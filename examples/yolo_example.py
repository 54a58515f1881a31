"""YOLOv3-tiny detection example — port of examples/yolo/yolo_example.cc.

Loads yolov3-tiny (Darknet .cfg + .weights if given, else the built-in
model with random weights), letterboxes an input image, runs inference,
and draws/prints the detections.

Usage:
  python examples/yolo_example.py <image> [cfg] [weights]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

COCO_NAMES = (
    "person bicycle car motorbike aeroplane bus train truck boat "
    "traffic_light fire_hydrant stop_sign parking_meter bench bird cat dog "
    "horse sheep cow elephant bear zebra giraffe backpack umbrella handbag "
    "tie suitcase frisbee skis snowboard sports_ball kite baseball_bat "
    "baseball_glove skateboard surfboard tennis_racket bottle wine_glass "
    "cup fork knife spoon bowl banana apple sandwich orange broccoli carrot "
    "hot_dog pizza donut cake chair sofa pottedplant bed diningtable toilet "
    "tvmonitor laptop mouse remote keyboard cell_phone microwave oven "
    "toaster sink refrigerator book clock vase scissors teddy_bear "
    "hair_drier toothbrush"
).split()


def prepare_frame(img, netw, neth):
    """Letterbox preprocess (yolo_example.cc:21-79): aspect-preserving
    resize centered on a gray canvas, mapped to [-1, 1]."""
    from bcnn_tpu import bip

    h, w, c = img.shape
    if netw / w < neth / h:
        nw, nh = netw, (h * netw) // w
    else:
        nh, nw = neth, (w * neth) // h
    resized = bip.resize_bilinear(img, nw, nh)
    canvas = np.full((neth, netw, 3), 128, np.uint8)
    dx, dy = (netw - nw) // 2, (neth - nh) // 2
    bip.crop_image(resized, -dx, -dy, netw, neth, out=canvas)
    x = (canvas.astype(np.float32) - 127.5) / 127.5
    return np.transpose(x, (2, 0, 1))[None]  # NCHW


def main(argv):
    from bcnn_tpu import Mode, Net, Session, bip
    from bcnn_tpu.models import yolov3_tiny

    if len(argv) < 2:
        print("usage: yolo_example.py <image> [cfg] [weights]")
        return 1
    img_path = argv[1]
    img = bip.load_image(img_path)
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)

    if len(argv) >= 4:
        from bcnn_tpu.config import load_net

        net = Net(Mode.PREDICT)
        load_net(net, argv[2], argv[3])
    else:
        print("no cfg/weights given; running built-in net, random weights")
        net = yolov3_tiny(batch_size=1, mode=Mode.PREDICT)
    sess = Session(net, seed=0).compile_net()

    x = prepare_frame(img, net.tensors[0].w, net.tensors[0].h)
    # timed inference (run_inference, yolo_example.cc:88-107)
    sess.yolo_get_detections(
        x, img.shape[1], img.shape[0], net.tensors[0].w, net.tensors[0].h,
        thresh=0.5,
    )  # warmup/compile
    t0 = time.time()
    dets = sess.yolo_get_detections(
        x, img.shape[1], img.shape[0], net.tensors[0].w, net.tensors[0].h,
        thresh=0.5,
    )
    print(f"inference time: {(time.time() - t0) * 1e3:.1f} ms")

    kept = [d for d in dets if d["objectness"] > 0]
    print(f"{len(kept)} detections")
    for d in kept:
        cls = int(np.argmax(d["prob"]))
        name = COCO_NAMES[cls] if cls < len(COCO_NAMES) else str(cls)
        print(
            f"  {name} p={d['prob'][cls]:.3f} "
            f"x={d['x']:.3f} y={d['y']:.3f} w={d['w']:.3f} h={d['h']:.3f}"
        )
    # draw boxes
    out = img.copy()
    hh, ww = img.shape[:2]
    for d in kept:
        x0 = int(np.clip((d["x"] - d["w"] / 2) * ww, 0, ww - 1))
        x1 = int(np.clip((d["x"] + d["w"] / 2) * ww, 0, ww - 1))
        y0 = int(np.clip((d["y"] - d["h"] / 2) * hh, 0, hh - 1))
        y1 = int(np.clip((d["y"] + d["h"] / 2) * hh, 0, hh - 1))
        out[y0:y1, x0, :] = (0, 0, 255)
        out[y0:y1, x1, :] = (0, 0, 255)
        out[y0, x0:x1, :] = (0, 0, 255)
        out[y1, x0:x1, :] = (0, 0, 255)
    dst = os.path.splitext(os.path.basename(img_path))[0] + "_dets.png"
    bip.write_image(dst, out)
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))

"""YOLOv3-tiny detection example — port of examples/yolo/yolo_example.cc.

Loads yolov3-tiny (Darknet .cfg + .weights if given, else the built-in
model with random weights), letterboxes input frames, runs inference,
and draws/prints the detections.

Image mode (yolo_example.cc image path):
  python examples/yolo_example.py <image> [cfg] [weights]

Video mode (yolo_example.cc:219-240's OpenCV loop): the frame source is
a directory of image frames, a raw .y4m video (both dependency-free), a
webcam device index "0"/"1", or any cv2-decodable video file (the
reference's open_video dispatch, yolo_example.cc:110-124); decode of
frame N+1 overlaps device inference of frame N (host-side prefetch
thread — the TPU analogue of the reference's capture-then-infer loop),
annotated frames are written out with per-frame latency and aggregate
FPS:
  python examples/yolo_example.py video <frames-dir|clip.y4m|0|clip.avi> \\
      [cfg] [weights] [--out outdir]
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


def read_y4m_frames(path):
    """Minimal YUV4MPEG2 reader: yields HWC uint8 RGB frames (BT.601)."""
    with open(path, "rb") as f:
        header = f.readline().decode("ascii", "replace").strip()
        if not header.startswith("YUV4MPEG2"):
            raise ValueError("not a y4m file")
        w = h = 0
        for tok in header.split()[1:]:
            if tok[0] == "W":
                w = int(tok[1:])
            elif tok[0] == "H":
                h = int(tok[1:])
            elif tok[0] == "C" and not tok.startswith("C420"):
                raise ValueError(f"only 4:2:0 y4m supported, got {tok}")
        ysz, csz = w * h, (w // 2) * (h // 2)
        while True:
            marker = f.readline()
            if not marker:
                return
            if not marker.startswith(b"FRAME"):
                raise ValueError("bad y4m frame marker")
            raw = f.read(ysz + 2 * csz)
            if len(raw) < ysz + 2 * csz:
                return
            y = np.frombuffer(raw, np.uint8, ysz).reshape(h, w)
            u = np.frombuffer(raw, np.uint8, csz, ysz).reshape(
                h // 2, w // 2
            )
            v = np.frombuffer(raw, np.uint8, csz, ysz + csz).reshape(
                h // 2, w // 2
            )
            u = np.repeat(np.repeat(u, 2, 0), 2, 1).astype(np.float32)
            v = np.repeat(np.repeat(v, 2, 0), 2, 1).astype(np.float32)
            yf = y.astype(np.float32)
            # BT.601 limited-range
            c = 1.164 * (yf - 16.0)
            r = c + 1.596 * (v - 128.0)
            g = c - 0.392 * (u - 128.0) - 0.813 * (v - 128.0)
            b = c + 2.017 * (u - 128.0)
            yield np.clip(
                np.stack([r, g, b], -1), 0, 255
            ).astype(np.uint8)


def read_cv2_frames(source):
    """OpenCV capture source, matching the reference's `open_video`
    dispatch (yolo_example.cc:110-124): source "0"/"1" opens the webcam
    at that device index, anything else is any cv2-decodable video file.
    Yields HWC uint8 RGB frames. Needs cv2; the y4m / frame-dir sources
    carry no such dependency."""
    import cv2

    cap = cv2.VideoCapture(int(source) if source in ("0", "1") else source)
    if not cap.isOpened():
        raise IOError(f"failed to open video source {source!r}")
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                return
            yield frame[..., ::-1].copy()  # cv2 is BGR; the loop wants RGB
    finally:
        cap.release()


def read_dir_frames(path):
    from bcnn_tpu import bip

    names = sorted(
        n for n in os.listdir(path)
        if n.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )
    for n in names:
        img = bip.load_image(os.path.join(path, n))
        if img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        yield img


def _draw_dets(img, dets, thresh=0.0):
    out = img.copy()
    hh, ww = img.shape[:2]
    for d in dets:
        if d["objectness"] <= thresh:
            continue
        x0 = int(np.clip((d["x"] - d["w"] / 2) * ww, 0, ww - 1))
        x1 = int(np.clip((d["x"] + d["w"] / 2) * ww, 0, ww - 1))
        y0 = int(np.clip((d["y"] - d["h"] / 2) * hh, 0, hh - 1))
        y1 = int(np.clip((d["y"] + d["h"] / 2) * hh, 0, hh - 1))
        out[y0:y1, x0, :] = (0, 0, 255)
        out[y0:y1, x1, :] = (0, 0, 255)
        out[y0, x0:x1, :] = (0, 0, 255)
        out[y1, x0:x1, :] = (0, 0, 255)
    return out


def run_video(source, net, sess, out_dir, thresh=0.5, max_frames=None):
    """The reference's video loop (yolo_example.cc:219-240), pipelined:
    a prefetch thread decodes + letterboxes frame N+1 while the device
    runs frame N. Returns (n_frames, fps)."""
    import queue
    import threading

    from bcnn_tpu import bip

    netw, neth = net.tensors[0].w, net.tensors[0].h
    if source.endswith(".y4m"):
        frames = read_y4m_frames(source)
    elif os.path.isdir(source):
        frames = read_dir_frames(source)
    else:  # "0"/"1" webcam index or a cv2-decodable video file
        frames = read_cv2_frames(source)
    q = queue.Queue(maxsize=2)  # double buffer

    def producer():
        for i, img in enumerate(frames):
            if max_frames is not None and i >= max_frames:
                break
            q.put((i, img, prepare_frame(img, netw, neth)))
        q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    t_total = t_first = time.time()
    while True:
        item = q.get()
        if item is None:
            break
        i, img, x = item
        t0 = time.time()
        dets = sess.yolo_get_detections(
            x, img.shape[1], img.shape[0], netw, neth, thresh=thresh
        )
        dt = (time.time() - t0) * 1e3
        kept = [d for d in dets if d["objectness"] > 0]
        bip.write_image(
            os.path.join(out_dir, f"frame_{i:05d}.png"),
            _draw_dets(img, kept),
        )
        print(f"frame {i}: {len(kept)} dets, {dt:.1f} ms")
        if n == 0:
            t_first = time.time()  # exclude compile from FPS
        n += 1
    wall = time.time() - t_first
    fps = (n - 1) / wall if n > 1 and wall > 0 else 0.0
    print(f"{n} frames, {fps:.1f} FPS (steady-state)")
    return n, fps


def main(argv):
    from examples._common import honor_jax_platforms
    honor_jax_platforms()
    from bcnn_tpu import Mode, Net, Session, bip
    from bcnn_tpu.models import yolov3_tiny

    if len(argv) < 2:
        print(
            "usage: yolo_example.py <image> [cfg] [weights] | "
            "yolo_example.py video <src> [cfg] [weights] [--out dir]"
        )
        return 1
    if argv[1] == "video":
        out_dir = "video_dets"
        if "--out" in argv:
            k = argv.index("--out")
            out_dir = argv[k + 1]
            argv = argv[:k] + argv[k + 2 :]
        source = argv[2]
        if len(argv) >= 5:
            from bcnn_tpu.config import load_net

            net = Net(Mode.PREDICT)
            load_net(net, argv[3], argv[4])
        else:
            print("no cfg/weights; built-in net, random weights")
            net = yolov3_tiny(batch_size=1, mode=Mode.PREDICT)
        sess = Session(net, seed=0).compile_net()
        run_video(source, net, sess, out_dir)
        return 0
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

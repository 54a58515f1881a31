"""bcnn-cl equivalent: `python -m bcnn_tpu.cli <train|valid|predict> <conf>
[model]`.

Mirrors src/cli/bcnn_cl.c:
  - general params read from the [net]/[network] section
    (bcnn_cl_load_param :38-102): data_format, input_model, output_model,
    out_pred, eval_test, eval_period, save_model, num_pred,
    source_train/label_train, source_test/label_test;
  - train loop (bcnn_cl_train :104-146): max_batches iterations, periodic
    eval via mode switch, periodic checkpoints named
    <output_model>_iter<i>.bcnnmodel;
  - predict (bcnn_cl_predict :148-250): num_pred/batch batches; raw floats
    to out_pred, or detection boxes drawn onto det_<b>.png for detection
    nets.
"""

from __future__ import annotations

import argparse
import sys
import time
from dataclasses import dataclass
from typing import Optional

import numpy as np

from .api import Session
from .config import load_net, parse_ini
from .graph import Net
from .serialization import save_weights
from .types import LoaderType, Mode

_DATA_FORMATS = {
    "mnist": LoaderType.MNIST,
    "cifar10": LoaderType.CIFAR10,
    "classif": LoaderType.CLASSIFICATION_LIST,
    "classification": LoaderType.CLASSIFICATION_LIST,
    "reg": LoaderType.REGRESSION_LIST,
    "regression": LoaderType.REGRESSION_LIST,
    "detection": LoaderType.DETECTION_LIST,
}


@dataclass
class CliParam:
    """Mirror of bcnn_cl_param with its defaults (bcnn_cl.c:97-101)."""

    data_format: LoaderType = LoaderType.MNIST
    input_model: Optional[str] = None
    output_model: Optional[str] = None
    pred_out: Optional[str] = None
    eval_test: int = 0
    eval_period: int = 100
    save_model: int = 1000
    num_pred: int = 1
    train_input: Optional[str] = None
    path_train_label: Optional[str] = None
    test_input: Optional[str] = None
    path_test_label: Optional[str] = None
    scan_steps: int = 1  # extension: k loader batches per device program


def load_cli_param(config_path: str) -> CliParam:
    p = CliParam()
    sections = parse_ini(config_path)
    for k, v in sections[0].keys:
        if k == "data_format":
            if v not in _DATA_FORMATS:
                raise ValueError(f"Invalid data_format {v!r}")
            p.data_format = _DATA_FORMATS[v]
        elif k == "input_model":
            p.input_model = v
        elif k == "output_model":
            p.output_model = v
        elif k == "out_pred":
            p.pred_out = v
        elif k == "eval_test":
            p.eval_test = int(v)
        elif k == "eval_period":
            p.eval_period = int(v)
        elif k == "save_model":
            p.save_model = int(v)
        elif k == "num_pred":
            p.num_pred = int(v)
        elif k == "source_train":
            p.train_input = v
        elif k == "label_train":
            p.path_train_label = v
        elif k == "source_test":
            p.test_input = v
        elif k == "label_test":
            p.path_test_label = v
        elif k == "scan_steps":
            p.scan_steps = int(v)
    p.num_pred = max(p.num_pred, 1)
    p.scan_steps = max(p.scan_steps, 1)
    p.eval_period = p.eval_period if p.eval_period > 0 else 100
    p.save_model = p.save_model if p.save_model > 0 else 1000
    return p


def predict(sess: Session, param: CliParam) -> float:
    """bcnn_cl_predict (bcnn_cl.c:148-250): num_pred/batch batches; raw
    floats to out_pred, or det_<b>.png with drawn truth(green)/pred(blue)
    boxes for detection nets."""
    net = sess.net
    err = 0.0
    n = max(1, param.num_pred // net.batch_size)
    is_detection = param.data_format == LoaderType.DETECTION_LIST
    f = (
        open(param.pred_out, "wt")
        if (param.pred_out and not is_detection)
        else None
    )
    for _ in range(n):
        if is_detection and param.pred_out:
            x, y = sess.loader.next_batch()
            _dump_detections(sess, x, y)
            _, loss = sess.predict_on_batch(x, y)
            err += float(loss)
            continue
        outs, loss = sess.predict_on_batch()
        err += float(loss)
        if f is not None:
            out = np.asarray(outs[0]).reshape(net.batch_size, -1)
            for row in out:
                f.write(" ".join(f"{v:f}" for v in row) + "\n")
    if f:
        f.close()
    return err / param.num_pred


def _draw_box(img, bx, by, bw, bh, color):
    """bcnn_draw_color_box equivalent; img HWC uint8, box relative xywh."""
    hh, ww = img.shape[:2]
    x0 = int(np.clip((bx - bw / 2) * ww, 0, ww - 1))
    x1 = int(np.clip((bx + bw / 2) * ww, 0, ww - 1))
    y0 = int(np.clip((by - bh / 2) * hh, 0, hh - 1))
    y1 = int(np.clip((by + bh / 2) * hh, 0, hh - 1))
    img[y0:y1, x0] = color
    img[y0:y1, x1] = color
    img[y0, x0:x1] = color
    img[y1, x0:x1] = color


def _dump_detections(sess: Session, x, y):
    """det_<b>.png dumps: truth boxes green, detections blue."""
    from . import bip

    net = sess.net
    w, h = net.tensors[0].w, net.tensors[0].h
    for b in range(net.batch_size):
        img = np.clip((x[b] + 1.0) * 127.5, 0, 255).astype(np.uint8)
        img = np.transpose(img, (1, 2, 0))
        if img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
        img = np.ascontiguousarray(img)
        for t in range(y.shape[1] // 5):
            bx, by_, bw, bh, _cls = y[b, t * 5 : t * 5 + 5]
            if bw <= 0 or bh <= 0:
                continue
            _draw_box(img, bx, by_, bw, bh, (0, 255, 0))
        dets = sess.yolo_get_detections(
            x, w, h, w, h, thresh=0.5, batch_item=b
        )
        for d in dets:
            if d["objectness"] > 0:
                _draw_box(img, d["x"], d["y"], d["w"], d["h"], (0, 0, 255))
        bip.write_image(f"det_{b}.png", img)


def _print_yolo_stats(sess: Session, k: int = 1):
    """The reference prints one diagnostics line per yolo layer per TRAIN
    batch (bcnn_yolo.c:408-414). k>1: stats arrive stacked per scan step."""
    stats = sess.last_yolo_stats
    if stats is None:
        return
    from .ops.yolo import format_yolo_stats

    for step in range(k):
        for layer in stats:
            d = (
                {kk: v[step] for kk, v in layer.items()} if k > 1 else layer
            )
            print(format_yolo_stats(d), file=sys.stderr)
    sess.last_yolo_stats = None


def train(sess: Session, param: CliParam) -> float:
    net = sess.net
    nb_iter = net.learner.max_batches
    k = param.scan_steps
    if k > 1:
        # extension (conf key `scan_steps`): run k loader batches per
        # device program via lax.scan — no host round-trip per step
        # (measured -9.5 ms/step through the axon tunnel, BENCHMARKS.md).
        # Eval/save boundaries must align with the chunk size; when they
        # don't, fall back to the reference-exact per-step loop.
        scan_unsupported = (
            (getattr(net, "device_augment", None) is not None
             and sess.mesh is not None)  # single-device scan augments
            or bool(getattr(net, "remat", False))
            or int(getattr(net, "accum_steps", 1) or 1) > 1
        )
        if (param.eval_period % k or param.save_model % k
                or nb_iter % k or scan_unsupported):
            print(
                f"scan_steps={k} needs aligned eval_period/save_model/"
                "max_batches and no mesh+device_augment/remat/accum_steps; "
                "using the per-step loop",
                file=sys.stderr,
            )
        else:
            return _train_scan_loop(sess, param, k)
    sum_error = 0.0
    t0 = time.time()
    for i in range(nb_iter):
        sum_error += float(sess.train_on_batch())
        _print_yolo_stats(sess)
        if i % param.eval_period == 0 and i > 0:
            dt = time.time() - t0
            if param.eval_test:
                sess.set_mode(Mode.VALID)
                error_valid = predict(sess, param)
                sess.set_mode(Mode.TRAIN)
                print(
                    f"iter-batches= {i} train-error= "
                    f"{sum_error / (param.eval_period * net.batch_size):f} "
                    f"test-error= {error_valid:f} training-time= {dt:.3f} sec",
                    file=sys.stderr,
                )
            else:
                print(
                    f"iter-batches= {i} train-error= "
                    f"{sum_error / (param.eval_period * net.batch_size):f} "
                    f"training-time= {dt:.3f} sec",
                    file=sys.stderr,
                )
            t0 = time.time()
            sum_error = 0.0
        if i % param.save_model == 0 and i > 0 and param.output_model:
            save_weights(
                sess.net,
                sess.params,
                sess.state,
                f"{param.output_model}_iter{i}.bcnnmodel",
            )
    return sum_error / (param.eval_period * net.batch_size)


def _train_scan_loop(sess: Session, param: CliParam, k: int) -> float:
    """Chunked train loop: k steps per device dispatch, eval/save at
    every aligned boundary. Deliberate deviation from the per-step
    loop's cadence: the reference evals after step INDEX i%period==0 —
    i.e. after i+1 completed steps (bcnn_cl.c's loop counts from 0) —
    which no chunking can reproduce without splitting a chunk. This
    loop evals/saves after exactly i completed steps, so an _iter{i}
    checkpoint here holds i updates (the per-step loop's holds i+1),
    and each logged train-error window covers exactly eval_period
    steps. The per-step loop (scan_steps=1) stays reference-exact."""
    net = sess.net
    nb_iter = net.learner.max_batches
    sum_error = 0.0
    t0 = time.time()
    i = 0
    while i < nb_iter:
        sum_error += float(sess.train_scan_on_batches(k))
        _print_yolo_stats(sess, k)
        i += k
        if i % param.eval_period == 0 and i < nb_iter:
            dt = time.time() - t0
            msg = (
                f"iter-batches= {i} train-error= "
                f"{sum_error / (param.eval_period * net.batch_size):f} "
            )
            if param.eval_test:
                sess.set_mode(Mode.VALID)
                error_valid = predict(sess, param)
                sess.set_mode(Mode.TRAIN)
                msg += f"test-error= {error_valid:f} "
            print(msg + f"training-time= {dt:.3f} sec", file=sys.stderr)
            t0 = time.time()
            sum_error = 0.0
        if i % param.save_model == 0 and i < nb_iter and param.output_model:
            save_weights(
                sess.net, sess.params, sess.state,
                f"{param.output_model}_iter{i}.bcnnmodel",
            )
    return sum_error / (param.eval_period * net.batch_size)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="bcnn-cl")
    ap.add_argument(
        "mode", choices=["train", "valid", "predict", "export"]
    )
    ap.add_argument("config")
    ap.add_argument("model", nargs="?", default=None)
    ap.add_argument(
        "--out", default=None,
        help="export: artifact path (default <output_model>.stablehlo)",
    )
    ap.add_argument(
        "--detect", action="store_true",
        help="export: bake the full detect pipeline instead of the forward",
    )
    args = ap.parse_args(argv)
    if args.mode != "export" and (args.out or args.detect):
        ap.error("--out/--detect apply to export mode only")

    mode = {
        "train": Mode.TRAIN,
        "valid": Mode.VALID,
        "predict": Mode.PREDICT,
        "export": Mode.PREDICT,
    }[args.mode]
    param = load_cli_param(args.config)
    net = Net(mode)
    model_path = args.model or param.input_model
    load_net(net, args.config, model_path)
    if mode == Mode.TRAIN:
        from .types import LayerType

        # the reference prints per-batch yolo diagnostics unconditionally
        # during detection training (bcnn_yolo.c:408-414)
        if any(n.type == LayerType.YOLOV3 for n in net.nodes):
            net.yolo_stats = True
    sess = Session(net)

    if args.mode == "export":
        # beyond bcnn-cl: AOT serving artifact from the same config-file
        # workflow (deploy.py; the edge path stays tools/bcnn2tflite.py)
        sess.compile_net()
        out = args.out or (
            (param.output_model or "model") + ".stablehlo"
        )
        try:
            sess.export_serving(out, detect=args.detect)
        except ValueError as e:
            print(f"export failed: {e}", file=sys.stderr)
            return 1
        print(f"Exported serving artifact to {out}", file=sys.stderr)
        return 0

    sess.set_data_loader(
        param.data_format,
        param.train_input,
        param.path_train_label,
        param.test_input,
        param.path_test_label,
    )
    sess.compile_net()

    if mode == Mode.TRAIN:
        err = train(sess, param)
        if param.output_model:
            save_weights(net, sess.params, sess.state, param.output_model)
        print(f"Training ended, final error= {err:f}", file=sys.stderr)
    else:
        err = predict(sess, param)
        print(f"Average error= {err:f}", file=sys.stderr)
        if (
            args.mode == "valid"
            and param.data_format == LoaderType.DETECTION_LIST
        ):
            # beyond bcnn-cl: detection quality, not just the delta-norm
            # loss — mAP over the same num_pred images (metrics_det.py)
            from .metrics_det import format_map, map_eval

            res = map_eval(sess, num_images=param.num_pred)
            print(format_map(res), file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

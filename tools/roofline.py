"""Per-model roofline audit: XLA cost/memory analysis + measured wall
time -> GFLOP/s, GB/s, and %-of-wall for each benchmark model.

The reference's harness reports wall time only
(inference_benchmark.c:92-112); this tool adds the piece that makes a
number falsifiable: the program's own FLOP and byte counts from XLA's
cost analysis, positioned against the chip's walls (v5e: 819 GB/s HBM,
~197 bf16 TFLOP/s, ~394 int8 TOPS). A model "at the wall" has no
headroom without changing the program's bytes; one far off its wall has
a pinned, attributable gap.

Usage:
  python tools/roofline.py                      # all configs
  python tools/roofline.py mobilenet-v1:int8:256  yolov3:bf16:32

Prints one JSON line per config plus a markdown table at the end.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

# v5e single-chip walls
HBM_GBPS = 819.0
BF16_TFLOPS = 197.0
INT8_TOPS = 394.0
FP32_TFLOPS = 98.5

DEFAULT_CONFIGS = [
    "mobilenet-v1:bf16:256",
    "mobilenet-v1:int8:256",
    "resnet18:bf16:256",
    "resnet18:int8:256",
    "yolov3:bf16:32",
    "yolov3:int8:32",
    "yolov3-tiny:bf16:256",
    "yolov3-tiny:int8:256",
]


def build_forward(model, mode, batch):
    """Same program shape as examples/inference_benchmark.py: PREDICT
    forward to the head tensors, checksum outputs (sync reads otherwise
    measure tunnel bandwidth)."""
    import types as pytypes

    from examples.inference_benchmark import build

    args = pytypes.SimpleNamespace(
        config=None, weights=None, model=model, batch=batch,
        bf16=(mode != "fp32"), int8=(mode == "int8"),
    )
    net, sess = build(args)

    from bcnn_tpu import Mode
    from bcnn_tpu.compile import execute
    from bcnn_tpu.types import LayerType

    out_idx = [
        n.dst[0] for n in net.nodes if n.type not in (LayerType.COST,)
    ][-1:]
    yolo_idx = [n.dst[0] for n in net.nodes if n.type == LayerType.YOLOV3]
    if yolo_idx:
        out_idx = yolo_idx

    def forward(params, state, x):
        ex = execute(net, params, state, {"input": x}, Mode.PREDICT, None)
        return tuple(
            jnp.sum(ex.values[i], dtype=jnp.float32) for i in out_idx
        )

    t0 = net.tensors[0]
    x = jnp.asarray(
        np.random.RandomState(0).rand(t0.n, t0.c, t0.h, t0.w), jnp.float32
    )
    return forward, sess, x, t0.n


def sync(o):
    jax.block_until_ready(o)
    return float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])


def audit(spec, runs):
    model, mode, batch = spec.split(":")
    batch = int(batch)
    forward, sess, x, n = build_forward(model, mode, batch)

    compiled = jax.jit(forward).lower(sess.params, sess.state, x).compile()

    row = {"model": model, "mode": mode, "batch": n}
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    ca = ca or {}
    mem = compiled.memory_analysis()
    row["gflop"] = ca.get("flops", 0.0) / 1e9
    row["gbytes"] = ca.get("bytes accessed", 0.0) / 1e9
    if mem is not None:
        row["temp_mb"] = getattr(mem, "temp_size_in_bytes", 0) / 1e6
        row["arg_mb"] = getattr(mem, "argument_size_in_bytes", 0) / 1e6

    sync(compiled(sess.params, sess.state, x))
    times = []
    for _ in range(runs):
        t = time.perf_counter()
        sync(compiled(sess.params, sess.state, x))
        times.append((time.perf_counter() - t) * 1e3)
    burst = 6
    t = time.perf_counter()
    outs = [compiled(sess.params, sess.state, x) for _ in range(burst)]
    sync(outs[-1])
    times.append((time.perf_counter() - t) * 1e3 / burst)
    ms = min(times)
    row["ms"] = round(ms, 2)
    row["img_s"] = round(n / (ms / 1e3))

    # achieved rates and wall fractions. FLOP wall: int8 convs accumulate
    # on the int8 MXU path but cost analysis counts HLO flops uniformly,
    # so use the mode's MXU wall.
    flop_wall = {"bf16": BF16_TFLOPS, "int8": INT8_TOPS,
                 "fp32": FP32_TFLOPS}[mode]
    row["tflops"] = round(row["gflop"] / ms, 1)  # GFLOP / ms == TFLOP/s
    row["gbps"] = round(row["gbytes"] / ms * 1e3, 0)
    row["pct_flop_wall"] = round(100 * row["tflops"] / flop_wall, 1)
    row["pct_hbm_wall"] = round(100 * row["gbps"] / HBM_GBPS, 1)
    # bytes floor: time the program needs just to move its bytes at the
    # HBM wall; flops floor likewise. max() = speed-of-light for this
    # program; ms/floor = headroom multiple.
    floor_ms = max(
        row["gbytes"] / HBM_GBPS * 1e3, row["gflop"] / flop_wall
    )
    row["floor_ms"] = round(floor_ms, 2)
    row["x_floor"] = round(ms / floor_ms, 2)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("specs", nargs="*", default=None)
    ap.add_argument("--runs", type=int, default=12)
    args = ap.parse_args()
    specs = args.specs or DEFAULT_CONFIGS

    rows = []
    for spec in specs:
        row = audit(spec, args.runs)
        print(json.dumps(row), flush=True)
        rows.append(row)

    print("\n| model | mode | batch | ms | img/s | GFLOP | GB | TFLOP/s "
          "| GB/s | %FLOP wall | %HBM wall | floor ms | x floor |")
    print("|---|---|---|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['model']} | {r['mode']} | {r['batch']} | {r['ms']} "
            f"| {r['img_s']} | {r['gflop']:.1f} | {r['gbytes']:.2f} "
            f"| {r['tflops']} | {r['gbps']:.0f} | {r['pct_flop_wall']} "
            f"| {r['pct_hbm_wall']} | {r['floor_ms']} | {r['x_floor']} |"
        )


if __name__ == "__main__":
    main()

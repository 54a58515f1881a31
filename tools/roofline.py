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
        bf16=(mode != "fp32"), int8=mode.startswith("int8"),
    )
    net, sess = build(args)
    if mode.endswith("a"):  # bf16a/int8a: bf16 boundary storage on top
        net.act_dtype = jnp.bfloat16
    build_forward.last_net = net

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


def padded_traffic_gb(net, mode):
    """Lane-padding-adjusted HBM traffic estimate (upper bound).

    XLA's nominal bytes_accessed counts logical element sizes, but TPU
    vregs tile the last two dims of every stored tensor to (8 sublanes x
    128 lanes): an NHWC activation stores C padded to 128 and W padded
    to 8. Thin-channel maps (C=32 -> 4x, C=64 -> 2x) therefore move far
    more HBM bytes than the nominal count — the dominant correction for
    MobileNet/ResNet-class models. This walks the graph and counts, per
    node with weights or spatial work: read(src, padded) +
    write(dst, padded), activation dtype 4B (fp32 inter-layer storage;
    the bf16 MXU cast fuses into the conv read), int8 1B where the
    activation-flow plan applies. The true floor lies between the
    nominal floor and this estimate (XLA sometimes picks transposed
    layouts or fuses a producer entirely)."""
    from bcnn_tpu.types import LayerType

    act_b = (1 if mode.startswith("int8")
             else 2 if mode.endswith("a") else 4)
    # counting is per-USE: one padded write at the producer plus one
    # padded read per consuming node (fan-out tensors are read N times)
    # — a deliberate worst case on top of the worst-case padding; the
    # model is pinned as an over-predictor either way (see BENCHMARKS.md)

    def tbytes(t, b):
        c = ((t.c + 127) // 128) * 128
        w = ((t.w + 7) // 8) * 8 if t.h > 1 or t.w > 1 else t.w
        return t.n * t.h * w * c * b

    compute = {
        LayerType.CONV2D, LayerType.DEPTHWISE_CONV2D,
        LayerType.TRANSPOSE_CONV2D, LayerType.FULL_CONNECTED,
        LayerType.MAXPOOL, LayerType.AVGPOOL, LayerType.BATCHNORM,
        LayerType.CONCAT, LayerType.ELTWISE, LayerType.UPSAMPLE,
        LayerType.YOLOV3, LayerType.ACTIVATION, LayerType.LRN,
    }
    total = 0
    for node in net.nodes:
        if node.type not in compute:
            continue
        for i in list(node.src) + list(node.dst):
            t = net.tensors[i]
            if t.name == "label" or t.size() == 0:
                continue
            b = act_b if node.type != LayerType.YOLOV3 else 4
            total += tbytes(t, b)
    return total / 1e9


def scan_device_ms(forward, sess, x, n):
    """True per-step DEVICE time: run `n` forwards inside ONE dispatch via
    lax.scan, so the axon tunnel's per-call floor (~6-13 ms measured; see
    BENCHMARKS.md) is paid once for the whole chain. The carry perturbs a
    single input element by the running checksum — a data dependence that
    stops XLA hoisting the loop-invariant body out of the while-loop
    (with an untouched x the whole forward is loop-invariant and the scan
    would measure nothing). n kept <= 16: longer scans produce giant HLOs
    that wedge the shared remote-compile queue (CLAUDE.md)."""
    from jax import lax

    def body(carry, _):
        xc, acc = carry
        outs = forward(sess.params, sess.state, xc)
        s = sum(outs, jnp.float32(0.0))
        xc = xc.at[0, 0, 0, 0].add(1e-12 * s)
        return (xc, acc + s), None

    def chain(x0):
        (_, acc), _ = lax.scan(body, (x0, jnp.float32(0.0)), None, length=n)
        return acc

    compiled = jax.jit(chain).lower(x).compile()
    sync(compiled(x))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        sync(compiled(x))
        best = min(best, (time.perf_counter() - t0) * 1e3)
    return best / n


def audit(spec, runs, scan=0):
    model, mode, batch = spec.split(":")
    batch = int(batch)
    forward, sess, x, n = build_forward(model, mode, batch)

    compiled = jax.jit(forward).lower(sess.params, sess.state, x).compile()

    row = {"model": model, "mode": mode, "batch": n}
    row["padded_gb"] = round(
        padded_traffic_gb(build_forward.last_net, mode), 2
    )
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
                 "fp32": FP32_TFLOPS, "bf16a": BF16_TFLOPS,
                 "int8a": INT8_TOPS}[mode]
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
    if scan:
        dms = scan_device_ms(forward, sess, x, scan)
        row["device_ms"] = round(dms, 2)
        row["dispatch_ms"] = round(ms - dms, 2)
        row["device_img_s"] = round(n / (dms / 1e3))
        row["device_x_floor"] = round(dms / floor_ms, 2)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("specs", nargs="*", default=None)
    ap.add_argument("--runs", type=int, default=12)
    ap.add_argument("--scan", type=int, default=0,
                    help="also measure per-step device time via an "
                         "N-long scan in one dispatch (N<=16)")
    args = ap.parse_args()
    specs = args.specs or DEFAULT_CONFIGS

    rows = []
    for spec in specs:
        row = audit(spec, args.runs, scan=args.scan)
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

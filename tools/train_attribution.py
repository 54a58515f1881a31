"""Per-layer attribution of the yolov3-tiny training step (VERDICT r3 #3).

BENCHMARKS.md's round-3 decomposition bracketed the batch-256 train step
at whole-chain granularity: YOLO delta machinery ~9 ms, BN ~0, and
"everything else" — 129.5 ms fp32-act / ~103 ms act16 against the bytes
floor — written off as "the conv backward chain XLA owns". This tool
attributes that residue to NAMED layers.

Method — prefix differencing: build the net truncated after each
layer/block (cut k), put a sum-of-squares surrogate on the prefix's
live outputs (cotangent 2*out; every conv's dW/dX and its optimizer
update stay in the program — nothing DCEs), jit the full
fwd+bwd+SGD-update step, and time each prefix with the bench protocol
(individually-synced best-of-N plus an amortized burst). Then

    block_ms[k]    = ms[k] - ms[k-1]
    block_floor[k] = nominal floor (XLA cost analysis bytes/flops) delta

so each block gets its own x-floor — the outlier hunt the verdict asked
for. The full real train step (make_train_step, yolo loss) is measured
in the same session: full - last_cut re-checks the ~9 ms YOLO bracket.

Known systematic: cut k's surrogate reads its boundary tensor once and
seeds a same-shape cotangent (~3x boundary bytes); the `bnd_ms` column
estimates it at the HBM wall so deltas can be corrected
(block ≈ delta - bnd[k] + bnd[k-1]). It shrinks 2x per pool stage and
is <0.2 ms past cut 4.

Branch cuts (11-13) keep the 13x13 head tensor (lid16) as a second
surrogate output so the head-1 chain stays live, mirroring the real
program where both heads feed the loss.

Usage:
  python tools/train_attribution.py [--batch 256] [--size 416]
      [--runs 12] [--act bf16|fp32] [--cuts 1-13] [--quick]
      [--skip-full]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bcnn_tpu_jax_cache")

import numpy as np

HBM_GBPS = 819.0  # v5e HBM wall (tools/roofline.py)
BF16_TFLOPS = 197.0
FP32_TFLOPS = 49.0


def build_prefix(k, batch, size, act):
    """yolov3-tiny truncated after cut k (1-13). Returns (net, out_names).
    Mirrors models/yolov3.py:37-65 layer-for-layer; cut boundaries are
    placed after each conv so a block = (preceding pool/route/upsample +
    conv)."""
    import jax.numpy as jnp

    from bcnn_tpu import Activation, FillerType, Mode, Padding
    from bcnn_tpu.graph import Net

    net = Net(Mode.TRAIN)
    net.set_input_shape(size, size, 3, batch)
    net.set_sgd_optimizer(learning_rate=0.001, momentum=0.9)
    net.set_weight_regularizer(0.0005)
    net.compute_dtype = jnp.bfloat16
    if act == "bf16":
        net.train_act_dtype = jnp.bfloat16
    X, F, L = FillerType.XAVIER, Activation.LRELU, Activation.NONE

    def conv(n, ksz, s, p, bn, a, src, dst):
        net.add_convolutional_layer(n, ksz, s, p, 1, bn, X, a, 0, src, dst)

    steps = [
        lambda: conv(16, 3, 1, 1, 1, F, "input", "lid1"),           # 1
        lambda: (net.add_maxpool_layer(2, 2, Padding.SAME, "lid1", "lid2"),
                 conv(32, 3, 1, 1, 1, F, "lid2", "lid3")),          # 2
        lambda: (net.add_maxpool_layer(2, 2, Padding.SAME, "lid3", "lid4"),
                 conv(64, 3, 1, 1, 1, F, "lid4", "lid5")),          # 3
        lambda: (net.add_maxpool_layer(2, 2, Padding.SAME, "lid5", "lid6"),
                 conv(128, 3, 1, 1, 1, F, "lid6", "lid7")),         # 4
        lambda: (net.add_maxpool_layer(2, 2, Padding.SAME, "lid7", "lid8"),
                 conv(256, 3, 1, 1, 1, F, "lid8", "lid9")),         # 5
        lambda: (net.add_maxpool_layer(2, 2, Padding.SAME, "lid9", "lid10"),
                 conv(512, 3, 1, 1, 1, F, "lid10", "lid11")),       # 6
        lambda: (net.add_maxpool_layer(2, 1, Padding.SAME, "lid11", "lid12"),
                 conv(1024, 3, 1, 1, 1, F, "lid12", "lid13")),      # 7
        lambda: conv(256, 1, 1, 0, 1, F, "lid13", "lid14"),         # 8
        lambda: conv(512, 3, 1, 1, 1, F, "lid14", "lid15"),         # 9
        lambda: conv(255, 1, 1, 0, 0, L, "lid15", "lid16"),         # 10
        lambda: (net.add_concat_layer(["lid14"], "lid18"),
                 conv(128, 1, 1, 0, 1, F, "lid18", "lid19"),
                 net.add_upsample_layer(2, "lid19", "lid20")),      # 11
        lambda: (net.add_concat_layer(["lid20", "lid9"], "lid21"),
                 conv(256, 3, 1, 1, 1, F, "lid21", "lid22")),       # 12
        lambda: conv(255, 1, 1, 0, 0, L, "lid22", "lid23"),         # 13
    ]
    ends = ["lid1", "lid3", "lid5", "lid7", "lid9", "lid11", "lid13",
            "lid14", "lid15", "lid16", "lid20", "lid22", "lid23"]
    for s in steps[:k]:
        s()
    outs = [ends[k - 1]]
    if k >= 11:  # past the branch: keep the 13x13 head chain live too
        outs = ["lid16", ends[k - 1]]
    return net, outs


CUT_NAMES = [
    "c1 conv16x3 @416",
    "p1+c2 conv32x3 @208",
    "p2+c3 conv64x3 @104",
    "p3+c4 conv128x3 @52",
    "p4+c5 conv256x3 @26",
    "p5+c6 conv512x3 @13",
    "p6(s1)+c7 conv1024x3 @13",
    "c8 conv256x1 @13",
    "c9 conv512x3 @13",
    "c10 head1 conv255x1 @13",
    "route+c11 conv128x1+up @26",
    "cat+c12 conv256x3 @26",
    "c13 head2 conv255x1 @26",
]


def make_prefix_step(net, out_names):
    import functools

    import jax
    import jax.numpy as jnp

    from bcnn_tpu.compile import execute
    from bcnn_tpu.learner import apply_updates
    from bcnn_tpu.types import Mode

    out_idx = [net.get_tensor_index_by_name(n) for n in out_names]

    def loss_fn(params, state, batch, rng):
        ex = execute(net, params, state, batch, Mode.TRAIN, rng)
        loss = jnp.zeros((), jnp.float32)
        for i in out_idx:
            v = ex.values[i].astype(jnp.float32)
            loss = loss + jnp.sum(v * v)
        return loss, ex.state

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(params, state, opt, batch, rng):
        (loss, state2), grads = grad_fn(params, state, batch, rng)
        params2, opt2 = apply_updates(net, params, grads, opt)
        return params2, state2, opt2, loss

    return step


def sync(v):
    # block_until_ready may return early on axon — force a host read
    np.asarray(v)


def measure(compiled, args_tuple, runs):
    """bench.py protocol: warmup, individually-synced calls, plus one
    amortized burst; min over all. Donated params/state/opt are threaded
    through so buffers stay valid."""
    params, state, opt, batch, key = args_tuple
    params, state, opt, loss = compiled(params, state, opt, batch, key)
    sync(loss)  # warmup / first-dispatch tail
    times = []
    for _ in range(runs):
        t = time.perf_counter()
        params, state, opt, loss = compiled(params, state, opt, batch, key)
        sync(loss)
        times.append((time.perf_counter() - t) * 1e3)
    burst = 6
    t = time.perf_counter()
    for _ in range(burst):
        params, state, opt, loss = compiled(params, state, opt, batch, key)
    sync(loss)
    times.append((time.perf_counter() - t) * 1e3 / burst)
    return min(times), (params, state, opt)


def compile_step(step, params, state, opt, batch, key):
    """ONE server-side compile per cut: lower+compile explicitly, reuse
    the executable for both cost analysis and timing."""
    t0 = time.perf_counter()
    compiled = step.lower(params, state, opt, batch, key).compile()
    compile_s = time.perf_counter() - t0
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    ca = ca or {}
    return (compiled, compile_s, ca.get("flops", 0.0) / 1e9,
            ca.get("bytes accessed", 0.0) / 1e9)


def boundary_ms(net, out_names, batch):
    """Estimated surrogate-boundary cost at the HBM wall: read out once
    (loss) + read again and write the cotangent in the backward seed."""
    total = 0.0
    act_bytes = 2 if getattr(net, "train_act_dtype", None) is not None else 4
    for n in out_names:
        t = net.tensors[net.get_tensor_index_by_name(n)]
        elems = batch * t.c * t.h * t.w
        total += 3 * elems * act_bytes / (HBM_GBPS * 1e9) * 1e3
    return total


def run_cut(k, args, x, key, runs):
    import jax

    from bcnn_tpu import Session

    net, outs = build_prefix(k, args.batch, args.size, args.act)
    sess = Session(net, seed=0).compile_net()
    step = make_prefix_step(net, outs)
    batch = {"input": x}
    compiled, compile_s, gflop, gbytes = compile_step(
        step, sess.params, sess.state, sess.opt_state, batch, key
    )
    ms, _ = measure(
        compiled, (sess.params, sess.state, sess.opt_state, batch, key),
        runs,
    )
    flop_wall = BF16_TFLOPS  # compute_dtype is bf16 in both act modes
    floor = max(gbytes / HBM_GBPS * 1e3, gflop / flop_wall)
    row = {
        "cut": k,
        "name": CUT_NAMES[k - 1],
        "ms": round(ms, 2),
        "gflop": round(gflop, 1),
        "gbytes": round(gbytes, 2),
        "floor_ms": round(floor, 2),
        "bnd_ms": round(boundary_ms(net, outs, args.batch), 2),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def run_full(args, x, key, runs):
    """The real train step (yolo loss) for the same config — full minus
    cut 13 re-checks the round-3 ~9 ms YOLO-machinery bracket."""
    import jax.numpy as jnp

    from bcnn_tpu import Mode, Session
    from bcnn_tpu.compile import make_train_step
    from bcnn_tpu.models import yolov3_tiny

    net = yolov3_tiny(batch_size=args.batch, width=args.size,
                      height=args.size, mode=Mode.TRAIN)
    net.compute_dtype = jnp.bfloat16
    if args.act == "bf16":
        net.train_act_dtype = jnp.bfloat16
    sess = Session(net, seed=0).compile_net()
    step = make_train_step(net)
    y = jnp.zeros((args.batch, 250), jnp.float32)
    batch = {"input": x, "label": y}
    compiled, compile_s, _, _ = compile_step(
        step, sess.params, sess.state, sess.opt_state, batch, key
    )
    ms, _ = measure(
        compiled, (sess.params, sess.state, sess.opt_state, batch, key),
        runs,
    )
    row = {"cut": "full", "name": "full train step (yolo loss)",
           "ms": round(ms, 2), "compile_s": round(compile_s, 1)}
    print(json.dumps(row), flush=True)
    return row


def table(rows, full_row, sentinel=None):
    """Per-block floor = max(Δbytes/BW, Δflops/peak) of the BLOCK's own
    deltas — NOT the delta of the prefix maxes (which under-floors a
    flops-bound block appended to a bytes-bound prefix and fabricates
    'outliers'; caught reconciling cut 7/12 against their flop cost)."""
    out = ["", "| block | ms | Δms(corr) | ΔGB | ΔGF "
           "| floor ms | x-floor | bnd ms |",
           "|---|---|---|---|---|---|---|---|"]
    prev = {"ms": 0.0, "gbytes": 0.0, "gflop": 0.0, "bnd_ms": 0.0}
    total_attr = total_floor = 0.0
    for r in rows:
        dms = r["ms"] - prev["ms"]
        dgb = r["gbytes"] - prev["gbytes"]
        dgf = r["gflop"] - prev["gflop"]
        dfloor = max(dgb / HBM_GBPS * 1e3, dgf / BF16_TFLOPS)
        corr = dms - r["bnd_ms"] + prev["bnd_ms"]
        xf = corr / dfloor if dfloor > 0.05 else float("nan")
        total_attr += corr
        total_floor += dfloor
        out.append(
            f"| {r['name']} | {r['ms']:.1f} | {corr:+.1f} | {dgb:+.2f} "
            f"| {dgf:+.0f} | {dfloor:.2f} | {xf:.2f} | {r['bnd_ms']:.2f} |"
        )
        prev = r
    out.append(f"| sum of blocks | | {total_attr:+.1f} | | "
               f"| {total_floor:.2f} | {total_attr / total_floor:.2f} | |")
    if full_row is not None:
        yolo_ms = full_row["ms"] - rows[-1]["ms"] + rows[-1]["bnd_ms"]
        out.append(
            f"| YOLO machinery (full - cut13) | {full_row['ms']:.1f} "
            f"| {yolo_ms:+.1f} | | | | |"
        )
    out.append("")
    out.append(f"attributed (boundary-corrected) total: {total_attr:.1f} ms")
    if sentinel is not None:
        out.append(f"sentinel drift (cut 7 re-run): {sentinel:+.1%}")
    return "\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--runs", type=int, default=12)
    ap.add_argument("--act", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--cuts", default="1-13",
                    help="e.g. 5-13 or 1,2,7 (compiles cost minutes each "
                    "through the shared remote compiler)")
    ap.add_argument("--quick", action="store_true",
                    help="runs=3, no sentinel (CPU smoke)")
    ap.add_argument("--skip-full", action="store_true")
    ap.add_argument("--no-sentinel", action="store_true")
    ap.add_argument("--table-from", default="",
                    help="rebuild the table from a saved run's row-JSON "
                    "lines (no TPU)")
    args = ap.parse_args()
    if args.table_from:
        rows, full_row, sentinel = [], None, None
        for ln in open(args.table_from):
            ln = ln.strip()
            if not ln.startswith("{"):
                continue
            r = json.loads(ln)
            if r["cut"] == "full":
                full_row = r
            elif any(q["cut"] == r["cut"] for q in rows):
                q = next(q for q in rows if q["cut"] == r["cut"])
                sentinel = (r["ms"] - q["ms"]) / q["ms"]
            else:
                rows.append(r)
        print(table(rows, full_row, sentinel))
        return
    if args.quick:
        args.runs = 3
        args.no_sentinel = True

    if "-" in args.cuts:
        a, b = args.cuts.split("-")
        cuts = list(range(int(a), int(b) + 1))
    else:
        cuts = [int(c) for c in args.cuts.split(",")]

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from _common import honor_jax_platforms

    honor_jax_platforms()
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(np.random.default_rng(0).random(
        (args.batch, 3, args.size, args.size), dtype=np.float32
    ))
    key = jax.random.PRNGKey(0)

    rows = [run_cut(k, args, x, key, args.runs) for k in cuts]
    full_row = None if args.skip_full else run_full(args, x, key, args.runs)
    sentinel = None
    if not args.no_sentinel and 7 in cuts:
        r7 = next(r for r in rows if r["cut"] == 7)
        re7 = run_cut(7, args, x, key, args.runs)
        sentinel = (re7["ms"] - r7["ms"]) / r7["ms"]
    print(table(rows, full_row, sentinel))


if __name__ == "__main__":
    main()

"""Serving latency profile over a bucketed-batch artifact set.

Throughput alone hides the serving story: a deployment picks a batch
bucket per request class, and what it cares about is the latency
distribution at each bucket. This exports the full detection pipeline
(forward + decode + NMS, deploy.export_detect — the same program the
reference's yolo example times end-to-end) as one AOT StableHLO artifact
per batch bucket, loads each with zero framework code
(deploy.load_exported), and reports per-call p50/p90/p99 latency and the
implied throughput.

Note on the measurement floor: on the axon single-chip tunnel every
synced call pays a host<->device RTT (measured ~6-8 ms); real-fleet p50s
at small batches sit below that floor. The cross-bucket SHAPE of the
table (flat small-batch latency until the chip saturates, then linear)
is the transferable result.

Usage:
  python examples/serving_latency.py [--mode int8|bf16|both]
      [--buckets 1,8,64,256] [--calls 60] [--size 416]
Prints one JSON line per bucket plus a markdown table.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bcnn_tpu_jax_cache")

import numpy as np


def build_session(batch, size, int8):
    import jax.numpy as jnp

    from bcnn_tpu import Mode, Session
    from bcnn_tpu.models import yolov3_tiny

    net = yolov3_tiny(batch_size=batch, width=size, height=size,
                      mode=Mode.PREDICT)
    net.compute_dtype = jnp.bfloat16
    sess = Session(net, seed=0).compile_net()
    if int8:
        from bcnn_tpu.ops.quant import ptq_synthetic

        ptq_synthetic(net, sess)
    return net, sess


def profile_bucket(batch, size, mode, calls, outdir):
    import jax

    from bcnn_tpu.deploy import export_detect, load_exported

    net, sess = build_session(batch, size, int8=(mode == "int8"))
    path = os.path.join(outdir, f"detect_{mode}_b{batch}.stablehlo")
    blob = export_detect(net, sess.params, sess.state, path, thresh=0.5,
                         max_dets=100)
    call = load_exported(blob)

    import jax.numpy as jnp

    x = jnp.asarray(
        np.random.RandomState(0).rand(batch, 3, size, size), jnp.float32
    )

    def sync(o):
        jax.block_until_ready(o)
        # one-element host read: block_until_ready can return early on axon
        return float(np.asarray(jax.tree.leaves(o)[-1]).ravel()[0])

    sync(call(x))  # compile + warm
    lat = []
    for _ in range(calls):
        t0 = time.perf_counter()
        sync(call(x))
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.sort(np.asarray(lat))

    def pct(p):
        # np.percentile interpolates the order statistic; the previous
        # round(p/100*n) index sat one rank high and pinned p99 to the max
        return float(np.percentile(lat, p))

    return {
        "mode": mode,
        "batch": batch,
        "artifact_mb": round(len(blob) / 1e6, 1),
        "p50_ms": round(pct(50), 2),
        "p90_ms": round(pct(90), 2),
        "p99_ms": round(pct(99), 2),
        "min_ms": round(float(lat[0]), 2),
        "img_s_at_p50": round(batch / (pct(50) / 1e3)),
    }


def main():
    from examples._common import honor_jax_platforms

    honor_jax_platforms()
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both",
                    choices=["bf16", "int8", "both"])
    ap.add_argument("--buckets", default="1,8,64,256")
    ap.add_argument("--calls", type=int, default=60)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--outdir", default="/tmp/bcnn_artifacts")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    buckets = [int(b) for b in args.buckets.split(",")]
    modes = ["bf16", "int8"] if args.mode == "both" else [args.mode]

    rows = []
    for mode in modes:
        for b in buckets:
            row = profile_bucket(b, args.size, mode, args.calls,
                                 args.outdir)
            print(json.dumps(row), flush=True)
            rows.append(row)

    print("\n| mode | batch | artifact MB | p50 ms | p90 ms | p99 ms "
          "| min ms | img/s @p50 |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['mode']} | {r['batch']} | {r['artifact_mb']} "
            f"| {r['p50_ms']} | {r['p90_ms']} | {r['p99_ms']} "
            f"| {r['min_ms']} | {r['img_s_at_p50']} |"
        )


if __name__ == "__main__":
    main()

"""Serving latency profile: p50 / p90 / p99 per-batch latency of the
exported detection artifacts across a bucketed batch set.

The throughput headlines (bench.py, BENCHMARKS.md) answer "how many
img/s"; a serving deployment also needs "how long does ONE request
wait". This measures the full detect pipeline (forward + on-device
decode + NMS, the same AOT program deploy.export_detect ships) at the
standard serving batch buckets and prints one JSON line per bucket.

Tunnel note (CLAUDE.md): per-call sync through the axon relay adds an
RTT floor to every sample; the p50 on local-attached hardware would be
lower. The shared chip also jitters 5-10x across hours, so percentiles
are computed per run batch and the best run is reported alongside.

Usage (ONE TPU job at a time):
    python tools/latency_profile.py [--batches 1,8,64,256] [--samples 40]
    python tools/latency_profile.py --int8
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bcnn_tpu_jax_cache")

import jax

# honor JAX_PLATFORMS=cpu for chip-less smoke runs (sitecustomize pins
# the axon plugin; env vars alone don't switch backends)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8,64,256")
    ap.add_argument("--samples", type=int, default=40)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--int8", action="store_true")
    args = ap.parse_args()

    from bcnn_tpu import Mode, Session
    from bcnn_tpu.compile import make_detect_fn
    from bcnn_tpu.models import yolov3_tiny

    for batch in [int(b) for b in args.batches.split(",")]:
        net = yolov3_tiny(batch_size=batch, width=args.size,
                          height=args.size, mode=Mode.PREDICT)
        net.compute_dtype = jnp.bfloat16
        sess = Session(net, seed=0).compile_net()
        if args.int8:
            from bcnn_tpu.ops.quant import ptq_synthetic

            ptq_synthetic(net, sess)
        detect = make_detect_fn(net, thresh=0.5, max_dets=100)
        fwd = jax.jit(
            lambda p, s, x: detect(p, s, {"input": x})
        )
        x = jnp.asarray(
            np.random.RandomState(0).rand(batch, 3, args.size, args.size),
            jnp.float32,
        )

        def sync(o):
            jax.block_until_ready(o)
            return float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])

        sync(fwd(sess.params, sess.state, x))  # compile + warm
        lat = []
        for _ in range(args.samples):
            t0 = time.perf_counter()
            sync(fwd(sess.params, sess.state, x))
            lat.append((time.perf_counter() - t0) * 1e3)
        lat = np.asarray(lat)
        print(
            json.dumps(
                {
                    "batch": batch,
                    "precision": "int8" if args.int8 else "bf16",
                    "p50_ms": round(float(np.percentile(lat, 50)), 2),
                    "p90_ms": round(float(np.percentile(lat, 90)), 2),
                    "p99_ms": round(float(np.percentile(lat, 99)), 2),
                    "min_ms": round(float(lat.min()), 2),
                    "img_s_at_p50": round(
                        batch / (np.percentile(lat, 50) / 1e3), 0
                    ),
                    "n": len(lat),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Roofline audit of the model zoo on one TPU chip.

For each (model, precision) program this measures best-of-rounds wall
time and pulls XLA's own cost analysis (flops, bytes accessed) from the
compiled executable (profiling.memory_report), then places the program
against the v5e roofline:

    t_flops = flops / peak_flops        (MXU ceiling for the dtype)
    t_bytes = bytes_accessed / hbm_bw   (memory wall)
    floor   = max(t_flops, t_bytes)     -> %-of-wall = floor / measured

The reference's own harness reports only min/max/avg ms
(examples/inference_benchmark/inference_benchmark.c:92-112); this adds
the "is that good?" column VERDICT r2 asked for. Results are pasted into
BENCHMARKS.md.

Usage (ONE TPU job at a time — see CLAUDE.md):
    python tools/roofline.py [--models mobilenet-v1,resnet18,yolov3]
                             [--runs 12]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bcnn_tpu_jax_cache")

import jax

# honor JAX_PLATFORMS=cpu for chip-less smoke runs: the container's
# sitecustomize pins the axon TPU plugin, env vars alone don't switch
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

# TPU v5e single chip
PEAK = {"bf16": 197e12, "int8": 394e12, "fp32": 197e12 / 4}
HBM_BW = 819e9  # bytes/s


def build(name, batch, precision):
    from bcnn_tpu import Mode, Session
    from bcnn_tpu import models

    builders = {
        "yolov3-tiny": lambda: models.yolov3_tiny(batch),
        "yolov3": lambda: models.yolov3(batch, width=608, height=608),
        "mobilenet-v1": lambda: models.mobilenet_v1(batch),
        "resnet18": lambda: models.resnet18(batch),
    }
    net = builders[name]()
    if precision != "fp32":
        net.compute_dtype = jnp.bfloat16
    sess = Session(net, seed=0).compile_net()
    if precision == "int8":
        from bcnn_tpu.ops.quant import calibrate, quantize_weights

        for k in list(sess.state):
            if "run_var" in k:
                sess.state[k] = jnp.ones_like(sess.state[k])
        t0 = net.tensors[0]
        calib = np.random.RandomState(1).rand(
            min(4, t0.n), t0.c, t0.h, t0.w
        ).astype(np.float32)
        net.quant = {
            "act_scales": calibrate(net, sess.params, sess.state, [calib]),
            "weights": quantize_weights(net, sess.params),
        }
    return net, sess


def audit(name, batch, precision, runs):
    from bcnn_tpu import Mode
    from bcnn_tpu.compile import execute
    from bcnn_tpu.profiling import memory_report
    from bcnn_tpu.types import LayerType

    net, sess = build(name, batch, precision)
    yolo_idx = [n.dst[0] for n in net.nodes if n.type == LayerType.YOLOV3]
    out_idx = yolo_idx or [
        n.dst[0] for n in net.nodes if n.type != LayerType.COST
    ][-1:]

    def forward(params, state, x):
        ex = execute(net, params, state, {"input": x}, Mode.PREDICT, None)
        return tuple(
            jnp.sum(ex.values[i], dtype=jnp.float32) for i in out_idx
        )

    t0 = net.tensors[0]
    x = jnp.asarray(
        np.random.RandomState(0).rand(t0.n, t0.c, t0.h, t0.w), jnp.float32
    )
    rep = memory_report(forward, sess.params, sess.state, x)

    fwd = jax.jit(forward)

    def sync(o):
        jax.block_until_ready(o)
        return float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])

    sync(fwd(sess.params, sess.state, x))
    round_bests = []
    burst = 6
    for _ in range(max(2, runs // 4)):
        rb = []
        for _ in range(2):
            t = time.perf_counter()
            sync(fwd(sess.params, sess.state, x))
            rb.append(time.perf_counter() - t)
        t = time.perf_counter()
        outs = [fwd(sess.params, sess.state, x) for _ in range(burst)]
        sync(outs[-1])
        rb.append((time.perf_counter() - t) / burst)
        round_bests.append(min(rb))
    best = min(round_bests)

    flops = rep.get("flops", 0.0)
    bytes_acc = rep.get("bytes_accessed", 0.0)
    t_flops = flops / PEAK[precision]
    t_bytes = bytes_acc / HBM_BW
    floor = max(t_flops, t_bytes)
    return {
        "model": name,
        "precision": precision,
        "batch": batch,
        "best_ms": round(best * 1e3, 2),
        "img_s": round(batch / best, 0),
        "gflops": round(flops / 1e9, 1),
        "gbytes": round(bytes_acc / 1e9, 3),
        "t_flops_ms": round(t_flops * 1e3, 2),
        "t_bytes_ms": round(t_bytes * 1e3, 2),
        "floor_ms": round(floor * 1e3, 2),
        "pct_of_wall": round(100 * floor / best, 1),
        "bound": "flops" if t_flops > t_bytes else "bytes",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--models",
        default="mobilenet-v1,resnet18,yolov3,yolov3-tiny",
    )
    ap.add_argument("--precisions", default="bf16,int8")
    ap.add_argument("--runs", type=int, default=12)
    ap.add_argument("--batch", type=int, default=0)  # 0 = per-model default
    args = ap.parse_args()

    defaults = {
        "yolov3-tiny": 256,
        "yolov3": 32,
        "mobilenet-v1": 256,
        "resnet18": 256,
    }
    for name in args.models.split(","):
        for prec in args.precisions.split(","):
            batch = args.batch or defaults[name]
            r = audit(name, batch, prec, args.runs)
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()

"""Generic inference perf harness — port of examples/inference_benchmark.

Times N forward runs of a model (built-in name or .conf) and prints
min/max/avg ms like the reference (inference_benchmark.c:92-112), plus
img/s.

Usage:
  python examples/inference_benchmark.py --model yolov3-tiny [--batch 64]
  python examples/inference_benchmark.py --config net.conf --weights m.bcnnmodel
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bcnn_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def build(args):
    from bcnn_tpu import Mode, Net, Session
    from bcnn_tpu import models

    if args.config:
        from bcnn_tpu.config import load_net

        net = Net(Mode.PREDICT)
        net.set_input_shape(0, 0, 0, args.batch)
        load_net(net, args.config, args.weights)
    else:
        builders = {
            "yolov3-tiny": lambda: models.yolov3_tiny(args.batch),
            "yolov3": lambda: models.yolov3(args.batch),
            "mobilenet-v1": lambda: models.mobilenet_v1(args.batch),
            "resnet18": lambda: models.resnet18(args.batch),
            "lenet": lambda: models.lenet_mnist(args.batch, Mode.PREDICT),
        }
        net = builders[args.model]()
    if args.bf16:
        net.compute_dtype = jnp.bfloat16
    sess = Session(net, seed=0).compile_net()
    if args.int8:
        from bcnn_tpu.ops.quant import ptq_synthetic

        ptq_synthetic(net, sess)
    return net, sess


def main():
    from examples._common import honor_jax_platforms
    honor_jax_platforms()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov3-tiny")
    ap.add_argument("--config")
    ap.add_argument("--weights")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--runs", type=int, default=20)
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--fp32", dest="bf16", action="store_false")
    ap.add_argument("--int8", action="store_true")
    args = ap.parse_args()

    net, sess = build(args)
    from bcnn_tpu.compile import execute
    from bcnn_tpu import Mode
    from bcnn_tpu.types import LayerType

    out_idx = [
        n.dst[0]
        for n in net.nodes
        if n.type not in (LayerType.COST,)
    ][-1:]
    # all yolo heads if present
    yolo_idx = [
        n.dst[0] for n in net.nodes if n.type == LayerType.YOLOV3
    ]
    if yolo_idx:
        out_idx = yolo_idx

    @jax.jit
    def forward(params, state, x):
        ex = execute(net, params, state, {"input": x}, Mode.PREDICT, None)
        # checksum, not the tensor: the sync read otherwise pulls whole
        # head buffers through the tunnel and measures bandwidth, not TPU
        return tuple(
            jnp.sum(ex.values[i], dtype=jnp.float32) for i in out_idx
        )

    t0 = net.tensors[0]
    x = jnp.asarray(
        np.random.RandomState(0).rand(t0.n, t0.c, t0.h, t0.w), jnp.float32
    )

    def sync(o):
        # block_until_ready alone can return early on the experimental
        # axon backend; reading an element forces completion
        jax.block_until_ready(o)
        return float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0])

    sync(forward(sess.params, sess.state, x))

    times = []
    for _ in range(args.runs):
        t = time.perf_counter()
        sync(forward(sess.params, sess.state, x))
        times.append((time.perf_counter() - t) * 1e3)
    # burst timing amortizes the tunnel RTT that per-run sync includes
    burst = 6
    t = time.perf_counter()
    outs = [forward(sess.params, sess.state, x) for _ in range(burst)]
    sync(outs[-1])
    times.append((time.perf_counter() - t) * 1e3 / burst)
    print(
        f"{args.model or args.config}: batch={t0.n} "
        f"min= {min(times):.3f} ms max= {max(times):.3f} ms "
        f"avg= {sum(times)/len(times):.3f} ms "
        f"-> {t0.n / (min(times) / 1e3):.0f} img/s"
    )


if __name__ == "__main__":
    main()

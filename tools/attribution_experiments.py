"""Round-5 attribution experiments (VERDICT r4 #5): one measured
experiment each at the three worst x-floor blocks of the round-4 table.

E1 c13 (1.68x): pad head2 conv 255 -> 256 filters (lane-aligned output).
E2 c5  (1.49x): maxpool-backward variant at that block
                (BCNN_POOL2X2=reshape vs default select_and_scatter).
E3 c3  (1.40x): fusion-boundary move — optimization_barrier between the
                pool and the conv, preventing cross-block fusion.

Protocol: same as tools/train_attribution.py (one explicit compile per
cut, bench-style min-of-runs, per-block delta between consecutive cuts).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/bcnn_tpu_jax_cache")

import numpy as np

from train_attribution import (  # noqa: E402
    build_prefix, compile_step, make_prefix_step, measure,
)

RUNS = 10
BATCH, SIZE, ACT = 256, 416, "bf16"


def time_cut(k, x, key, variant=None):
    import jax.numpy as jnp

    from bcnn_tpu import Session

    net, outs = build_prefix(k, BATCH, SIZE, ACT)
    if variant == "pad256" and k == 13:
        # rebuild with head2 at 256 filters instead of 255
        from bcnn_tpu import Activation, FillerType, Mode
        from bcnn_tpu.graph import Net

        net2, _ = build_prefix(12, BATCH, SIZE, ACT)
        net2.add_convolutional_layer(
            256, 1, 1, 0, 1, 0, FillerType.XAVIER, Activation.NONE, 0,
            "lid22", "lid23",
        )
        net = net2
        outs = ["lid16", "lid23"]
    sess = Session(net, seed=0).compile_net()
    if variant == "barrier":
        # wrap the step: barrier on the pool output tensor inside the
        # traced program via a tensor tap — simplest honest version:
        # recompute with an optimization_barrier injected on the pool
        # output through net's executor hook
        step = make_prefix_step_barrier(net, outs)
    else:
        step = make_prefix_step(net, outs)
    batch = {"input": x}
    compiled, compile_s, gflop, gbytes = compile_step(
        step, sess.params, sess.state, sess.opt_state, batch, key
    )
    ms, _ = measure(
        compiled, (sess.params, sess.state, sess.opt_state, batch, key),
        RUNS,
    )
    print(json.dumps({"cut": k, "variant": variant or "base",
                      "ms": round(ms, 2), "compile_s": round(compile_s, 1),
                      "gbytes": round(gbytes, 2)}), flush=True)
    return ms


def make_prefix_step_barrier(net, out_names):
    """make_prefix_step with jax.lax.optimization_barrier applied to the
    LAST maxpool's output value, cutting XLA fusion across the pool/conv
    boundary in both fwd and (via the barrier's transpose) bwd."""
    import functools

    import jax
    import jax.numpy as jnp

    from bcnn_tpu.compile import execute
    from bcnn_tpu.learner import apply_updates
    from bcnn_tpu.types import LayerType, Mode

    out_idx = [net.get_tensor_index_by_name(n) for n in out_names]
    pool_dst = [n.dst[0] for n in net.nodes if n.type == LayerType.MAXPOOL]
    net.value_hooks = {pool_dst[-1]: jax.lax.optimization_barrier}

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


def main():
    import jax

    rng = np.random.RandomState(0)
    x = (rng.rand(BATCH, 3, SIZE, SIZE).astype(np.float32))
    import jax.numpy as jnp
    x = jnp.asarray(x)
    key = jax.random.PRNGKey(0)
    out = {}

    # E1: c13 pad 255->256
    t12 = time_cut(12, x, key)
    t13 = time_cut(13, x, key)
    t13p = time_cut(13, x, key, variant="pad256")
    out["E1_c13"] = {"base_delta_ms": round(t13 - t12, 2),
                     "pad256_delta_ms": round(t13p - t12, 2)}

    # E2: c5 pool-backward variant
    t4 = time_cut(4, x, key)
    t5 = time_cut(5, x, key)
    import bcnn_tpu.ops.pool as pool_mod  # knob is read at import time

    pool_mod.POOL2X2_IMPL = "reshape"
    t4r = time_cut(4, x, key, variant="pool_reshape_c4")
    t5r = time_cut(5, x, key, variant="pool_reshape_c5")
    pool_mod.POOL2X2_IMPL = "rw"
    out["E2_c5"] = {"base_delta_ms": round(t5 - t4, 2),
                    "reshape_delta_ms": round(t5r - t4r, 2)}

    # E3: c3 fusion barrier at the pool->conv boundary
    t2 = time_cut(2, x, key)
    t3 = time_cut(3, x, key)
    t3b = time_cut(3, x, key, variant="barrier")
    out["E3_c3"] = {"base_delta_ms": round(t3 - t2, 2),
                    "barrier_delta_ms": round(t3b - t2, 2)}

    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Data parallelism over a TPU mesh.

The reference is strictly single-process single-device (SURVEY.md §2.8: no
MPI/NCCL anywhere). This module is the TPU-native scaling story: a 1-D
`jax.sharding.Mesh` over all local devices, batch-sharded inputs, replicated
parameters, and GSPMD inserting the gradient all-reduce over ICI
automatically (the loss is a *global batch sum*, matching the reference's
summed-gradient semantics, so partitioning the batch axis yields a psum of
per-shard sums — bit-identical math to single-device).

BatchNorm note: batch statistics are means over the full (global) batch —
under GSPMD this compiles to a cross-replica reduction, i.e. sync-BN, which
is exactly the reference's single-device semantics at any device count.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..compile import execute, get_loss, nhwc_to_nchw
from ..graph import Net
from ..types import Mode

BATCH_AXIS = "batch"


def make_mesh(devices: Optional[Sequence] = None, axis: str = BATCH_AXIS):
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, tree):
    """Place host arrays batch-sharded over the mesh."""
    sh = NamedSharding(mesh, P(BATCH_AXIS))
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sh), tree)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sh), tree)


def make_dp_train_step(net: Net, mesh: Mesh):
    """bcnn_train_on_batch, batch-data-parallel: params/state/opt replicated,
    batch sharded on its leading axis. One jitted program; XLA partitions it
    and rides ICI for the grad all-reduce."""
    from ..learner import apply_updates

    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(BATCH_AXIS))

    def loss_fn(params, state, batch, rng):
        ex = execute(net, params, state, batch, Mode.TRAIN, rng)
        return ex.surrogate, (ex.state, get_loss(ex))

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def core(params, state, opt_state, batch, rng):
        (_, (new_state, loss)), grads = grad_fn(params, state, batch, rng)
        new_params, new_opt = apply_updates(net, params, grads, opt_state)
        return new_params, new_state, new_opt, loss

    return jax.jit(
        core,
        in_shardings=(repl, repl, repl, bsh, repl),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1, 2),
    )


def make_dp_train_scan(net: Net, mesh: Mesh):
    """Multi-step data-parallel training in ONE device program: lax.scan
    over train steps composed with batch sharding over the mesh — the
    documented multi-chip training recipe. Batches are staged as
    (K, B, ...) with the PER-STEP batch axis sharded; params replicated;
    GSPMD all-reduces grads over ICI inside every scan iteration. On a
    tunneled chip this also amortizes the per-step dispatch RTT like the
    single-device make_train_scan."""
    from ..learner import apply_updates

    repl = NamedSharding(mesh, P())
    # (K, B, ...): leading scan axis unsharded, batch axis sharded
    ksh = NamedSharding(mesh, P(None, BATCH_AXIS))

    def loss_fn(params, state, batch, rng):
        ex = execute(net, params, state, batch, Mode.TRAIN, rng)
        return ex.surrogate, (ex.state, get_loss(ex))

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def core(params, state, opt_state, xs_in, xs_lab, rng):
        def body(carry, xs):
            params, state, opt_state = carry
            x, y, key = xs
            (_, (state2, loss)), grads = grad_fn(
                params, state, {"input": x, "label": y}, key
            )
            params2, opt2 = apply_updates(net, params, grads, opt_state)
            return (params2, state2, opt2), loss

        keys = jax.random.split(rng, xs_in.shape[0])
        (params, state, opt_state), losses = jax.lax.scan(
            body, (params, state, opt_state), (xs_in, xs_lab, keys)
        )
        return params, state, opt_state, losses

    return jax.jit(
        core,
        in_shardings=(repl, repl, repl, ksh, ksh, repl),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1, 2),
    )


def make_spatial_forward(net: Net, mesh: Mesh, output_names,
                         axis: str = BATCH_AXIS):
    """Spatial partitioning: shard the image HEIGHT across the mesh —
    the TPU answer to inputs that exceed one chip's HBM (SURVEY.md §2.8:
    bcnn's scaling axis is image resolution). GSPMD inserts the halo
    exchanges convolutions need at shard edges automatically; callers feed
    full (replicated-batch) NCHW images and get full outputs back."""
    repl = NamedSharding(mesh, P())
    # NCHW input: shard H (axis 2)
    in_sh = NamedSharding(mesh, P(None, None, axis, None))
    out_idx = [net.get_tensor_index_by_name(n) for n in output_names]

    def core(params, state, x):
        ex = execute(net, params, state, {"input": x}, Mode.PREDICT, None)
        outs = []
        for i in out_idx:
            v = ex.values[i]
            outs.append(nhwc_to_nchw(v) if v.ndim == 4 else v)
        return tuple(outs)

    return jax.jit(
        core,
        in_shardings=(repl, repl, in_sh),
        out_shardings=repl,
    )


def make_dp_forward(net: Net, mesh: Mesh, output_names, mode: Mode):
    """Batch-sharded inference: the throughput path for serving."""
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(BATCH_AXIS))
    out_idx = [net.get_tensor_index_by_name(n) for n in output_names]

    def core(params, state, batch):
        ex = execute(net, params, state, batch, mode, None)
        outs = []
        for i in out_idx:
            v = ex.values[i]
            outs.append(nhwc_to_nchw(v) if v.ndim == 4 else v)
        return tuple(outs)

    return jax.jit(
        core,
        in_shardings=(repl, repl, bsh),
        out_shardings=bsh,
    )

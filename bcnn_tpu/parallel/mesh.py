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

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..compile import execute, get_loss, nhwc_to_nchw
from ..graph import Net, TensorKind
from ..types import Mode

BATCH_AXIS = "batch"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence] = None, axis: str = BATCH_AXIS):
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(
    devices: Optional[Sequence] = None,
    dp: Optional[int] = None,
    axes: Tuple[str, str] = (BATCH_AXIS, MODEL_AXIS),
):
    """2-D mesh (data x model) for composing batch-DP with tensor/spatial
    parallelism. On real hardware lay the model axis on the faster ICI
    ring (its collectives are per-layer, DP's one grad all-reduce is
    per-step); here the device order is whatever the caller passes."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = 2 if n % 2 == 0 else 1
    if n % dp:
        raise ValueError(f"dp={dp} does not divide {n} devices")
    return Mesh(np.asarray(devices).reshape(dp, n // dp), axes)


def shard_batch(mesh: Mesh, tree):
    """Place host arrays batch-sharded over the mesh."""
    sh = NamedSharding(mesh, P(BATCH_AXIS))
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sh), tree)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sh), tree)


def _make_sharded_train_step(net: Net, in_shardings, out_shardings):
    """The one train-step core (loss -> autodiff grads -> bcnn update)
    shared by every sharding regime — DP, DPxTP, DPxSP differ ONLY in the
    sharding annotations; GSPMD derives the collectives."""
    from ..learner import apply_updates

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
        in_shardings=in_shardings,
        out_shardings=out_shardings,
        donate_argnums=(0, 1, 2),
    )


def make_dp_train_step(net: Net, mesh: Mesh):
    """bcnn_train_on_batch, batch-data-parallel: params/state/opt replicated,
    batch sharded on its leading axis. One jitted program; XLA partitions it
    and rides ICI for the grad all-reduce."""
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(BATCH_AXIS))
    return _make_sharded_train_step(
        net, (repl, repl, repl, bsh, repl), (repl, repl, repl, repl)
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


def make_dp_train_scan_resident(net: Net, mesh: Mesh,
                                device_augment=None):
    """Data-parallel variant of compile.make_train_scan_resident: the
    dataset is REPLICATED into every device's HBM (a dataset small
    enough for this feed fits many times over) and each scan step's
    (K, B) int32 index slab is sharded on the batch axis, so every
    device gathers only its stripe of the batch and GSPMD all-reduces
    grads over ICI inside the scan — the multi-chip version of the feed
    that holds sustained == burst in the soak (BENCHMARKS.md). Per-step
    numerics match the single-device resident scan (test_parallel.py);
    supports the device-augment uint8 path like the single-device
    factory."""
    from ..compile import _make_train_loss_fn
    from ..learner import apply_updates

    if device_augment is None:
        device_augment = getattr(net, "device_augment", None)
    loss_fn = _make_train_loss_fn(net, device_augment)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    repl = NamedSharding(mesh, P())
    ish = NamedSharding(mesh, P(None, BATCH_AXIS))

    def core(params, state, opt_state, dataset, idx, rng):
        def body(carry, xs):
            params, state, opt_state = carry
            i, key = xs
            x = jnp.take(dataset["input"], i, axis=0)
            y = jnp.take(dataset["label"], i, axis=0)
            (_, (state2, loss, _ys)), grads = grad_fn(
                params, state, {"input": x, "label": y}, key
            )
            params2, opt2 = apply_updates(net, params, grads, opt_state)
            return (params2, state2, opt2), loss

        keys = jax.random.split(rng, idx.shape[0])
        (params, state, opt_state), losses = jax.lax.scan(
            body, (params, state, opt_state), (idx, keys)
        )
        return params, state, opt_state, losses

    return jax.jit(
        core,
        in_shardings=(repl, repl, repl, repl, ish, repl),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1, 2),
    )


def shard_resident_dataset(mesh: Mesh, dataset: Dict, axis: str = BATCH_AXIS):
    """Reshape a (n, ...) resident dataset into (D, n/D, ...) and place
    shard d in device d's memory ONLY — per-device bytes are total/D,
    against the replicated feed's total per device
    (make_dp_train_scan_resident). n must divide by the mesh axis size;
    trim or pad the record set to a multiple first."""
    d = mesh.shape[axis]
    sh = NamedSharding(mesh, P(axis))

    def put(x):
        n = x.shape[0]
        if n % d:
            raise ValueError(f"dataset size {n} not divisible by {d}")
        return jax.device_put(
            jnp.asarray(x).reshape((d, n // d) + x.shape[1:]), sh
        )

    return jax.tree.map(put, dataset)


def make_dp_train_scan_resident_sharded(net: Net, mesh: Mesh,
                                        device_augment=None,
                                        axis: str = BATCH_AXIS):
    """Device-resident DP feed that SHARDS the dataset over the mesh's
    batch axis instead of replicating it: n devices hold n x the data
    (shard_resident_dataset), each device gathers its stripe of every
    batch from ITS OWN shard, and nothing about the dataset crosses ICI.

    Sampling semantics (documented, intentional): the batch is
    STRATIFIED by shard — each global batch takes exactly B/D samples
    from every shard, and each shard's samples appear exactly once per
    local epoch (data.ShardedEpochIndexStream). This is the standard
    per-host sharded-input semantics of DP training, vs the replicated
    feed's single global shuffle; per-STEP numerics given the same
    realized index sets are identical (test_parallel.py).

    dataset: (D, n/D, ...) arrays from shard_resident_dataset;
    idx: (K, D, B/D) int32 LOCAL indices (ShardedEpochIndexStream.next),
    sharded (None, axis, None). The per-shard gather is a vmap over the
    shard axis — operands are aligned on the mesh axis, so GSPMD keeps
    every gather local (no all-gather of the dataset; asserted in
    test_parallel.py via per-device buffer sizes)."""
    from ..compile import _make_train_loss_fn
    from ..learner import apply_updates

    if device_augment is None:
        device_augment = getattr(net, "device_augment", None)
    loss_fn = _make_train_loss_fn(net, device_augment)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    repl = NamedSharding(mesh, P())
    dsh = NamedSharding(mesh, P(axis))
    ish = NamedSharding(mesh, P(None, axis, None))
    bsh = NamedSharding(mesh, P(axis))

    def core(params, state, opt_state, dataset, idx, rng):
        def body(carry, xs):
            params, state, opt_state = carry
            i, key = xs  # i: (D, B/D) local indices

            def take(ds, ii):
                return jax.vmap(lambda s, j: jnp.take(s, j, axis=0))(
                    ds, ii
                )

            x = take(dataset["input"], i)  # (D, B/D, ...)
            y = take(dataset["label"], i)
            x = jax.lax.with_sharding_constraint(
                x.reshape((-1,) + x.shape[2:]), bsh
            )
            y = jax.lax.with_sharding_constraint(
                y.reshape((-1,) + y.shape[2:]), bsh
            )
            (_, (state2, loss, _ys)), grads = grad_fn(
                params, state, {"input": x, "label": y}, key
            )
            params2, opt2 = apply_updates(net, params, grads, opt_state)
            return (params2, state2, opt2), loss

        keys = jax.random.split(rng, idx.shape[0])
        (params, state, opt_state), losses = jax.lax.scan(
            body, (params, state, opt_state), (idx, keys)
        )
        return params, state, opt_state, losses

    return jax.jit(
        core,
        in_shardings=(repl, repl, repl, dsh, ish, repl),
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


def tp_param_specs(
    net: Net, mesh: Mesh, axis: str = MODEL_AXIS
) -> Tuple[Dict[str, P], Dict[str, P]]:
    """Tensor-parallel partition specs: shard the OUTPUT-channel axis of
    every conv / depthwise / deconv / FC weight over `axis`, plus all the
    per-output-channel vectors hanging off the same node (bias, BN stats
    and scales, PReLU slopes). SURVEY.md §2.8 marks TP optional for parity
    (the reference is single-device); this is the pjit channel-sharding
    extension it describes — GSPMD propagates the activation shardings and
    inserts the contraction psums, so the math is unchanged at any mesh
    size. Tensors whose channel count does not divide the axis size (and
    grouped convs) stay replicated.

    Returns (param_specs, state_specs) keyed like the params/state pytrees.
    """
    from ..types import LayerType

    size = mesh.shape[axis]
    pspecs: Dict[str, P] = {
        t.key: P() for t in net.tensors if t.kind == TensorKind.PARAM
    }
    sspecs: Dict[str, P] = {
        t.key: P() for t in net.tensors if t.kind == TensorKind.STATE
    }
    # weight out-channel axis per layer type (mem layouts in graph.py)
    out_axis = {
        LayerType.CONV2D: 3,  # HWIO
        LayerType.DEPTHWISE_CONV2D: 3,  # (k, k, 1, c)
        LayerType.TRANSPOSE_CONV2D: 2,  # (k, k, n, c_src)
        LayerType.FULL_CONNECTED: 1,  # (in, out)
    }
    for node in net.nodes:
        ax = out_axis.get(node.type)
        if ax is None or len(node.src) < 2:
            continue
        if node.param.get("num_groups", 1) != 1:
            continue  # grouped conv: keep group boundaries intact
        w = net.tensors[node.src[1]]
        out_ch = w.mem_shape[ax]
        if out_ch % size:
            continue
        wspec = [None] * len(w.mem_shape)
        wspec[ax] = axis
        pspecs[w.key] = P(*wspec)
        for si in node.src[2:]:
            t = net.tensors[si]
            if t.mem_shape == (out_ch,):
                (pspecs if t.kind == TensorKind.PARAM else sspecs)[
                    t.key
                ] = P(axis)
    return pspecs, sspecs


def _opt_shardings(net: Net, mesh: Mesh, pspecs: Dict[str, P]):
    """Sharding pytree matching learner.init_opt_state's structure: each
    optimizer slot mirrors its parameter's sharding."""
    from ..types import Optimizer

    repl = NamedSharding(mesh, P())
    velocity, adam_m, adam_v = {}, {}, {}
    adam = net.learner.optimizer == Optimizer.ADAM
    for t in net.param_specs():
        if not t.trainable:
            continue
        sh = NamedSharding(mesh, pspecs.get(t.key, P()))
        if adam and t.adam_capable:
            adam_m[t.key] = sh
            adam_v[t.key] = sh
        else:
            velocity[t.key] = sh
    return {
        "seen": repl,
        "velocity": velocity,
        "adam_m": adam_m,
        "adam_v": adam_v,
    }


def shard_train_state(net: Net, mesh: Mesh, params, state, opt_state,
                      axis: str = MODEL_AXIS, put=None):
    """Place (params, state, opt_state) with tensor-parallel shardings.

    put(value, sharding): placement function — defaults to
    jax.device_put (single process); multi-process callers pass
    jax.make_array_from_process_local_data so leaves assemble across a
    jax.distributed cluster (see tests/multihost_worker.py)."""
    if put is None:
        put = jax.device_put
    pspecs, sspecs = tp_param_specs(net, mesh, axis)
    params = {
        k: put(v, NamedSharding(mesh, pspecs[k]))
        for k, v in params.items()
    }
    state = {
        k: put(v, NamedSharding(mesh, sspecs[k]))
        for k, v in state.items()
    }
    osh = _opt_shardings(net, mesh, pspecs)
    opt_state = jax.tree.map(put, opt_state, osh)
    return params, state, opt_state


def zero_param_specs(
    net: Net, mesh: Mesh, axis: str = BATCH_AXIS
) -> Dict[str, P]:
    """ZeRO-style partition specs: shard every parameter tensor along its
    LARGEST dimension divisible by the mesh axis size (tensors with no
    divisible dim stay replicated). Unlike tp_param_specs this is a pure
    memory-partitioning layout — it does not need to follow the layer
    math, because GSPMD re-gathers whatever each op requires. Used to
    shard optimizer slots (ZeRO-1) and/or the parameters themselves
    (FSDP) over the data-parallel axis."""
    size = mesh.shape[axis]
    specs: Dict[str, P] = {}
    for t in net.tensors:
        if t.kind != TensorKind.PARAM:
            continue
        best = None
        for d, extent in enumerate(t.mem_shape):
            if extent % size == 0 and extent >= size:
                if best is None or extent > t.mem_shape[best]:
                    best = d
        if best is None:
            specs[t.key] = P()
        else:
            spec = [None] * len(t.mem_shape)
            spec[best] = axis
            specs[t.key] = P(*spec)
    return specs


def make_zero1_train_step(net: Net, mesh: Mesh, axis: str = BATCH_AXIS):
    """ZeRO stage 1: optimizer state sharded over the DATA-parallel axis,
    parameters/batch-stats replicated, batch sharded. Each device holds
    1/N of the Adam m/v (or momentum) slots and updates only its stripe;
    GSPMD turns the grad all-reduce into reduce-scatter + all-gather
    (same bytes on the wire, 1/N optimizer memory and update FLOPs per
    device). Math identical to single-device (elementwise update over a
    batch-sum gradient)."""
    zspecs = zero_param_specs(net, mesh, axis)
    o_sh = _opt_shardings(net, mesh, zspecs)
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(axis))
    return _make_sharded_train_step(
        net, (repl, repl, o_sh, bsh, repl), (repl, repl, o_sh, repl)
    )


def make_fsdp_train_step(net: Net, mesh: Mesh, axis: str = BATCH_AXIS):
    """Fully-sharded data parallelism (ZeRO-3): parameters AND optimizer
    slots sharded over the data-parallel axis, batch sharded. GSPMD
    all-gathers each weight at its use site (fwd and bwd) and
    reduce-scatters the grads into the sharded update — per-device
    parameter+optimizer memory is 1/N, enabling models bigger than one
    chip's HBM at DP speeds. Batch stats stay replicated (they are
    per-channel vectors, negligible)."""
    zspecs = zero_param_specs(net, mesh, axis)
    p_sh = {k: NamedSharding(mesh, s) for k, s in zspecs.items()}
    o_sh = _opt_shardings(net, mesh, zspecs)
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(axis))
    return _make_sharded_train_step(
        net, (p_sh, repl, o_sh, bsh, repl), (p_sh, repl, o_sh, repl)
    )


def shard_zero_state(net: Net, mesh: Mesh, params, state, opt_state,
                     axis: str = BATCH_AXIS, params_too: bool = False,
                     put=None):
    """Place (params, state, opt_state) with ZeRO shardings: opt slots
    sharded over the DP axis; params sharded too when params_too (FSDP)
    else replicated. Same put hook as shard_train_state for
    multi-process assembly."""
    if put is None:
        put = jax.device_put
    zspecs = zero_param_specs(net, mesh, axis)
    repl = NamedSharding(mesh, P())
    params = {
        k: put(v, NamedSharding(mesh, zspecs[k]) if params_too else repl)
        for k, v in params.items()
    }
    state = {k: put(v, repl) for k, v in state.items()}
    osh = _opt_shardings(net, mesh, zspecs)
    opt_state = jax.tree.map(put, opt_state, osh)
    return params, state, opt_state


def make_dp_tp_train_step(net: Net, mesh: Mesh,
                          model_axis: str = MODEL_AXIS):
    """Training step composing batch data-parallelism with tensor
    parallelism on a 2-D (batch, model) mesh: batch sharded over `batch`,
    weights channel-sharded over `model` (tp_param_specs), optimizer slots
    sharded like their params. GSPMD inserts the per-layer collectives on
    the model axis and the grad all-reduce on the batch axis."""
    pspecs, sspecs = tp_param_specs(net, mesh, model_axis)
    p_sh = {k: NamedSharding(mesh, s) for k, s in pspecs.items()}
    s_sh = {k: NamedSharding(mesh, s) for k, s in sspecs.items()}
    o_sh = _opt_shardings(net, mesh, pspecs)
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(BATCH_AXIS))
    return _make_sharded_train_step(
        net, (p_sh, s_sh, o_sh, bsh, repl), (p_sh, s_sh, o_sh, repl)
    )


def make_dp_sp_train_step(net: Net, mesh: Mesh,
                          model_axis: str = MODEL_AXIS):
    """Training step composing batch-DP with SPATIAL partitioning: the
    input's height axis is sharded over the model axis (NCHW at the API
    boundary -> H is axis 2), params replicated. This is the training-side
    counterpart of make_spatial_forward — the TPU answer when one sample's
    activations exceed a chip's HBM (SURVEY.md §2.8: bcnn's "long context"
    axis is image resolution). GSPMD inserts conv halo exchanges in both
    the forward and the autodiff backward."""
    repl = NamedSharding(mesh, P())
    in_sh = NamedSharding(mesh, P(BATCH_AXIS, None, model_axis, None))
    lab_sh = NamedSharding(mesh, P(BATCH_AXIS))
    return _make_sharded_train_step(
        net,
        (repl, repl, repl, {"input": in_sh, "label": lab_sh}, repl),
        (repl, repl, repl, repl),
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

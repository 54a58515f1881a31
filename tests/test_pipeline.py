"""Pipeline (inter-op) parallelism tests on the faked 8-device CPU mesh.

The reference is single-device (SURVEY.md §2.8); PP is a rebuild
extension. Exactness contract (parallel/pipeline.py docstring):
  - n_microbatches=1 is bit-for-bit the single-device step, including
    BN batch stats, per-node RNG folding, and reference grad routing
    across stage boundaries;
  - n_microbatches>1 matches single-device exactly for nets without
    batch-coupled ops (grads are batch SUMS).
"""

import jax
import numpy as np
import pytest

from bcnn_tpu import Mode, Session
from bcnn_tpu.compile import make_forward, make_train_step
from bcnn_tpu.graph import Net
from bcnn_tpu.models import cifar10_resnet, lenet_mnist
from bcnn_tpu.parallel.pipeline import Pipeline, split_stages, stage_io
from bcnn_tpu.types import (
    Activation,
    FillerType,
    Loss,
    Metric,
    Padding,
)


def _devices(n):
    ds = jax.devices()
    assert len(ds) >= n, "conftest must fake 8 CPU devices"
    return ds[:n]


def _mnist_batch(rng, n):
    lab = rng.randint(0, 10, n)
    x = rng.randn(n, 1, 28, 28).astype(np.float32) * 0.1
    for i, c in enumerate(lab):
        x[i, 0, c : c + 8, c : c + 8] += 1.0
    y = np.zeros((n, 10, 1, 1), np.float32)
    y[np.arange(n), lab] = 1.0
    return {"input": x, "label": y}


def _cifar_batch(rng, n):
    x = rng.randn(n, 3, 32, 32).astype(np.float32) * 0.1
    y = np.zeros((n, 10, 1, 1), np.float32)
    y[np.arange(n), rng.randint(0, 10, n)] = 1.0
    return {"input": x, "label": y}


def _bn_free_net(batch):
    """Conv/pool/fc stack with NO batch-coupled ops: microbatched PP must
    reproduce the full-batch gradient exactly (batch-sum grads)."""
    net = Net(Mode.TRAIN)
    net.set_input_shape(16, 16, 3, batch)
    net.set_sgd_optimizer(learning_rate=0.01, momentum=0.9)
    X, R = FillerType.XAVIER, Activation.RELU
    net.add_convolutional_layer(16, 3, 1, 1, 1, 0, X, R, 0, "input", "c1")
    net.add_maxpool_layer(2, 2, Padding.SAME, "c1", "p1")
    net.add_convolutional_layer(32, 3, 1, 1, 1, 0, X, R, 0, "p1", "c2")
    net.add_maxpool_layer(2, 2, Padding.SAME, "c2", "p2")
    net.add_fullc_layer(64, X, R, 0, "p2", "fc1")
    net.add_fullc_layer(10, X, Activation.NONE, 0, "fc1", "fc2")
    net.add_softmax_layer("fc2", "sm")
    net.add_cost_layer(Loss.EUCLIDEAN, Metric.SSE, 1.0, "sm", "label", "cost")
    return net


# --------------------------------------------------------------------- #
# Static analysis
# --------------------------------------------------------------------- #


def test_split_stages_contiguous_cover():
    net = lenet_mnist(8)
    for n_stages in (1, 2, 3, 4):
        ranges = split_stages(net, n_stages)
        assert len(ranges) == n_stages
        assert ranges[0][0] == 0 and ranges[-1][1] == len(net.nodes)
        for (a, b), (c, d) in zip(ranges, ranges[1:]):
            assert b == c and a < b and c < d


def test_stage_io_boundary_sets():
    net = lenet_mnist(8)
    ranges = split_stages(net, 2)
    ios = stage_io(net, ranges, Mode.TRAIN)
    # stage 0 consumes the image, stage 1 consumes stage-0 activations
    assert 0 in ios[0].ext_in
    assert ios[0].pipe_in == []
    assert ios[1].pipe_in == ios[0].pipe_out and ios[0].pipe_out
    # the cost node's label is host-fed into whichever stage holds it
    assert 1 in ios[1].ext_in
    # every param is owned by exactly one stage
    all_keys = ios[0].param_keys + ios[1].param_keys
    assert len(all_keys) == len(set(all_keys))


# --------------------------------------------------------------------- #
# Forward
# --------------------------------------------------------------------- #


def test_pp_forward_matches_single_device():
    batch = 8
    net = lenet_mnist(batch, Mode.PREDICT)
    s = Session(net, seed=0).compile_net()
    x = {"input": _mnist_batch(np.random.RandomState(0), batch)["input"]}

    fwd = make_forward(net, ["softmax"], Mode.PREDICT)
    (ref_out,), _ = fwd(s.params, s.state, x)

    pipe = Pipeline(
        net,
        [[d] for d in _devices(3)],
        mode=Mode.PREDICT,
        output_names=["softmax"],
    )
    ps, ss = pipe.shard(s.params, s.state)
    (pp_out,) = pipe.forward(ps, ss, x)
    np.testing.assert_array_equal(np.asarray(ref_out), np.asarray(pp_out))


def test_pp_forward_microbatched():
    batch = 8
    net = lenet_mnist(batch, Mode.PREDICT)
    s = Session(net, seed=0).compile_net()
    x = {"input": _mnist_batch(np.random.RandomState(1), batch)["input"]}

    fwd = make_forward(net, ["softmax"], Mode.PREDICT)
    (ref_out,), _ = fwd(s.params, s.state, x)

    pipe = Pipeline(
        net,
        [[d] for d in _devices(2)],
        mode=Mode.PREDICT,
        n_microbatches=4,
        output_names=["softmax"],
    )
    ps, ss = pipe.shard(s.params, s.state)
    (pp_out,) = pipe.forward(ps, ss, x)
    # PREDICT has no batch coupling: microbatching is exact
    np.testing.assert_allclose(
        np.asarray(ref_out), np.asarray(pp_out), rtol=1e-6, atol=1e-6
    )


# --------------------------------------------------------------------- #
# Training
# --------------------------------------------------------------------- #


def _single_device_steps(net_fn, batchs, rngkey, n_steps, batches):
    net = net_fn()
    s = Session(net, seed=0).compile_net()
    step = make_train_step(net)
    p, st, o = s.params, s.state, s.opt_state
    losses = []
    for i in range(n_steps):
        p, st, o, loss = step(p, st, o, batches[i], jax.random.fold_in(rngkey, i))
        losses.append(float(loss))
    return p, st, o, losses


def _pipeline_steps(net_fn, stage_devices, n_micro, rngkey, n_steps, batches):
    net = net_fn()
    s = Session(net, seed=0).compile_net()
    pipe = Pipeline(net, stage_devices, Mode.TRAIN, n_microbatches=n_micro)
    ps, ss, os_ = pipe.shard(s.params, s.state, s.opt_state)
    losses = []
    for i in range(n_steps):
        ps, ss, os_, loss = pipe.train_on_batch(
            ps, ss, os_, batches[i], jax.random.fold_in(rngkey, i)
        )
        losses.append(float(loss))
    return pipe.gather(ps), pipe.gather(ss), losses


def _assert_trees_close(ref, got, rtol=1e-5, atol=1e-6):
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(got[k]),
            rtol=rtol, atol=atol, err_msg=k,
        )


def test_pp_train_matches_single_device():
    """2-stage PP, n_micro=1: bit-for-bit the single-device trajectory
    (same BN batch stats, same per-node RNG, same optimizer updates)."""
    batch, n_steps = 8, 3
    rng = np.random.RandomState(2)
    batches = [_mnist_batch(rng, batch) for _ in range(n_steps)]
    key = jax.random.PRNGKey(7)

    p1, st1, _o1, losses1 = _single_device_steps(
        lambda: lenet_mnist(batch), batch, key, n_steps, batches
    )
    p2, st2, losses2 = _pipeline_steps(
        lambda: lenet_mnist(batch),
        [[d] for d in _devices(2)], 1, key, n_steps, batches,
    )
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5)
    _assert_trees_close(p1, p2)
    _assert_trees_close(st1, st2)


def test_pp_train_branched_graph_cross_stage_taps():
    """ResNet-style net split mid-block: eltwise shortcuts and the
    reference's overwrite-vs-accumulate grad routing cross the stage
    boundary (taps are forwarded as extra boundary values)."""
    batch, n_steps = 8, 2
    rng = np.random.RandomState(3)
    batches = [_cifar_batch(rng, batch) for _ in range(n_steps)]
    key = jax.random.PRNGKey(11)

    p1, st1, _o1, losses1 = _single_device_steps(
        lambda: cifar10_resnet(batch), batch, key, n_steps, batches
    )
    p2, st2, losses2 = _pipeline_steps(
        lambda: cifar10_resnet(batch),
        [[d] for d in _devices(3)], 1, key, n_steps, batches,
    )
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5)
    _assert_trees_close(p1, p2, rtol=1e-4, atol=1e-5)
    _assert_trees_close(st1, st2, rtol=1e-4, atol=1e-6)


def test_pp_microbatched_exact_without_batch_coupling():
    """GPipe with 4 microbatches on a BN-free net: batch-sum gradients
    make the microbatched step exactly the full-batch step."""
    batch, n_steps = 8, 2
    rng = np.random.RandomState(4)
    batches = [
        {
            "input": rng.randn(batch, 3, 16, 16).astype(np.float32),
            "label": np.eye(10, dtype=np.float32)[
                rng.randint(0, 10, batch)
            ].reshape(batch, 10, 1, 1),
        }
        for _ in range(n_steps)
    ]
    key = jax.random.PRNGKey(13)

    p1, st1, _o1, losses1 = _single_device_steps(
        lambda: _bn_free_net(batch), batch, key, n_steps, batches
    )
    p2, st2, losses2 = _pipeline_steps(
        lambda: _bn_free_net(batch),
        [[d] for d in _devices(2)], 4, key, n_steps, batches,
    )
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5)
    _assert_trees_close(p1, p2, rtol=1e-5, atol=1e-6)


def test_pp_1f1b_schedule_identical_to_gpipe():
    """1F1B frees each microbatch's stash after its backward; the numbers
    must be identical to the GPipe schedule (sums commute, forward state
    order unchanged) — here vs the single-device step on a BN-free net."""
    batch = 8
    rng = np.random.RandomState(6)
    batches = [
        {
            "input": rng.randn(batch, 3, 16, 16).astype(np.float32),
            "label": np.eye(10, dtype=np.float32)[
                rng.randint(0, 10, batch)
            ].reshape(batch, 10, 1, 1),
        }
    ]
    key = jax.random.PRNGKey(19)

    p1, _st1, _o1, losses1 = _single_device_steps(
        lambda: _bn_free_net(batch), batch, key, 1, batches
    )

    net = _bn_free_net(batch)
    s = Session(net, seed=0).compile_net()
    pipe = Pipeline(
        net, [[d] for d in _devices(2)], Mode.TRAIN,
        n_microbatches=4, schedule="1f1b",
    )
    ps, ss, os_ = pipe.shard(s.params, s.state, s.opt_state)
    ps, ss, os_, loss = pipe.train_on_batch(ps, ss, os_, batches[0], key)
    np.testing.assert_allclose(losses1[0], float(loss), rtol=1e-5)
    _assert_trees_close(p1, pipe.gather(ps), rtol=1e-5, atol=1e-6)


def test_pp_dp_hybrid_stage():
    """DP x PP: stage 0 data-parallel over 2 devices, stage 1 on one.
    GSPMD reduction inside the stage keeps batch-sum math identical."""
    batch = 8
    devs = _devices(3)
    rng = np.random.RandomState(5)
    batches = [_mnist_batch(rng, batch)]
    key = jax.random.PRNGKey(17)

    p1, st1, _o1, losses1 = _single_device_steps(
        lambda: lenet_mnist(batch), batch, key, 1, batches
    )
    p2, st2, losses2 = _pipeline_steps(
        lambda: lenet_mnist(batch),
        [[devs[0], devs[1]], [devs[2]]], 1, key, 1, batches,
    )
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5)
    _assert_trees_close(p1, p2, rtol=1e-4, atol=1e-5)
    _assert_trees_close(st1, st2, rtol=1e-4, atol=1e-6)


# --------------------------------------------------------------------- #
# BN nets under microbatched PP (round 4, VERDICT r3 #5)
# --------------------------------------------------------------------- #


def _bn_net(batch, frozen=False):
    """Conv+BN stack — the batch-coupled case microbatching must handle."""
    net = Net(Mode.TRAIN)
    net.set_input_shape(16, 16, 3, batch)
    net.set_sgd_optimizer(learning_rate=0.01, momentum=0.9)
    X, R = FillerType.XAVIER, Activation.RELU
    net.add_convolutional_layer(16, 3, 1, 1, 1, 1, X, R, 0, "input", "c1")
    net.add_maxpool_layer(2, 2, Padding.SAME, "c1", "p1")
    net.add_convolutional_layer(32, 3, 1, 1, 1, 1, X, R, 0, "p1", "c2")
    net.add_fullc_layer(10, X, Activation.NONE, 0, "c2", "fc")
    net.add_softmax_layer("fc", "sm")
    net.add_cost_layer(Loss.EUCLIDEAN, Metric.SSE, 1.0, "sm", "label", "cost")
    if frozen:
        net.bn_frozen_stats = True
    return net


def _warm(state):
    """Non-degenerate running stats (frozen BN divides by run_var+eps)."""
    import jax.numpy as jnp

    return {
        k: (jnp.ones_like(v) if "run_var" in k else v)
        for k, v in state.items()
    }


def _single_device_accum_steps(net_fn, accum, rngkey, n_steps, batches,
                               warm=False):
    net = net_fn()
    s = Session(net, seed=0).compile_net()
    step = make_train_step(net, accum_steps=accum)
    p, st, o = s.params, s.state, s.opt_state
    if warm:
        st = _warm(st)
    losses = []
    for i in range(n_steps):
        p, st, o, loss = step(
            p, st, o, batches[i], jax.random.fold_in(rngkey, i)
        )
        losses.append(float(loss))
    return p, st, o, losses


def _pipeline_steps_warm(net_fn, stage_devices, n_micro, rngkey, n_steps,
                         batches, warm=False):
    net = net_fn()
    s = Session(net, seed=0).compile_net()
    st0 = _warm(s.state) if warm else s.state
    pipe = Pipeline(net, stage_devices, Mode.TRAIN, n_microbatches=n_micro)
    ps, ss, os_ = pipe.shard(s.params, st0, s.opt_state)
    losses = []
    for i in range(n_steps):
        ps, ss, os_, loss = pipe.train_on_batch(
            ps, ss, os_, batches[i], jax.random.fold_in(rngkey, i)
        )
        losses.append(float(loss))
    return pipe.gather(ps), pipe.gather(ss), losses


def test_pp_microbatched_bn_matches_accumulation_step():
    """Microbatched PP on a BN net is EXACTLY the single-device
    gradient-accumulation program (make_train_step(accum_steps=k)): same
    per-microbatch BN batch stats, same fold_in(rng, m) keys, same
    summed gradients, one optimizer update — the PP semantics for BN
    nets is accumulation semantics, pinned against a single-device
    program instead of being merely asserted."""
    batch, n_steps = 8, 2
    rng = np.random.RandomState(5)
    batches = [_mnist_batch_rgb(rng, batch) for _ in range(n_steps)]
    key = jax.random.PRNGKey(17)

    p1, st1, _o1, losses1 = _single_device_accum_steps(
        lambda: _bn_net(batch), 4, key, n_steps, batches
    )
    p2, st2, losses2 = _pipeline_steps_warm(
        lambda: _bn_net(batch), [[d] for d in _devices(2)], 4, key,
        n_steps, batches,
    )
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5)
    _assert_trees_close(p1, p2, rtol=1e-4, atol=1e-6)
    _assert_trees_close(st1, st2, rtol=1e-4, atol=1e-6)


def test_pp_microbatched_bn_frozen_stats_exact():
    """net.bn_frozen_stats (ops/norm.py): BN normalizes with step-start
    running stats as constants — no sample coupling — so microbatched PP
    matches the equivalent single-device program tightly."""
    batch, n_steps = 8, 2
    rng = np.random.RandomState(6)
    batches = [_mnist_batch_rgb(rng, batch) for _ in range(n_steps)]
    key = jax.random.PRNGKey(19)

    p1, st1, _o1, losses1 = _single_device_accum_steps(
        lambda: _bn_net(batch, frozen=True), 4, key, n_steps, batches,
        warm=True,
    )
    p2, st2, losses2 = _pipeline_steps_warm(
        lambda: _bn_net(batch, frozen=True), [[d] for d in _devices(2)],
        4, key, n_steps, batches, warm=True,
    )
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5)
    _assert_trees_close(p1, p2, rtol=1e-4, atol=1e-6)
    _assert_trees_close(st1, st2, rtol=1e-4, atol=1e-6)


def _mnist_batch_rgb(rng, n):
    lab = rng.randint(0, 4, n)
    x = rng.randn(n, 3, 16, 16).astype(np.float32) * 0.1
    for i, c in enumerate(lab):
        r, col = divmod(int(c), 2)
        x[i, :, r * 8:(r + 1) * 8, col * 8:(col + 1) * 8] += 1.5
    y = np.zeros((n, 10, 1, 1), np.float32)
    y[np.arange(n), lab] = 1.0
    return {"input": x, "label": y}


def test_pp_microbatched_bn_net_converges():
    """Microbatched PP with frozen-stats BN is a working training
    program, not just a consistent one: the conv+BN net drives the loss
    down ~10x on the separable quadrant task."""
    batch = 8
    rng = np.random.RandomState(7)
    net = _bn_net(batch, frozen=True)
    s = Session(net, seed=0).compile_net()
    pipe = Pipeline(
        net, [[d] for d in _devices(2)], Mode.TRAIN, n_microbatches=2
    )
    ps, ss, os_ = pipe.shard(s.params, _warm(s.state), s.opt_state)
    key = jax.random.PRNGKey(23)
    losses = []
    for i in range(80):
        ps, ss, os_, loss = pipe.train_on_batch(
            ps, ss, os_, _mnist_batch_rgb(rng, batch),
            jax.random.fold_in(key, i),
        )
        losses.append(float(loss))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first * 0.12, (first, last)

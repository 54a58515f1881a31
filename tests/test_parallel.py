"""Data-parallel tests on the faked 8-device CPU mesh (SURVEY.md §4:
multi-device tests without a pod)."""

import jax
import numpy as np
import pytest

from bcnn_tpu import Mode, Session
from bcnn_tpu.models import lenet_mnist
from bcnn_tpu.parallel import (
    make_dp_train_step,
    make_mesh,
    replicate,
    shard_batch,
)


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must fake 8 CPU devices"
    return make_mesh(jax.devices()[:8])


def _batch(rng, n):
    lab = rng.randint(0, 10, n)
    x = rng.randn(n, 1, 28, 28).astype(np.float32) * 0.1
    for i, c in enumerate(lab):
        x[i, 0, c : c + 8, c : c + 8] += 1.0
    y = np.zeros((n, 10, 1, 1), np.float32)
    y[np.arange(n), lab] = 1.0
    return x, y


def test_dp_train_step_matches_single_device(mesh8):
    """The DP step over 8 devices must produce the same parameters as the
    single-device step — the loss is a global batch sum, so GSPMD's psum
    reproduces single-device math exactly (SURVEY.md §2.8)."""
    batch = 16
    rng = np.random.RandomState(0)
    x, y = _batch(rng, batch)
    rngkey = jax.random.PRNGKey(42)

    # single-device
    net1 = lenet_mnist(batch)
    s1 = Session(net1, seed=0).compile_net()
    from bcnn_tpu.compile import make_train_step

    step1 = make_train_step(net1)
    p1, st1, o1, loss1 = step1(
        s1.params, s1.state, s1.opt_state,
        {"input": x, "label": y}, rngkey,
    )

    # 8-device DP
    net8 = lenet_mnist(batch)
    s8 = Session(net8, seed=0).compile_net()
    step8 = make_dp_train_step(net8, mesh8)
    p = replicate(mesh8, s8.params)
    st = replicate(mesh8, s8.state)
    o = replicate(mesh8, s8.opt_state)
    k = replicate(mesh8, rngkey)
    bt = shard_batch(mesh8, {"input": x, "label": y})
    p8, st8, o8, loss8 = step8(p, st, o, bt, k)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)
    for key in p1:
        np.testing.assert_allclose(
            np.asarray(p1[key]),
            np.asarray(p8[key]),
            rtol=1e-4,
            atol=1e-5,
            err_msg=key,
        )
    for key in st1:
        np.testing.assert_allclose(
            np.asarray(st1[key]), np.asarray(st8[key]), rtol=1e-4, atol=1e-6
        )


def test_dp_train_step_act16_matches_single_device(mesh8):
    """train_act_dtype (bf16 activation storage) composes with DP: the
    parallel executor goes through the same compile.execute, so the DP
    step with act16 must equal the single-device act16 step."""
    import jax.numpy as jnp

    batch = 16
    rng = np.random.RandomState(3)
    x, y = _batch(rng, batch)
    rngkey = jax.random.PRNGKey(7)
    from bcnn_tpu.compile import make_train_step

    net1 = lenet_mnist(batch)
    net1.compute_dtype = jnp.bfloat16
    net1.train_act_dtype = jnp.bfloat16
    s1 = Session(net1, seed=0).compile_net()
    step1 = make_train_step(net1)
    p1, st1, o1, loss1 = step1(
        s1.params, s1.state, s1.opt_state, {"input": x, "label": y}, rngkey
    )

    net8 = lenet_mnist(batch)
    net8.compute_dtype = jnp.bfloat16
    net8.train_act_dtype = jnp.bfloat16
    s8 = Session(net8, seed=0).compile_net()
    step8 = make_dp_train_step(net8, mesh8)
    p8, st8, o8, loss8 = step8(
        replicate(mesh8, s8.params), replicate(mesh8, s8.state),
        replicate(mesh8, s8.opt_state),
        shard_batch(mesh8, {"input": x, "label": y}),
        replicate(mesh8, rngkey),
    )

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)
    # act16 grads carry bf16-level fidelity and GSPMD may fuse the
    # boundary casts differently than the single-device program, so
    # parity here is at grad precision, not the fp32 test's exactness
    # (a wiring bug — wrong batch scaling, missed psum — would still
    # blow these bounds by orders of magnitude)
    for key in p1:
        np.testing.assert_allclose(
            np.asarray(p1[key]), np.asarray(p8[key]),
            rtol=5e-3, atol=5e-5, err_msg=key,
        )


def test_dp_forward_matches_single_device(mesh8):
    """Batch-sharded inference equals single-device inference."""
    from bcnn_tpu import Mode
    from bcnn_tpu.parallel import make_dp_forward, replicate, shard_batch

    net = lenet_mnist(16, mode=Mode.PREDICT)
    sess = Session(net, seed=0).compile_net()
    x = np.random.RandomState(7).randn(16, 1, 28, 28).astype(np.float32)
    (ref,), _ = sess.predict_on_batch(x, outputs=["softmax"])

    fwd = make_dp_forward(net, mesh8, ["softmax"], Mode.PREDICT)
    p = replicate(mesh8, sess.params)
    s = replicate(mesh8, sess.state)
    batch = shard_batch(mesh8, {"input": x})
    (got,) = fwd(p, s, batch)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-6
    )


def test_spatial_forward_matches_single_device(mesh8):
    """Height-sharded inference (halo exchange inserted by GSPMD) must
    equal the unsharded forward."""
    from bcnn_tpu.models import cifar10_convnet
    from bcnn_tpu import Mode
    from bcnn_tpu.parallel import make_spatial_forward

    net = cifar10_convnet(batch_size=2, mode=Mode.PREDICT)
    sess = Session(net, seed=0).compile_net()
    x = np.random.RandomState(3).randn(2, 3, 32, 32).astype(np.float32)
    (ref,), _ = sess.predict_on_batch(x, outputs=["softmax"])

    fwd = make_spatial_forward(net, mesh8, ["softmax"])
    (got,) = fwd(sess.params, sess.state, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_session_mesh_integration(mesh8):
    """Session(net, mesh=...) trains DP transparently and matches the
    explicit single-device Session."""
    rng = np.random.RandomState(5)
    x, y = _batch(rng, 16)

    s1 = Session(lenet_mnist(16), seed=0).compile_net()
    s8 = Session(lenet_mnist(16), seed=0, mesh=mesh8).compile_net()
    s8._rng = s1._rng
    l1 = float(s1.train_on_batch(x, y))
    l8 = float(s8.train_on_batch(x, y))
    np.testing.assert_allclose(l1, l8, rtol=1e-5)
    for k in s1.params:
        np.testing.assert_allclose(
            np.asarray(s1.params[k]), np.asarray(s8.params[k]),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )
    # predict path still works on the replicated params
    s8.net.set_mode(Mode.VALID)
    _, err = s8.predict_on_batch(x, y)
    assert np.isfinite(float(err))


def test_dp_multiple_steps_converge(mesh8):
    batch = 32
    net = lenet_mnist(batch)
    sess = Session(net, seed=0).compile_net()
    step = make_dp_train_step(net, mesh8)
    p = replicate(mesh8, sess.params)
    st = replicate(mesh8, sess.state)
    o = replicate(mesh8, sess.opt_state)
    rng = np.random.RandomState(1)
    losses = []
    for i in range(8):
        x, y = _batch(rng, batch)
        bt = shard_batch(mesh8, {"input": x, "label": y})
        k = replicate(mesh8, jax.random.PRNGKey(i))
        p, st, o, loss = step(p, st, o, bt, k)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_dp_train_scan_matches_single_device_scan(mesh8):
    """scan + DP compose: K steps in one device program over the 8-device
    mesh must track the single-device make_train_scan trajectory."""
    import jax.numpy as jnp

    from bcnn_tpu.compile import make_train_scan
    from bcnn_tpu.parallel import make_dp_train_scan

    K, batch = 4, 16
    rng = np.random.RandomState(3)
    xs = np.stack([_batch(rng, batch)[0] for _ in range(K)])
    rng = np.random.RandomState(3)
    ys = np.stack([_batch(rng, batch)[1] for _ in range(K)])

    def run(parallel):
        net = lenet_mnist(batch_size=batch)
        net.set_sgd_optimizer(0.05, 0.9)
        sess = Session(net, seed=0).compile_net()
        key = jax.random.PRNGKey(0)
        if parallel:
            step = make_dp_train_scan(net, mesh8)
            params = replicate(mesh8, sess.params)
            state = replicate(mesh8, sess.state)
            opt = replicate(mesh8, sess.opt_state)
            # batches are (K, B, ...): shard the PER-STEP batch axis
            from jax.sharding import NamedSharding, PartitionSpec as P

            ksh = NamedSharding(mesh8, P(None, "batch"))
            bx = jax.device_put(jnp.asarray(xs), ksh)
            by = jax.device_put(jnp.asarray(ys), ksh)
            params, state, opt, losses = step(
                params, state, opt, bx, by, key
            )
        else:
            step = make_train_scan(net)
            params, state, opt, losses = step(
                sess.params, sess.state, sess.opt_state,
                {"input": jnp.asarray(xs), "label": jnp.asarray(ys)}, key,
            )
        return jax.tree.map(np.asarray, params), np.asarray(losses)

    p1, l1 = run(False)
    p8, l8 = run(True)
    np.testing.assert_allclose(l1, l8, rtol=1e-5, atol=1e-7)
    # Param trajectories diverge chaotically from GSPMD reduction
    # re-association (measured: 1.3e-7 at K=1, 1.6e-4 at K=2, 1.3e-3 at
    # K=4 — growth with K, while per-step losses stay bit-identical). A
    # real DP bug (missing grad sync, wrong psum) shows O(1) error at
    # K=1, which the tight single-step test above catches.
    for k in p1:
        np.testing.assert_allclose(
            p1[k], p8[k], rtol=1e-2, atol=5e-3, err_msg=k
        )


def test_dp_tp_train_step_matches_single_device(mesh8):
    """Tensor parallelism composed with DP on a 2-D (batch=2, model=4)
    mesh: channel-sharded weights + batch-sharded inputs must reproduce
    the single-device step (GSPMD inserts the model-axis collectives; the
    math is unchanged)."""
    from bcnn_tpu.compile import make_train_step
    from bcnn_tpu.parallel import (
        make_dp_tp_train_step,
        make_mesh_2d,
        shard_train_state,
        tp_param_specs,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch = 16
    rng = np.random.RandomState(11)
    x, y = _batch(rng, batch)
    rngkey = jax.random.PRNGKey(7)

    net1 = lenet_mnist(batch)
    s1 = Session(net1, seed=0).compile_net()
    step1 = make_train_step(net1)
    p1, st1, o1, loss1 = step1(
        s1.params, s1.state, s1.opt_state, {"input": x, "label": y}, rngkey
    )

    mesh = make_mesh_2d(jax.devices()[:8], dp=2)
    net = lenet_mnist(batch)
    s = Session(net, seed=0).compile_net()
    # some weights must actually be channel-sharded for this test to bite
    pspecs, _ = tp_param_specs(net, mesh)
    assert any(spec != P() for spec in pspecs.values()), pspecs
    step = make_dp_tp_train_step(net, mesh)
    p, st, o = shard_train_state(net, mesh, s.params, s.state, s.opt_state)
    bt = {
        "input": jax.device_put(x, NamedSharding(mesh, P("batch"))),
        "label": jax.device_put(y, NamedSharding(mesh, P("batch"))),
    }
    k = jax.device_put(rngkey, NamedSharding(mesh, P()))
    p, st, o, loss = step(p, st, o, bt, k)

    np.testing.assert_allclose(float(loss1), float(loss), rtol=1e-4)
    for key in p1:
        np.testing.assert_allclose(
            np.asarray(p1[key]), np.asarray(p[key]),
            rtol=1e-4, atol=1e-5, err_msg=key,
        )
    # the sharding actually took: conv weights split on the model axis
    sharded = [
        key for key, spec in pspecs.items()
        if spec != P() and len(s.params.get(key, np.zeros(())).shape) == 4
    ]
    assert sharded
    shard_shapes = {
        sh.data.shape for sh in p[sharded[0]].addressable_shards
    }
    full = p1[sharded[0]].shape
    assert (full[0], full[1], full[2], full[3] // 4) in shard_shapes


def test_dp_sp_train_step_matches_single_device(mesh8):
    """Spatial partitioning in TRAINING: input height sharded over the
    model axis of a 2-D mesh (halo exchanges in fwd AND the autodiff bwd),
    composed with batch DP — must reproduce the single-device step."""
    from bcnn_tpu.compile import make_train_step
    from bcnn_tpu.parallel import make_dp_sp_train_step, make_mesh_2d
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch = 8
    rng = np.random.RandomState(13)
    x, y = _batch(rng, batch)
    rngkey = jax.random.PRNGKey(3)

    net1 = lenet_mnist(batch)
    s1 = Session(net1, seed=0).compile_net()
    step1 = make_train_step(net1)
    p1, st1, o1, loss1 = step1(
        s1.params, s1.state, s1.opt_state, {"input": x, "label": y}, rngkey
    )

    mesh = make_mesh_2d(jax.devices()[:8], dp=2)
    net = lenet_mnist(batch)
    s = Session(net, seed=0).compile_net()
    step = make_dp_sp_train_step(net, mesh)
    repl = NamedSharding(mesh, P())
    p = jax.tree.map(lambda v: jax.device_put(v, repl), s.params)
    st = jax.tree.map(lambda v: jax.device_put(v, repl), s.state)
    o = jax.tree.map(lambda v: jax.device_put(v, repl), s.opt_state)
    bt = {
        "input": jax.device_put(
            x, NamedSharding(mesh, P("batch", None, "model", None))
        ),
        "label": jax.device_put(y, NamedSharding(mesh, P("batch"))),
    }
    p, st, o, loss = step(p, st, o, bt, jax.device_put(rngkey, repl))

    np.testing.assert_allclose(float(loss1), float(loss), rtol=1e-4)
    for key in p1:
        np.testing.assert_allclose(
            np.asarray(p1[key]), np.asarray(p[key]),
            rtol=1e-4, atol=1e-5, err_msg=key,
        )


def test_multihost_helpers_single_process(mesh8):
    """multihost.host_local_batch / process_batch_slice run in plain
    single-process mode (process_count==1): the local slice IS the global
    batch, and the assembled arrays are batch-sharded over the mesh."""
    from bcnn_tpu.parallel import multihost

    start, size = multihost.process_batch_slice(32)
    assert (start, size) == (0, 32)

    x = np.random.RandomState(0).randn(16, 1, 8, 8).astype(np.float32)
    y = np.zeros((16, 10), np.float32)
    batch = multihost.host_local_batch(mesh8, x, y)
    assert batch["input"].shape == (16, 1, 8, 8)
    np.testing.assert_array_equal(np.asarray(batch["input"]), x)
    # sharded over the batch axis: each device holds 16/8 = 2 samples
    shard_shapes = {
        s.data.shape for s in batch["input"].addressable_shards
    }
    assert shard_shapes == {(2, 1, 8, 8)}


def test_multihost_global_mesh_single_process():
    from bcnn_tpu.parallel import multihost

    mesh = multihost.global_mesh()
    assert mesh.devices.size == jax.device_count()
    assert mesh.axis_names == ("batch",)


def test_zero1_train_step_matches_single_device(mesh8):
    """ZeRO-1: optimizer slots sharded over the DP axis must reproduce
    the single-device step exactly (elementwise update over the same
    batch-sum gradient) while each device holds only 1/8 of the slots."""
    from bcnn_tpu.compile import make_train_step
    from bcnn_tpu.parallel import (
        make_zero1_train_step,
        shard_zero_state,
        zero_param_specs,
    )
    from jax.sharding import PartitionSpec as P

    batch = 16
    rng = np.random.RandomState(21)
    x, y = _batch(rng, batch)
    rngkey = jax.random.PRNGKey(5)

    net1 = lenet_mnist(batch)
    s1 = Session(net1, seed=0).compile_net()
    step1 = make_train_step(net1)
    p1, st1, o1, loss1 = step1(
        s1.params, s1.state, s1.opt_state, {"input": x, "label": y}, rngkey
    )

    net = lenet_mnist(batch)
    s = Session(net, seed=0).compile_net()
    zspecs = zero_param_specs(net, mesh8)
    assert any(spec != P() for spec in zspecs.values()), zspecs
    step = make_zero1_train_step(net, mesh8)
    p, st, o = shard_zero_state(net, mesh8, s.params, s.state, s.opt_state)
    bt = shard_batch(mesh8, {"input": x, "label": y})
    k = replicate(mesh8, rngkey)
    p, st, o, loss = step(p, st, o, bt, k)

    np.testing.assert_allclose(float(loss1), float(loss), rtol=1e-4)
    for key in p1:
        np.testing.assert_allclose(
            np.asarray(p1[key]), np.asarray(p[key]),
            rtol=1e-4, atol=1e-5, err_msg=key,
        )
    # a momentum slot is actually sharded 8-ways
    slots = o["velocity"] or o["adam_m"]
    key = max(slots, key=lambda k2: slots[k2].size)
    shard_shapes = {s2.data.shape for s2 in slots[key].addressable_shards}
    assert len(shard_shapes) == 1
    assert 8 * np.prod(list(shard_shapes)[0]) == slots[key].size


def test_fsdp_train_step_matches_single_device(mesh8):
    """FSDP (ZeRO-3): params AND optimizer slots sharded over the DP
    axis; GSPMD all-gathers weights at use and reduce-scatters grads —
    same math as single-device, 1/8 param+opt memory per device."""
    from bcnn_tpu.compile import make_train_step
    from bcnn_tpu.parallel import make_fsdp_train_step, shard_zero_state

    batch = 16
    rng = np.random.RandomState(22)
    x, y = _batch(rng, batch)
    rngkey = jax.random.PRNGKey(6)

    net1 = lenet_mnist(batch)
    s1 = Session(net1, seed=0).compile_net()
    step1 = make_train_step(net1)
    p1, st1, o1, loss1 = step1(
        s1.params, s1.state, s1.opt_state, {"input": x, "label": y}, rngkey
    )

    net = lenet_mnist(batch)
    s = Session(net, seed=0).compile_net()
    step = make_fsdp_train_step(net, mesh8)
    p, st, o = shard_zero_state(
        net, mesh8, s.params, s.state, s.opt_state, params_too=True
    )
    bt = shard_batch(mesh8, {"input": x, "label": y})
    k = replicate(mesh8, rngkey)
    p, st, o, loss = step(p, st, o, bt, k)

    np.testing.assert_allclose(float(loss1), float(loss), rtol=1e-4)
    for key in p1:
        np.testing.assert_allclose(
            np.asarray(p1[key]), np.asarray(p[key]),
            rtol=1e-4, atol=1e-5, err_msg=key,
        )
    # the largest weight is held 1/8 per device
    key = max(p1, key=lambda k2: p1[k2].size)
    shard_shapes = {s2.data.shape for s2 in p[key].addressable_shards}
    assert len(shard_shapes) == 1
    assert 8 * np.prod(list(shard_shapes)[0]) == p1[key].size


def test_fsdp_second_step_converges(mesh8):
    """Two FSDP steps keep matching single-device (the re-sharded outputs
    feed back in cleanly, incl. Adam's seen counter)."""
    from bcnn_tpu.compile import make_train_step
    from bcnn_tpu.parallel import make_fsdp_train_step, shard_zero_state
    from bcnn_tpu.types import Optimizer

    batch = 16
    rng = np.random.RandomState(23)
    rngkey = jax.random.PRNGKey(9)

    net1 = lenet_mnist(batch)
    net1.learner.optimizer = Optimizer.ADAM
    s1 = Session(net1, seed=0).compile_net()
    step1 = make_train_step(net1)
    p1, st1, o1 = s1.params, s1.state, s1.opt_state

    net = lenet_mnist(batch)
    net.learner.optimizer = Optimizer.ADAM
    s = Session(net, seed=0).compile_net()
    step = make_fsdp_train_step(net, mesh8)
    p, st, o = shard_zero_state(
        net, mesh8, s.params, s.state, s.opt_state, params_too=True
    )
    k = replicate(mesh8, rngkey)
    for i in range(2):
        x, y = _batch(rng, batch)
        p1, st1, o1, loss1 = step1(
            p1, st1, o1, {"input": x, "label": y}, rngkey
        )
        bt = shard_batch(mesh8, {"input": x, "label": y})
        p, st, o, loss = step(p, st, o, bt, k)
        np.testing.assert_allclose(
            float(loss1), float(loss), rtol=1e-4, err_msg=f"step {i}"
        )


def test_session_train_scan_on_batches_dp(mesh8):
    """Session.train_scan_on_batches on a mesh routes through
    make_dp_train_scan: k chunked DP steps track k sequential
    single-device steps (same loader data; scan-vs-straight-line
    compilation rounds differently, hence tolerance not bit-equality)."""
    from bcnn_tpu import Session
    from tests.test_train import lenet, synthetic_batch

    k, batch = 4, 16

    class FixedLoader:
        def __init__(self):
            self.r = np.random.RandomState(11)

        def next_batch(self):
            return synthetic_batch(self.r, batch, 12, 4)

    # single device, sequential
    net1 = lenet(batch, 12, 4)
    s1 = Session(net1, seed=0).compile_net()
    s1.loader = FixedLoader()
    seq_loss = sum(float(s1.train_on_batch()) for _ in range(k))

    # mesh, one scan chunk
    net8 = lenet(batch, 12, 4)
    s8 = Session(net8, seed=0, mesh=mesh8).compile_net()
    s8.loader = FixedLoader()
    scan_loss = s8.train_scan_on_batches(k)

    assert abs(seq_loss - scan_loss) <= 1e-3 * max(1.0, abs(seq_loss)), (
        seq_loss, scan_loss,
    )
    for kk in s1.params:
        a = np.asarray(s1.params[kk])
        b = np.asarray(jax.device_get(s8.params[kk]))
        np.testing.assert_allclose(
            a, b, rtol=2e-3, atol=2e-4, err_msg=kk
        )


def test_dp_resident_scan_matches_single_device(mesh8):
    """The device-resident feed under DP: dataset replicated, per-step
    (K, B) index slab sharded on batch. Per-step losses must match the
    single-device make_train_scan_resident; params to the same DP
    tolerance as the staged-scan test above (GSPMD reduction
    re-association). Runs the uint8 + device-augment production path."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bcnn_tpu.compile import make_train_scan_resident
    from bcnn_tpu.parallel import make_dp_train_scan_resident, replicate

    K, batch, n = 3, 16, 40
    rng = np.random.RandomState(5)
    ds_x = rng.randint(0, 256, (n, 1, 28, 28)).astype(np.uint8)
    ds_y = np.zeros((n, 10, 1, 1), np.float32)
    ds_y[np.arange(n), rng.randint(0, 10, n)] = 1.0
    idx = rng.randint(0, n, (K, batch)).astype(np.int32)
    aug = {"random_fliph": 1, "min_brightness": -20, "max_brightness": 20}

    def build():
        net = lenet_mnist(batch_size=batch)
        net.set_sgd_optimizer(0.05, 0.9)
        net.device_augment = aug
        return net

    key = jax.random.PRNGKey(0)
    s1 = Session(build(), seed=0).compile_net()
    scan1 = make_train_scan_resident(build())
    p1, _, _, l1 = scan1(
        s1.params, s1.state, s1.opt_state,
        {"input": jnp.asarray(ds_x), "label": jnp.asarray(ds_y)},
        jnp.asarray(idx), key,
    )

    s8 = Session(build(), seed=0).compile_net()
    scan8 = make_dp_train_scan_resident(build(), mesh8)
    ish = NamedSharding(mesh8, P(None, "batch"))
    p8, _, _, l8 = scan8(
        replicate(mesh8, s8.params), replicate(mesh8, s8.state),
        replicate(mesh8, s8.opt_state),
        replicate(mesh8, {"input": ds_x, "label": ds_y}),
        jax.device_put(jnp.asarray(idx), ish), key,
    )
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l8), rtol=1e-5, atol=1e-7
    )
    for k in p1:
        np.testing.assert_allclose(
            np.asarray(p1[k]), np.asarray(p8[k]), rtol=1e-2, atol=5e-3,
            err_msg=k,
        )


def test_sharded_resident_feed_matches_replicated(mesh8):
    """The SHARDED device-resident feed (dataset split over the DP axis,
    parallel.make_dp_train_scan_resident_sharded) against the replicated
    feed given the SAME realized per-step sample sets: identical per-step
    losses and parameters, while each device holds only n/D samples of
    the dataset (the capacity point of the sharded design)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bcnn_tpu.parallel import (
        make_dp_train_scan_resident,
        make_dp_train_scan_resident_sharded,
        shard_resident_dataset,
    )

    K, batch, n, D = 3, 16, 64, 8
    rng = np.random.RandomState(7)
    ds_x = rng.randint(0, 256, (n, 1, 28, 28)).astype(np.uint8)
    ds_y = np.zeros((n, 10, 1, 1), np.float32)
    ds_y[np.arange(n), rng.randint(0, 10, n)] = 1.0
    # local per-shard indices (K, D, B/D); the equivalent GLOBAL indices
    # for the replicated feed are shard*(n/D) + local
    idx_local = rng.randint(0, n // D, (K, D, batch // D)).astype(np.int32)
    idx_global = (
        idx_local + (np.arange(D, dtype=np.int32) * (n // D))[None, :, None]
    ).reshape(K, batch)
    aug = {"random_fliph": 1, "min_brightness": -20, "max_brightness": 20}

    def build():
        net = lenet_mnist(batch_size=batch)
        net.set_sgd_optimizer(0.05, 0.9)
        net.device_augment = aug
        return net

    key = jax.random.PRNGKey(3)
    sr = Session(build(), seed=0).compile_net()
    scan_r = make_dp_train_scan_resident(build(), mesh8)
    ish_r = NamedSharding(mesh8, P(None, "batch"))
    pr, _, _, lr = scan_r(
        replicate(mesh8, sr.params), replicate(mesh8, sr.state),
        replicate(mesh8, sr.opt_state),
        replicate(mesh8, {"input": ds_x, "label": ds_y}),
        jax.device_put(jnp.asarray(idx_global), ish_r), key,
    )

    ss = Session(build(), seed=0).compile_net()
    scan_s = make_dp_train_scan_resident_sharded(build(), mesh8)
    dataset_s = shard_resident_dataset(
        mesh8, {"input": ds_x, "label": ds_y}
    )
    # capacity: every device holds exactly ONE (n/D)-sample shard, not
    # the whole set (the replicated feed stores all n per device)
    for arr in dataset_s.values():
        assert arr.shape[0] == D and arr.shape[1] == n // D
        for sh in arr.addressable_shards:
            assert sh.data.shape[0] == 1, sh.data.shape
    ish_s = NamedSharding(mesh8, P(None, "batch", None))
    ps, _, _, ls = scan_s(
        replicate(mesh8, ss.params), replicate(mesh8, ss.state),
        replicate(mesh8, ss.opt_state),
        dataset_s,
        jax.device_put(jnp.asarray(idx_local), ish_s), key,
    )
    np.testing.assert_allclose(
        np.asarray(lr), np.asarray(ls), rtol=1e-5, atol=1e-7
    )
    for k in pr:
        np.testing.assert_allclose(
            np.asarray(pr[k]), np.asarray(ps[k]), rtol=1e-4, atol=1e-5,
            err_msg=k,
        )


def test_sharded_epoch_index_stream_semantics():
    """ShardedEpochIndexStream: stratified batches (B/D local indices per
    shard), each shard's samples exactly once per local epoch, and the
    single-pos checkpoint/resume contract."""
    from bcnn_tpu.data import ShardedEpochIndexStream

    n, batch, D = 48, 12, 4
    st = ShardedEpochIndexStream(n, batch, D, seed=5)
    k_per_epoch = n // batch  # 4 steps = one local epoch everywhere
    idx = st.next(k_per_epoch)
    assert idx.shape == (k_per_epoch, D, batch // D)
    assert idx.dtype == np.int32
    for d in range(D):
        seen = np.sort(idx[:, d, :].ravel())
        np.testing.assert_array_equal(seen, np.arange(n // D))
    assert st.pos == n
    # resume: same pos -> same continuation
    st2 = ShardedEpochIndexStream(n, batch, D, seed=5)
    st2.pos = st.pos
    np.testing.assert_array_equal(st.next(3), st2.next(3))
    # shards shuffle independently (different permutations)
    st3 = ShardedEpochIndexStream(n, batch, D, seed=5)
    first = st3.next(k_per_epoch)
    assert not all(
        np.array_equal(first[:, 0, :], first[:, d, :]) for d in range(1, D)
    )
    with np.testing.assert_raises(ValueError):
        ShardedEpochIndexStream(50, batch, D)  # n not divisible

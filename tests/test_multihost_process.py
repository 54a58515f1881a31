"""REAL multi-process training over jax.distributed — the DCN-analogue
integration test the single-host environment allows: two OS processes,
each owning 4 CPU devices, join a jax.distributed cluster over localhost
gRPC, build the global 8-device mesh (parallel/multihost.py) and run DP
train steps whose gradient all-reduce crosses the process boundary. The
loss trajectory must match the same net trained on this process's own
8-device mesh (single-process GSPMD), which in turn is bit-checked
against single-device in test_parallel.py."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_cluster(extra_args, timeout=420):
    """Run a 2-process jax.distributed cluster of multihost_worker.py with
    the given per-phase args; assert both workers exit 0."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own 4-device forcing
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(WORKER))
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, f"localhost:{port}", "2", str(i)]
            + extra_args,
            env=env,
            cwd=os.path.dirname(os.path.dirname(WORKER)),
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=timeout) for p in procs]
    finally:
        for p in procs:  # no orphaned jax.distributed workers on failure
            if p.poll() is None:
                p.kill()
                p.wait()
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so[-2000:]}\n{se[-2000:]}"


def test_two_process_sharded_loader_matches_single_process(tmp_path):
    """Per-process sharded STREAMING loaders, end-to-end: two processes
    each read only their stripe of the same MNIST files
    (multihost.shard_loader) and the cluster's loss trajectory equals a
    single process reading the whole stream in file order."""
    import jax

    from bcnn_tpu import Session
    from bcnn_tpu.data.loaders import MnistLoader
    from bcnn_tpu.parallel import (
        make_dp_train_step,
        make_mesh,
        replicate,
        shard_batch,
    )
    from tests.multihost_worker import build_net
    from tests.test_data import write_mnist

    img, lbl, _, _ = write_mnist(tmp_path, n=30)
    gbatch = 16
    net = build_net(gbatch, 28, 28, 1, 10)
    loader = MnistLoader(net, img, lbl)  # unsharded: whole stream
    sess = Session(net, 0).compile_net()
    mesh = make_mesh(jax.devices("cpu")[:8])
    step = make_dp_train_step(net, mesh)
    params = replicate(mesh, sess.params)
    state = replicate(mesh, sess.state)
    opt = replicate(mesh, sess.opt_state)
    key = replicate(mesh, jax.random.PRNGKey(0))
    want = []
    for _ in range(3):
        x, y = loader.next_batch()
        bt = shard_batch(
            mesh, {"input": x, "label": y.reshape(gbatch, -1, 1, 1)}
        )
        params, state, opt, loss = step(params, state, opt, bt, key)
        want.append(float(np.asarray(loss)))

    outfile = str(tmp_path / "loader_losses.txt")
    _launch_cluster([outfile, "loader", img, lbl])
    got = [float(v) for v in open(outfile).read().split()]
    assert len(got) == 3
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_two_process_fsdp_matches_single_process(tmp_path):
    """FSDP (ZeRO-3) across the process boundary: each process holds half
    of every weight and optimizer slot; the per-use weight all-gather and
    the grad reduce-scatter cross the localhost-gRPC cluster. The loss
    trajectory must match plain single-process DP (identical math, 1/N
    memory). The worker also asserts the largest weight's addressable
    shards really hold only half its elements per process."""
    import jax

    from bcnn_tpu import Session
    from bcnn_tpu.parallel import (
        make_dp_train_step,
        make_mesh,
        replicate,
        shard_batch,
    )
    from tests.multihost_worker import build_net, global_batch

    batch = 16
    net = build_net(batch)
    sess = Session(net, 0).compile_net()
    mesh = make_mesh(jax.devices("cpu")[:8])
    step = make_dp_train_step(net, mesh)
    params = replicate(mesh, sess.params)
    state = replicate(mesh, sess.state)
    opt = replicate(mesh, sess.opt_state)
    key = replicate(mesh, jax.random.PRNGKey(0))
    want = []
    for i in range(3):
        x, y = global_batch(batch, i)
        bt = shard_batch(mesh, {"input": x, "label": y})
        params, state, opt, loss = step(params, state, opt, bt, key)
        want.append(float(np.asarray(loss)))

    outfile = str(tmp_path / "fsdp_losses.txt")
    _launch_cluster([outfile, "fsdp"])
    got = [float(v) for v in open(outfile).read().split()]
    assert len(got) == 3
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_two_process_checkpoint_resume_continues_trajectory(tmp_path):
    """Fault recovery across the cluster boundary (SURVEY §5): cluster A
    trains 2 steps and writes a full-state checkpoint, dies; a FRESH
    cluster B restores it and must continue exactly the uninterrupted
    4-step trajectory's steps 2-3."""
    import jax

    from bcnn_tpu import Session
    from bcnn_tpu.parallel import (
        make_dp_train_step,
        make_mesh,
        replicate,
        shard_batch,
    )
    from tests.multihost_worker import build_net, global_batch

    batch = 16
    net = build_net(batch)
    sess = Session(net, 0).compile_net()
    mesh = make_mesh(jax.devices("cpu")[:8])
    step = make_dp_train_step(net, mesh)
    params = replicate(mesh, sess.params)
    state = replicate(mesh, sess.state)
    opt = replicate(mesh, sess.opt_state)
    key = replicate(mesh, jax.random.PRNGKey(0))
    want = []
    for i in range(4):  # uninterrupted reference
        x, y = global_batch(batch, i)
        bt = shard_batch(mesh, {"input": x, "label": y})
        params, state, opt, loss = step(params, state, opt, bt, key)
        want.append(float(np.asarray(loss)))

    ckpt = str(tmp_path / "cluster.ckpt.npz")
    outfile = str(tmp_path / "resume_losses.txt")
    _launch_cluster([outfile, "resume_a", ckpt])
    assert os.path.exists(ckpt), "cluster A wrote no checkpoint"
    assert not os.path.exists(outfile)  # A died before reporting
    _launch_cluster([outfile, "resume_b", ckpt])
    got = [float(v) for v in open(outfile).read().split()]
    assert len(got) == 2
    np.testing.assert_allclose(got, want[2:], rtol=1e-5, atol=1e-7)


def test_elastic_resume_across_topology_change(tmp_path):
    """ELASTIC recovery: checkpoints are host-gathered full state and the
    DP loss/grad math is a batch SUM (bit-equal at any device count), so
    a run can resume on a DIFFERENT topology than it crashed on.
    Scale-DOWN: a 2-process cluster trains 2 steps, checkpoints, dies;
    THIS process (no cluster) restores and continues — on its 8-device
    mesh AND on one device — matching the uninterrupted trajectory.
    Scale-UP: a single device trains 2 steps, checkpoints; a fresh
    2-process cluster restores and continues steps 2-3 identically."""
    import jax

    from bcnn_tpu import Session
    from bcnn_tpu.checkpoint import load_checkpoint, save_checkpoint
    from bcnn_tpu.compile import make_train_step
    from bcnn_tpu.parallel import (
        make_dp_train_step,
        make_mesh,
        replicate,
        shard_batch,
    )
    from tests.multihost_worker import build_net, global_batch

    batch = 16
    net = build_net(batch)
    sess = Session(net, 0).compile_net()
    mesh = make_mesh(jax.devices("cpu")[:8])
    step = make_dp_train_step(net, mesh)
    params = replicate(mesh, sess.params)
    state = replicate(mesh, sess.state)
    opt = replicate(mesh, sess.opt_state)
    key = replicate(mesh, jax.random.PRNGKey(0))
    want = []
    for i in range(4):  # uninterrupted reference trajectory
        x, y = global_batch(batch, i)
        bt = shard_batch(mesh, {"input": x, "label": y})
        params, state, opt, loss = step(params, state, opt, bt, key)
        want.append(float(np.asarray(loss)))

    # ---- scale-DOWN: 2-process cluster dies after checkpointing step 2
    ckpt = str(tmp_path / "elastic.ckpt.npz")
    _launch_cluster([str(tmp_path / "unused.txt"), "resume_a", ckpt])
    p_np, s_np, o_np, extra = load_checkpoint(ckpt)
    assert int(np.asarray(extra["next_step"])) == 2

    # (a) resume on this process's 8-device mesh
    p8 = replicate(mesh, p_np)
    s8 = replicate(mesh, s_np)
    o8 = replicate(mesh, o_np)
    got8 = []
    for i in range(2, 4):
        x, y = global_batch(batch, i)
        bt = shard_batch(mesh, {"input": x, "label": y})
        p8, s8, o8, loss = step(p8, s8, o8, bt, key)
        got8.append(float(np.asarray(loss)))
    np.testing.assert_allclose(got8, want[2:], rtol=1e-5, atol=1e-7)

    # (b) resume on ONE device (full scale-down). Reload from disk: the
    # donated DP step above consumed p8/s8/o8, whose device-0 shards
    # ALIAS the load_checkpoint arrays (device_put reuses a matching
    # source buffer as a shard), so p_np/s_np/o_np are deleted now —
    # exactly what a real restart does anyway.
    p_np, s_np, o_np, _ = load_checkpoint(ckpt)
    step1 = make_train_step(net)
    p1 = {k: jax.numpy.asarray(v) for k, v in p_np.items()}
    s1 = {k: jax.numpy.asarray(v) for k, v in s_np.items()}
    o1 = jax.tree.map(jax.numpy.asarray, o_np)
    got1 = []
    for i in range(2, 4):
        x, y = global_batch(batch, i)
        p1, s1, o1, loss = step1(
            p1, s1, o1, {"input": x, "label": y}, jax.random.PRNGKey(0)
        )
        got1.append(float(np.asarray(loss)))
    np.testing.assert_allclose(got1, want[2:], rtol=1e-5, atol=1e-7)

    # ---- scale-UP: single device trains steps 0-1, a fresh 2-process
    # cluster restores the checkpoint and continues steps 2-3
    sess2 = Session(net, 0).compile_net()
    pu, su, ou = sess2.params, sess2.state, sess2.opt_state
    for i in range(2):
        x, y = global_batch(batch, i)
        pu, su, ou, _ = step1(
            pu, su, ou, {"input": x, "label": y}, jax.random.PRNGKey(0)
        )
    ckpt_up = str(tmp_path / "elastic_up.ckpt.npz")
    save_checkpoint(
        ckpt_up,
        {k: np.asarray(v) for k, v in pu.items()},
        {k: np.asarray(v) for k, v in su.items()},
        jax.tree.map(np.asarray, ou),
        extra={"next_step": 2},
    )
    outfile = str(tmp_path / "elastic_up_losses.txt")
    _launch_cluster([outfile, "resume_b", ckpt_up])
    got_up = [float(v) for v in open(outfile).read().split()]
    np.testing.assert_allclose(got_up, want[2:], rtol=1e-5, atol=1e-7)


def test_two_process_dp_training_matches_single_process(tmp_path):
    # reference trajectory on this process's 8-device CPU mesh
    import jax

    from bcnn_tpu import Session
    from bcnn_tpu.parallel import (
        make_dp_train_step,
        make_mesh,
        replicate,
        shard_batch,
    )
    from tests.multihost_worker import build_net, global_batch

    batch = 16
    net = build_net(batch)
    sess = Session(net, 0).compile_net()
    mesh = make_mesh(jax.devices("cpu")[:8])
    step = make_dp_train_step(net, mesh)
    params = replicate(mesh, sess.params)
    state = replicate(mesh, sess.state)
    opt = replicate(mesh, sess.opt_state)
    key = replicate(mesh, jax.random.PRNGKey(0))
    orig_params = {k: np.asarray(v) for k, v in sess.params.items()}
    orig_state = {k: np.asarray(v) for k, v in sess.state.items()}
    orig_opt = jax.tree.map(np.asarray, sess.opt_state)

    want = []
    for i in range(3):
        x, y = global_batch(batch, i)
        bt = shard_batch(mesh, {"input": x, "label": y})
        params, state, opt, loss = step(params, state, opt, bt, key)
        want.append(float(np.asarray(loss)))

    # DP x TP reference on this process's own 2-D mesh
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bcnn_tpu.parallel import (
        make_dp_tp_train_step,
        make_mesh_2d,
        shard_train_state,
    )

    mesh2 = make_mesh_2d(jax.devices("cpu")[:8], dp=2)
    step_tp = make_dp_tp_train_step(net, mesh2)
    p2, s2, o2 = shard_train_state(
        net, mesh2, orig_params, orig_state, orig_opt
    )
    key2 = jax.device_put(
        jax.random.PRNGKey(0), NamedSharding(mesh2, P())
    )
    bsh2 = NamedSharding(mesh2, P("batch"))
    for i in range(2):
        x, y = global_batch(batch, 10 + i)
        bt2 = {
            "input": jax.device_put(x, bsh2),
            "label": jax.device_put(y, bsh2),
        }
        p2, s2, o2, loss_tp = step_tp(p2, s2, o2, bt2, key2)
        want.append(float(np.asarray(loss_tp)))

    # two real processes, 4 devices each, coordinator over localhost gRPC
    port = _free_port()
    outfile = str(tmp_path / "losses.txt")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own 4-device forcing
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(WORKER))
    procs = [
        subprocess.Popen(
            [
                sys.executable, WORKER, f"localhost:{port}", "2", str(i),
                outfile,
            ],
            env=env,
            cwd=os.path.dirname(os.path.dirname(WORKER)),
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    try:
        outs = [p.communicate(timeout=420) for p in procs]
    finally:
        for p in procs:  # no orphaned jax.distributed workers on failure
            if p.poll() is None:
                p.kill()
                p.wait()
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{so[-2000:]}\n{se[-2000:]}"

    got = [float(v) for v in open(outfile).read().split()]
    assert len(got) == 5  # 3 DP steps + 2 DPxTP steps
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

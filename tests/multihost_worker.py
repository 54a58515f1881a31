"""Worker process for the real multi-process (DCN-analogue) test.

Launched by tests/test_multihost_process.py: each worker owns 4 CPU
devices, joins a 2-process jax.distributed cluster over localhost gRPC
(the DCN stand-in), builds the global 8-device mesh, and runs DP training
steps where every gradient all-reduce crosses the process boundary.
Not a pytest module (no test_ prefix) — also imported by the test for the
shared net/batch builders.
"""

import os
import sys


def build_net(batch, w=12, h=12, c=3, classes=4):
    from bcnn_tpu import Activation, FillerType, Loss, Metric, Mode, Net

    net = Net(Mode.TRAIN)
    net.set_input_shape(w, h, c, batch)
    net.set_sgd_optimizer(0.05, 0.9)
    net.add_convolutional_layer(
        8, 3, 1, 1, 1, 1, FillerType.XAVIER, Activation.RELU, 0,
        "input", "c1",
    )
    net.add_fullc_layer(
        classes, FillerType.XAVIER, Activation.NONE, 0, "c1", "f"
    )
    net.add_softmax_layer("f", "s")
    net.add_cost_layer(Loss.EUCLIDEAN, Metric.ERROR_RATE, 1.0, "s")
    return net


def global_batch(batch, step):
    import numpy as np

    rng = np.random.RandomState(100 + step)
    x = rng.randn(batch, 3, 12, 12).astype(np.float32)
    y = np.zeros((batch, 4, 1, 1), np.float32)
    y[np.arange(batch), rng.randint(0, 4, batch)] = 1.0
    return x, y


def run_loader_phase(proc_id, outfile, img_path, lbl_path):
    """Sharded streaming loaders end-to-end: each process reads only its
    stripe of the MNIST stream (multihost.shard_loader) and the cluster
    trains on the exact global batch order a single process would see."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bcnn_tpu import Session
    from bcnn_tpu.data.loaders import MnistLoader
    from bcnn_tpu.parallel import make_dp_train_step, multihost

    gbatch = 16
    local = gbatch // jax.process_count()
    step_net = build_net(gbatch, 28, 28, 1, 10)
    loader_net = build_net(local, 28, 28, 1, 10)
    loader = multihost.shard_loader(
        MnistLoader(loader_net, img_path, lbl_path)
    )
    sess = Session(step_net, 0).compile_net()
    mesh = multihost.global_mesh()
    step = make_dp_train_step(step_net, mesh)
    repl = NamedSharding(mesh, P())
    rep = lambda v: jax.make_array_from_process_local_data(  # noqa: E731
        repl, np.asarray(v)
    )
    params = {k: rep(v) for k, v in sess.params.items()}
    state = {k: rep(v) for k, v in sess.state.items()}
    opt = jax.tree.map(rep, sess.opt_state)
    key = rep(jax.random.PRNGKey(0))
    losses = []
    for _ in range(3):
        x, y = loader.next_batch()  # this process's stripe only
        bt = multihost.host_local_batch(
            mesh, x, y.reshape(local, -1, 1, 1)
        )
        params, state, opt, loss = step(params, state, opt, bt, key)
        losses.append(float(np.asarray(loss)))
    if proc_id == 0:
        with open(outfile, "w") as fp:
            fp.write(" ".join(f"{v:.8e}" for v in losses))


def run_fsdp_phase(proc_id, outfile):
    """FSDP (ZeRO-3) across the process boundary: parameters and optimizer
    slots are sharded over the global batch axis, so half of every weight
    lives in EACH process — the per-use all-gather and the grad
    reduce-scatter both cross the DCN stand-in. Loss trajectory must match
    the single-process DP reference (same math, sharded memory)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bcnn_tpu import Session
    from bcnn_tpu.parallel import (
        make_fsdp_train_step,
        multihost,
        shard_zero_state,
        zero_param_specs,
    )

    batch = 16
    net = build_net(batch)
    sess = Session(net, 0).compile_net()
    mesh = multihost.global_mesh()
    step = make_fsdp_train_step(net, mesh)
    # every process has the full seed-0 value; make_array_from_callback
    # hands each device exactly its shard of it
    put = lambda v, sh: jax.make_array_from_callback(  # noqa: E731
        np.asarray(v).shape, sh, lambda idx, _v=np.asarray(v): _v[idx]
    )
    params, state, opt = shard_zero_state(
        net, mesh, sess.params, sess.state, sess.opt_state,
        params_too=True, put=put,
    )
    # prove the model is really split across the processes: this process's
    # addressable shards of the largest weight hold only half its elements
    zspecs = zero_param_specs(net, mesh)
    key_w = max(
        (k for k, s in zspecs.items() if s != P()),
        key=lambda k: sess.params[k].size,
    )
    local_elems = sum(
        int(np.prod(s.data.shape))
        for s in params[key_w].addressable_shards
    )
    assert local_elems * jax.process_count() == sess.params[key_w].size, (
        local_elems, sess.params[key_w].size
    )

    rng_key = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P()), np.asarray(jax.random.PRNGKey(0))
    )
    losses = []
    for i in range(3):
        x, y = global_batch(batch, i)
        start, size = multihost.process_batch_slice(batch)
        bt = multihost.host_local_batch(
            mesh, x[start:start + size], y[start:start + size]
        )
        params, state, opt, loss = step(params, state, opt, bt, rng_key)
        losses.append(float(np.asarray(loss)))
    if proc_id == 0:
        with open(outfile, "w") as fp:
            fp.write(" ".join(f"{v:.8e}" for v in losses))


def run_resume_phase(phase, proc_id, outfile, ckpt_path):
    """Fault-recovery across the cluster boundary: phase A trains 2 steps
    and checkpoints (then the cluster dies); phase B is a FRESH cluster
    that restores the checkpoint and continues steps 2-3. The B losses
    must continue the uninterrupted trajectory."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from bcnn_tpu import Session
    from bcnn_tpu.checkpoint import load_checkpoint, save_checkpoint
    from bcnn_tpu.parallel import make_dp_train_step, multihost

    batch = 16
    net = build_net(batch)
    mesh = multihost.global_mesh()
    step = make_dp_train_step(net, mesh)
    repl = NamedSharding(mesh, P())
    rep = lambda v: jax.make_array_from_process_local_data(  # noqa: E731
        repl, np.asarray(v)
    )
    if phase == "resume_a":
        sess = Session(net, 0).compile_net()
        params = {k: rep(v) for k, v in sess.params.items()}
        state = {k: rep(v) for k, v in sess.state.items()}
        opt = jax.tree.map(rep, sess.opt_state)
        steps = range(0, 2)
    else:
        p_np, s_np, o_np, extra = load_checkpoint(ckpt_path)
        assert int(np.asarray(extra["next_step"])) == 2
        params = {k: rep(v) for k, v in p_np.items()}
        state = {k: rep(v) for k, v in s_np.items()}
        opt = jax.tree.map(rep, o_np)
        steps = range(2, 4)
    key = rep(jax.random.PRNGKey(0))

    losses = []
    for i in steps:
        x, y = global_batch(batch, i)
        start, size = multihost.process_batch_slice(batch)
        bt = multihost.host_local_batch(
            mesh, x[start:start + size], y[start:start + size]
        )
        params, state, opt, loss = step(params, state, opt, bt, key)
        losses.append(float(np.asarray(loss)))

    if phase == "resume_a":
        if proc_id == 0:
            # replicated arrays: device 0's shard is the full value
            full = lambda v: np.asarray(v.addressable_data(0))  # noqa: E731
            save_checkpoint(
                ckpt_path,
                {k: full(v) for k, v in params.items()},
                {k: full(v) for k, v in state.items()},
                jax.tree.map(full, opt),
                extra={"next_step": 2},
            )
    elif proc_id == 0:
        with open(outfile, "w") as fp:
            fp.write(" ".join(f"{v:.8e}" for v in losses))


def main():
    coordinator, n_proc, proc_id, outfile = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    phase = sys.argv[5] if len(sys.argv) > 5 else "base"
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from bcnn_tpu import Session
    from bcnn_tpu.parallel import make_dp_train_step, multihost

    multihost.initialize(
        coordinator_address=coordinator,
        num_processes=n_proc,
        process_id=proc_id,
    )
    assert jax.process_count() == n_proc, jax.process_count()
    assert jax.device_count() == 4 * n_proc, jax.device_count()
    assert jax.local_device_count() == 4

    if phase == "loader":
        run_loader_phase(proc_id, outfile, sys.argv[6], sys.argv[7])
        jax.distributed.shutdown()
        return
    if phase == "fsdp":
        run_fsdp_phase(proc_id, outfile)
        jax.distributed.shutdown()
        return
    if phase in ("resume_a", "resume_b"):
        run_resume_phase(phase, proc_id, outfile, sys.argv[6])
        jax.distributed.shutdown()
        return

    batch = 16
    net = build_net(batch)
    sess = Session(net, 0).compile_net()
    mesh = multihost.global_mesh()
    step = make_dp_train_step(net, mesh)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    # replicated leaves: every process contributes the same full value
    rep = lambda v: jax.make_array_from_process_local_data(  # noqa: E731
        repl, np.asarray(v)
    )
    params = {k: rep(v) for k, v in sess.params.items()}
    state = {k: rep(v) for k, v in sess.state.items()}
    opt = jax.tree.map(rep, sess.opt_state)
    rng_key = rep(jax.random.PRNGKey(0))

    orig_params = {k: np.asarray(v) for k, v in sess.params.items()}
    orig_state = {k: np.asarray(v) for k, v in sess.state.items()}
    orig_opt = jax.tree.map(np.asarray, sess.opt_state)

    losses = []
    for i in range(3):
        x, y = global_batch(batch, i)
        start, size = multihost.process_batch_slice(batch)
        bt = multihost.host_local_batch(
            mesh, x[start:start + size], y[start:start + size]
        )
        params, state, opt, loss = step(params, state, opt, bt, rng_key)
        # loss is fully replicated -> each process reads it directly
        losses.append(float(np.asarray(loss)))

    # DP x TP on a 2-D (batch=2, model=4) mesh: the batch axis spans the
    # two processes (grad all-reduce over the DCN stand-in) while the
    # channel-sharded weights keep their TP collectives inside each
    # process — the canonical "model-parallel rides ICI, data-parallel
    # rides DCN" layout.
    from bcnn_tpu.parallel import (
        make_dp_tp_train_step,
        make_mesh_2d,
        shard_train_state,
    )

    mesh2 = make_mesh_2d(jax.devices(), dp=2)
    step_tp = make_dp_tp_train_step(net, mesh2)
    p2, s2, o2 = shard_train_state(
        net, mesh2, orig_params, orig_state, orig_opt,
        put=lambda v, sh: jax.make_array_from_process_local_data(
            sh, np.asarray(v)
        ),
    )
    key2 = jax.make_array_from_process_local_data(
        NamedSharding(mesh2, P()), np.asarray(jax.random.PRNGKey(0))
    )
    bsh2 = NamedSharding(mesh2, P("batch"))
    for i in range(2):
        x, y = global_batch(batch, 10 + i)
        half = batch // 2
        lo = proc_id * half
        bt2 = {
            "input": jax.make_array_from_process_local_data(
                bsh2, x[lo:lo + half]
            ),
            "label": jax.make_array_from_process_local_data(
                bsh2, y[lo:lo + half]
            ),
        }
        p2, s2, o2, loss_tp = step_tp(p2, s2, o2, bt2, key2)
        losses.append(float(np.asarray(loss_tp)))

    if proc_id == 0:
        with open(outfile, "w") as fp:
            fp.write(" ".join(f"{v:.8e}" for v in losses))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()

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


def build_net(batch):
    from bcnn_tpu import Activation, FillerType, Loss, Metric, Mode, Net

    net = Net(Mode.TRAIN)
    net.set_input_shape(12, 12, 3, batch)
    net.set_sgd_optimizer(0.05, 0.9)
    net.add_convolutional_layer(
        8, 3, 1, 1, 1, 1, FillerType.XAVIER, Activation.RELU, 0,
        "input", "c1",
    )
    net.add_fullc_layer(
        4, FillerType.XAVIER, Activation.NONE, 0, "c1", "f"
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


def main():
    coordinator, n_proc, proc_id, outfile = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
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

"""Coverage for profiling and debug utilities."""

import numpy as np
import pytest

from bcnn_tpu import Mode, Session
from bcnn_tpu.debug import check_pytree_finite
from bcnn_tpu.models import lenet_mnist
from bcnn_tpu.profiling import print_profile, profile_forward


def test_profile_forward_reports_all_nodes(capsys):
    net = lenet_mnist(batch_size=2, mode=Mode.PREDICT)
    sess = Session(net, 0).compile_net()
    x = np.random.RandomState(0).randn(2, 1, 28, 28).astype(np.float32)
    timings = profile_forward(sess, x, runs=1)
    assert len(timings) == len(net.nodes)
    assert all(t >= 0 for _, _, t in timings)
    types = [t for t, _, _ in timings]
    assert "CONV2D" in types and "SOFTMAX" in types
    print_profile(timings)
    out = capsys.readouterr().out
    assert "total" in out and "CONV2D" in out


def test_memory_report_on_forward_and_train_step():
    from bcnn_tpu.compile import make_train_step
    from bcnn_tpu.profiling import memory_report

    net = lenet_mnist(batch_size=4, mode=Mode.PREDICT)
    sess = Session(net, 0).compile_net()
    x = np.random.RandomState(0).randn(4, 1, 28, 28).astype(np.float32)

    from bcnn_tpu.compile import execute
    from bcnn_tpu.types import Mode as M

    def fwd(params, state, xin):
        ex = execute(net, params, state, {"input": xin}, M.PREDICT, None)
        return ex.values[max(ex.values)]  # last produced tensor

    rep = memory_report(fwd, sess.params, sess.state, x)
    assert rep.get("argument_size_in_bytes", 0) > 0
    assert rep.get("output_size_in_bytes", 0) > 0
    # lenet batch-4 forward args: params + 28x28 input, well under 100 MB
    assert rep["argument_size_in_bytes"] < 100e6
    if "flops" in rep:
        assert rep["flops"] > 1e6  # conv layers dominate

    # the train step compiles and reports too (donation shows up as alias)
    import jax

    tnet = lenet_mnist(batch_size=4, mode=Mode.TRAIN)
    tsess = Session(tnet, 0).compile_net()
    step = make_train_step(tnet)
    y = np.zeros((4, 10, 1, 1), np.float32)
    y[:, 0] = 1
    rep2 = memory_report(
        step, tsess.params, tsess.state, tsess.opt_state,
        {"input": x, "label": y}, jax.random.PRNGKey(0),
    )
    assert rep2.get("argument_size_in_bytes", 0) > 0


def test_check_pytree_finite():
    ok = {"a": np.ones(3), "b": {"c": np.zeros(2)}}
    check_pytree_finite(ok, "ok")
    bad = {"a": np.array([1.0, np.nan])}
    with pytest.raises(FloatingPointError):
        check_pytree_finite(bad, "bad")

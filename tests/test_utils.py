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


def test_check_pytree_finite():
    ok = {"a": np.ones(3), "b": {"c": np.zeros(2)}}
    check_pytree_finite(ok, "ok")
    bad = {"a": np.array([1.0, np.nan])}
    with pytest.raises(FloatingPointError):
        check_pytree_finite(bad, "bad")

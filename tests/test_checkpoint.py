"""Checkpoint/resume: full state round-trips and training continues
identically after resume (unlike the reference, which loses optimizer
state, SURVEY.md §5)."""

import numpy as np
import pytest

from bcnn_tpu import Mode, Session
from bcnn_tpu.models import lenet_mnist


def batch(rng, n=16):
    lab = rng.randint(0, 10, n)
    x = rng.randn(n, 1, 28, 28).astype(np.float32) * 0.1
    for i, c in enumerate(lab):
        x[i, 0, c : c + 8, c : c + 8] += 1.0
    y = np.zeros((n, 10, 1, 1), np.float32)
    y[np.arange(n), lab] = 1.0
    return x, y


def test_checkpoint_resume_bitexact(tmp_path):
    rng = np.random.RandomState(0)
    batches = [batch(rng) for _ in range(6)]

    s1 = Session(lenet_mnist(16), seed=0).compile_net()
    for x, y in batches[:3]:
        s1.train_on_batch(x, y)
    ckpt = str(tmp_path / "ck.npz")
    s1.save_checkpoint(ckpt)
    for x, y in batches[3:]:
        s1.train_on_batch(x, y)

    s2 = Session(lenet_mnist(16), seed=1).compile_net()
    s2.load_checkpoint(ckpt)
    # resume must continue the momentum/seen state exactly; the dropout rng
    # differs but this net has no dropout
    s2._rng = s1._rng  # not used by this net; keep equal anyway
    for x, y in batches[3:]:
        s2.train_on_batch(x, y)

    for k in s1.params:
        np.testing.assert_allclose(
            np.asarray(s1.params[k]), np.asarray(s2.params[k]),
            rtol=1e-6, atol=1e-7, err_msg=k,
        )
    assert int(s1.opt_state["seen"]) == int(s2.opt_state["seen"])


def test_orbax_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from bcnn_tpu.checkpoint import (
        load_checkpoint_orbax, save_checkpoint_orbax,
    )

    s = Session(lenet_mnist(8), seed=0).compile_net()
    x, y = batch(np.random.RandomState(2), 8)
    s.train_on_batch(x, y)
    p = str(tmp_path / "ckpt_dir")
    save_checkpoint_orbax(
        p, s.params, s.state, s.opt_state, extra={"step_count": 1}
    )
    params, state, opt, extra = load_checkpoint_orbax(p)
    assert extra["step_count"] == 1
    for k in s.params:
        np.testing.assert_allclose(
            np.asarray(params[k]), np.asarray(s.params[k]), rtol=1e-6
        )
    assert int(np.asarray(opt["seen"])) == 8



def test_checkpoint_keeps_opt_state(tmp_path):
    s = Session(lenet_mnist(16), seed=0).compile_net()
    x, y = batch(np.random.RandomState(1))
    s.train_on_batch(x, y)
    p = str(tmp_path / "c.npz")
    s.save_checkpoint(p)
    from bcnn_tpu.checkpoint import load_checkpoint

    params, state, opt, extra = load_checkpoint(p)
    assert int(opt["seen"]) == 16
    assert extra["step_count"] == 1
    assert set(params) == set(s.params)
    assert any("run_mean" in k for k in state)

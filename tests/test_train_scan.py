"""make_train_scan must match the per-step loop exactly."""

import jax
import numpy as np

from bcnn_tpu import Session
from bcnn_tpu.compile import make_train_scan, make_train_step
from bcnn_tpu.models import lenet_mnist


def test_scan_matches_loop():
    k, b = 4, 8
    rng = np.random.RandomState(0)
    xs = rng.randn(k, b, 1, 28, 28).astype(np.float32)
    ys = np.zeros((k, b, 10, 1, 1), np.float32)
    ys[..., 3, 0, 0] = 1.0
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, k)

    s1 = Session(lenet_mnist(b), seed=0).compile_net()
    step = make_train_step(lenet_mnist(b))
    p, st, o = s1.params, s1.state, s1.opt_state
    losses_loop = []
    for i in range(k):
        p, st, o, loss = step(
            p, st, o, {"input": xs[i], "label": ys[i]}, keys[i]
        )
        losses_loop.append(float(loss))

    s2 = Session(lenet_mnist(b), seed=0).compile_net()
    scan = make_train_scan(lenet_mnist(b))
    p2, st2, o2, losses = scan(
        s2.params, s2.state, s2.opt_state,
        {"input": xs, "label": ys}, key,
    )
    np.testing.assert_allclose(
        np.asarray(losses), losses_loop, rtol=1e-5, atol=1e-6
    )
    for kk in p:
        np.testing.assert_allclose(
            np.asarray(p[kk]), np.asarray(p2[kk]), rtol=1e-5, atol=1e-6,
            err_msg=kk,
        )

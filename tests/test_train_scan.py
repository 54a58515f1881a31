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


def test_resident_scan_matches_staged():
    """make_train_scan_resident(dataset, idx) must be bit-equal to
    make_train_scan on the batches those indices gather: same rng tree,
    same augment stream, the only difference is WHERE the gather runs."""
    from bcnn_tpu.compile import make_train_scan_resident

    k, b, n = 3, 8, 20
    rng = np.random.RandomState(1)
    ds_x = rng.randint(0, 256, (n, 1, 28, 28)).astype(np.uint8)
    ds_y = np.zeros((n, 10, 1, 1), np.float32)
    ds_y[np.arange(n), rng.randint(0, 10, n)] = 1.0
    idx = rng.randint(0, n, (k, b)).astype(np.int32)
    key = jax.random.PRNGKey(3)
    aug = {"random_fliph": 1, "min_brightness": -20, "max_brightness": 20}

    def build():
        net = lenet_mnist(b)
        net.device_augment = aug
        return net

    s1 = Session(build(), seed=0).compile_net()
    scan = make_train_scan(build())
    p1, _, _, l1 = scan(
        s1.params, s1.state, s1.opt_state,
        {"input": ds_x[idx], "label": ds_y[idx]}, key,
    )

    s2 = Session(build(), seed=0).compile_net()
    rscan = make_train_scan_resident(build())
    p2, _, _, l2 = rscan(
        s2.params, s2.state, s2.opt_state,
        {"input": ds_x, "label": ds_y}, idx, key,
    )
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    for kk in p1:
        np.testing.assert_array_equal(
            np.asarray(p1[kk]), np.asarray(p2[kk]), err_msg=kk
        )


def test_epoch_index_stream():
    from bcnn_tpu.data import EpochIndexStream

    # sequential mode = RawRecordLoader's mod-n order
    s = EpochIndexStream(10, 4, shuffle=False)
    got = s.next(3)
    np.testing.assert_array_equal(
        got.ravel(), np.arange(12) % 10
    )

    # shuffle: every epoch is a permutation, epochs differ, and a
    # checkpointed pos resumes the exact sequence
    s = EpochIndexStream(10, 5, seed=7)
    e0 = s.next(2).ravel()
    e1 = s.next(2).ravel()
    assert sorted(e0) == list(range(10))
    assert sorted(e1) == list(range(10))
    assert not np.array_equal(e0, e1)
    pos = s.pos
    ahead = s.next(3)
    s2 = EpochIndexStream(10, 5, seed=7)
    s2.pos = pos
    np.testing.assert_array_equal(ahead, s2.next(3))


def test_read_all_roundtrip(tmp_path):
    from bcnn_tpu.data import RawRecordLoader, write_records
    from bcnn_tpu.graph import Net
    from bcnn_tpu.types import Mode

    n, c, h, w, lab = 6, 3, 5, 4, 7
    rng = np.random.RandomState(0)
    xs = rng.randint(0, 256, (n, c, h, w)).astype(np.uint8)
    ys = rng.randn(n, lab).astype(np.float32)
    p = str(tmp_path / "r.bcrd")
    write_records(p, zip(xs, ys), c, h, w, lab)
    net = Net(Mode.TRAIN)
    net.set_input_shape(w, h, c, 2)
    rl = RawRecordLoader(net, p)
    ax, ay = rl.read_all()
    np.testing.assert_array_equal(ax, xs)
    np.testing.assert_array_equal(ay, ys)

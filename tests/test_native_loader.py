"""Native (C++) batched loader vs the pure-Python per-sample path.

The native path (native/loader.cpp via data/native_loader.py) must be
BIT-identical to the Python loaders across epochs (auto-rewind), mode
switches (eval stream rewind), center crop, raw mode and every
normalization variant — it is the same streaming-iterator contract
(bcnn_loader_next, bcnn_data.c:392-427) assembled batch-at-a-time."""

import numpy as np
import pytest

from bcnn_tpu.data.loaders import Cifar10Loader, MnistLoader
from bcnn_tpu.types import Mode

from test_data import make_net, write_mnist


def _native_available():
    from bcnn_tpu.data import native_loader

    return native_loader._lib() is not None


needs_native = pytest.mark.skipif(
    not _native_available(), reason="native loader lib unavailable"
)


def _collect(build, monkeypatch, native: bool):
    if native:
        monkeypatch.delenv("BCNN_TPU_NATIVE_LOADER", raising=False)
    else:
        monkeypatch.setenv("BCNN_TPU_NATIVE_LOADER", "0")
    ld = build()
    outs = []
    for _ in range(4):  # wraps the small files -> exercises auto-rewind
        outs.append(ld.next_batch())
    ld.set_mode(Mode.VALID)
    outs.append(ld.next_batch())
    ld.set_mode(Mode.TRAIN)
    outs.append(ld.next_batch())
    ld.close()
    return outs


def _assert_same(a, b):
    assert len(a) == len(b)
    for (xa, ya), (xb, yb) in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)


@needs_native
def test_mnist_native_matches_python(tmp_path, monkeypatch):
    pimg, plbl, _, _ = write_mnist(tmp_path, n=10)

    def build():
        return MnistLoader(make_net(batch=7), pimg, plbl)

    _assert_same(
        _collect(build, monkeypatch, True),
        _collect(build, monkeypatch, False),
    )


@needs_native
def test_mnist_native_center_crop_and_test_stream(tmp_path, monkeypatch):
    pimg, plbl, _, _ = write_mnist(tmp_path, n=9)
    tim, tlb, _, _ = write_mnist(tmp_path, n=6, seed=3, name="t10k")

    def build():
        # 24x24 net over 28x28 images -> deterministic center crop
        return MnistLoader(make_net(w=24, h=24, batch=5), pimg, plbl,
                           tim, tlb)

    _assert_same(
        _collect(build, monkeypatch, True),
        _collect(build, monkeypatch, False),
    )


@needs_native
def test_mnist_native_raw_mode(tmp_path, monkeypatch):
    pimg, plbl, _, _ = write_mnist(tmp_path, n=8)

    def build():
        net = make_net(batch=6)
        net.device_augment = {}  # raw pixels for on-device augmentation
        return MnistLoader(net, pimg, plbl)

    a = _collect(build, monkeypatch, True)
    _assert_same(a, _collect(build, monkeypatch, False))
    assert a[0][0].max() > 2.0  # raw [0,255], not normalized


def _write_cifar(tmp_path, n=10, seed=1):
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, 10, n)
    chws = rng.randint(0, 255, (n, 3, 32, 32)).astype(np.uint8)
    p = tmp_path / "data_batch_1.bin"
    with open(p, "wb") as f:
        for i in range(n):
            f.write(bytes([labels[i]]))
            chws[i].tofile(f)
    return str(p)


@needs_native
@pytest.mark.parametrize(
    "aug",
    [
        {},
        {"swap_to_bgr": 1},
        {"no_input_norm": 1},
        {"mean_r": 0.4, "mean_g": 0.45, "mean_b": 0.5},
    ],
)
def test_cifar_native_matches_python(tmp_path, monkeypatch, aug):
    path = _write_cifar(tmp_path)

    def build():
        net = make_net(32, 32, 3, batch=4)
        net.data_aug = aug
        return Cifar10Loader(net, path)

    _assert_same(
        _collect(build, monkeypatch, True),
        _collect(build, monkeypatch, False),
    )


@needs_native
def test_native_loader_is_actually_used(tmp_path, monkeypatch):
    """Guard against the fast path silently degrading to Python: with the
    lib present and an identity augmenter, next_batch must route through
    native_loader.mnist_batch."""
    from bcnn_tpu.data import native_loader

    pimg, plbl, _, _ = write_mnist(tmp_path, n=8)
    called = {}
    orig = native_loader.mnist_batch

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    monkeypatch.setattr(native_loader, "mnist_batch", spy)
    ld = MnistLoader(make_net(batch=4), pimg, plbl)
    ld.next_batch()
    assert called.get("yes")

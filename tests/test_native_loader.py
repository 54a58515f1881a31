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


# --------------------------------------------------------------------- #
# Native JPEG/PNG decode (native/decode.cpp, round 4 — VERDICT r3 #7)
# --------------------------------------------------------------------- #


def _codecs_available():
    from bcnn_tpu.bip import native

    return native.available() and native.decode_available()


@pytest.mark.skipif(
    not _codecs_available(), reason="libjpeg/libpng codecs unavailable"
)
class TestNativeDecode:
    def _save(self, tmp_path, img, name, **kw):
        from PIL import Image

        p = str(tmp_path / name)
        mode = {1: "L", 3: "RGB", 4: "RGBA"}[
            img.shape[2] if img.ndim == 3 else 1
        ]
        Image.fromarray(img.squeeze(), mode).save(p, **kw)
        return p

    def test_png_bit_identical_to_pil(self, tmp_path):
        from bcnn_tpu.bip import native, ops

        rng = np.random.RandomState(0)
        img = (rng.rand(41, 57, 3) * 255).astype(np.uint8)
        p = self._save(tmp_path, img, "a.png")
        np.testing.assert_array_equal(
            native.load_image(p), ops.load_image(p)
        )

    def test_jpeg_matches_pil(self, tmp_path):
        # both wrap the same system/vendored libjpeg-turbo; exact on this
        # image, tolerance 1 guards alternative IDCTs
        from bcnn_tpu.bip import native, ops

        rng = np.random.RandomState(1)
        img = (rng.rand(64, 48, 3) * 255).astype(np.uint8)
        p = self._save(tmp_path, img, "a.jpg", quality=90)
        a = native.load_image(p).astype(int)
        b = ops.load_image(p).astype(int)
        assert a.shape == b.shape
        assert np.abs(a - b).max() <= 1

    def test_gray_stays_single_channel(self, tmp_path):
        from bcnn_tpu.bip import native, ops

        img = (np.random.RandomState(2).rand(30, 20) * 255).astype(np.uint8)
        p = self._save(tmp_path, img, "g.png")
        a = native.load_image(p)
        assert a.shape == (30, 20, 1)
        np.testing.assert_array_equal(a, ops.load_image(p))

    def test_rgba_drops_alpha_like_pil_convert(self, tmp_path):
        from bcnn_tpu.bip import native, ops

        rng = np.random.RandomState(3)
        img = (rng.rand(22, 26, 4) * 255).astype(np.uint8)
        p = self._save(tmp_path, img, "r.png")
        a = native.load_image(p)
        assert a.shape == (22, 26, 3)
        np.testing.assert_array_equal(a, ops.load_image(p))

    def test_unsupported_format_falls_back_to_pil(self, tmp_path):
        from bcnn_tpu import bip

        img = (np.random.RandomState(4).rand(10, 12, 3) * 255).astype(
            np.uint8
        )
        p = self._save(tmp_path, img, "b.bmp")
        np.testing.assert_array_equal(bip.load_image(p), img)

    def test_batch_decode_matches_single(self, tmp_path):
        from bcnn_tpu.bip import native

        rng = np.random.RandomState(5)
        paths = []
        for i, (h, w) in enumerate([(33, 44), (20, 20), (50, 10)]):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            paths.append(self._save(tmp_path, img, f"m{i}.png"))
        blobs = [open(p, "rb").read() for p in paths]
        outs = native.decode_batch(blobs)
        for p, o in zip(paths, outs):
            np.testing.assert_array_equal(o, native.load_image(p))

    def test_corrupt_blob_raises(self):
        from bcnn_tpu.bip import native

        with pytest.raises(ValueError):
            native.decode_image_bytes(b"\x89PNG\r\n\x1a\nnot a real png")
        with pytest.raises(ValueError):
            native.decode_image_bytes(b"garbage")

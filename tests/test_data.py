"""Data pipeline tests: idx/cifar formats, streaming rewind, augmentation
op order, normalization, letterbox detection labels."""

import os
import struct

import numpy as np
import pytest

from bcnn_tpu import Mode, Net
from bcnn_tpu.data import (
    Augmenter,
    Cifar10Loader,
    DetectionListLoader,
    MnistLoader,
    convert_img_to_float,
)
from bcnn_tpu import bip


def write_mnist(tmp_path, n=40, hw=28, seed=0, name="train"):
    """Synthetic idx files: label-correlated bright squares + noise."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, 10, n).astype(np.uint8)
    imgs = (rng.rand(n, hw, hw) * 40).astype(np.uint8)
    for i, c in enumerate(labels):
        r, col = divmod(int(c), 4)
        imgs[i, 2 + r * 8 : 8 + r * 8, 2 + col * 6 : 8 + col * 6] = 250
    pimg = tmp_path / f"{name}-images.idx3-ubyte"
    plbl = tmp_path / f"{name}-labels.idx1-ubyte"
    with open(pimg, "wb") as f:
        f.write(struct.pack(">4i", 0x803, n, hw, hw))
        imgs.tofile(f)
    with open(plbl, "wb") as f:
        f.write(struct.pack(">2i", 0x801, n))
        labels.tofile(f)
    return str(pimg), str(plbl), imgs, labels


def make_net(w=28, h=28, c=1, batch=8, label=10):
    net = Net(Mode.TRAIN)
    net.set_input_shape(w, h, c, batch)
    t1 = net.tensors[1]
    t1.n, t1.c, t1.h, t1.w = batch, label, 1, 1
    return net


def test_mnist_loader_roundtrip(tmp_path):
    pimg, plbl, imgs, labels = write_mnist(tmp_path)
    net = make_net()
    loader = MnistLoader(net, pimg, plbl)
    x, y = loader.next_batch()
    assert x.shape == (8, 1, 28, 28)
    assert y.shape == (8, 10)
    # value mapping: uint8 250 -> (250-127.5)/127.5
    got = x[0, 0]
    want = (imgs[0].astype(np.float32) - 127.5) / 127.5
    np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_array_equal(np.argmax(y, 1), labels[:8])


def test_mnist_loader_rewinds(tmp_path):
    pimg, plbl, imgs, labels = write_mnist(tmp_path, n=5)
    net = make_net(batch=12)
    loader = MnistLoader(net, pimg, plbl)
    x, y = loader.next_batch()  # needs 12 samples from 5 -> wraps
    np.testing.assert_array_equal(
        np.argmax(y, 1), np.concatenate([labels, labels, labels[:2]])
    )


def test_mnist_mode_switch_rewinds_test_stream(tmp_path):
    pimg, plbl, _, labels = write_mnist(tmp_path, n=6, name="train")
    tim, tlb, _, tlabels = write_mnist(tmp_path, n=6, seed=7, name="t10k")
    net = make_net(batch=3)
    loader = MnistLoader(net, pimg, plbl, tim, tlb)
    loader.set_mode(Mode.VALID)
    _, y1 = loader.next_batch()
    loader.set_mode(Mode.TRAIN)
    loader.set_mode(Mode.VALID)  # must rewind test stream
    _, y2 = loader.next_batch()
    np.testing.assert_array_equal(y1, y2)


def test_sharded_streams_partition_global_batches(tmp_path):
    """DataLoader.set_shard: P sharded loaders (per-host batch b) must
    jointly reproduce, without overlap, exactly the batches a single
    loader with batch P*b reads — including the EOF auto-rewind inside a
    striped epoch."""
    n = 22  # not a multiple of the global batch: exercises rewind
    pimg, plbl, imgs, labels = write_mnist(tmp_path, n=n)
    b, P = 4, 2

    net_g = make_net(batch=b * P)
    ref = MnistLoader(net_g, pimg, plbl)
    shards = []
    for p in range(P):
        net_s = make_net(batch=b)
        ld = MnistLoader(net_s, pimg, plbl)
        ld.set_shard(p, P)
        shards.append(ld)

    for _ in range(7):  # crosses the n=22 rewind repeatedly
        xg, yg = ref.next_batch()
        for p, ld in enumerate(shards):
            xs, ys = ld.next_batch()
            np.testing.assert_array_equal(xs, xg[p * b : (p + 1) * b])
            np.testing.assert_array_equal(ys, yg[p * b : (p + 1) * b])


def test_sharded_list_loader_partitions(tmp_path):
    """Same striping contract for a line-oriented loader (classification
    list): skips are readline-only, no image decode."""
    from bcnn_tpu.data.loaders import ClassificationListLoader

    rng = np.random.RandomState(2)
    lines = []
    for i in range(10):
        img = (rng.rand(8, 8, 3) * 255).astype(np.uint8)
        p = tmp_path / f"s{i}.png"
        bip.write_image(str(p), img)
        lines.append(f"{p} {i % 4}")
    lst = tmp_path / "cl.txt"
    lst.write_text("\n".join(lines) + "\n")

    b, P = 2, 2
    net_g = make_net(8, 8, 3, batch=b * P, label=4)
    net_g.mode = Mode.VALID
    ref = ClassificationListLoader(net_g, str(lst))
    ref.set_mode(Mode.VALID)
    shards = []
    for p in range(P):
        net_s = make_net(8, 8, 3, batch=b, label=4)
        net_s.mode = Mode.VALID
        ld = ClassificationListLoader(net_s, str(lst))
        ld.set_mode(Mode.VALID)
        ld.set_shard(p, P)
        shards.append(ld)
    for _ in range(5):
        xg, yg = ref.next_batch()
        for p, ld in enumerate(shards):
            xs, ys = ld.next_batch()
            np.testing.assert_array_equal(xs, xg[p * b : (p + 1) * b])
            np.testing.assert_array_equal(ys, yg[p * b : (p + 1) * b])


def test_cifar10_loader(tmp_path):
    rng = np.random.RandomState(1)
    n = 10
    recs = []
    labels = rng.randint(0, 10, n)
    chws = rng.randint(0, 255, (n, 3, 32, 32)).astype(np.uint8)
    p = tmp_path / "data_batch_1.bin"
    with open(p, "wb") as f:
        for i in range(n):
            f.write(bytes([labels[i]]))
            chws[i].tofile(f)
    net = make_net(32, 32, 3, batch=4)
    loader = Cifar10Loader(net, str(p))
    loader.augmenter.rng = np.random.RandomState(0)
    net.mode = Mode.VALID
    loader.set_mode(Mode.VALID)
    x, y = loader.next_batch()
    # CHW->HWC swap then normalize then back to CHW: net value == raw CHW
    want = (chws[0].astype(np.float32) - 127.5) / 127.5
    np.testing.assert_allclose(x[0], want, atol=1e-6)
    assert np.argmax(y[0]) == labels[0]


def test_detection_loader_letterbox_labels(tmp_path):
    # one 64x32 landscape image (ratio 2): letterbox into 32x32 net
    img = np.zeros((32, 64, 3), np.uint8)
    img[:, :, 0] = 200
    ip = tmp_path / "im.png"
    bip.write_image(str(ip), img)
    lst = tmp_path / "list.txt"
    # class 1, centered box covering half the image
    lst.write_text(f"{ip} 1 0.5 0.5 0.4 0.6\n")
    net = make_net(32, 32, 3, batch=1, label=250)
    from bcnn_tpu.types import DETECTION_MAX_BOXES

    t1 = net.tensors[1]
    t1.c, t1.h, t1.w = 1, 1, DETECTION_MAX_BOXES * 5
    net.mode = Mode.VALID
    loader = DetectionListLoader(net, str(lst))
    loader.set_mode(Mode.VALID)
    x, y = loader.next_batch()
    # nw=32, nh=16 -> dy=8 centered; box y = 0.5*(16/32) + 8/32 = 0.5
    np.testing.assert_allclose(y[0, 0], 0.5, atol=1e-6)
    np.testing.assert_allclose(y[0, 1], 0.5, atol=1e-6)
    np.testing.assert_allclose(y[0, 2], 0.4, atol=1e-6)
    np.testing.assert_allclose(y[0, 3], 0.6 * 0.5, atol=1e-6)
    assert y[0, 4] == 1.0
    # gray letterbox bands at top: value (128-127.5)/127.5
    np.testing.assert_allclose(x[0, 0, 0, 0], (128 - 127.5) / 127.5)
    np.testing.assert_allclose(x[0, 0, 16, 16], (200 - 127.5) / 127.5)


def test_classification_list_loader(tmp_path):
    rng = np.random.RandomState(4)
    lines = []
    for i in range(4):
        img = (rng.rand(20, 20, 3) * 255).astype(np.uint8)
        p = tmp_path / f"c{i}.png"
        bip.write_image(str(p), img)
        lines.append(f"{p} {i % 3}")
    lst = tmp_path / "cl.txt"
    lst.write_text("\n".join(lines) + "\n")
    net = make_net(16, 16, 3, batch=4, label=3)
    net.mode = Mode.VALID  # center crop, no augmentation
    from bcnn_tpu.data import ClassificationListLoader

    loader = ClassificationListLoader(net, str(lst))
    loader.set_mode(Mode.VALID)
    x, y = loader.next_batch()
    assert x.shape == (4, 3, 16, 16)
    np.testing.assert_array_equal(np.argmax(y, 1), [0, 1, 2, 0])
    # center crop of a 20x20 into 16x16 starts at offset 2
    img0 = bip.load_image(str(tmp_path / "c0.png"))
    want = (img0[2:18, 2:18].astype(np.float32) - 127.5) / 127.5
    np.testing.assert_allclose(
        x[0], np.transpose(want, (2, 0, 1)), atol=1e-6
    )


def test_regression_list_loader(tmp_path):
    rng = np.random.RandomState(5)
    img = (rng.rand(16, 16, 1) * 255).astype(np.uint8)
    p = tmp_path / "r.png"
    bip.write_image(str(p), img)
    lst = tmp_path / "rl.txt"
    lst.write_text(f"{p} 0.5 -1.25 3.0\n")
    net = make_net(16, 16, 1, batch=1, label=3)
    net.mode = Mode.VALID
    from bcnn_tpu.data import RegressionListLoader

    loader = RegressionListLoader(net, str(lst))
    loader.set_mode(Mode.VALID)
    x, y = loader.next_batch()
    np.testing.assert_allclose(y[0], [0.5, -1.25, 3.0])


def test_augmenter_order_and_determinism():
    rng_img = np.random.RandomState(3)
    img = (rng_img.rand(16, 16, 1) * 255).astype(np.uint8)
    a = Augmenter(
        range_shift_x=4, range_shift_y=4, rotation_range=20.0,
        min_contrast=0.8, max_contrast=1.2, min_brightness=-20,
        max_brightness=20,
    )
    a.rng = np.random.RandomState(5)
    out1 = a.apply(img.copy())
    # precomputed: re-apply same params -> identical result
    a.use_precomputed = True
    out2 = a.apply(img.copy())
    np.testing.assert_array_equal(out1, out2)
    assert out1.shape == img.shape


def test_bip_crop_negative_offsets():
    src = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    out = bip.crop_image(src, -1, -1, 4, 4, fill=99)
    assert out[0, 0, 0] == 99  # padded corner
    assert out[1, 1, 0] == src[0, 0, 0]


def test_bip_resize_identity_and_downscale():
    img = (np.random.RandomState(0).rand(8, 8, 3) * 255).astype(np.uint8)
    same = bip.resize_bilinear(img, 8, 8)
    np.testing.assert_array_equal(same, img)
    down = bip.resize_bilinear(img, 4, 4)
    assert down.shape == (4, 4, 3)


def test_convert_img_to_float_bgr_swap():
    img = np.zeros((2, 2, 3), np.uint8)
    img[..., 0] = 255  # R
    out = convert_img_to_float(img, 1 / 127.5, swap_to_bgr=1)
    assert out.shape == (3, 2, 2)
    np.testing.assert_allclose(out[2], 1.0)  # R landed in last channel
    np.testing.assert_allclose(out[0], -1.0)

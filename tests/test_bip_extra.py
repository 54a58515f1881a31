"""Coverage for the remaining bip ops (perlin distortion, spotlights,
rotate fixed-point semantics) and image IO."""

import numpy as np

from bcnn_tpu.bip import ops


def test_perlin_distortion_deterministic_and_bounded():
    img = (np.random.RandomState(0).rand(24, 24, 3) * 255).astype(np.uint8)
    a = ops.perlin_distortion(img, 0.05, 0.2, -0.3, seed=42)
    b = ops.perlin_distortion(img, 0.05, 0.2, -0.3, seed=42)
    np.testing.assert_array_equal(a, b)
    c = ops.perlin_distortion(img, 0.05, 0.2, -0.3, seed=43)
    assert not np.array_equal(a, c)
    assert a.shape == img.shape and a.dtype == np.uint8
    # zero distortion samples at integer coordinates -> near identity
    # (interior; border pixels map out of the valid bilinear window)
    d = ops.perlin_distortion(img, 0.0, 0.0, 0.0, seed=1)
    np.testing.assert_array_equal(d[1:-1, 1:-1], img[1:-1, 1:-1])


def test_spotlights_additive_and_clamped():
    img = np.full((16, 16, 1), 100, np.uint8)
    rng = np.random.RandomState(0)
    out = ops.add_random_spotlights(img, 2, 1.0, 3.0, 1.0, 3.0, rng)
    assert out.dtype == np.uint8
    assert (out >= 100).all()  # purely additive
    assert out.max() <= 255
    assert out.max() > 100  # something got brighter


def test_rotate_zero_angle_is_identity_interior():
    img = (np.random.RandomState(1).rand(10, 12, 3) * 255).astype(np.uint8)
    out = ops.rotate_image(img, 0.0, 6, 5)
    # 16.16 fixed point at angle 0 is exact; border cols/rows map outside
    np.testing.assert_array_equal(out[:-1, :-1], img[:-1, :-1])


def test_integral_image():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    ii = ops.image_integral(img)
    assert ii.shape == (4, 5)
    assert ii[0].sum() == 0 and ii[:, 0].sum() == 0
    assert ii[-1, -1] == img.sum()
    # any rectangle sum via 4 corner reads
    r = ii[3, 4] - ii[1, 4] - ii[3, 1] + ii[1, 1]
    assert r == img[1:3, 1:4].sum()


def test_sobel_flat_is_zero_and_edge_detected():
    flat = np.full((8, 8), 100, np.uint8)
    assert ops.image_sobel(flat).sum() == 0
    edge = np.zeros((8, 8), np.uint8)
    edge[:, 4:] = 200
    out = ops.image_sobel(edge)
    assert out[4, 4] > 0 and out[4, 1] == 0


def test_otsu_bimodal():
    img = np.concatenate(
        [np.full(100, 40, np.uint8), np.full(100, 200, np.uint8)]
    ).reshape(20, 10)
    t = ops.otsu_threshold(img)
    assert 40 <= t < 200


def test_pyramid_down():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = ops.pyramid_down(img)
    assert out.shape == (2, 2)
    assert out[0, 0] == (0 + 1 + 4 + 5 + 2) // 4
    odd = np.arange(9, dtype=np.uint8).reshape(3, 3)
    assert ops.pyramid_down(odd).shape == (2, 2)


def test_image_io_roundtrip(tmp_path):
    img = (np.random.RandomState(2).rand(9, 7, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "t.png")
    ops.write_image(p, img)
    back = ops.load_image(p)
    np.testing.assert_array_equal(back, img)
    # grayscale keeps one channel
    g = img[:, :, :1]
    ops.write_image(p, g)
    back = ops.load_image(p)
    assert back.shape == (9, 7, 1)

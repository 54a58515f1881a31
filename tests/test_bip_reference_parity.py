"""Cross-implementation parity for the bip CV long tail (round 2): the
reference's bip.c is compiled into a shared object and driven via ctypes,
and every newly-ported function is checked against it on random images.
This is the strongest possible validation of the ports' border/rounding
quirks (fixed-point gray, truncated sliding means, LBP bit order, median
border scheme, gaussian integer rounding...).
"""

import ctypes as C
import os
import shutil
import subprocess

import numpy as np
import pytest

from bcnn_tpu.bip import ops

REF = "/root/reference"
SHIM = "/tmp/libbip_shim.so"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF) or shutil.which("cc") is None,
    reason="reference tree or toolchain unavailable",
)


@pytest.fixture(scope="module")
def bip():
    if not os.path.exists(SHIM):
        try:
            subprocess.run(
                [
                    "cc", "-O2", "-fPIC", "-shared",
                    "-include", "math.h", "-include", "stdio.h",
                    f"{REF}/src/bip/src/bip.c",
                    f"-I{REF}/src/bip/inc", f"-I{REF}/src/bh/inc",
                    "-o", SHIM, "-lm",
                ],
                check=True, capture_output=True,
            )
        except subprocess.CalledProcessError as e:
            pytest.skip(f"bip shim build failed: {e.stderr[-500:]}")
    return C.CDLL(SHIM)


def u8p(a):
    return a.ctypes.data_as(C.POINTER(C.c_uint8))


def _img(rng, h, w, c=1):
    return np.ascontiguousarray(
        (rng.rand(h, w, c) * 255).astype(np.uint8)
    )


def test_rgb2gray(bip):
    rng = np.random.RandomState(0)
    img = _img(rng, 13, 17, 3)
    dst = np.zeros((13, 17), np.uint8)
    bip.bip_rgb2gray(u8p(img), C.c_size_t(17), C.c_size_t(13),
                     C.c_size_t(17 * 3), u8p(dst), C.c_size_t(17))
    np.testing.assert_array_equal(ops.rgb2gray(img)[:, :, 0], dst)


def test_invert(bip):
    rng = np.random.RandomState(1)
    img = _img(rng, 7, 9, 3)
    dst = np.zeros_like(img)
    bip.bip_invert_image(u8p(img), C.c_size_t(9), C.c_size_t(7),
                         C.c_size_t(3), C.c_size_t(27), u8p(dst),
                         C.c_size_t(27))
    np.testing.assert_array_equal(ops.invert_image(img), dst)


def test_pyramid_up(bip):
    rng = np.random.RandomState(2)
    img = _img(rng, 6, 8, 1)
    dst = np.zeros((12, 16), np.uint8)
    bip.bip_pyramid_up(u8p(img), C.c_size_t(8), C.c_size_t(6),
                       C.c_size_t(8), u8p(dst), C.c_size_t(16),
                       C.c_size_t(12), C.c_size_t(16))
    np.testing.assert_array_equal(ops.pyramid_up(img)[:, :, 0], dst)


def test_mirror_borders(bip):
    rng = np.random.RandomState(3)
    img = _img(rng, 6, 7, 3)
    t, b, l, r = 2, 3, 2, 1
    dst = np.zeros((6 + t + b, 7 + l + r, 3), np.uint8)
    bip.bip_mirror_borders_8u(
        u8p(img), 7, 6, 3, 7 * 3, u8p(dst), 7 + l + r, 6 + t + b, 3,
        (7 + l + r) * 3, t, b, l, r,
    )
    np.testing.assert_array_equal(ops.mirror_borders(img, t, b, l, r), dst)


def test_histogram_and_entropy(bip):
    rng = np.random.RandomState(4)
    img = _img(rng, 19, 23, 1)
    histo = np.zeros(256, np.uint32)
    bip.bip_image_histogram(
        u8p(img), C.c_size_t(23), C.c_size_t(19), C.c_size_t(23),
        histo.ctypes.data_as(C.POINTER(C.c_uint32)),
    )
    np.testing.assert_array_equal(ops.image_histogram(img), histo)
    ent = C.c_float(0)
    bip.bip_image_entropy(u8p(img), C.c_size_t(23), C.c_size_t(19),
                          C.c_size_t(23), C.byref(ent))
    assert abs(ops.image_entropy(img) - ent.value) < 1e-4


def test_square_integral(bip):
    rng = np.random.RandomState(5)
    img = _img(rng, 9, 11, 1)
    s = np.zeros((10, 12), np.uint32)
    sq = np.zeros((10, 12), np.float64)
    bip.bip_image_square_integral(
        u8p(img), C.c_size_t(11), C.c_size_t(9), C.c_size_t(11),
        s.ctypes.data_as(C.POINTER(C.c_uint32)), C.c_size_t(12 * 4),
        sq.ctypes.data_as(C.POINTER(C.c_double)), C.c_size_t(12 * 8),
    )
    ours_s, ours_sq = ops.image_square_integral(img)
    np.testing.assert_array_equal(ours_s, s)
    np.testing.assert_allclose(ours_sq, sq)


@pytest.mark.parametrize("kw,kh", [(3, 3), (5, 3), (7, 7)])
def test_sliding_mean_and_variance(bip, kw, kh):
    rng = np.random.RandomState(6)
    img = _img(rng, 14, 18, 1)
    dst = np.zeros((14, 18), np.uint8)
    bip.bip_image_sliding_mean(
        u8p(img), C.c_size_t(18), C.c_size_t(14), C.c_size_t(18),
        u8p(dst), C.c_size_t(18), C.c_size_t(kw), C.c_size_t(kh),
    )
    np.testing.assert_array_equal(
        ops.image_sliding_mean(img, kw, kh)[:, :, 0], dst
    )
    dst2 = np.zeros((14, 18), np.uint8)
    var = np.zeros((14, 18), np.float64)
    bip.bip_image_sliding_mean_variance(
        u8p(img), C.c_size_t(18), C.c_size_t(14), C.c_size_t(18),
        u8p(dst2), C.c_size_t(18),
        var.ctypes.data_as(C.POINTER(C.c_double)), C.c_size_t(18 * 8),
        C.c_size_t(kw), C.c_size_t(kh),
    )
    m, v = ops.image_sliding_mean_variance(img, kw, kh)
    np.testing.assert_array_equal(m[:, :, 0], dst2)
    np.testing.assert_allclose(v, var, atol=1e-9)


def test_lbp(bip):
    rng = np.random.RandomState(7)
    img = _img(rng, 12, 15, 1)
    dst = np.zeros((12, 15), np.uint8)
    bip.bip_lbp_estimate(u8p(img), C.c_size_t(15), C.c_size_t(12),
                         C.c_size_t(15), u8p(dst), C.c_size_t(15))
    lbp = ops.lbp_estimate(img)
    np.testing.assert_array_equal(lbp[:, :, 0], dst)

    for norm in (0, 1):
        for uni, bins in ((0, 256), (1, 59)):
            feat = np.zeros(256, np.float32)
            bip.bip_lbp_histogram_features(
                u8p(lbp[:, :, 0].copy()), C.c_size_t(15), C.c_size_t(12),
                C.c_size_t(15),
                feat.ctypes.data_as(C.POINTER(C.c_float)),
                C.c_int32(norm), C.c_int(uni),
            )
            ours = ops.lbp_histogram_features(
                lbp, norm=bool(norm), uniform=bool(uni)
            )
            np.testing.assert_allclose(ours, feat[:bins], atol=1e-6)


def test_median_3x3(bip):
    rng = np.random.RandomState(8)
    img = _img(rng, 11, 13, 1)
    dst = np.zeros((11, 13), np.uint8)
    bip.bip_median_3x3(u8p(img), C.c_size_t(13), C.c_size_t(11),
                       C.c_size_t(13), u8p(dst), C.c_size_t(13))
    np.testing.assert_array_equal(ops.median_3x3(img)[:, :, 0], dst)


@pytest.mark.parametrize("c", [1, 3])
def test_gaussian_blur_3x3(bip, c):
    rng = np.random.RandomState(9)
    img = _img(rng, 10, 12, c)
    dst = np.zeros_like(img)
    bip.bip_gaussian_blur_3x3(
        u8p(img), C.c_size_t(12), C.c_size_t(10), C.c_size_t(c),
        C.c_size_t(12 * c), u8p(dst), C.c_size_t(12 * c),
    )
    np.testing.assert_array_equal(ops.gaussian_blur_3x3(img), dst)


# ---------------------------------------------------------------------- #
# stb-backed IO tail (round 4): bip_status_string, write_float_image_norm,
# write_double_image — compiled with BIP_USE_STB_IMAGE so the reference's
# own PNG writer runs, then both PNGs are decoded and compared pixelwise.
# ---------------------------------------------------------------------- #

STB_SHIM = "/tmp/libbip_stb_shim.so"


@pytest.fixture(scope="module")
def bip_stb():
    if not os.path.exists(STB_SHIM):
        try:
            subprocess.run(
                [
                    "cc", "-O2", "-fPIC", "-shared",
                    "-include", "math.h", "-include", "stdio.h",
                    "-include", "stdlib.h",
                    "-DBIP_USE_STB_IMAGE",
                    f"{REF}/src/bip/src/bip.c",
                    f"-I{REF}/src/bip/inc", f"-I{REF}/src/bh/inc",
                    f"-I{REF}/src/bip/thirdparty",
                    "-o", STB_SHIM, "-lm",
                ],
                check=True, capture_output=True,
            )
        except subprocess.CalledProcessError as e:
            pytest.skip(f"bip stb shim build failed: {e.stderr[-500:]}")
    return C.CDLL(STB_SHIM)


def test_status_string(bip):
    bip.bip_status_string.restype = C.c_char_p
    for code in range(6):
        assert (
            ops.status_string(code)
            == bip.bip_status_string(code).decode()
        )


@pytest.mark.parametrize("c", [1, 3])
def test_write_float_image_norm(bip_stb, tmp_path, c):
    rng = np.random.RandomState(20 + c)
    img = np.ascontiguousarray(
        (rng.rand(9, 11, c) * 5 - 2).astype(np.float32)
    )
    ref_png = str(tmp_path / "ref.png").encode()
    bip_stb.bip_write_float_image_norm(
        C.c_char_p(ref_png),
        img.ctypes.data_as(C.POINTER(C.c_float)),
        C.c_int32(11), C.c_int32(9), C.c_int32(c),
        C.c_int32(11 * c * 4),
    )
    mine = tmp_path / "mine.png"
    ops.write_float_image_norm(str(mine), img.squeeze())
    np.testing.assert_array_equal(
        np.atleast_3d(ops.load_image(str(mine))),
        np.atleast_3d(ops.load_image(ref_png.decode())),
    )


@pytest.mark.parametrize("c", [1, 3])
def test_write_double_image(bip_stb, tmp_path, c):
    rng = np.random.RandomState(30 + c)
    img = np.ascontiguousarray(rng.rand(7, 10, c) * 1.4 - 0.2)
    ref_png = str(tmp_path / "ref.png").encode()
    bip_stb.bip_write_double_image(
        C.c_char_p(ref_png),
        img.ctypes.data_as(C.POINTER(C.c_double)),
        C.c_int32(10), C.c_int32(7), C.c_int32(c),
        C.c_int32(10 * c * 8),
    )
    mine = tmp_path / "mine.png"
    ops.write_double_image(str(mine), img.squeeze())
    np.testing.assert_array_equal(
        np.atleast_3d(ops.load_image(str(mine))),
        np.atleast_3d(ops.load_image(ref_png.decode())),
    )

"""Native C++ bip kernels vs. the numpy reference implementations."""

import numpy as np
import pytest

from bcnn_tpu.bip import ops as np_ops
from bcnn_tpu.bip import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@pytest.fixture
def img():
    return (np.random.RandomState(0).rand(37, 29, 3) * 255).astype(np.uint8)


def test_crop(img):
    for args in [(3, 5, 20, 22), (-4, -2, 40, 40), (10, 30, 29, 37)]:
        a = np_ops.crop_image(img, *args, fill=7)
        b = native.crop_image(img, *args, fill=7)
        np.testing.assert_array_equal(a, b)


def test_fliph(img):
    np.testing.assert_array_equal(
        np_ops.fliph_image(img), native.fliph_image(img)
    )


def test_resize(img):
    for dw, dh in [(29, 37), (64, 48), (13, 11)]:
        a = np_ops.resize_bilinear(img, dw, dh)
        b = native.resize_bilinear(img, dw, dh)
        # float summation order may differ by 1 ulp at rounding boundaries
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_rotate(img):
    a = np_ops.rotate_image(img, 0.3, 14, 18)
    b = native.rotate_image(img, 0.3, 14, 18)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_contrast_brightness(img):
    np.testing.assert_array_equal(
        np_ops.contrast_stretch(img, 1.3), native.contrast_stretch(img, 1.3)
    )
    np.testing.assert_array_equal(
        np_ops.image_brightness(img, -30), native.image_brightness(img, -30)
    )


def test_to_float(img):
    from bcnn_tpu.data.augment import convert_img_to_float

    a = convert_img_to_float(img, 1 / 127.5, 1, 100.0, 110.0, 120.0)
    b = native.convert_img_to_float(img, 1 / 127.5, 1, 100.0, 110.0, 120.0)
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_batch_to_float(img):
    imgs = np.stack([img, img[::-1].copy()])
    out = native.batch_convert_to_float(imgs)
    from bcnn_tpu.data.augment import convert_img_to_float

    np.testing.assert_allclose(out[1], convert_img_to_float(imgs[1]),
                               rtol=1e-6)


def test_set_num_threads_caps_native_pool():
    """Net.set_num_threads mirrors bcnn_set_num_threads: it caps the
    OpenMP pool used by the native host kernels."""
    from bcnn_tpu import Mode, Net
    from bcnn_tpu.bip.native import get_lib

    lib = get_lib()
    if lib is None or not hasattr(lib, "bcnn_bip_set_num_threads"):
        import pytest

        pytest.skip("native lib unavailable")
    net = Net(Mode.PREDICT)
    net.set_input_shape(8, 8, 1, 1)
    before = lib.bcnn_bip_num_threads()
    try:
        net.set_num_threads(2)
        assert lib.bcnn_bip_num_threads() == 2
    finally:
        lib.bcnn_bip_set_num_threads(max(1, before))

"""bip: the image-processing library (host side).

Re-implements the subset of the reference's bip library
(/root/reference/src/bip/) that the framework uses — load/save, crop (with
negative-offset padding), bilinear resize, rotate, flip, contrast/brightness,
perlin distortion, spotlights. Two backends with identical semantics:

  - native C++ kernels (native/bip.cpp, OpenMP) via ctypes — the default
    when the toolchain is available;
  - vectorized numpy (ops.py) — always available, used as fallback and as
    the cross-check oracle in tests.

File IO uses Pillow instead of the vendored stb_image.
"""

from .ops import (
    add_random_spotlights,
    perlin_distortion,
    status_string,
    write_double_image,
    write_float_image,
    write_float_image_norm,
    write_image,
)
from . import native as _native
from . import ops as _ops

if _native.available() and _native.decode_available():
    # native JPEG/PNG decode (native/decode.cpp, system libjpeg/libpng) —
    # the stb_image decode-at-train-time analogue (bip.c:1837). PIL covers
    # formats outside the native codecs (bmp/gif/...).
    def load_image(path: str):
        try:
            return _native.load_image(path)
        except ValueError:
            return _ops.load_image(path)
else:  # pragma: no cover - exercised when codecs are missing
    load_image = _ops.load_image

if _native.available():
    crop_image = _native.crop_image
    fliph_image = _native.fliph_image
    resize_bilinear = _native.resize_bilinear
    rotate_image = _native.rotate_image
    contrast_stretch = _native.contrast_stretch
    image_brightness = _native.image_brightness
else:  # pragma: no cover - exercised when no toolchain is present
    crop_image = _ops.crop_image
    fliph_image = _ops.fliph_image
    resize_bilinear = _ops.resize_bilinear
    rotate_image = _ops.rotate_image
    contrast_stretch = _ops.contrast_stretch
    image_brightness = _ops.image_brightness

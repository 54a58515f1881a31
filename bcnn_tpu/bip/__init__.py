"""bip: the image-processing library (host side).

Re-implements the subset of the reference's bip library
(/root/reference/src/bip/) that the framework uses — load/save, crop (with
negative-offset padding), bilinear resize, rotate, flip, contrast/brightness,
perlin distortion, spotlights — as vectorized numpy over HWC uint8 arrays.
File IO uses Pillow instead of the vendored stb_image.
"""

from .ops import (
    add_random_spotlights,
    contrast_stretch,
    crop_image,
    fliph_image,
    image_brightness,
    load_image,
    perlin_distortion,
    resize_bilinear,
    rotate_image,
    write_image,
)

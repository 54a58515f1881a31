"""ctypes bindings for the native C++ bip kernels (native/bip.cpp).

The shared library is built on demand with the repo's native/Makefile the
first time it's needed; if the toolchain is unavailable everything falls
back to the numpy implementations in ops.py (identical semantics — the test
suite cross-checks). Disable with BCNN_TPU_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
)
_SO = os.path.join(_NATIVE_DIR, "libbcnn_bip.so")

_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i = ctypes.c_int
_f = ctypes.c_float


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"],
            cwd=_NATIVE_DIR,
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("BCNN_TPU_NATIVE", "1") == "0":
        return None
    # make is a no-op when the .so is newer than the sources; this also
    # refreshes a stale cached build after the native sources change
    _build()
    if not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.bcnn_bip_crop.argtypes = [_u8p, _i, _i, _i, _i, _i, _u8p, _i, _i]
    lib.bcnn_bip_fliph.argtypes = [_u8p, _i, _i, _i, _u8p]
    lib.bcnn_bip_resize_bilinear.argtypes = [_u8p, _i, _i, _i, _u8p, _i, _i]
    lib.bcnn_bip_rotate.argtypes = [_u8p, _i, _i, _i, _u8p, _f, _i, _i]
    lib.bcnn_bip_contrast.argtypes = [_u8p, _i, _i, _i, _u8p, _f]
    lib.bcnn_bip_brightness.argtypes = [_u8p, _i, _u8p, _i]
    lib.bcnn_bip_to_float_chw.argtypes = [
        _u8p, _i, _i, _i, _f, _i, _f32p, _f32p,
    ]
    lib.bcnn_bip_batch_to_float_chw.argtypes = [
        _u8p, _i, _i, _i, _i, _f, _i, _f32p, _f32p,
    ]
    lib.bcnn_bip_num_threads.restype = _i
    _lp = ctypes.POINTER(ctypes.c_long)
    if hasattr(lib, "bcnn_loader_mnist_batch"):  # older cached .so lacks it
        lib.bcnn_loader_mnist_batch.argtypes = [
            _u8p, ctypes.c_long, _u8p, ctypes.c_long, _lp, _lp,
            _i, _i, _i, _i, _i, _i, _f32p, _f32p, _i,
        ]
        lib.bcnn_loader_mnist_batch.restype = _i
        lib.bcnn_loader_cifar_batch.argtypes = [
            _u8p, ctypes.c_long, _lp, _i, _i, _f, _f, _f, _f, _f32p,
            _f32p, _i,
        ]
        lib.bcnn_loader_cifar_batch.restype = _i
    if hasattr(lib, "bcnn_loader_records_batch"):
        lib.bcnn_loader_records_batch.argtypes = [
            _u8p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.POINTER(ctypes.c_long), _i, _u8p,
            _f32p,
        ]
        lib.bcnn_loader_records_batch.restype = _i
    if hasattr(lib, "bcnn_decode_image"):  # absent without libjpeg/libpng
        _ip = ctypes.POINTER(ctypes.c_int)
        lib.bcnn_decode_image.argtypes = [
            _u8p, ctypes.c_long, _u8p, ctypes.c_long, _ip, _ip, _ip,
        ]
        lib.bcnn_decode_image.restype = _i
        _lp2 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        _i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.bcnn_decode_batch.argtypes = [
            _u8p, _lp2, _lp2, _i, _u8p, _lp2, _lp2,
            _i32p, _i32p, _i32p, _i32p,
        ]
        lib.bcnn_decode_batch.restype = _i
    _LIB = lib
    return _LIB


def available() -> bool:
    return get_lib() is not None


# --------------------------------------------------------------------- #
# wrappers (same signatures as ops.py)
# --------------------------------------------------------------------- #


def crop_image(src, x_ul, y_ul, dst_w, dst_h, fill=0, out=None):
    lib = get_lib()
    h, w, c = src.shape
    if out is None:
        out = np.full((dst_h, dst_w, c), fill, np.uint8)
    lib.bcnn_bip_crop(
        np.ascontiguousarray(src), h, w, c, x_ul, y_ul, out, dst_h, dst_w
    )
    return out


def fliph_image(src):
    lib = get_lib()
    h, w, c = src.shape
    out = np.empty_like(src)
    lib.bcnn_bip_fliph(np.ascontiguousarray(src), h, w, c, out)
    return out


def resize_bilinear(src, dst_w, dst_h):
    lib = get_lib()
    h, w, c = src.shape
    out = np.empty((dst_h, dst_w, c), np.uint8)
    lib.bcnn_bip_resize_bilinear(
        np.ascontiguousarray(src), h, w, c, out, dst_h, dst_w
    )
    return out


def rotate_image(src, angle, center_x, center_y):
    lib = get_lib()
    h, w, c = src.shape
    out = np.empty_like(src)
    lib.bcnn_bip_rotate(
        np.ascontiguousarray(src), h, w, c, out, float(angle),
        int(center_x), int(center_y),
    )
    return out


def contrast_stretch(src, contrast):
    lib = get_lib()
    h, w, c = src.shape
    out = np.empty_like(src)
    lib.bcnn_bip_contrast(
        np.ascontiguousarray(src), h, w, c, out, float(contrast)
    )
    return out


def image_brightness(src, brightness):
    lib = get_lib()
    out = np.empty_like(src)
    lib.bcnn_bip_brightness(
        np.ascontiguousarray(src), src.size, out, int(brightness)
    )
    return out


def convert_img_to_float(
    img, norm_coeff=1 / 127.5, swap_to_bgr=0,
    mean_r=127.5, mean_g=127.5, mean_b=127.5,
):
    lib = get_lib()
    h, w, c = img.shape
    mean = np.asarray([mean_r, mean_g, mean_b][:c], np.float32)
    out = np.empty((c, h, w), np.float32)
    lib.bcnn_bip_to_float_chw(
        np.ascontiguousarray(img), h, w, c, float(norm_coeff),
        int(swap_to_bgr), mean, out,
    )
    return out


def batch_convert_to_float(
    imgs, norm_coeff=1 / 127.5, swap_to_bgr=0, mean=(127.5, 127.5, 127.5),
):
    """imgs: (N,H,W,C) uint8 -> (N,C,H,W) float32, OpenMP over the batch."""
    lib = get_lib()
    n, h, w, c = imgs.shape
    m = np.asarray(mean[:c], np.float32)
    out = np.empty((n, c, h, w), np.float32)
    lib.bcnn_bip_batch_to_float_chw(
        np.ascontiguousarray(imgs), n, h, w, c, float(norm_coeff),
        int(swap_to_bgr), m, out,
    )
    return out


# --------------------------------------------------------------------- #
# JPEG/PNG decode (native/decode.cpp, system libjpeg/libpng)
# --------------------------------------------------------------------- #

_DECODE_DUMMY = np.zeros(1, np.uint8)


def decode_available() -> bool:
    lib = get_lib()
    return lib is not None and hasattr(lib, "bcnn_decode_image")


def decode_image_bytes(data) -> np.ndarray:
    """Decode an in-memory JPEG/PNG blob -> HWC uint8 (grayscale stays
    1 channel, like ops.load_image). Raises ValueError on anything the
    native codecs don't cover (caller falls back to PIL)."""
    lib = get_lib()
    buf = np.frombuffer(data, np.uint8) if not isinstance(
        data, np.ndarray
    ) else data
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    r = lib.bcnn_decode_image(
        buf, len(buf), _DECODE_DUMMY, 0,
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(c),
    )
    if r == -1:
        raise ValueError("unsupported or corrupt image")
    out = np.empty((h.value, w.value, c.value), np.uint8)
    r = lib.bcnn_decode_image(
        buf, len(buf), out, out.size,
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(c),
    )
    if r != 0:
        raise ValueError("image decode failed")
    return out


def load_image(path: str) -> np.ndarray:
    """bip_load_image via the native codecs (decode.cpp)."""
    with open(path, "rb") as f:
        return decode_image_bytes(f.read())


def decode_batch(blobs) -> list:
    """Decode a list of in-memory JPEG/PNG blobs OpenMP-parallel.
    Returns a list of HWC uint8 arrays; raises ValueError if any blob
    fails (statuses inspected for the message)."""
    lib = get_lib()
    n = len(blobs)
    data = np.frombuffer(b"".join(blobs), np.uint8)
    sizes = np.asarray([len(b) for b in blobs], np.int64)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype(np.int64)
    ws = np.zeros(n, np.int32)
    hs = np.zeros(n, np.int32)
    cs = np.zeros(n, np.int32)
    status = np.zeros(n, np.int32)
    # probe pass (cap 0) to learn dims, then one parallel decode pass
    caps0 = np.zeros(n, np.int64)
    out0 = np.zeros(1, np.uint8)
    lib.bcnn_decode_batch(
        data, offsets, sizes, n, out0, caps0, caps0, ws, hs, cs, status
    )
    if (status == -1).any():
        raise ValueError(f"undecodable blobs at {np.nonzero(status == -1)[0]}")
    caps = (ws.astype(np.int64) * hs * cs)
    out_offsets = np.concatenate([[0], np.cumsum(caps)[:-1]]).astype(np.int64)
    outs = np.empty(int(caps.sum()), np.uint8)
    r = lib.bcnn_decode_batch(
        data, offsets, sizes, n, outs, out_offsets, caps, ws, hs, cs,
        status,
    )
    if r != 0:
        raise ValueError(f"decode failed at {np.nonzero(status != 0)[0]}")
    return [
        outs[o:o + k].reshape(hs[i], ws[i], cs[i])
        for i, (o, k) in enumerate(zip(out_offsets, caps))
    ]

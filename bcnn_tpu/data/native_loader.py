"""Native (C++/OpenMP) batch assembly for the streaming loaders.

The reference's data pipeline layer is C (src/data_loader/ +
bcnn_loader_next, bcnn_data.c:392-427); this is its native rebuild for the
formats whose decode is pure byte math — MNIST idx and CIFAR-10 binary.
The dataset files are mmapped once per file object; stream positions stay
in the Python file objects (so rewind-on-mode-switch, finite `tell()`
semantics and interop with the pure-Python per-sample path are preserved),
and native/loader.cpp assembles the whole batch in one call.

Used automatically by MnistLoader/Cifar10Loader when no host augmentation
is active (augmented samples go through the per-sample bip path, which owns
the RNG stream). Outputs are bit-identical to the Python loaders
(tests/test_native_loader.py). Disable with BCNN_TPU_NATIVE=0 (same knob
as the bip kernels) or BCNN_TPU_NATIVE_LOADER=0.
"""

from __future__ import annotations

import ctypes
import mmap
import os
from typing import Optional, Tuple

import numpy as np

from ..bip.native import get_lib


def _enabled() -> bool:
    return os.environ.get("BCNN_TPU_NATIVE_LOADER", "1") != "0"


def _lib():
    if not _enabled():
        return None
    lib = get_lib()
    if lib is None or not hasattr(lib, "bcnn_loader_mnist_batch"):
        return None
    return lib


def _mmap_of(f) -> np.ndarray:
    """uint8 view of the whole file, cached on the file object."""
    buf = getattr(f, "_bcnn_mmap", None)
    if buf is None:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
        buf = np.frombuffer(mm, np.uint8)
        f._bcnn_mmap_obj = mm  # keep the mapping alive
        f._bcnn_mmap = buf
    return buf


def mnist_batch(
    fimg, flbl, batch: int, img_h: int, img_w: int, out_h: int, out_w: int,
    normalize: bool, label_sz: int,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _lib()
    if lib is None:
        return None
    img = _mmap_of(fimg)
    lbl = _mmap_of(flbl)
    ip = ctypes.c_long(fimg.tell())
    lp = ctypes.c_long(flbl.tell())
    x = np.zeros((batch, 1, out_h, out_w), np.float32)
    y = np.zeros((batch, label_sz), np.float32)
    rc = lib.bcnn_loader_mnist_batch(
        img, img.size, lbl, lbl.size, ctypes.byref(ip), ctypes.byref(lp),
        batch, img_h, img_w, out_h, out_w, int(normalize), x, y, label_sz,
    )
    if rc != 0:
        raise ValueError("Corrupted Mnist data")
    fimg.seek(ip.value)
    flbl.seek(lp.value)
    return x, y


def cifar_batch(
    f, batch: int, swap_bgr: int, means: Tuple[float, float, float],
    coeff: float, label_sz: int,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _lib()
    if lib is None:
        return None
    buf = _mmap_of(f)
    pos = ctypes.c_long(f.tell())
    x = np.zeros((batch, 3, 32, 32), np.float32)
    y = np.zeros((batch, label_sz), np.float32)
    rc = lib.bcnn_loader_cifar_batch(
        buf, buf.size, ctypes.byref(pos), batch, int(swap_bgr),
        float(means[0]), float(means[1]), float(means[2]), float(coeff),
        x, y, label_sz,
    )
    if rc != 0:
        raise ValueError("Corrupted Cifar data")
    f.seek(pos.value)
    return x, y

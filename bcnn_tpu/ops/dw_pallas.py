"""Pallas TPU kernel: fused depthwise conv + bias + activation.

The roofline audit (BENCHMARKS.md, round 3) pinned MobileNet-v1 as
VPU/depthwise-bound: its 13 depthwise 3x3 layers have a contraction
depth of 9 per channel — nothing for the MXU — and the XLA grouped-conv
lowering runs them as separate kernels from their bias/activation
epilogues. This kernel does the whole depthwise block in ONE pass per
batch element: the pipeline stages one (H, W, C) image into VMEM, the
kernel zero-pads it in registers, runs the k*k taps as shifted
multiply-adds over the VMEM-resident value (exactly the formulation
that LOSES as a pure-XLA rewrite because XLA materializes each shifted
slice in HBM — ops/conv._conv_best pinned that), applies bias +
activation in-register, and writes one output image. HBM traffic = one
read + one write, i.e. the bytes floor.

Stride 2 computes the stride-1 output and subsamples at the end: one
strided sublane read replaces nine (cheaper than strided taps), and the
4x extra VPU work happens only on the three small s2 layers.

Two on-chip Mosaic constraints shaped this design (both measured,
round 3):
- Manual `make_async_copy` HBM slices must be (8, 128)-aligned on the
  trailing (sublane, lane) dims, so a haloed row-tile DMA is impossible
  for the W in {28, 14, 7} maps this kernel exists for. The standard
  Blocked pipeline has no such restriction (it masks edge copies), so
  blocks are whole images and halos never cross a block edge.
- XLA hands a sub-128-channel NHWC map to the kernel 128-lane padded
  (a 112x112x32 input arrives as a 112x112x128 memref), forfeiting the
  bytes advantage — `supported()` keeps C % 128 != 0 layers on the XLA
  path.

Math identical to ops.conv.depthwise_conv2d (one filter per channel,
bcnn_depthwise_conv_layer.c:165-294) + bias + activation.

NOT DISPATCHED — pinned negative result. Measured on-chip across the 11
lane-aligned MobileNet dw layers at batch 256, this kernel is
0.80-0.83x XLA's own depthwise emitter (56.6 vs 45.5 ms per-dispatch
sum): XLA avoids the whole-image pad/relayout this version pays. The
kernel is kept, with its correctness tests (test_dw_pallas.py checks it
in interpreter mode against the XLA path), as the measured record of
WHY the XLA path stays — compile._depthwise_conv2d has no Pallas branch
on purpose. Re-evaluate only with a changed Mosaic layout story.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import Activation

# activations the kernel can fuse (apply_activation parity for these)
_FUSABLE = (
    Activation.NONE, Activation.RELU, Activation.LRELU, Activation.CLAMP,
)

_VMEM_BUDGET = 12 * 1024 * 1024


def _apply_act(y, act):
    if act == Activation.RELU:
        return jnp.maximum(y, 0.0)
    if act == Activation.LRELU:
        return jnp.where(y > 0, y, 0.1 * y)  # reference slope 0.1
    if act == Activation.CLAMP:
        return jnp.clip(y, 0.0, 1.0)  # reference clamp is [0,1]
    return y


def _vmem_bytes(h, w, c, k, stride):
    """VMEM cost of one grid step WITH 128-lane / 8-sublane padding:
    input image + padded copy + output + ~2 tap temps."""
    cpad = -(-c // 128) * 128

    def rnd8(v):
        return -(-v // 8) * 8

    pad = k // 2
    s1 = h + 2 * pad - k + 1  # stride-1 output rows (cols same)
    return 4 * cpad * (
        h * rnd8(w)                      # staged input block
        + (h + 2 * pad) * rnd8(w + 2 * pad)  # in-register padded copy
        + 3 * s1 * rnd8(s1)              # acc + temps
        + ((h + 2 * pad - k) // stride + 1)
        * rnd8((w + 2 * pad - k) // stride + 1)  # output block
    )


def supported(k: int, stride: int, pad: int, act, c: int = 128,
              h: int = 8, w: int = 8) -> bool:
    return (
        stride in (1, 2) and pad == k // 2 and k <= 7 and act in _FUSABLE
        and c % 128 == 0
        and _vmem_bytes(h, w, c, k, stride) <= _VMEM_BUDGET
    )


def _kernel(x_ref, w_ref, b_ref, o_ref, *, k, stride, pad, act,
            compute_dtype):
    cd = compute_dtype or x_ref.dtype
    x = x_ref[...].astype(cd)                     # (G, H, W, C)
    g, h, wd, c = x.shape
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    wk = w_ref[...].astype(cd)                    # (k, k, C)
    s1h = h + 2 * pad - k + 1
    s1w = wd + 2 * pad - k + 1
    acc = None
    for r in range(k):
        for q in range(k):
            t = (x[:, r : r + s1h, q : q + s1w, :] * wk[r, q]).astype(
                jnp.float32
            )
            acc = t if acc is None else acc + t
    if stride > 1:
        # strided slicing lowers to an unsupported gather on Mosaic;
        # phase-reshape instead (pad to even, split each spatial dim in
        # (out, stride) pairs, keep phase 0 — C stays minor throughout)
        ph = -s1h % stride
        pw = -s1w % stride
        if ph or pw:
            acc = jnp.pad(acc, ((0, 0), (0, ph), (0, pw), (0, 0)))
        acc = acc.reshape(
            g, (s1h + ph) // stride, stride, (s1w + pw) // stride, stride,
            c,
        )[:, :, 0, :, 0, :]
    y = acc + b_ref[0].astype(jnp.float32)
    o_ref[...] = _apply_act(y, act).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("stride", "pad", "act", "compute_dtype", "interpret"),
)
def depthwise_fused(
    x: jax.Array,      # (N, H, W, C) fp32
    w: jax.Array,      # (k, k, 1, C) fp32
    b: jax.Array,      # (C,) fp32
    stride: int,
    pad: int,
    act: Activation = Activation.NONE,
    compute_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    n, h, wd, c = x.shape
    k = w.shape[0]
    oh = (h + 2 * pad - k) // stride + 1
    ow = (wd + 2 * pad - k) // stride + 1
    # group images per grid step to amortize pipeline overhead, within
    # the VMEM budget
    g = 1
    for cand in (8, 4, 2):
        if n % cand == 0 and cand * _vmem_bytes(
            h, wd, c, k, stride
        ) <= _VMEM_BUDGET:
            g = cand
            break
    kern = functools.partial(
        _kernel, k=k, stride=stride, pad=pad, act=act,
        compute_dtype=compute_dtype,
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, oh, ow, c), x.dtype),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((g, h, wd, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((k, k, c), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((g, oh, ow, c), lambda i: (i, 0, 0, 0)),
        interpret=interpret,
    )(x, w[:, :, 0, :], b.reshape(1, c))

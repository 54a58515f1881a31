"""Dropout, concat, eltwise (stride broadcast), upsample, LRN.

All mirror the corresponding src/layers/*.c implementations; deviations from
reference quirks are documented inline.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def dropout(
    x: jax.Array, rate: float, scale: float, rng: jax.Array, training: bool
) -> jax.Array:
    """Inverted dropout (bcnn_dropout_layer.c:82-110): train-only; elements
    with r < rate zeroed, survivors scaled by 1/(1-rate)."""
    if not training or rate <= 0.0:
        return x
    keep = jax.random.uniform(rng, x.shape) >= rate
    return jnp.where(keep, x * scale, 0.0)


def concat_channels(xs: Sequence[jax.Array]) -> jax.Array:
    """Channel-axis concat (bcnn_concat_layer.c forward); NHWC -> last axis.
    Channel order matches the reference's NCHW concat."""
    return jnp.concatenate(list(xs), axis=-1)


def eltwise_add(
    x0: jax.Array,
    x1: jax.Array,
    stride: Tuple[int, int],
    min_dim: Tuple[int, int, int],
) -> jax.Array:
    """Add with stride broadcast (bcnn_eltwise_layer.c:111-135 +
    bcnn_axpy_strided, bcnn_mat.c:159-178):

      dst = copy(src0)
      dst[b, c, j*stride0, i*stride0] += src1[b, c, j*stride1, i*stride1]
        for c < min_c, j < min_h, i < min_w

    Note: the reference's equal-stride fast path adds only the first
    min_c*h*w *flat* elements — i.e. batch item 0 only
    (bcnn_eltwise_layer.c:119-121). That is an indexing bug (the strided
    path and darknet both loop over the batch); we implement the intended
    full-batch semantics.
    Inputs NHWC.
    """
    min_c, min_h, min_w = min_dim
    s0, s1 = stride
    if s0 == 1 and s1 == 1 and x0.shape == x1.shape:
        return x0 + x1
    # gather the strided window of src1 and scatter-add into dst
    add = x1[:, : min_h * s1 : s1, : min_w * s1 : s1, :min_c]
    dst_view = x0[:, : min_h * s0 : s0, : min_w * s0 : s0, :min_c]
    updated = dst_view + add
    out = x0.at[:, : min_h * s0 : s0, : min_w * s0 : s0, :min_c].set(updated)
    return out


def upsample_nn(x: jax.Array, size: int) -> jax.Array:
    """Nearest-neighbor upsample x size (bcnn_upsample_layer.c:86-110);
    backward (autodiff) accumulates, as in the reference."""
    return jnp.repeat(jnp.repeat(x, size, axis=1), size, axis=2)


def lrn(
    x: jax.Array, local_size: int, alpha: float, beta: float, k: float
) -> jax.Array:
    """Cross-channel local response normalization, transcribed EXACTLY from
    the reference's running-sum implementation (bcnn_lrn_layer.c:106-155):
      y = x * norm^(-beta)
    where norm is built channel-by-channel:
      norm[0]   = k + a * sum_{c' < ls/2} sq[c']
      loop A (c in [1, min(1+(ls-1)/2, C-ls/2))):
                  norm[c] = norm[c-1] + a*sq[c + ls/2]
      loop B (c in [min(1+(ls-1)/2, C-ls/2), C-ls/2)):
                  norm[c] = norm[c-1] - a*sq[c-(ls-1)/2-1] + a*sq[c+ls/2]
      loop C (c in [max(1, C-ls/2), C)):
                  norm[c] = norm[c-1] - a*sq[c-(ls-1)/2-1]
    with a = alpha/local_size. Note this is NOT the textbook symmetric
    window (e.g. for ls=3 channel 1's window is {0,2}) — the quirk is
    preserved for numerical parity, which the cross-implementation test
    (tests/test_reference_parity.py) checks against the compiled reference.
    x: NHWC; channel count is static, the recurrence unrolls at trace time.
    """
    cdim = x.shape[-1]
    a = alpha / local_size
    half_hi = local_size // 2
    half_lo = (local_size - 1) // 2
    sq = jnp.square(x)
    norm = [None] * cdim
    cur = k + a * sum(
        (sq[..., c2] for c2 in range(min(half_hi, cdim))),
        start=jnp.zeros_like(sq[..., 0]),
    )
    norm[0] = cur
    b_start = min(1 + half_lo, cdim - half_hi)
    for c in range(1, b_start):
        cur = norm[c - 1] + a * sq[..., c + half_hi]
        norm[c] = cur
    for c in range(max(1, b_start), cdim - half_hi):
        cur = norm[c - 1] - a * sq[..., c - half_lo - 1] \
            + a * sq[..., c + half_hi]
        norm[c] = cur
    for c in range(max(1, cdim - half_hi), cdim):
        cur = norm[c - 1] - a * sq[..., c - half_lo - 1]
        norm[c] = cur
    stacked = jnp.stack(norm, axis=-1)
    return x * jnp.power(stacked, -beta)

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
    """Cross-channel local response normalization with the reference's
    exact (quirky) window semantics (bcnn_lrn_layer.c:106-155):
      y = x * norm^(-beta),  a = alpha/local_size
      norm[0] = k + a * sum_{c' < ls/2} sq[c']          (ls/2 EXCLUDED)
      norm[c] = norm[c-1] (+ a*sq[c+ls/2] while in range)
                          (- a*sq[c-(ls-1)/2-1] once c is past the head)
    — NOT the textbook symmetric window (for ls=3 channel 1's window is
    {0,2}); parity is checked against the compiled reference
    (tests/test_reference_parity.py).

    The recurrence is evaluated as a lax.scan over the channel axis so the
    HLO op count is CONSTANT in C (the round-1 transcription unrolled an
    O(C) chain — an AlexNet C=256 LRN emits hundreds of chained ops, which
    wedges the shared remote TPU compiler). A closed cumsum form exists
    but re-associates the floating-point adds/subtracts; with the
    reference's k=0 quirk the running sum can cancel to ~0 and the -beta
    power amplifies any re-association, so the scan reproduces the exact
    sequential op order instead: bit-identical to the reference loop.
    With hh = ls//2, hl = (ls-1)//2, m = max(1, min(1+hl, C-hh)):
      step s in [1, C-hh)  adds      a*sq[s+hh]
      step s in [m, C)     subtracts a*sq[s-hl-1]   (subtract-then-add
                           order inside a step, as in loop B)
    where negative remove indices resolve as JAX static indexing does
    (add C once, then clamp to 0) — the reference underflows its buffer
    there (undefined behavior), so the contract for those degenerate
    C < window cases is bit-identity with the round-1 transcription.
    """
    import numpy as np

    from jax import lax

    cdim = x.shape[-1]
    a = alpha / local_size
    hh = local_size // 2
    hl = (local_size - 1) // 2
    sq = jnp.square(x)

    # head term: Python loop of min(hh, C) adds — O(local_size), constant
    # in C, and the same sequential association as the reference
    norm0 = k + a * sum(
        (sq[..., c2] for c2 in range(min(hh, cdim))),
        start=jnp.zeros_like(sq[..., 0]),
    )
    if cdim == 1:
        return x * jnp.power(norm0[..., None], -beta)

    s = np.arange(1, cdim)
    add_m = s < cdim - hh
    add_idx = np.where(add_m, np.minimum(s + hh, cdim - 1), 0)
    m = max(1, min(1 + hl, cdim - hh))
    rm_m = s >= m
    raw = s - hl - 1
    rm_idx = np.where(raw >= 0, raw, np.clip(raw + cdim, 0, cdim - 1))
    rm_idx = np.where(rm_m, rm_idx, 0)

    sq_c = jnp.moveaxis(sq, -1, 0)  # (C, N, H, W)
    xs = (
        sq_c[add_idx],
        jnp.asarray(add_m),
        sq_c[rm_idx],
        jnp.asarray(rm_m),
    )

    def body(prev, t):
        ad, am, rm, rmm = t
        cur = jnp.where(rmm, prev - a * rm, prev)
        cur = jnp.where(am, cur + a * ad, cur)
        return cur, cur

    _, rest = lax.scan(body, norm0, xs)
    norm = jnp.concatenate([norm0[None], rest], axis=0)
    return x * jnp.power(jnp.moveaxis(norm, 0, -1), -beta)


def _lrn_unrolled(
    x: jax.Array, local_size: int, alpha: float, beta: float, k: float
) -> jax.Array:
    """Direct transcription of the reference recurrence (the round-1
    implementation). Kept as the specification for tests/test_ops.py's
    lrn_vectorized_matches_unrolled sweep; O(C) HLO ops — do not use in
    model graphs."""
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

"""Convolution ops on the MXU.

The reference implements conv as im2col + blocked SGEMM (AVX/NEON,
src/kernels/bcnn_mat.c:2164-2650) plus a Winograd F(2x2,3x3) NC4HW4 fast path
(bcnn_mat.c:1367-2155). On TPU both collapse into a single
`lax.conv_general_dilated`: XLA lowers it to implicit GEMM on the 128x128
systolic array and fuses the bias/BN/activation post-ops, so no hand-written
kernel is needed for the conv itself.

Layouts: activations NHWC, weights HWIO. Grouped conv via
feature_group_count (reference: per-group GEMM loop,
bcnn_conv_layer.c:438-467). Output shape (h + 2p - k)/s + 1 matches the
builder (bcnn_conv_layer.c:126-135) because lax uses
floor((h + pl + ph - k)/s) + 1 with pl = ph = p.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = lax.conv_dimension_numbers(
    (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
)


def conv2d(
    x: jax.Array,
    w: jax.Array,
    stride: int,
    pad: int,
    groups: int = 1,
    compute_dtype=None,
    out_dtype=None,
) -> jax.Array:
    """x: (N,H,W,C), w: (k,k,C//groups,O) -> (N,H',W',O).

    compute_dtype: MXU input dtype (bf16 for the perf path); the MXU always
    accumulates fp32 internally. out_dtype: result dtype — keeping it bf16
    in inference halves inter-layer HBM traffic on the memory-bound
    high-resolution layers."""
    precision = lax.Precision.HIGHEST
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        precision = lax.Precision.DEFAULT
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=precision,
        preferred_element_type=out_dtype or jnp.float32,
    )


def depthwise_conv2d(
    x: jax.Array,
    w: jax.Array,
    stride: int,
    pad: int,
    compute_dtype=None,
    out_dtype=None,
) -> jax.Array:
    """Depthwise conv (bcnn_depthwise_conv_layer.c:165-294): one filter per
    input channel. w: (k,k,1,C), feature_group_count == C."""
    return conv2d(
        x, w, stride, pad, groups=x.shape[-1],
        compute_dtype=compute_dtype, out_dtype=out_dtype,
    )


def conv2d_transpose(
    x: jax.Array,
    w: jax.Array,
    stride: int,
    pad: int,
    compute_dtype=None,
) -> jax.Array:
    """Transpose conv matching the reference deconv
    (bcnn_deconv_layer.c:149-180: GEMM(transA) + col2im).

    Output spatial: s*(h-1) + k - 2p. Implemented as the exact transpose
    (gradient) of a forward conv with the same stride/padding.
    w: (k,k,Cout,Cin) — the HWIO weight of the forward conv being transposed,
    so I == deconv output channels, O == deconv input channels.

    Parity note: the reference's forward passes pad=0 to col2im regardless
    of the configured pad (bcnn_deconv_layer.c:177-180) while sizing the
    output with the pad (builder :97-101) — padded deconvs are
    geometrically inconsistent there. This implementation is the standard
    transpose; it matches the reference exactly for pad == 0 (verified in
    tests/test_reference_parity.py).
    """
    precision = lax.Precision.HIGHEST
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        precision = lax.Precision.DEFAULT
    # lax.conv_transpose's explicit padding pairs apply to the dilated
    # input, not the forward conv being transposed: the gradient of a conv
    # with padding p needs explicit pads of (k-1-p) per edge, giving
    # output s*(i-1) + k - 2p
    k = w.shape[0]
    e = k - 1 - pad
    return lax.conv_transpose(
        x,
        w,
        strides=(stride, stride),
        padding=((e, e), (e, e)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
        precision=precision,
        preferred_element_type=jnp.float32,
    )

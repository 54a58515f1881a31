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

import functools

import jax
import jax.numpy as jnp
from jax import lax

_DN = lax.conv_dimension_numbers(
    (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC")
)


def _conv_raw(x, w, stride, pad, groups, precision, preferred):
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=precision,
        preferred_element_type=preferred,
    )


def _conv_s2d2(x, w, pad, precision, preferred):
    """Stride-2 conv via space-to-depth: measured 10.98 ms for ResNet's
    7x7/s2 C=3 stem at batch 256 on v5e (the MXU runs at 3/128 lane
    utilization on a 3-channel input). Rewriting as a stride-1 VALID conv
    on the 2x2-block-to-channel transformed input quadruples the
    contraction depth (C -> 4C) and removes the stride; algebraically
    EXACT (same multiply-adds, reassociated):

        y[i,j,o] = sum_{r,q,c} w[r,q,c,o] * xp[2i+r, 2j+q, c]
                 = sum_{a,b,(rho,sigma,c)} w2[a,b,(rho,sigma,c),o]
                       * s2d(xp)[i+a, j+b, (rho,sigma,c)]
        with r = 2a+rho, q = 2b+sigma; w2 zero where 2a+rho >= k.

    Used on the bf16 perf path for tiny input channel counts; the fp32
    parity path keeps the direct lowering."""
    k = w.shape[0]
    n, h, wd, c = x.shape
    oh = (h + 2 * pad - k) // 2 + 1
    ow = (wd + 2 * pad - k) // 2 + 1
    kh = (k + 2) // 2  # ceil((k+1)/2): sub-kernel taps per phase
    # pad so the padded image splits into whole 2x2 blocks covering the
    # last window: need 2*(oh-1) + k <= hp and hp even
    hp = max(h + 2 * pad, 2 * (oh - 1 + kh))
    hp += hp % 2
    wp = max(wd + 2 * pad, 2 * (ow - 1 + kh))
    wp += wp % 2
    xp = jnp.pad(
        x, ((0, 0), (pad, hp - h - pad), (pad, wp - wd - pad), (0, 0))
    )
    xs = xp.reshape(n, hp // 2, 2, wp // 2, 2, c)
    xs = jnp.transpose(xs, (0, 1, 3, 2, 4, 5)).reshape(
        n, hp // 2, wp // 2, 4 * c
    )
    o = w.shape[3]
    w2 = jnp.zeros((kh, kh, 2, 2, c, o), w.dtype)
    for r in range(k):
        for q in range(k):
            w2 = w2.at[r // 2, q // 2, r % 2, q % 2].set(w[r, q])
    w2 = w2.reshape(kh, kh, 4 * c, o)
    y = lax.conv_general_dilated(
        xs, w2, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision, preferred_element_type=preferred,
    )
    return y[:, :oh, :ow]


def _depthwise_fma(x, w, stride, pad, preferred):
    """Depthwise conv as k*k shifted fused multiply-adds: XLA's grouped
    conv lowering measured 11.6 ms for ONE 3x3 dw layer (112x112x64,
    batch 256) on v5e — pathologically off both walls. The unrolled
    shifted-slice formulation compiles to one fused elementwise kernel
    (~2 image reads) on the VPU. w: (k,k,1,C)."""
    k = w.shape[0]
    n, h, wd, c = x.shape
    oh = (h + 2 * pad - k) // stride + 1
    ow = (wd + 2 * pad - k) // stride + 1
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    acc = None
    for r in range(k):
        for q in range(k):
            sl = xp[
                :,
                r : r + (oh - 1) * stride + 1 : stride,
                q : q + (ow - 1) * stride + 1 : stride,
                :,
            ]
            # products in the input dtype, fp32 accumulation (same
            # semantics as the MXU conv it replaces)
            term = (sl * w[r, q, 0]).astype(jnp.float32)
            acc = term if acc is None else acc + term
    return acc.astype(preferred if preferred is not None else x.dtype)


# threshold: inputs this thin waste the MXU's 128-deep contraction lanes
_S2D_MAX_CIN = 4


def _conv_best(x, w, stride, pad, groups, precision, preferred):
    """Perf-path conv dispatch. NEGATIVE RESULT (round 3, pinned): both
    alternative formulations measured SLOWER in-model on v5e —
    MobileNet-v1 bf16 went 14.75 -> 28.05 ms/256 with the shifted-FMA
    depthwise (XLA materializes the shifted slices: bytes_accessed 3.5 ->
    12.4 GB) and ResNet-18 bf16 18.29 -> 19.54 ms with the s2d stem.
    An isolated single-layer probe of the grouped-conv lowering had
    suggested an 11.6 ms pathology, but in-model layouts do not
    reproduce it — isolated micro-probes mislead here (fresh-layout
    inputs + per-dispatch floor); measure inside the full program.
    The formulations are kept (value-checked by tests/test_ops.py) so
    this can be revisited per-compiler-version, but dispatch is OFF."""
    return _conv_raw(x, w, stride, pad, groups, precision, preferred)


# --------------------------------------------------------------------- #
# Mixed-precision conv with a valid VJP.
#
# JAX's conv transpose rule requires lhs/rhs dtypes to match, so the
# "cast inputs to bf16, accumulate/emit fp32" pattern is not directly
# differentiable (the rule would pair a bf16 residual with the fp32
# cotangent). This custom_vjp keeps the forward numerics identical to the
# inference fast path (bf16 MXU inputs, fp32 accumulate+output) and runs
# the backward as the VJP of the all-bf16 conv: the cotangent is cast to
# bf16, both transposed convs hit the MXU in bf16 (fp32 internal
# accumulation), and the grads are cast back to the primal dtypes so
# fp32 master params get fp32 grads. This replaces the reference's
# hand-written fp32 conv backward (bcnn_conv_layer.c:487-587) at MXU
# speed. Residuals are stored in bf16 — the activation memory of the
# backward pass is halved as a side effect.
# --------------------------------------------------------------------- #


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _conv2d_mixed(x, w, stride, pad, groups, cd):
    return _conv_best(
        x.astype(cd), w.astype(cd), stride, pad, groups,
        lax.Precision.DEFAULT, jnp.float32,
    )


def _conv2d_mixed_fwd(x, w, stride, pad, groups, cd):
    x16 = x.astype(cd)
    w16 = w.astype(cd)
    y = _conv_best(
        x16, w16, stride, pad, groups, lax.Precision.DEFAULT, jnp.float32
    )
    # zero-size dtype carriers: residual leaves must be JAX types
    return y, (x16, w16, jnp.zeros((0,), x.dtype), jnp.zeros((0,), w.dtype))


def _conv2d_mixed_bwd(stride, pad, groups, cd, res, g):
    x16, w16, xdt_c, wdt_c = res
    xdt, wdt = xdt_c.dtype, wdt_c.dtype

    def f(a, b):
        # same-dtype conv => standard JAX transpose rules apply; the
        # dispatched formulations are plain jnp/lax ops with their own
        # (equally faster) transposes
        return _conv_best(
            a, b, stride, pad, groups, lax.Precision.DEFAULT, None
        )

    _, vjp = jax.vjp(f, x16, w16)
    dx, dw = vjp(g.astype(cd))
    return dx.astype(xdt), dw.astype(wdt)


_conv2d_mixed.defvjp(_conv2d_mixed_fwd, _conv2d_mixed_bwd)


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
    if compute_dtype is not None:
        if out_dtype is not None:
            # inference-only act_dtype path: no grad needed, direct lowering
            return _conv_best(
                x.astype(compute_dtype), w.astype(compute_dtype),
                stride, pad, groups, lax.Precision.DEFAULT, out_dtype,
            )
        return _conv2d_mixed(
            x, w, stride, pad, groups, jnp.dtype(compute_dtype)
        )
    # act-dtype boundary storage without bf16 compute: upcast the stored
    # activation back to fp32 (conv_general_dilated requires equal dtypes)
    return _conv_raw(
        x.astype(jnp.float32), w, stride, pad, groups,
        lax.Precision.HIGHEST, jnp.float32,
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
    if compute_dtype is not None:
        return _convt_mixed(x, w, stride, pad, jnp.dtype(compute_dtype))
    return _convt_raw(
        x.astype(jnp.float32), w, stride, pad,
        lax.Precision.HIGHEST, jnp.float32,
    )


def conv2d_transpose_ref_quirk(
    x: jax.Array, w: jax.Array, stride: int, pad: int
) -> jax.Array:
    """Bit-replication of the reference's *forward* padded deconv
    (bcnn_deconv_layer.c:149-180), quirk included.

    The reference sizes the output with the pad (builder :97-101:
    s*(h-1)+k-2p) but calls bcnn_col2im with pad=0 (:177-180). col2im
    (bcnn_mat.c) walks its input POINTER SEQUENTIALLY, consuming
    oh*ow = ((dh-k)/s+1)*((dw-k)/s+1) floats per (channel, kr, kc) row —
    while the GEMM laid the workspace out as rows of length h*w. For
    pad > 0, oh*ow < h*w, so each successive row is read from an
    ever-more-misaligned offset: the f-th float consumed is simply
    workspace[f] = C.ravel()[f] where C = W^T X is (co*k*k, h*w)
    row-major. That makes the quirk a *static index map*: take the first
    co*k*k*oh*ow elements of C.ravel() and scatter-add each to its col2im
    placement (ir, ic) = (kr + orow*s, kc + ocol*s) — always in bounds at
    pad=0. At pad == 0 the map is exactly standard col2im, so this path
    degenerates to the true transpose conv (test-pinned).

    Training caveat (documented divergence, pinned in
    tests/test_reference_parity.py): the reference *backward* with pad>0
    (bcnn_deconv_layer.c:216-246) runs im2col(pad=0) into the shared
    workspace, writing only dst_c*k*k*oh*ow floats, then the dW/dX GEMMs
    read k = src_h*src_w columns per row — past the freshly-written data
    into bytes left over from earlier kernel calls. The gradient depends
    on heap history, i.e. it is stale-memory-dependent; this rebuild
    instead differentiates the quirk forward (a well-defined function).
    """
    k = w.shape[0]
    num = w.shape[2]
    n, h, wid, _ = x.shape
    dh = stride * (h - 1) + k - 2 * pad
    dw = stride * (wid - 1) + k - 2 * pad
    oh = (dh - k) // stride + 1
    ow = (dw - k) // stride + 1
    if oh <= 0 or ow <= 0:
        raise ValueError("degenerate padded deconv geometry")
    # C[(co,kr,kc),(y,x)] = sum_ci w[kr,kc,co,ci] * x[y,x,ci]
    cols = jnp.einsum(
        "nhwc,rqoc->norqhw", x, w, precision=lax.Precision.HIGHEST
    ).reshape(n, num * k * k * h * wid)
    f = jnp.arange(num * k * k * oh * ow)
    q, t = f // (oh * ow), f % (oh * ow)
    co, kr, kc = q // (k * k), (q // k) % k, q % k
    ir = kr + (t // ow) * stride
    ic = kc + (t % ow) * stride
    tgt = (ir * dw + ic) * num + co  # NHWC flat target
    taken = cols[:, : num * k * k * oh * ow]
    out = jnp.zeros((n, dh * dw * num), x.dtype).at[:, tgt].add(taken)
    return out.reshape(n, dh, dw, num)


def _convt_raw(x, w, stride, pad, precision, preferred):
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
        preferred_element_type=preferred,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _convt_mixed(x, w, stride, pad, cd):
    """Mixed-precision deconv; same VJP strategy as _conv2d_mixed."""
    return _convt_raw(
        x.astype(cd), w.astype(cd), stride, pad,
        lax.Precision.DEFAULT, jnp.float32,
    )


def _convt_mixed_fwd(x, w, stride, pad, cd):
    x16 = x.astype(cd)
    w16 = w.astype(cd)
    y = _convt_raw(
        x16, w16, stride, pad, lax.Precision.DEFAULT, jnp.float32
    )
    return y, (x16, w16, jnp.zeros((0,), x.dtype), jnp.zeros((0,), w.dtype))


def _convt_mixed_bwd(stride, pad, cd, res, g):
    x16, w16, xdt_c, wdt_c = res
    xdt, wdt = xdt_c.dtype, wdt_c.dtype

    def f(a, b):
        return _convt_raw(a, b, stride, pad, lax.Precision.DEFAULT, None)

    _, vjp = jax.vjp(f, x16, w16)
    dx, dw = vjp(g.astype(cd))
    return dx.astype(xdt), dw.astype(wdt)


_convt_mixed.defvjp(_convt_mixed_fwd, _convt_mixed_bwd)

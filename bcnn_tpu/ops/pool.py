"""Pooling ops.

Maxpool mirrors bcnn_forward_maxpool_layer_cpu
(src/layers/bcnn_maxpool_layer.c:145-192): the window for output (i,j)
starts at (i*stride, j*stride) — never negative — and positions past the
bottom/right edge read -FLT_MAX. So the op is a reduce_window with
low padding 0 and exactly enough high padding to realize the output size
computed by the builder ((SAME/VALID/CAFFE formulas,
bcnn_maxpool_layer.c:62-83).

Backward (autodiff of reduce_window max) routes the gradient to the argmax,
matching the reference's stored-index scatter
(bcnn_maxpool_layer.c backward). Avgpool is the reference's *global*
average pool (bcnn_avgpool_layer.c:82-100).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

# 2x2/stride-2 maxpool backward implementation:
#   "rw"      — autodiff of reduce_window (select_and_scatter): re-reads
#               the full-resolution input to re-find the argmax.
#   "reshape" — custom VJP below: forward stores the in-window argmax
#               (uint8, 1/8 the bf16 input bytes), backward expands the
#               cotangent through a one-hot — no gather/scatter, no
#               re-read of x. Identical values AND identical tie-break
#               (first max in row-major window order, = the reference's
#               strictly-greater scan, bcnn_maxpool_layer.c:145-192).
#
# MEASURED NEGATIVE, twice (BENCHMARKS.md): the round-3 one_hot variant
# lost 168.9-vs-140.4 ms on the fp32-act full step; this uint8-argmax
# variant lost again on the act16 prefix cuts (cut 2: 56.5 vs 48.2 ms,
# cut 6: 92.5 vs 78.0, +10 GB cost-analysis traffic) — XLA materializes
# the (N,oh,ow,4,C) window transpose instead of fusing it, which costs
# more than select_and_scatter's re-read. Default stays "rw"; the
# formulation + knob + bit-parity test are kept so the next compiler
# version can re-run the A/B in one env var.
POOL2X2_IMPL = os.environ.get("BCNN_POOL2X2", "rw")


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _maxpool2x2_reshape(x, out_h, out_w, in_h, in_w):
    y, _ = _maxpool2x2_fwd(x, out_h, out_w, in_h, in_w)
    return y


def _pool2x2_windows(x, out_h, out_w):
    n, h, w, c = x.shape
    ph, pw = 2 * out_h - h, 2 * out_w - w  # 0 or 1 (SAME high padding)
    if ph or pw:
        neg = (
            -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.iinfo(x.dtype).min
        )
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=neg)
    xb = x.reshape(n, out_h, 2, out_w, 2, c)
    # (N, oh, ow, 4, C): window flattened row-major — the order argmax
    # tie-breaks in, matching the reference's strictly-greater scan
    return jnp.transpose(xb, (0, 1, 3, 2, 4, 5)).reshape(
        n, out_h, out_w, 2 * 2, c
    )


def _maxpool2x2_fwd(x, out_h, out_w, in_h, in_w):
    xw = _pool2x2_windows(x, out_h, out_w)
    y = xw.max(axis=3)
    idx = xw.argmax(axis=3).astype(jnp.uint8)  # first max wins
    return y, (idx, jnp.zeros((0,), x.dtype))


def _maxpool2x2_bwd(out_h, out_w, in_h, in_w, res, g):
    idx, xdt_c = res
    n, _, _, c = idx.shape
    onehot = (
        idx[:, :, :, None, :]
        == jnp.arange(4, dtype=jnp.uint8)[:, None]
    )
    dxw = jnp.where(onehot, g[:, :, :, None, :].astype(xdt_c.dtype), 0)
    dx = jnp.transpose(
        dxw.reshape(n, out_h, out_w, 2, 2, c), (0, 1, 3, 2, 4, 5)
    ).reshape(n, 2 * out_h, 2 * out_w, c)
    return (dx[:, :in_h, :in_w, :],)


_maxpool2x2_reshape.defvjp(_maxpool2x2_fwd, _maxpool2x2_bwd)


def maxpool(
    x: jax.Array, size: int, stride: int, out_h: int, out_w: int
) -> jax.Array:
    """x: NHWC -> (N, out_h, out_w, C)."""
    n, h, w, c = x.shape
    if (
        size == 2 and stride == 2
        and POOL2X2_IMPL == "reshape"
        and 2 * out_h - h in (0, 1) and 2 * out_w - w in (0, 1)
    ):
        return _maxpool2x2_reshape(x, out_h, out_w, h, w)
    pad_h = max(0, (out_h - 1) * stride + size - h)
    pad_w = max(0, (out_w - 1) * stride + size - w)
    # identity for max: -inf, or the type minimum for ints (the int8
    # activation-flow path pools quantized values directly — max commutes
    # exactly with the monotone quantizer, ops/quant.py plan_int8_flow).
    # init must be a CONCRETE scalar: a traced jnp value breaks the
    # reduce_window VJP ("linearization failed").
    import numpy as np

    if jnp.issubdtype(x.dtype, jnp.floating):
        init = -jnp.inf
    else:
        init = np.asarray(np.iinfo(x.dtype).min, x.dtype)
    return lax.reduce_window(
        x,
        init,
        lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
    )


def global_avgpool(x: jax.Array) -> jax.Array:
    """x: NHWC -> (N, 1, 1, C)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)

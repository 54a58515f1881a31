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

import jax
import jax.numpy as jnp
from jax import lax


def maxpool(
    x: jax.Array, size: int, stride: int, out_h: int, out_w: int
) -> jax.Array:
    """x: NHWC -> (N, out_h, out_w, C)."""
    n, h, w, c = x.shape
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

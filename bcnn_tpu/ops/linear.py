"""Fully-connected layer.

Mirrors bcnn_fc_layer.c:144-226. The reference stores weights as
(out, c*h*w) with the input flattened in NCHW order; since activations here
are NHWC, the input is transposed to NCHW before flattening so that loaded
reference weights line up exactly. The in-memory weight is (in, out) so the
op is a single MXU matmul x @ W.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def full_connected(
    x: jax.Array, w: jax.Array, b: jax.Array, compute_dtype=None
) -> jax.Array:
    """x: (N,H,W,C) or (N,F); w: (F,out); returns (N,1,1,out) NHWC."""
    n = x.shape[0]
    if x.ndim == 4:
        x = jnp.transpose(x, (0, 3, 1, 2))  # NHWC -> NCHW flatten order
    x = x.reshape(n, -1)
    precision = jax.lax.Precision.HIGHEST
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        precision = jax.lax.Precision.DEFAULT
    y = (
        jnp.dot(x, w, precision=precision, preferred_element_type=jnp.float32)
        + b
    )
    return y.reshape(n, 1, 1, -1)

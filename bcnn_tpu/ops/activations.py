"""Activation functions.

Math mirrors bcnn_forward_activation_cpu
(src/layers/bcnn_activation_layer.c:90-163). Notably LRELU uses slope 0.1
(the implementation's value, not the header's documented 0.01) and RAMP is
x*(x>0) + 0.1*x. Backward passes come from autodiff — they agree with the
reference's hand-written gradients for all activations used in practice
(tanh/relu/lrelu/logistic/prelu/clamp); for SOFTPLUS/ABS the reference
backward differentiates w.r.t. its own *output* (an artifact of the in-place
update, bcnn_activation_layer.c:165-220) and autodiff is the correct math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..types import Activation


def apply_activation(
    x: jax.Array, act: Activation, slopes: jax.Array | None = None
) -> jax.Array:
    """slopes: per-channel PReLU slopes, broadcast over the trailing (channel)
    axis of NHWC data."""
    if act == Activation.NONE:
        return x
    if act == Activation.TANH:
        return jnp.tanh(x)
    if act == Activation.RELU:
        return jnp.maximum(x, 0.0)
    if act == Activation.LRELU:
        return jnp.where(x > 0, x, 0.1 * x)
    if act == Activation.RAMP:
        return x * (x > 0) + 0.1 * x
    if act == Activation.SOFTPLUS:
        return jnp.logaddexp(x, 0.0)
    if act == Activation.ABS:
        return jnp.abs(x)
    if act == Activation.CLAMP:
        return jnp.clip(x, 0.0, 1.0)
    if act == Activation.LOGISTIC:
        return jax.nn.sigmoid(x)
    if act == Activation.PRELU:
        if slopes is None:
            raise ValueError("PReLU needs slopes")
        return jnp.where(x > 0, x, slopes * x)
    raise ValueError(f"unknown activation {act}")

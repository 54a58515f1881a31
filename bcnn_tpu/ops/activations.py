"""Activation functions.

Math mirrors bcnn_forward_activation_cpu
(src/layers/bcnn_activation_layer.c:90-163). Notably LRELU uses slope 0.1
(the implementation's value, not the header's documented 0.01) and RAMP is
x*(x>0) + 0.1*x. Backward passes come from autodiff — they agree with the
reference's hand-written gradients for tanh/relu/lrelu/logistic/clamp; for
SOFTPLUS/ABS the reference backward differentiates w.r.t. its own *output*
(an artifact of the in-place update, bcnn_activation_layer.c:165-220) and
autodiff is the correct math.

PReLU replicates the reference's output-based backward as a custom VJP
(quirk kept on purpose — it changes training dynamics):
bcnn_backward_activation_cpu:211-222 computes
    grad_slope[c] += dy * y * (y < 0);   dx = dy * (y > 0 ? 1 : slope[c])
with y the activation OUTPUT (in-place update), so the slope gradient is
the true gradient scaled by the slope itself — and since the reference
initializes PReLU slopes to ZERO (calloc, bcnn_activation_layer.c:64-70;
conv builder likewise), slopes can never leave zero under the reference:
its PReLU trains as a permanent ReLU unless nonzero slopes are loaded
from a file. Verified end-to-end by the randomized training-trajectory
parity (tests/test_training_parity.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..types import Activation


@functools.partial(jax.custom_vjp)
def _prelu_ref(x, s):
    return jnp.where(x > 0, x, s * x)


def _prelu_ref_fwd(x, s):
    y = jnp.where(x > 0, x, s * x)
    return y, (y, s)


def _prelu_ref_bwd(res, g):
    y, s = res
    # reference math on the OUTPUT y (bcnn_activation_layer.c:211-222)
    ds = jnp.sum(
        g * y * (y < 0), axis=tuple(range(y.ndim - 1))
    ).reshape(s.shape)
    dx = g * jnp.where(y > 0, 1.0, s)
    return dx, ds


_prelu_ref.defvjp(_prelu_ref_fwd, _prelu_ref_bwd)


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
        return _prelu_ref(x, slopes)
    raise ValueError(f"unknown activation {act}")

"""Softmax with the reference's pass-through gradient.

Forward mirrors bcnn_forward_softmax_layer_cpu
(src/layers/bcnn_softmax_layer.c:88-160): log-sum-exp-stable softmax over
the channel axis — a single vector softmax when h*w == 1, otherwise
channelwise per spatial position.

The reference backward is NOT the softmax Jacobian: it simply copies the
output gradient to the input gradient (bcnn_softmax_layer.c:161-175, an
axpy). Combined with the euclidean cost this is the darknet-style
"softmax + SSE" training signal. Replicated here with a custom_vjp so
training dynamics match exactly.
"""

from __future__ import annotations

import jax


@jax.custom_vjp
def softmax_passthrough_grad(x: jax.Array) -> jax.Array:
    return _softmax(x)


def _softmax(x: jax.Array) -> jax.Array:
    # x: NHWC; softmax over channels (last axis)
    return jax.nn.softmax(x, axis=-1)


def _fwd(x):
    return _softmax(x), None


def _bwd(_, g):
    return (g,)  # pass-through, as in the reference


softmax_passthrough_grad.defvjp(_fwd, _bwd)

"""Optimizers and learning-rate schedules as pure pytree transforms.

Update math mirrors src/bcnn_learner.c exactly, including its quirks:

  - SGD (bcnn_sgd_update_cpu :67-83): the gradient buffer doubles as the
    momentum/velocity buffer. Per step:
        v_t = g_t + decay*B*w_t + momentum * v_{t-1}   (decay on weights only)
        w  -= (lr / B) * v_t
    Gradients are *summed* over the batch (as in the reference's backward
    kernels), hence the lr/B scaling.

  - Adam (bcnn_adam_update_cpu :106-131): applied only to tensors whose
    layer update() routes them through Adam (conv/deconv/depthwise/fc
    weights). Biases always use the SGD momentum rule (:113-117). The
    bias-correction exponent is the reference's `seen` counter (samples
    seen, not step count — bcnn_update_conv_layer passes learner->seen):
        mu = sqrt(1 - beta2^(seen+1)) / (1 - beta1^(seen+1))
        m  = (1-b1)*g + b1*m ; v = (1-b2)*g^2 + b2*v
        w -= (lr / B) * mu * m / (sqrt(v) + 1e-7)
    and the weight-grad buffer is zeroed (no momentum carry, :128).

  - PReLU slopes (bcnn_update_activation_layer :262-295) use the SGD rule
    regardless of optimizer, with B = slopes->n == 1.

  - LR schedules (bcnn_update_learning_rate :29-65) with
    iter = seen / batch_size, where seen += batch_size happens *before* the
    step, so the first update sees iter = 1.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .graph import Learner, Net
from .types import LrDecay, Optimizer

ADAM_EPS = 1e-7


def learning_rate(learner: Learner, it: jax.Array) -> jax.Array:
    """it: traced int32 iteration counter (= seen // batch_size)."""
    base = learner.base_learning_rate
    d = learner.decay_type
    itf = it.astype(jnp.float32)
    if d == LrDecay.CONSTANT:
        return jnp.float32(base)
    if d == LrDecay.STEP:
        return base * jnp.power(
            jnp.float32(learner.scale), (it // max(1, learner.step)).astype(jnp.float32)
        )
    if d == LrDecay.INV:
        return base * jnp.power(1.0 + learner.gamma * itf, -learner.power)
    if d == LrDecay.EXP:
        return base * jnp.power(jnp.float32(learner.gamma), itf)
    if d == LrDecay.POLY:
        return base * jnp.power(
            1.0 - itf / max(1, learner.max_batches), learner.power
        )
    if d == LrDecay.SIGMOID:
        return base * (
            1.0 / (1.0 + jnp.exp(learner.gamma * (itf - learner.step)))
        )
    raise ValueError(f"unknown decay {d}")


def init_opt_state(net: Net, params: Dict[str, jax.Array]) -> Dict[str, Any]:
    learner = net.learner
    specs = {t.key: t for t in net.param_specs()}
    velocity = {}
    adam_m = {}
    adam_v = {}
    for k, p in params.items():
        t = specs[k]
        if not t.trainable:
            continue
        if learner.optimizer == Optimizer.ADAM and t.adam_capable:
            adam_m[k] = jnp.zeros_like(p)
            adam_v[k] = jnp.zeros_like(p)
        else:
            velocity[k] = jnp.zeros_like(p)
    return {
        "seen": jnp.zeros((), jnp.int32),
        "velocity": velocity,
        "adam_m": adam_m,
        "adam_v": adam_v,
    }


def apply_updates(
    net: Net,
    params: Dict[str, jax.Array],
    grads: Dict[str, jax.Array],
    opt_state: Dict[str, Any],
) -> Tuple[Dict[str, jax.Array], Dict[str, Any]]:
    """One optimizer step. `grads` are batch-summed (matching the reference's
    accumulate-into-grad backward kernels)."""
    learner = net.learner
    batch_size = net.batch_size
    specs = {t.key: t for t in net.param_specs()}

    seen = opt_state["seen"] + batch_size
    it = seen // batch_size
    lr = learning_rate(learner, it)
    momentum = learner.momentum
    decay = learner.decay

    new_params = dict(params)
    velocity = dict(opt_state["velocity"])
    adam_m = dict(opt_state["adam_m"])
    adam_v = dict(opt_state["adam_v"])

    # Adam bias correction exponent: reference passes learner->seen
    if learner.optimizer == Optimizer.ADAM:
        t_exp = (seen + 1).astype(jnp.float32)
        mu = jnp.sqrt(1.0 - jnp.power(learner.beta2, t_exp)) / (
            1.0 - jnp.power(learner.beta1, t_exp)
        )

    for k in params:
        t = specs[k]
        if not t.trainable:
            continue
        g = grads[k]
        p = params[k]
        if t.grad_div_batch:
            # deconv weight-grad quirk: the reference's dW GEMM alone uses
            # alpha = 1/batch_size (bcnn_deconv_layer.c:206) — no other
            # layer scales its gradients
            g = g / batch_size
        bdiv = 1 if t.batch_div_one else batch_size
        if t.weight_decay and decay:
            g = g + decay * bdiv * p
        if learner.optimizer == Optimizer.ADAM and t.adam_capable:
            m = (1.0 - learner.beta1) * g + learner.beta1 * adam_m[k]
            v = (1.0 - learner.beta2) * jnp.square(g) + learner.beta2 * adam_v[k]
            new_params[k] = p - (lr / bdiv) * mu * m / (jnp.sqrt(v) + ADAM_EPS)
            adam_m[k], adam_v[k] = m, v
        else:
            vnew = g + momentum * velocity[k]
            new_params[k] = p - (lr / bdiv) * vnew
            velocity[k] = vnew

    return new_params, {
        "seen": seen,
        "velocity": velocity,
        "adam_m": adam_m,
        "adam_v": adam_v,
    }

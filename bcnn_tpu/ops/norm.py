"""Batch normalization.

Math mirrors bcnn_forward_batchnorm_cpu
(src/layers/bcnn_batchnorm_layer.c:147-245):
  - TRAIN: batch mean / *biased* variance over (N,H,W); running stats
    updated as run = 0.9*run + 0.1*batch (lines 220-223); normalize with
    eps = 1e-6 (line 178); then y = y*scales + biases.
  - VALID: normalize with running stats, then scale/shift.
  - PREDICT (folded): y = y*scales + biases, with the fold done at weight
    load (bcnn_net.c:1281-1292); PREDICT without a fold behaves like VALID.

The reference backward uses eps = 1e-5 (line 278) while forward uses 1e-6 —
autodiff here uses the forward's 1e-6 consistently (the mathematically
consistent choice).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

EPS = 1e-6
RUN_MOMENTUM = 0.9


def batch_norm(
    x: jax.Array,
    scales: jax.Array,
    biases: jax.Array,
    run_mean: jax.Array,
    run_var: jax.Array,
    training: bool,
    folded: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """x: NHWC. Returns (y, new_run_mean, new_run_var)."""
    if folded and not training:
        return x * scales + biases, run_mean, run_var
    if training:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(x), axis=(0, 1, 2)) - jnp.square(mean)
        new_mean = RUN_MOMENTUM * run_mean + (1.0 - RUN_MOMENTUM) * mean
        new_var = RUN_MOMENTUM * run_var + (1.0 - RUN_MOMENTUM) * var
    else:
        # stay in the activation dtype on the inference perf path
        mean, var = run_mean.astype(x.dtype), run_var.astype(x.dtype)
        new_mean, new_var = run_mean, run_var
    x_norm = (x - mean) * jax.lax.rsqrt(var + EPS)
    return x_norm * scales + biases, new_mean, new_var

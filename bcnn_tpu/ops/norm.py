"""Batch normalization.

Math mirrors bcnn_forward_batchnorm_cpu
(src/layers/bcnn_batchnorm_layer.c:147-245):
  - TRAIN: batch mean / *biased* variance over (N,H,W); running stats
    updated as run = 0.9*run + 0.1*batch (lines 220-223); normalize with
    eps = 1e-6 (line 178); then y = y*scales + biases.
  - VALID: normalize with running stats, then scale/shift.
  - PREDICT (folded): y = y*scales + biases, with the fold done at weight
    load (bcnn_net.c:1281-1292); PREDICT without a fold behaves like VALID.

The TRAIN backward replicates the reference's hand-written rule
(bcnn_backward_batchnorm_cpu, :263-299) EXACTLY rather than
differentiating the forward — the reference's backward is NOT the true
gradient of its forward:
  - it normalizes with eps 1e-5 (:278,:293) while the forward used 1e-6
    (:178) — for channels whose batch variance is << 1e-5 (e.g. a conv
    channel with a tiny weight) the two rsqrt factors differ by up to
    sqrt(10), which is what the randomized trajectory parity caught in
    round 3;
  - the d(var) term is scaled by c/(var^1.5 + 1e-5) (bcnn_varnorm,
    bcnn_mat.c:692-696) — eps added to var^1.5, not to var;
  - the d(mean) term omits the variance-path contribution (zero-sum in
    exact arithmetic; darknet-style shortcut).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

EPS = 1e-6
EPS_BWD = 1e-5  # the reference backward's eps (bcnn_batchnorm_layer.c:278)
RUN_MOMENTUM = 0.9


@jax.custom_vjp
def _bn_train_ref(x: jax.Array, scales: jax.Array, biases: jax.Array):
    """TRAIN-mode normalize + scale + bias over NHWC with the reference's
    exact backward (see module docstring). Batch stats are recomputed in
    the fwd pass of the vjp; callers obtain them separately for the
    running-stat update (pure duplicate work that XLA CSEs away)."""
    mean = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(x), axis=(0, 1, 2)) - jnp.square(mean)
    x_norm = (x - mean) * jax.lax.rsqrt(var + EPS)
    return x_norm * scales + biases


def _bn_train_ref_fwd(x, scales, biases):
    mean = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(x), axis=(0, 1, 2)) - jnp.square(mean)
    x_norm = (x - mean) * jax.lax.rsqrt(var + EPS)
    return x_norm * scales + biases, (x, mean, var, x_norm, scales)


def _bn_train_ref_bwd(res, g):
    x, mean, var, x_norm, scales = res
    n = x.shape[0] * x.shape[1] * x.shape[2]  # b * wxh
    dbias = jnp.sum(g, axis=(0, 1, 2))
    dscale = jnp.sum(g * x_norm, axis=(0, 1, 2))
    dyh = g * scales
    inv = 1.0 / jnp.sqrt(var + EPS_BWD)  # :278,:293 — NOT the fwd eps
    mean_diff = jnp.sum(dyh, axis=(0, 1, 2)) * (-inv)
    var_diff = jnp.sum(dyh * (x - mean), axis=(0, 1, 2)) * (
        -0.5 / (var * jnp.sqrt(var) + EPS_BWD)  # bcnn_varnorm
    )
    dx = (
        dyh * inv
        + var_diff * 2.0 * (x - mean) / n
        + mean_diff / n
    )
    return dx, dscale, dbias


_bn_train_ref.defvjp(_bn_train_ref_fwd, _bn_train_ref_bwd)


def batch_norm(
    x: jax.Array,
    scales: jax.Array,
    biases: jax.Array,
    run_mean: jax.Array,
    run_var: jax.Array,
    training: bool,
    folded: bool = False,
    frozen_stats: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """x: NHWC. Returns (y, new_run_mean, new_run_var).

    frozen_stats (net.bn_frozen_stats): TRAIN normalizes with the
    step-start RUNNING stats as constants (no sample coupling through
    mean/var, no d(stats)/dx terms) while still updating the running
    EMAs from the batch stats. This is the standard "frozen BN"
    semantics (fine-tuning / ghost-batch-free), and it is what makes
    microbatched pipeline parallelism EXACT: per-sample independence
    means k microbatches reproduce the full batch bit-for-bit
    (parallel/pipeline.py, test_pipeline.py). Deviation from the
    reference's per-batch-stats BN is deliberate and opt-in; running
    stats must be warm (e.g. run_var=1 init or a few unfrozen steps) or
    the 1/sqrt(var+eps) blows up."""
    if folded and not training:
        return x * scales + biases, run_mean, run_var
    if training:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(x), axis=(0, 1, 2)) - jnp.square(mean)
        new_mean = RUN_MOMENTUM * run_mean + (1.0 - RUN_MOMENTUM) * mean
        new_var = RUN_MOMENTUM * run_var + (1.0 - RUN_MOMENTUM) * var
        if frozen_stats:
            rm = jax.lax.stop_gradient(run_mean)
            rv = jax.lax.stop_gradient(run_var)
            y = (x - rm) * jax.lax.rsqrt(rv + EPS) * scales + biases
        else:
            y = _bn_train_ref(x, scales, biases)
        return y, jax.lax.stop_gradient(new_mean), jax.lax.stop_gradient(
            new_var
        )
    # stay in the activation dtype on the inference perf path
    mean, var = run_mean.astype(x.dtype), run_var.astype(x.dtype)
    x_norm = (x - mean) * jax.lax.rsqrt(var + EPS)
    return x_norm * scales + biases, run_mean, run_var

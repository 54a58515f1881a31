"""Cost layer math: euclidean loss + evaluation metrics.

Mirrors src/layers/bcnn_cost_layer.c:
  - the training gradient into src is always scale * (x - label)
    (bcnn_euclidean_loss_forward :111-128 writes (x - label) into dst grad,
    bcnn_euclidean_loss_backward :130-140 axpy's scale * that into src grad);
    realized here as the surrogate scale * 0.5 * sum((x-label)^2) whose
    autodiff gradient is exactly that;
  - the *reported* value is the metric from bcnn_compute_error (:142-245),
    not the surrogate: ERROR_RATE counts top-1 mismatches per batch, SSE is
    sum of squared errors, MSE divides by c*h*w, LOGLOSS sums -log(p) over
    positive labels, DICE is the thresholded Sørensen-Dice sum. CRPS in the
    reference computes a temporary and discards it, returning the same value
    as SSE (:188-210) — replicated as SSE.

bcnn_get_loss (bcnn_net.c:431-450) then averages the metric over cost nodes.

Inputs here are flat (N, c*h*w) in NCHW element order (compile.py converts
NHWC activations before calling), so argmax/label indexing matches the
reference exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..types import Metric


def euclidean_surrogate(x: jax.Array, label: jax.Array, scale: float):
    """Differentiable surrogate; d/dx == scale * (x - label)."""
    diff = x - jax.lax.stop_gradient(label)
    return 0.5 * scale * jnp.sum(jnp.square(diff))


def huber(x: jax.Array, label: jax.Array, hdelta: float = 1.0):
    """Huber loss (bcnn_huber_loss, bcnn_cost_layer.c:93-109 — present but
    unused in the reference; provided for the same completeness).
    Returns (error, grad) with the reference's exact piecewise forms:
    quadratic e^2 inside |e| <= delta, linearized 2*delta*|e| - delta^2
    outside with a clipped +-1 gradient."""
    e = x - label
    inside = jnp.abs(e) <= hdelta
    err = jnp.sum(
        jnp.where(inside, e * e, 2.0 * hdelta * jnp.abs(e) - hdelta * hdelta)
    )
    grad = jnp.where(inside, e, jnp.sign(e))
    return err, grad


def compute_metric(x: jax.Array, label: jax.Array, metric: Metric):
    """x, label: (N, F) flat NCHW order. Returns the scalar the reference
    stores in dst data[0]."""
    if metric == Metric.ERROR_RATE:
        j_best = jnp.argmax(x, axis=1)
        picked = jnp.take_along_axis(label, j_best[:, None], axis=1)[:, 0]
        return jnp.sum(picked == 0.0).astype(jnp.float32)
    if metric in (Metric.SSE, Metric.CRPS):
        d = x - label
        return jnp.sum(d * d)
    if metric == Metric.MSE:
        d = x - label
        return jnp.sum(d * d) / x.shape[1]
    if metric == Metric.LOGLOSS:
        p = jnp.clip(x, 1e-8, 1.0 - 1e-8)
        return jnp.sum(jnp.where(label > 0.0, -jnp.log(p), 0.0))
    if metric == Metric.DICE:
        pred = (x > 0.5).astype(jnp.float32)
        # reference truncates the per-sample sums to int (bcnn_cost_layer.c
        # :225-236 accumulates into ints)
        n = jnp.sum(label * pred, axis=1).astype(jnp.int32)
        d = jnp.sum(label + pred, axis=1).astype(jnp.int32)
        return jnp.sum((2.0 * n + 1.0) / (d + 1.0))
    raise ValueError(f"unknown metric {metric}")

"""Lifted structured similarity loss (Song et al. 2015).

Mirrors src/layers/bcnn_lifted_structure_loss.c:16-319:
  - squared distances D^2 = |xi|^2 + |xj|^2 - 2 xi.xj over the batch (:57-91);
  - pairwise same-class matrix from the first positive element of each
    one-hot label row (:96-122);
  - for every positive pair (i, j), i < j:
        J_ij = log( sum_{k: neg of i} e^{margin - D_ik}
                  + sum_{k: neg of j} e^{margin - D_jk} ) + D_ij
    hinged at 0, margin = 1 (:128-220);
  - loss = sum max(0, J)^2 / P  with P the positive-pair count (:281);
  - gradient = scale/P * d(sum J^2)/dx (:300-318) — the reference's
    hand-written accumulation is exactly the analytic gradient, so autodiff
    of the surrogate below reproduces it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MARGIN = 1.0


def lifted_struct_surrogate(
    x: jax.Array, label: jax.Array, scale: float
) -> jax.Array:
    """x: (B, K) embeddings; label: (B, L) one-hot. Returns the
    differentiable scale * loss (loss value = surrogate / scale)."""
    b = x.shape[0]
    sq = jnp.sum(jnp.square(x), axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * x @ x.T
    d = jnp.sqrt(jnp.maximum(d2, 1e-20))

    cls = jnp.where(
        jnp.any(label > 0, axis=1), jnp.argmax(label > 0.0, axis=1), -1
    )
    same = cls[:, None] == cls[None, :]

    # per-anchor negative log-sum-exp terms
    e = jnp.where(same, 0.0, jnp.exp(MARGIN - d))  # (B,B)
    row = jnp.sum(e, axis=1)  # (B,)

    upper = jnp.triu(jnp.ones((b, b), bool), k=1)
    pos_pair = same & upper
    j_mat = jnp.log(jnp.maximum(row[:, None] + row[None, :], 1e-30)) + d
    hinged = jnp.maximum(j_mat, 0.0)
    total = jnp.sum(jnp.where(pos_pair, jnp.square(hinged), 0.0))
    p = jnp.maximum(jnp.sum(pos_pair), 1)
    return scale * total / p

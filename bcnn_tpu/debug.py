"""Debugging aids — the functional analogue of the reference's (absent)
sanitizers (SURVEY.md §5: "JAX is functional; add jax.debug/NaN checks").
"""

from __future__ import annotations

import jax


def enable_nan_checks(enable: bool = True):
    """Global NaN detection: any jitted op producing NaN raises with the
    offending primitive (jax_debug_nans)."""
    jax.config.update("jax_debug_nans", enable)


def enable_inf_checks(enable: bool = True):
    jax.config.update("jax_debug_infs", enable)


def check_pytree_finite(tree, name: str = "tree"):
    """Host-side assertion that every leaf is finite; returns the tree."""
    import numpy as np

    bad = []

    def visit(path, leaf):
        a = np.asarray(leaf)
        if not np.isfinite(a).all():
            bad.append((jax.tree_util.keystr(path), a.dtype, a.shape))

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise FloatingPointError(f"non-finite leaves in {name}: {bad}")
    return tree

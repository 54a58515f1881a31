"""Shared example helpers."""

import os


def honor_jax_platforms():
    """Apply JAX_PLATFORMS (e.g. =cpu for chip-less smoke runs): the
    container's sitecustomize pins the axon TPU plugin, so the env var
    alone does not switch backends — jax.config.update after import does
    (the tests/conftest.py pattern)."""
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

"""VMEM-resident Pallas shear sweep (ops/shear_pallas.py) vs the XLA
fori_loop sweep it replaces (data/device_augment._row_shift).

Same taps, same hat weights, same ascending-k add order — equality is
gated at 1e-4 absolute on [0,255] values (one fma-contraction rounding,
see the module docstring) — far under the shear chain's own 2/255
documented tolerance vs the bilinear gather."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bcnn_tpu.data import device_augment as da
from bcnn_tpu.ops.shear_pallas import row_shift_pallas

ATOL = 1e-4


def _pal(img, d, kmax, out_w, k_local, fill):
    w = img.shape[1]
    pad_l, pad_r = kmax, (out_w - 1 + kmax) - (w - 1)
    imgp = jnp.pad(
        img, ((0, 0), (pad_l, pad_r + k_local), (0, 0)),
        constant_values=fill,
    )
    return row_shift_pallas(imgp, d, kmax, out_w, k_local, interpret=True)


@pytest.mark.parametrize("r,w,out_w,kmax,k_local", [
    (37, 53, 48, 9, 5),     # ragged rows (tail group edge-replicates d)
    (40, 64, 64, 6, 4),     # exact sublane multiple
    (8, 30, 20, 12, 10),    # single group, wide window
])
def test_row_shift_pallas_matches_sweep(r, w, out_w, kmax, k_local):
    rng = np.random.RandomState(r + w)
    img = jnp.asarray(rng.rand(r, w, 3).astype(np.float32) * 255)
    # per-row shifts within the group-spread bound: |slope| <= (k_local-3)/7
    slope = (k_local - 3) / 7.0 * 0.9
    d = jnp.clip(
        jnp.asarray((np.arange(r) - r / 2) * slope + 1.3, jnp.float32),
        -(kmax - 1), kmax - 1,
    )
    ref = np.asarray(da._row_shift(img, d, kmax, 0, out_w, 0, 127.0))
    got = np.asarray(_pal(img, d, kmax, out_w, k_local, 127.0))
    np.testing.assert_allclose(got, ref, rtol=0, atol=ATOL)


def test_row_shift_pallas_under_vmap_per_image_slopes():
    rng = np.random.RandomState(3)
    r, w, out_w, kmax, k_local = 21, 40, 36, 7, 5
    imgs = jnp.asarray(rng.rand(4, r, w, 3).astype(np.float32) * 255)
    slopes = jnp.asarray([0.05, -0.2, 0.25, 0.0], jnp.float32)
    ds = jnp.clip(
        (jnp.arange(r, dtype=jnp.float32)[None] - r / 2) * slopes[:, None],
        -(kmax - 1), kmax - 1,
    )
    ref = np.asarray(jax.vmap(
        lambda i, d: da._row_shift(i, d, kmax, 0, out_w, 0, 127.0)
    )(imgs, ds))
    got = np.asarray(jax.vmap(
        lambda i, d: _pal(i, d, kmax, out_w, k_local, 127.0)
    )(imgs, ds))
    np.testing.assert_allclose(got, ref, rtol=0, atol=ATOL)


def test_row_shift_pallas_integer_shifts_exact():
    """Integer d has one unit-weight tap — no interpolation arithmetic —
    so the kernel must be BIT-identical to the sweep there."""
    rng = np.random.RandomState(5)
    r, w, out_w, kmax, k_local = 16, 48, 40, 6, 4
    img = jnp.asarray(rng.rand(r, w, 3).astype(np.float32) * 255)
    d = jnp.asarray(rng.randint(-(kmax - 1), kmax - 1, r), jnp.float32)
    # constant-per-group so the spread bound holds for arbitrary ints
    d = jnp.repeat(d[::2][: r // 8 + 1], 8)[:r].astype(jnp.float32)
    ref = np.asarray(da._row_shift(img, d, kmax, 0, out_w, 0, 64.0))
    got = np.asarray(_pal(img, d, kmax, out_w, k_local, 64.0))
    np.testing.assert_array_equal(got, ref)


def test_augment_shear_chain_pallas_matches_sweep(monkeypatch):
    """End-to-end: the full three-shear rotation chain with the kernel
    routed in (BCNN_SHEAR_PALLAS=1) vs the XLA sweeps, through
    augment_batch's real geo='shear' path with per-image thetas."""
    rng_np = np.random.RandomState(11)
    x = (rng_np.rand(4, 48, 48, 3) * 255).astype(np.uint8)
    cfg = dict(rotation_range=25.0, random_fliph=1)
    key = jax.random.PRNGKey(9)

    monkeypatch.delenv("BCNN_SHEAR_PALLAS", raising=False)
    ref = np.asarray(da.augment_batch(jnp.asarray(x), key, cfg=cfg))
    monkeypatch.setenv("BCNN_SHEAR_PALLAS", "1")
    got = np.asarray(da.augment_batch(jnp.asarray(x), key, cfg=cfg))
    # three chained passes -> a few fma-contraction roundings per pixel
    # (measured max 3e-7 on this case)
    np.testing.assert_allclose(
        got.astype(np.float32), ref.astype(np.float32), rtol=0, atol=1e-5
    )

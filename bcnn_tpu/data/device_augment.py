"""On-device batched augmentation: the TPU-native bip.

The reference augments per-sample on the host in uint8 (bcnn_data.c:214-332,
backed by bip's scalar C kernels). Here the whole batch is augmented on
device inside the jitted step: one fused affine resample implements
flip + shift + scale + rotation in a single bilinear gather, followed by
elementwise contrast / brightness — so augmentation rides the VPU and
overlaps nothing on the host but file decode.

Parameter distributions match the host Augmenter (data/augment.py):
  shift ~ U(-range/2, range/2), scale ~ U(min,max), rotation ~
  U(-range/2, range/2) degrees, contrast ~ U(min,max), brightness ~
  U(min,max), flip with p=0.5. Pixels sampled outside the source read the
  augmentation fill value (128, like the host path's memset).

Geometry note: the host path applies shift/scale/rotation as three separate
resamples (each with its own rounding); the device path composes them into
ONE affine map — fewer interpolation losses, same distribution of views.
This is the documented fast path, not a bit-exact clone of the host chain.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

FILL = 128.0


def _bilinear_gather(img: jax.Array, xs: jax.Array, ys: jax.Array, fill):
    """img (H,W,C); xs, ys (H,W) source coordinates -> (H,W,C)."""
    h, w, _ = img.shape
    # clamp the interpolation cell to [0, n-2] and fold the remainder into
    # the fraction, so exact boundary coordinates (e.g. identity transform)
    # stay valid
    x0c = jnp.clip(jnp.floor(xs), 0, w - 2).astype(jnp.int32)
    y0c = jnp.clip(jnp.floor(ys), 0, h - 2).astype(jnp.int32)
    fx = (xs - x0c)[..., None]
    fy = (ys - y0c)[..., None]
    valid = (
        (xs >= 0) & (xs <= w - 1) & (ys >= 0) & (ys <= h - 1)
    )[..., None]
    p00 = img[y0c, x0c]
    p01 = img[y0c, x0c + 1]
    p10 = img[y0c + 1, x0c]
    p11 = img[y0c + 1, x0c + 1]
    out = (
        p00 * (1 - fx) * (1 - fy)
        + p01 * fx * (1 - fy)
        + p10 * (1 - fx) * fy
        + p11 * fx * fy
    )
    return jnp.where(valid, out, fill)


def _augment_one(img, params, fill=FILL):
    """img (H,W,C) float; params dict of scalars."""
    h, w, _ = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    # inverse map: output -> input.  flip then rotate(theta) then
    # scale(s, around center) then shift(tx, ty)
    cos_t = jnp.cos(params["theta"])
    sin_t = jnp.sin(params["theta"])
    inv_s = 1.0 / params["scale"]
    sx = (cos_t * xs - sin_t * ys) * inv_s + cx + params["tx"]
    sy = (sin_t * xs + cos_t * ys) * inv_s + cy + params["ty"]
    sx = jnp.where(params["flip"] > 0, (w - 1) - sx, sx)
    out = _bilinear_gather(img, sx, sy, fill)
    # contrast around the per-image mean, then brightness (bip semantics)
    mean = jnp.mean(out, axis=(0, 1), keepdims=True)
    out = (out - mean) * params["contrast"] + mean + params["brightness"]
    return jnp.clip(out, 0.0, 255.0)


def sample_params(rng: jax.Array, n: int, cfg: Dict) -> Dict[str, jax.Array]:
    ks = jax.random.split(rng, 7)

    def u(k, lo, hi):
        return jax.random.uniform(k, (n,), jnp.float32, lo, hi)

    theta = jnp.deg2rad(
        u(ks[0], -0.5, 0.5) * float(cfg.get("rotation_range", 0.0))
    )
    lo_s, hi_s = cfg.get("min_scale", 0.0), cfg.get("max_scale", 0.0)
    scale = (
        u(ks[1], lo_s, hi_s) if (lo_s or hi_s) else jnp.ones((n,))
    )
    tx = u(ks[2], -0.5, 0.5) * float(cfg.get("range_shift_x", 0))
    ty = u(ks[3], -0.5, 0.5) * float(cfg.get("range_shift_y", 0))
    lo_c, hi_c = cfg.get("min_contrast", 0.0), cfg.get("max_contrast", 0.0)
    contrast = (
        u(ks[4], lo_c, hi_c) if (lo_c or hi_c) else jnp.ones((n,))
    )
    lo_b, hi_b = cfg.get("min_brightness", 0), cfg.get("max_brightness", 0)
    brightness = (
        u(ks[5], lo_b, hi_b) if (lo_b or hi_b) else jnp.zeros((n,))
    )
    flip = (
        (jax.random.uniform(ks[6], (n,)) > 0.5).astype(jnp.float32)
        if cfg.get("random_fliph")
        else jnp.zeros((n,))
    )
    return dict(
        theta=theta, scale=scale, tx=tx, ty=ty,
        contrast=contrast, brightness=brightness, flip=flip,
    )


def augment_batch(
    batch_u8: jax.Array, rng: jax.Array, cfg: Dict,
    norm_coeff: float = 1 / 127.5, mean: float = 127.5,
) -> jax.Array:
    """batch: (N,H,W,C) uint8/float on device -> augmented, normalized
    (N,H,W,C) float32 in [-1,1]. Jit-friendly (static shapes)."""
    x = batch_u8.astype(jnp.float32)
    n = x.shape[0]
    params = sample_params(rng, n, cfg)
    out = jax.vmap(_augment_one)(x, params)
    return (out - mean) * norm_coeff


def augment_batch_nchw(batch_u8_nchw, rng, cfg, **kw):
    x = jnp.transpose(batch_u8_nchw, (0, 2, 3, 1))
    out = augment_batch(x, rng, cfg, **kw)
    return jnp.transpose(out, (0, 3, 1, 2))

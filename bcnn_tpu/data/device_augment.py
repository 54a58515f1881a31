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

import functools
import math
import os
from typing import Dict

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


def _noise2d_i32(ix, iy, seed):
    """bip's _bip_noise2d integer hash (bip.c:154-160) on the VPU; int32
    ops wrap like C."""
    i = (
        ix.astype(jnp.int32) * jnp.int32(1619)
        + iy.astype(jnp.int32) * jnp.int32(31337)
        + seed.astype(jnp.int32) * jnp.int32(13397)
    )
    n = jnp.bitwise_xor(jnp.left_shift(i, 13), i)
    m = (
        n * (n * n * jnp.int32(15731) + jnp.int32(789221))
        + jnp.int32(1376312589)
    ) & jnp.int32(0x7FFFFFFF)
    return 1.0 - m.astype(jnp.float32) / 1073741824.0


def _smooth2d_dev(x, y, seed):
    ix = jnp.floor(x)
    iy = jnp.floor(y)
    fx = x - ix
    fy = y - iy
    v1 = _noise2d_i32(ix, iy, seed)
    v2 = _noise2d_i32(ix + 1, iy, seed)
    v3 = _noise2d_i32(ix, iy + 1, seed)
    v4 = _noise2d_i32(ix + 1, iy + 1, seed)

    def interp(a, b, t):
        tt = (1.0 - jnp.cos(t * jnp.pi)) * 0.5
        return a * (1.0 - tt) + b * tt

    return interp(interp(v1, v2, fx), interp(v3, v4, fx), fy)


def _perlin_one(img, distortion, kx, ky, seed):
    """Device port of bip_image_perlin_distortion (bip.c:205-266): single
    octave, same displacement on x and y, bilinear with zero outside,
    C-truncation quirk for the sample cell."""
    h, w, _ = img.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    x_norm = xs / w
    y_norm = ys / h
    noise = _smooth2d_dev(x_norm + kx, y_norm + ky, seed)
    px = (x_norm + noise * distortion) * w
    py = (y_norm + noise * distortion) * h
    x_map = px.astype(jnp.int32)  # C cast truncates toward zero
    y_map = py.astype(jnp.int32)
    fx = (px - jnp.floor(px))[..., None]
    fy = (py - jnp.floor(py))[..., None]
    valid = (
        (x_map >= 0) & (x_map < w - 1) & (y_map >= 0) & (y_map < h - 1)
    )[..., None]
    xm = jnp.clip(x_map, 0, w - 2)
    ym = jnp.clip(y_map, 0, h - 2)
    out = (
        img[ym, xm] * (1 - fx) * (1 - fy)
        + img[ym, xm + 1] * fx * (1 - fy)
        + img[ym + 1, xm] * (1 - fx) * fy
        + img[ym + 1, xm + 1] * fx * fy
    )
    # host path rounds through uint8 here; keep float but clamp the same
    out = jnp.clip(out, 0.0, 255.0)
    return jnp.where(valid, out, 0.0)


def _spotlights_one(img, mu_x, mu_y, sx, sy, active):
    """Device port of bip_add_random_spotlights (bip.c:282-317): additive
    255*gaussian per spot, clamped AFTER EACH spot (host order). Spot
    count is dynamic on the host; here a static max_spots loop with an
    `active` mask per slot."""
    h, w, _ = img.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    out = img
    for i in range(mu_x.shape[0]):
        val = jnp.exp(
            -0.5
            * (
                (xs - mu_x[i]) ** 2 / (sx[i] * sx[i])
                + (ys - mu_y[i]) ** 2 / (sy[i] * sy[i])
            )
        )
        out = jnp.clip(
            out + 255.0 * val[..., None] * active[i], 0.0, 255.0
        )
    return out


def _interp_matrix(coords, n):
    """(m,) source coordinates -> ((m, n) two-tap bilinear weights with
    the gather path's clamped-cell semantics, (m,) in-range mask)."""
    c0 = jnp.clip(jnp.floor(coords), 0, n - 2).astype(jnp.int32)
    f = (coords - c0)[:, None]
    j = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    W = (
        (j == c0[:, None]) * (1.0 - f) + (j == c0[:, None] + 1) * f
    ).astype(jnp.float32)
    valid = (coords >= 0) & (coords <= n - 1)
    return W, valid


def _row_shift(img, d, kmax, out_x0, out_w, in_x0, fill, k_local=None):
    """Per-row two-tap fractional shift along axis 1, gather-free.

    out[r, j, c] = bilinear sample of row r at absolute x = out_x0+j+d[r],
    where img's columns cover absolute x in [in_x0, in_x0+img.shape[1])
    and `fill` extends outside. Computed as a sum over STATIC integer
    shifts k in [-kmax, kmax] of hat(d[r]-k) * IMG[r, out_x0+j+k] — the
    two-tap bilinear shift is EXACTLY the linear interpolation between
    the two adjacent integer-shift operators, so this equals the gather
    formulation for |d| <= kmax - 1 while lowering to dense fma sweeps
    over statically-sliced views (TPU gathers don't vectorize; see
    BENCHMARKS.md rotation pathology).

    On TPU, when the caller supplies a static `k_local` (its bound on
    the per-8-row tap spread, from the cfg's rotation_range), the sweep
    runs as a VMEM-resident Pallas kernel (ops/shear_pallas.py) by
    default: identical taps and weights in identical order, but each
    sublane group sweeps only its own k_local columns and HBM sees one
    read + one write instead of 2*kmax+1 streamed accumulator passes.
    Measured on-chip (same-session A/B, batch-256 images+boxes at 416,
    round 5): 284.0 -> 122.0 ms/batch at rotation_range=10 and
    702.9 -> 126.6 ms at range=30 (2.3x / 5.6x, ~21x over the original
    bilinear gather), outputs bit-identical on chip. BCNN_SHEAR_PALLAS=0
    reverts to the XLA sweep; =1 forces the kernel (interpret mode off
    TPU, used by the parity tests)."""
    r, win, c = img.shape
    lo = out_x0 - kmax  # first absolute column any term reads
    hi = out_x0 + out_w - 1 + kmax
    pad_l = in_x0 - lo
    pad_r = hi - (in_x0 + win - 1)
    if pad_l < 0:
        img = jax.lax.slice_in_dim(img, -pad_l, win, axis=1)
        pad_l = 0
    if pad_r < 0:
        img = jax.lax.slice_in_dim(img, 0, img.shape[1] + pad_r, axis=1)
        pad_r = 0
    knob = os.environ.get("BCNN_SHEAR_PALLAS", "auto")
    use_pallas = (
        k_local is not None
        and knob != "0"
        # default ON for real TPU lowering; interpret mode (CPU tests)
        # only when forced — the interpreter is slower than the sweep
        and (knob == "1" or jax.default_backend() == "tpu")
    )
    if use_pallas:
        from ..ops.shear_pallas import row_shift_pallas

        # the group sweep may read up to k_local columns past any row's
        # own (zero-weight beyond its two taps) — extend the fill pad
        imgp = jnp.pad(
            img, ((0, 0), (pad_l, pad_r + k_local), (0, 0)),
            constant_values=fill,
        )
        return row_shift_pallas(
            imgp.astype(jnp.float32), d, kmax, out_w, k_local,
            interpret=jax.default_backend() != "tpu",
        ).astype(img.dtype)
    imgp = jnp.pad(
        img, ((0, 0), (pad_l, pad_r), (0, 0)), constant_values=fill
    )

    # fori_loop, NOT an unrolled static-slice sum: XLA reassociates long
    # add chains into a tree and keeps dozens of full-size intermediates
    # live at once (measured 23.8 GB for batch 256 at 416 — OOM); the
    # loop carries ONE accumulator. The loop index is a shared scalar,
    # so under vmap the dynamic slice stays a slice (no gather).
    def body(i, acc):
        w_k = jnp.maximum(0.0, 1.0 - jnp.abs(d - (i - kmax)))[:, None, None]
        sl = jax.lax.dynamic_slice_in_dim(imgp, i, out_w, axis=1)
        return acc + w_k * sl

    return jax.lax.fori_loop(
        0, 2 * kmax + 1, body, jnp.zeros((r, out_w, c), img.dtype)
    )


def _rotate_3shear(mid, theta, h, w, kx, ky, kx2, myc, mxc, fill,
                   k_locals=(None, None, None)):
    """Pure rotation about the (h, w) frame's center, gather-free:
    Paeth's three-shear decomposition R(theta) = Shx(-tan(theta/2)) ·
    Shy(sin(theta)) · Shx(-tan(theta/2)), each shear an axis-separable
    per-row/per-column fractional shift (_row_shift). `mid` is the
    pre-rotation content on an EXPANDED canvas (h+2*myc, w+2*mxc, C)
    with absolute origin (-myc, -mxc): rotation reads up to the rotated
    frame's bounding box, so in-frame outputs whose pre-rotation source
    lies outside the frame (zoom-in / shift-back compositions) see real
    content instead of fill. Replaces the 4-tap bilinear gather for the
    rotation warp (reference semantics: bip_rotate_image,
    /root/reference/src/bip/src/bip.c:1202)."""
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    alpha = -jnp.tan(theta / 2.0)
    beta = jnp.sin(theta)
    # pass 1: x-shear of every content row; output columns [-kx, w-1+kx]
    d1e = alpha * (
        jnp.arange(h + 2 * myc, dtype=jnp.float32) - myc - cy
    )
    r3 = _row_shift(mid, d1e, kx2, -kx, w + 2 * kx, -mxc, fill,
                    k_local=k_locals[0])
    # pass 2: y-shear over the extended columns (transpose -> rows);
    # rows beyond the content extent read fill via _row_shift's padding
    d2 = beta * (jnp.arange(w + 2 * kx, dtype=jnp.float32) - kx - cx)
    r2 = jnp.transpose(
        _row_shift(jnp.transpose(r3, (1, 0, 2)), d2, ky, 0, h, -myc, fill,
                   k_local=k_locals[1]),
        (1, 0, 2),
    )
    # pass 3: x-shear back to [0, w)
    d1 = alpha * (jnp.arange(h, dtype=jnp.float32) - cy)
    return _row_shift(r2, d1, kx, 0, w, -kx, fill, k_local=k_locals[2])


def _shear_bounds(rot_deg, h, w, s_max=1.0, txm=0.0, tym=0.0):
    """Static (trace-time) extents for the shear chain given the cfg's
    rotation_range (degrees, FULL width: |theta| <= rot_deg/2) and the
    scale/shift envelopes. Returns (kx, ky, kx2, myc, mxc):
    kx/ky/kx2 bound the per-pass shift spans; myc/mxc are the content
    canvas half-extensions — the rotation stage reads pre-rotation
    coordinates q with |q_x - cx| <= min(rotated-frame bbox,
    s_max*(cx+|tx|max)) (only reads whose separable-stage source lands
    in frame matter), +1 for the bilinear cell."""
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    theta_max = math.radians(rot_deg) / 2.0
    a = math.tan(theta_max / 2.0)  # |alpha| bound
    b = math.sin(theta_max)  # |beta| bound
    mxc = int(min(math.ceil(cy * b),
                  math.ceil(max(0.0, s_max * (cx + txm) - cx)))) + 1
    myc = int(min(math.ceil(cx * b),
                  math.ceil(max(0.0, s_max * (cy + tym) - cy)))) + 1
    kx = int(math.ceil(a * cy)) + 1
    kx2 = int(math.ceil(a * (cy + myc))) + 1
    ky = int(math.ceil(b * (cx + kx))) + 1
    return kx, ky, kx2, myc, mxc


def _warp_separable(img, params, fill, ey=0, ex=0, edge_clamp=False):
    """Scale/shift/flip warp as two batched two-tap interpolation matmuls
    (out = Wx @ (Wy @ img)) on the MXU; validity/fill is the outer
    product of the per-axis in-range masks (see _augment_one geo
    docstring). ey/ex extend the OUTPUT canvas beyond the frame (for the
    shear chain's expanded pre-rotation content); the frame itself stays
    at rows [ey, ey+h), cols [ex, ex+w). edge_clamp=True replaces the
    fill mask with edge replication (source coords clamped into the
    frame) — the shear chain uses this so its boundary blends mimic the
    gather's clamped-cell edge behavior; the composed-map fill mask is
    applied downstream instead."""
    h, w, _ = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    inv_s = 1.0 / params["scale"]
    ys = jnp.arange(h + 2 * ey, dtype=jnp.float32) - ey
    xs = jnp.arange(w + 2 * ex, dtype=jnp.float32) - ex
    sy = (ys - cy) * inv_s + cy + params["ty"]
    sx = (xs - cx) * inv_s + cx + params["tx"]
    sx = jnp.where(params["flip"] > 0, (w - 1) - sx, sx)
    if edge_clamp:
        sy = jnp.clip(sy, 0, h - 1)
        sx = jnp.clip(sx, 0, w - 1)
    Wy, vy = _interp_matrix(sy, h)
    Wx, vx = _interp_matrix(sx, w)
    tmp = jnp.einsum(
        "ih,hwc->iwc", Wy, img, precision=jax.lax.Precision.HIGHEST
    )
    out = jnp.einsum(
        "jw,iwc->ijc", Wx, tmp, precision=jax.lax.Precision.HIGHEST
    )
    if edge_clamp:
        return out
    return jnp.where((vy[:, None] & vx[None, :])[..., None], out, fill)


def _augment_one(img, params, fill=FILL, geo="full", rot_deg=0.0,
                 sep=False, s_max=1.0, txm=0.0, tym=0.0):
    """img (H,W,C) float; params dict of scalars (per-image).

    `geo` is STATIC, decided from the cfg at trace time:

    - "none": no rotation/scale/shift requested — the warp is
      identity-or-mirror; a per-image selected lane reversal replaces
      the 4-tap `_bilinear_gather` (~0.5 B per-pixel gathers per
      416x416 batch-256 step, measured 2.5 s/step on TPU — gathers
      don't vectorize on the VPU the way a reversal does).
      Bit-identical to the warp at theta=0/scale=1/t=0.
    - "separable": scale/shift/flip but NO rotation — the source
      coordinate of axis y depends only on y and of x only on x, so
      the SAME bilinear math factors into two batched two-tap
      interpolation matmuls (out = Wx @ (Wy @ img)) that run on the
      MXU instead of gathering on the VPU; validity/fill is the outer
      product of the per-axis in-range masks, exactly the gather's
      rectangle. Same values to float-reassociation tolerance (the
      4-term bilinear sum regrouped as rows-then-cols; tested).
    - "shear": rotation requested — run the same separable warp (or the
      plain flip when `sep` is False), then rotate about the center via
      the Paeth three-shear decomposition (_rotate_3shear): each shear
      is again an axis-separable two-tap interpolation, so the whole
      chain is gather-free. The composed map equals the gather's affine
      (flip∘translate∘scale∘rotate = G∘R with G separable), and the
      gather's exact out-of-source fill rectangle is re-applied from the
      closed-form composed coordinates at the end. Values differ from
      the one-pass gather only by the standard multi-pass resampling
      tolerance (sequential bilinear passes; tested). `rot_deg` is the
      STATIC cfg rotation_range bounding the shear spans.
    - "full": the 4-tap bilinear gather (kept for rotation_range > 90
      where tan(theta/2) blows up the shear spans, and for A/B via
      BCNN_ROT_GATHER=1)."""
    h, w, _ = img.shape
    if geo == "none":
        out = jnp.where(params["flip"] > 0, img[:, ::-1, :], img)
    elif geo == "separable":
        out = _warp_separable(img, params, fill)
    elif geo == "shear":
        kx, ky, kx2, myc, mxc = _shear_bounds(rot_deg, h, w, s_max, txm,
                                              tym)
        if sep:
            mid = _warp_separable(img, params, fill, ey=myc, ex=mxc,
                                  edge_clamp=True)
        else:
            flipped = jnp.where(params["flip"] > 0, img[:, ::-1, :], img)
            mid = jnp.pad(
                flipped, ((myc, myc), (mxc, mxc), (0, 0)), mode="edge"
            )
        # static per-8-row tap-spread bounds for the Pallas group sweep
        # (shear shift is linear in the row index with |slope| bounded by
        # the cfg's rotation_range; +3 covers floor straddles, see
        # ops/shear_pallas.py)
        tmax = math.radians(rot_deg) / 2.0
        kl_a = int(math.ceil(7.0 * math.tan(tmax / 2.0))) + 3
        kl_b = int(math.ceil(7.0 * math.sin(tmax))) + 3
        out = _rotate_3shear(mid, params["theta"], h, w, kx, ky, kx2,
                             myc, mxc, fill, k_locals=(kl_a, kl_b, kl_a))
        # re-apply the gather path's exact fill region from the composed
        # inverse map (flip maps the frame to itself, so it drops out of
        # the validity test)
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
        xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
        cos_t = jnp.cos(params["theta"])
        sin_t = jnp.sin(params["theta"])
        inv_s = 1.0 / params["scale"]
        sx = (cos_t * xs - sin_t * ys) * inv_s + cx + params["tx"]
        sy = (sin_t * xs + cos_t * ys) * inv_s + cy + params["ty"]
        valid = (
            (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
        )[..., None]
        out = jnp.where(valid, out, fill)
    else:
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
    out = jnp.clip(out, 0.0, 255.0)
    # perlin distortion then spotlights, in the host augmenter's order
    # (bcnn_apply_data_augmentation, bcnn_data.c:214-332)
    if "distortion" in params:
        distorted = _perlin_one(
            out, params["distortion"], params["dist_kx"],
            params["dist_ky"], params["dist_seed"],
        )
        out = jnp.where(params["distortion"] > 0, distorted, out)
    if "spot_mu_x" in params:
        out = _spotlights_one(
            out, params["spot_mu_x"], params["spot_mu_y"],
            params["spot_sx"], params["spot_sy"], params["spot_active"],
        )
    return out


def _geo_mode(cfg: Dict) -> str:
    """Static (trace-time) warp classification for _augment_one's `geo`:
    "none" (flip only — lane reversal), "separable" (scale/shift but no
    rotation — MXU matmul warp), "shear" (rotation <= 90 deg range —
    gather-free three-shear chain), "full" (bilinear gather: rotation
    ranges beyond the shear decomposition's sweet spot, or forced via
    BCNN_ROT_GATHER=1 for A/B)."""
    rot = float(cfg.get("rotation_range", 0.0))
    if rot:
        if rot <= 90.0 and not os.environ.get("BCNN_ROT_GATHER"):
            return "shear"
        return "full"
    if (float(cfg.get("min_scale", 0.0)) or float(cfg.get("max_scale", 0.0))
            or float(cfg.get("range_shift_x", 0))
            or float(cfg.get("range_shift_y", 0))):
        return "separable"
    return "none"


def _geo_kwargs(cfg: Dict) -> Dict:
    """Static kwargs for _augment_one derived from the cfg."""
    geo = _geo_mode(cfg)
    kw = dict(geo=geo)
    if geo == "shear":
        kw["rot_deg"] = float(cfg.get("rotation_range", 0.0))
        lo_s = float(cfg.get("min_scale", 0.0))
        hi_s = float(cfg.get("max_scale", 0.0))
        txm = float(cfg.get("range_shift_x", 0)) / 2.0
        tym = float(cfg.get("range_shift_y", 0)) / 2.0
        kw["sep"] = bool(lo_s or hi_s or txm or tym)
        kw["s_max"] = max(lo_s, hi_s, 1.0) if (lo_s or hi_s) else 1.0
        kw["txm"] = txm
        kw["tym"] = tym
    return kw


def _needs_geo(cfg: Dict) -> bool:
    return _geo_mode(cfg) != "none"


def sample_params(rng: jax.Array, n: int, cfg: Dict) -> Dict[str, jax.Array]:
    rng, k_extra = jax.random.split(rng)
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
    out = dict(
        theta=theta, scale=scale, tx=tx, ty=ty,
        contrast=contrast, brightness=brightness, flip=flip,
    )
    max_dist = float(cfg.get("max_distortion", 0.0))
    if max_dist > 0.0:
        kd = jax.random.split(k_extra, 4)
        out["distortion"] = u(kd[0], 0.0, max_dist)
        out["dist_kx"] = u(kd[1], -0.5, 0.5)
        out["dist_ky"] = u(kd[2], -0.5, 0.5)
        out["dist_seed"] = jax.random.randint(
            kd[3], (n,), 0, 2**31 - 1, jnp.int32
        )
        k_extra = kd[3]
    max_spots = int(cfg.get("max_random_spots", 0))
    if max_spots > 0:
        km = jax.random.split(k_extra, 5)
        # host: n_spots = int(rand*max + 0.5); spot i active iff i < n
        n_spots = jnp.floor(
            jax.random.uniform(km[0], (n,)) * max_spots + 0.5
        )
        idx = jnp.arange(max_spots, dtype=jnp.float32)
        out["spot_active"] = (
            idx[None, :] < n_spots[:, None]
        ).astype(jnp.float32)  # (n, max_spots)
        # host: mu = int(rand*(dim-1)+0.5), sigma = rand*(3-0.3)+0.3+0.5
        hh = int(cfg["_img_h"])
        ww = int(cfg["_img_w"])
        out["spot_mu_x"] = jnp.floor(
            jax.random.uniform(km[1], (n, max_spots)) * (ww - 1) + 0.5
        )
        out["spot_mu_y"] = jnp.floor(
            jax.random.uniform(km[2], (n, max_spots)) * (hh - 1) + 0.5
        )
        out["spot_sx"] = (
            jax.random.uniform(km[3], (n, max_spots)) * (3.0 - 0.3)
            + 0.3 + 0.5
        )
        out["spot_sy"] = (
            jax.random.uniform(km[4], (n, max_spots)) * (3.0 - 0.3)
            + 0.3 + 0.5
        )
    return out


def augment_batch(
    batch_u8: jax.Array, rng: jax.Array, cfg: Dict,
    norm_coeff: float = 1 / 127.5, mean: float = 127.5,
) -> jax.Array:
    """batch: (N,H,W,C) uint8/float on device -> augmented, normalized
    (N,H,W,C) float32 in [-1,1]. Jit-friendly (static shapes)."""
    x = batch_u8.astype(jnp.float32)
    n = x.shape[0]
    cfg = dict(cfg, _img_h=x.shape[1], _img_w=x.shape[2])
    params = sample_params(rng, n, cfg)
    out = jax.vmap(
        functools.partial(_augment_one, **_geo_kwargs(cfg))
    )(x, params)
    return (out - mean) * norm_coeff


# --------------------------------------------------------------------- #
# Detection: the same affine map applied to box labels.
# --------------------------------------------------------------------- #


def transform_boxes(labels: jax.Array, params: Dict, h: int, w: int):
    """labels (N, 50*5) normalized [x,y,bw,bh,class], validity = x != 0
    up to the first zero (the reference's `break` semantics,
    bcnn_yolo.c:delta loop). Applies the FORWARD of _augment_one's
    inverse affine map to each box's corners, takes the axis-aligned
    envelope, clips to the frame, drops collapsed boxes, and compacts
    survivors to the front so the first-zero-terminates convention is
    preserved."""
    from ..types import DETECTION_MAX_BOXES as B

    n = labels.shape[0]
    lab = labels.reshape(n, B, 5)
    valid = jnp.cumprod(
        (lab[..., 0] != 0).astype(jnp.float32), axis=1
    )  # (N,B)

    cy_i, cx_i = (h - 1) / 2.0, (w - 1) / 2.0
    # normalized -> pixel coords (pixel centers at (i+0.5)/dim)
    cx = lab[..., 0] * w - 0.5
    cy = lab[..., 1] * h - 0.5
    hw = lab[..., 2] * w / 2.0
    hh = lab[..., 3] * h / 2.0
    corner_x = jnp.stack(
        [cx - hw, cx + hw, cx - hw, cx + hw], axis=-1
    )  # (N,B,4)
    corner_y = jnp.stack([cy - hh, cy - hh, cy + hh, cy + hh], axis=-1)

    flip = params["flip"][:, None, None]
    theta = params["theta"][:, None, None]
    scale = params["scale"][:, None, None]
    tx = params["tx"][:, None, None]
    ty = params["ty"][:, None, None]

    # forward of: s = R(theta) @ o / scale + c + t, then flip on s.x
    px = jnp.where(flip > 0, (w - 1) - corner_x, corner_x)
    dx = px - cx_i - tx
    dy = corner_y - cy_i - ty
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    ox = (cos_t * dx + sin_t * dy) * scale + cx_i
    oy = (-sin_t * dx + cos_t * dy) * scale + cy_i

    x0 = jnp.clip(jnp.min(ox, -1), -0.5, w - 0.5)
    x1 = jnp.clip(jnp.max(ox, -1), -0.5, w - 0.5)
    y0 = jnp.clip(jnp.min(oy, -1), -0.5, h - 0.5)
    y1 = jnp.clip(jnp.max(oy, -1), -0.5, h - 0.5)

    eps = 1e-3
    keep = (valid > 0) & ((x1 - x0) > eps) & ((y1 - y0) > eps)

    nx = ((x0 + x1) / 2.0 + 0.5) / w
    ny = ((y0 + y1) / 2.0 + 0.5) / h
    nw = (x1 - x0) / w
    nh = (y1 - y0) / h
    newlab = jnp.stack([nx, ny, nw, nh, lab[..., 4]], axis=-1)
    newlab = jnp.where(keep[..., None], newlab, 0.0)

    # stable compaction: dropped rows sink to the back, survivors keep
    # their relative order (first x==0 still terminates the truth list)
    order = jnp.argsort(~keep, axis=1, stable=True)  # (N,B)
    newlab = jnp.take_along_axis(newlab, order[..., None], axis=1)
    return newlab.reshape(n, B * 5)


def augment_batch_with_boxes(
    batch_u8: jax.Array, labels: jax.Array, rng: jax.Array, cfg: Dict,
    norm_coeff: float = 1 / 127.5, mean: float = 127.5,
):
    """Detection-safe device augmentation: images through the full device
    pipeline, box labels through the SAME per-image affine map. Perlin
    distortion moves pixels in a way no box transform can represent, so
    it is rejected here (the host reference never combines them either:
    the detection loader only flips, DetectionListLoader)."""
    if float(cfg.get("max_distortion", 0.0)) > 0.0:
        raise ValueError(
            "max_distortion is not representable as a box transform; "
            "disable perlin distortion for detection training"
        )
    x = batch_u8.astype(jnp.float32)
    n = x.shape[0]
    cfg = dict(cfg, _img_h=x.shape[1], _img_w=x.shape[2])
    params = sample_params(rng, n, cfg)
    out = jax.vmap(
        functools.partial(_augment_one, **_geo_kwargs(cfg))
    )(x, params)
    newlab = transform_boxes(labels, params, x.shape[1], x.shape[2])
    return (out - mean) * norm_coeff, newlab


def augment_batch_with_boxes_nchw(batch_u8_nchw, labels, rng, cfg, **kw):
    x = jnp.transpose(batch_u8_nchw, (0, 2, 3, 1))
    out, lab = augment_batch_with_boxes(x, labels, rng, cfg, **kw)
    return jnp.transpose(out, (0, 3, 1, 2)), lab


def augment_batch_nchw(batch_u8_nchw, rng, cfg, **kw):
    x = jnp.transpose(batch_u8_nchw, (0, 2, 3, 1))
    out = augment_batch(x, rng, cfg, **kw)
    return jnp.transpose(out, (0, 3, 1, 2))

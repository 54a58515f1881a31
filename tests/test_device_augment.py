"""On-device batched augmentation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from bcnn_tpu.data.device_augment import augment_batch, sample_params


def test_identity_when_no_augmentation():
    rng = jax.random.PRNGKey(0)
    x = (np.random.RandomState(0).rand(4, 16, 16, 3) * 255).astype(np.uint8)
    out = augment_batch(jnp.asarray(x), rng, cfg={})
    want = (x.astype(np.float32) - 127.5) / 127.5
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_flip_only():
    rng = jax.random.PRNGKey(1)
    x = np.zeros((8, 8, 8, 1), np.uint8)
    x[:, :, 0, 0] = 200  # left column bright
    out = np.asarray(
        augment_batch(jnp.asarray(x), rng, cfg=dict(random_fliph=1))
    )
    # each sample either kept or flipped; flipped ones have the bright
    # column on the right
    left = out[:, 4, 0, 0]
    right = out[:, 4, 7, 0]
    for l, r in zip(left, right):
        assert (l > 0.4 and r < 0) or (r > 0.4 and l < 0)
    assert (right > 0.4).any() and (left > 0.4).any()


def test_rotation_stays_in_range_and_fills():
    rng = jax.random.PRNGKey(2)
    x = np.full((2, 16, 16, 1), 255, np.uint8)
    out = np.asarray(
        augment_batch(jnp.asarray(x), rng, cfg=dict(rotation_range=90.0))
    )
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5
    # corners rotate out -> fill value 128 -> ~0.0039
    assert np.abs(out[0, 0, 0, 0] - (128 - 127.5) / 127.5) < 0.6


def test_contrast_brightness_match_host_semantics():
    rng = jax.random.PRNGKey(3)
    x = (np.random.RandomState(1).rand(2, 8, 8, 1) * 200 + 20).astype(
        np.uint8
    )
    cfg = dict(min_contrast=1.5, max_contrast=1.5001)
    out = np.asarray(augment_batch(jnp.asarray(x), rng, cfg))
    f = x.astype(np.float32)
    m = f.mean(axis=(1, 2), keepdims=True)
    want = np.clip((f - m) * 1.5 + m, 0, 255)
    want = (want - 127.5) / 127.5
    np.testing.assert_allclose(out, want, atol=2e-3)


def test_jit_compatible_and_deterministic():
    fn = jax.jit(
        lambda x, k: augment_batch(
            x, k, cfg=dict(rotation_range=30.0, range_shift_x=4,
                           min_scale=0.9, max_scale=1.1, random_fliph=1)
        )
    )
    x = jnp.asarray(
        (np.random.RandomState(2).rand(4, 12, 12, 3) * 255).astype(np.uint8)
    )
    k = jax.random.PRNGKey(7)
    a = np.asarray(fn(x, k))
    b = np.asarray(fn(x, k))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(fn(x, jax.random.PRNGKey(8)))
    assert not np.array_equal(a, c)


def test_perlin_device_matches_host():
    """Same seed/params -> the device perlin must reproduce the host bip
    port (identical hash + geometry; host rounds through uint8, so
    tolerance is 1 level)."""
    from bcnn_tpu.bip.ops import perlin_distortion
    from bcnn_tpu.data.device_augment import _perlin_one

    rng = np.random.RandomState(0)
    img = (rng.rand(24, 20, 3) * 255).astype(np.uint8)
    for seed, d, kx, ky in [(7, 0.08, 0.1, -0.3), (123, 0.2, -0.5, 0.4)]:
        host = perlin_distortion(img, d, kx, ky, seed).astype(np.float32)
        dev = np.asarray(
            _perlin_one(
                jnp.asarray(img, jnp.float32),
                jnp.float32(d), jnp.float32(kx), jnp.float32(ky),
                jnp.int32(seed),
            )
        )
        assert np.abs(host - dev).max() <= 1.0 + 1e-3, (
            seed, np.abs(host - dev).max()
        )


def test_spotlights_device_matches_host():
    from bcnn_tpu.bip.ops import add_random_spotlights
    from bcnn_tpu.data.device_augment import _spotlights_one

    rng = np.random.RandomState(5)
    img = (rng.rand(16, 16, 1) * 100).astype(np.uint8)
    # draw the host's own random sequence, then feed identical spot params
    # to the device kernel
    r2 = np.random.RandomState(5)
    host = add_random_spotlights(img, 3, 0.3, 3.0, 0.3, 3.0, r2)
    r3 = np.random.RandomState(5)
    mu_x, mu_y, sx, sy = [], [], [], []
    for _ in range(3):
        mu_x.append(int(r3.rand() * (16 - 1) + 0.5))
        mu_y.append(int(r3.rand() * (16 - 1) + 0.5))
        sx.append(r3.rand() * (3.0 - 0.3) + 0.3 + 0.5)
        sy.append(r3.rand() * (3.0 - 0.3) + 0.3 + 0.5)
    dev = np.asarray(
        _spotlights_one(
            jnp.asarray(img, jnp.float32),
            jnp.asarray(mu_x, jnp.float32), jnp.asarray(mu_y, jnp.float32),
            jnp.asarray(sx, jnp.float32), jnp.asarray(sy, jnp.float32),
            jnp.ones((3,), jnp.float32),
        )
    )
    assert np.abs(host.astype(np.float32) - dev).max() <= 1.0 + 1e-3


def test_full_cfg_augment_runs_jitted():
    from bcnn_tpu.data.device_augment import augment_batch

    cfg = dict(
        random_fliph=1, rotation_range=20.0, range_shift_x=3,
        range_shift_y=3, min_scale=0.9, max_scale=1.1,
        min_contrast=0.8, max_contrast=1.2, min_brightness=-20,
        max_brightness=20, max_distortion=0.1, max_random_spots=3,
    )
    fn = jax.jit(lambda x, k: augment_batch(x, k, cfg=cfg))
    x = jnp.asarray(
        (np.random.RandomState(3).rand(4, 20, 20, 3) * 255).astype(
            np.uint8
        )
    )
    out = np.asarray(fn(x, jax.random.PRNGKey(0)))
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    assert out.min() >= -1 - 1e-5 and out.max() <= 1 + 1e-5


def _bright_box_label(x_, y_, w_, h_, cls=1.0):
    from bcnn_tpu.types import DETECTION_MAX_BOXES as B

    lab = np.zeros((1, B * 5), np.float32)
    lab[0, 0:5] = [x_, y_, w_, h_, cls]
    return lab


def test_boxes_follow_image_geometry():
    """Self-consistency: draw a bright rectangle exactly under the box
    label, augment with a geometry-only cfg, and re-locate the bright
    pixels in the augmented image — they must sit inside (and tightly
    fill) the transformed box."""
    from bcnn_tpu.data.device_augment import augment_batch_with_boxes
    from bcnn_tpu.types import DETECTION_MAX_BOXES as B

    H = W = 48
    cfg = dict(
        random_fliph=1, rotation_range=40.0, range_shift_x=8,
        range_shift_y=8, min_scale=0.8, max_scale=1.2,
    )
    for trial in range(8):
        img = np.zeros((1, H, W, 1), np.uint8)
        # box at (0.4, 0.55), size (0.25, 0.2) normalized
        bx, by, bw, bh = 0.4, 0.55, 0.25, 0.2
        x0 = int(round((bx - bw / 2) * W))
        x1 = int(round((bx + bw / 2) * W))
        y0 = int(round((by - bh / 2) * H))
        y1 = int(round((by + bh / 2) * H))
        img[0, y0:y1, x0:x1, 0] = 255
        lab = _bright_box_label(bx, by, bw, bh)
        out, newlab = augment_batch_with_boxes(
            jnp.asarray(img), jnp.asarray(lab),
            jax.random.PRNGKey(trial), cfg,
            norm_coeff=1.0, mean=0.0,  # keep raw pixel values
        )
        out = np.asarray(out)[0, :, :, 0]
        nl = np.asarray(newlab).reshape(B, 5)[0]
        ys, xs = np.where(out > 128)
        if nl[0] == 0:  # box dropped -> bright area must be (mostly) gone
            assert len(ys) < 0.1 * (x1 - x0) * (y1 - y0)
            continue
        gx0, gx1 = (xs.min() + 0.0) / W, (xs.max() + 1.0) / W
        gy0, gy1 = (ys.min() + 0.0) / H, (ys.max() + 1.0) / H
        lx0, lx1 = nl[0] - nl[2] / 2, nl[0] + nl[2] / 2
        ly0, ly1 = nl[1] - nl[3] / 2, nl[1] + nl[3] / 2
        tol = 2.5 / W  # bilinear smear + envelope slack
        assert lx0 <= gx0 + tol and gx1 - tol <= lx1, (
            trial, (lx0, lx1), (gx0, gx1)
        )
        assert ly0 <= gy0 + tol and gy1 - tol <= ly1, (
            trial, (ly0, ly1), (gy0, gy1)
        )
        # envelope is tight up to rotation slack: the bright region fills
        # a decent fraction of the box
        frac = len(ys) / max(1.0, (lx1 - lx0) * W * (ly1 - ly0) * H)
        assert frac > 0.4, (trial, frac)
        assert nl[4] == 1.0  # class preserved


def test_box_compaction_preserves_terminator_semantics():
    """A middle box that leaves the frame must not hide later boxes:
    survivors compact to the front."""
    from bcnn_tpu.data.device_augment import sample_params, transform_boxes
    from bcnn_tpu.types import DETECTION_MAX_BOXES as B

    lab = np.zeros((1, B * 5), np.float32)
    lab[0, 0:5] = [0.5, 0.5, 0.2, 0.2, 1]   # stays
    lab[0, 5:10] = [0.02, 0.02, 0.02, 0.02, 2]  # shifted out of frame
    lab[0, 10:15] = [0.6, 0.6, 0.2, 0.2, 3]  # stays
    params = dict(
        theta=jnp.zeros((1,)), scale=jnp.ones((1,)),
        tx=jnp.full((1,), 10.0), ty=jnp.full((1,), 10.0),
        flip=jnp.zeros((1,)), contrast=jnp.ones((1,)),
        brightness=jnp.zeros((1,)),
    )
    # forward shift is -t in output coords: boxes move by (-10,-10) px
    out = np.asarray(transform_boxes(jnp.asarray(lab), params, 48, 48))
    out = out.reshape(B, 5)
    assert out[0, 4] == 1 and out[1, 4] == 3, out[:3]
    assert out[2, 0] == 0  # terminator right after the survivors


def test_detection_train_step_with_device_augment():
    """End-to-end: tiny yolo net + device augmentation with boxes inside
    the jitted train step; loss finite, and perlin+detection rejected."""
    import pytest

    from bcnn_tpu import Mode, Session
    from bcnn_tpu.compile import make_train_step
    from bcnn_tpu.models import yolov3_tiny
    from bcnn_tpu.types import DETECTION_MAX_BOXES

    net = yolov3_tiny(batch_size=2, width=64, height=64, classes=4,
                      mode=Mode.TRAIN)
    cfg = dict(random_fliph=1, range_shift_x=4, min_scale=0.9,
               max_scale=1.1)
    step = make_train_step(net, device_augment=cfg)
    sess = Session(net, seed=0).compile_net()
    x = (np.random.RandomState(0).rand(2, 3, 64, 64) * 255).astype(
        np.float32
    )
    lab = np.zeros((2, DETECTION_MAX_BOXES * 5), np.float32)
    lab[:, 0:5] = [0.5, 0.5, 0.25, 0.25, 1]
    params, state, opt, loss = step(
        sess.params, sess.state, sess.opt_state,
        {"input": jnp.asarray(x), "label": jnp.asarray(lab)},
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(loss))

    with pytest.raises(ValueError, match="max_distortion"):
        make_train_step(
            net, device_augment=dict(cfg, max_distortion=0.1)
        )


def test_gather_free_path_matches_warp_path():
    """A config with no rotation/scale/shift takes the gather-free flip
    path (geo=False); it must be BIT-identical to the full warp at
    theta=0/scale=1/t=0 — the bilinear gather reproduces exact pixels at
    integral coordinates, so the fast path is a pure lowering change."""
    import functools

    from bcnn_tpu.data.device_augment import _augment_one, _needs_geo

    cfg = {"random_fliph": 1, "min_contrast": 0.8, "max_contrast": 1.2,
           "min_brightness": -30, "max_brightness": 30,
           "_img_h": 17, "_img_w": 13}
    assert not _needs_geo(cfg)
    assert _needs_geo(dict(cfg, rotation_range=10.0))
    assert _needs_geo(dict(cfg, range_shift_x=2))

    x = (np.random.RandomState(0).rand(6, 17, 13, 3) * 255).astype(
        np.float32
    )
    params = sample_params(jax.random.PRNGKey(1), 6, cfg)
    assert bool(np.asarray(params["flip"]).max()) == 1  # both branches hit
    fast = jax.vmap(functools.partial(_augment_one, geo=False))(
        jnp.asarray(x), params
    )
    warp = jax.vmap(functools.partial(_augment_one, geo=True))(
        jnp.asarray(x), params
    )
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(warp))


def test_separable_warp_matches_gather_warp():
    """Scale/shift/flip (no rotation) classifies as "separable" and runs
    as two interpolation matmuls; values must match the bilinear gather
    to float-reassociation tolerance, including the fill rectangle."""
    import functools

    from bcnn_tpu.data.device_augment import _augment_one, _geo_mode

    cfg = {"random_fliph": 1, "min_scale": 0.7, "max_scale": 1.3,
           "range_shift_x": 6, "range_shift_y": 4,
           "min_brightness": -10, "max_brightness": 10,
           "_img_h": 21, "_img_w": 15}
    assert _geo_mode(cfg) == "separable"
    # rotation now classifies as the gather-free shear chain (round 5);
    # the gather survives for ranges beyond the shear sweet spot
    assert _geo_mode(dict(cfg, rotation_range=5.0)) == "shear"
    assert _geo_mode(dict(cfg, rotation_range=120.0)) == "full"
    assert _geo_mode({"random_fliph": 1}) == "none"

    x = (np.random.RandomState(2).rand(8, 21, 15, 3) * 255).astype(
        np.float32
    )
    params = sample_params(jax.random.PRNGKey(4), 8, cfg)
    sep = jax.vmap(functools.partial(_augment_one, geo="separable"))(
        jnp.asarray(x), params
    )
    full = jax.vmap(functools.partial(_augment_one, geo="full"))(
        jnp.asarray(x), params
    )
    np.testing.assert_allclose(
        np.asarray(sep), np.asarray(full), rtol=1e-5, atol=1e-3
    )


def _smooth_image(h, w):
    """A smooth test image (gradient + two gaussian blobs): multi-pass
    and single-pass resampling agree on band-limited content, so the
    tolerance below measures the decomposition, not noise smoothing."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (
        60 + 1.2 * xx + 0.8 * yy
        + 90 * np.exp(-((xx - w * 0.3) ** 2 + (yy - h * 0.6) ** 2) / 60)
        + 70 * np.exp(-((xx - w * 0.7) ** 2 + (yy - h * 0.3) ** 2) / 120)
    )
    return np.stack([img] * 3, -1)


def test_shear_rotation_matches_gather_within_tolerance():
    """The gather-free three-shear rotation chain (geo="shear") against
    the one-pass bilinear gather (geo="full"), composed with scale /
    shift / flip: the fill region must match EXACTLY (both apply the
    same closed-form composed-map mask) and the valid region must agree
    within the documented multi-pass resampling tolerance (sequential
    two-tap passes vs one 4-tap pass; max ~2/255 on smooth content)."""
    import functools

    from bcnn_tpu.data.device_augment import _augment_one

    h = w = 64
    img = jnp.asarray(_smooth_image(h, w))
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)

    cases = [  # (theta_deg, scale, tx, ty, flip)
        (15.0, 1.0, 0.0, 0.0, 0.0),
        (-12.0, 1.0, 0.0, 0.0, 1.0),
        (10.0, 0.9, 3.0, -2.0, 1.0),  # zoom-out + shift + flip
        (44.0, 1.2, -5.0, 4.0, 0.0),  # zoom-in near the 45-deg edge
        (20.0, 0.8, 6.0, 6.0, 0.0),
    ]
    for theta_deg, scale, tx, ty, flip in cases:
        th = float(np.deg2rad(theta_deg))
        p = {
            k: jnp.asarray([v], jnp.float32)
            for k, v in dict(
                theta=th, scale=scale, tx=tx, ty=ty, flip=flip,
                contrast=1.0, brightness=0.0,
            ).items()
        }
        sep = bool(scale != 1.0 or tx or ty)
        shear = np.asarray(
            jax.vmap(
                functools.partial(
                    _augment_one, geo="shear",
                    rot_deg=2 * abs(theta_deg), sep=sep,
                    s_max=max(scale, 1.0), txm=abs(tx), tym=abs(ty),
                )
            )(img[None], p)
        )[0]
        full = np.asarray(
            jax.vmap(functools.partial(_augment_one, geo="full"))(
                img[None], p
            )
        )[0]
        inv_s = 1.0 / scale
        sx = (np.cos(th) * (xx - cx) - np.sin(th) * (yy - cy)) * inv_s \
            + cx + tx
        sy = (np.sin(th) * (xx - cx) + np.cos(th) * (yy - cy)) * inv_s \
            + cy + ty
        if flip:
            sx = (w - 1) - sx
        valid = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
        d = np.abs(shear - full)
        if (~valid).any():
            assert d[~valid].max() == 0.0, "fill region must be exact"
        assert d[valid].max() < 2.5, (theta_deg, d[valid].max())
        assert d[valid].mean() < 0.2, (theta_deg, d[valid].mean())


def test_shear_rotation_exact_at_zero_theta():
    """theta == 0 degenerates every shear pass to the identity shift, so
    the shear chain must reproduce the separable warp (and hence the
    gather) EXACTLY — wiring check for the pass offsets."""
    import functools

    from bcnn_tpu.data.device_augment import _augment_one

    h, w = 33, 27
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.rand(h, w, 3).astype(np.float32) * 255)
    p = {
        k: jnp.asarray([v], jnp.float32)
        for k, v in dict(
            theta=0.0, scale=0.85, tx=2.0, ty=-3.0, flip=1.0,
            contrast=1.0, brightness=0.0,
        ).items()
    }
    shear = jax.vmap(
        functools.partial(
            _augment_one, geo="shear", rot_deg=10.0, sep=True,
            s_max=1.0, txm=2.0, tym=3.0,
        )
    )(img[None], p)
    full = jax.vmap(functools.partial(_augment_one, geo="full"))(
        img[None], p
    )
    np.testing.assert_allclose(
        np.asarray(shear), np.asarray(full), rtol=1e-5, atol=1e-3
    )


def test_shear_rotation_through_augment_batch_with_boxes(tmp_path):
    """End to end through the public detection entry point: a rotation
    cfg routes to the shear chain (geo mode 'shear'), produces finite
    normalized output, and the box labels ride the SAME composed affine
    (transform_boxes is decomposition-independent)."""
    from bcnn_tpu.data.device_augment import (
        _geo_mode, augment_batch_with_boxes,
    )
    from bcnn_tpu.types import DETECTION_MAX_BOXES as B

    cfg = {"rotation_range": 20.0, "min_scale": 0.9, "max_scale": 1.1,
           "random_fliph": 1}
    assert _geo_mode(cfg) == "shear"
    x = (np.random.RandomState(3).rand(4, 32, 32, 3) * 255).astype(
        np.uint8
    )
    labels = np.zeros((4, B * 5), np.float32)
    labels[:, 0:5] = [0.5, 0.5, 0.3, 0.3, 1.0]
    out, lab = augment_batch_with_boxes(
        jnp.asarray(x), jnp.asarray(labels), jax.random.PRNGKey(7), cfg
    )
    out, lab = np.asarray(out), np.asarray(lab)
    assert np.isfinite(out).all() and np.isfinite(lab).all()
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5
    lab = lab.reshape(4, B, 5)
    kept = lab[:, 0, 0] != 0
    assert kept.any()  # center boxes survive modest warps
    assert (lab[kept][:, 0, 2] > 0).all()  # surviving widths positive

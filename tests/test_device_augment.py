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

"""Pallas fused decode kernel (interpret mode on CPU) vs the XLA fallback."""

import numpy as np
import jax.numpy as jnp

from bcnn_tpu.ops.yolo_pallas import decode_fused, decode_grid_jnp


def test_fused_decode_matches_fallback():
    p = dict(
        num=3, classes=4, total=6, mask=[3, 4, 5],
        anchors=[10.0, 14, 23, 27, 37, 58, 81, 82, 135, 169, 344, 319],
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 5, 3 * 9).astype(np.float32))
    b1, o1, pr1 = decode_fused(x, p, 160, 160, interpret=True)
    b2, o2, pr2 = decode_grid_jnp(x, p, 160, 160)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(b1), np.asarray(b2), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(pr1), np.asarray(pr2), rtol=1e-5, atol=1e-6
    )

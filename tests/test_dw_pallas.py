"""Interpret-mode parity for the Pallas fused depthwise kernel.

PINNED NEGATIVE RESULT (round 3, real v5e chip): the kernel is correct
(relerr ~2e-3 vs the XLA path with bf16 taps, exact in fp32) but LOSES
to XLA's grouped-conv lowering in-isolation on the 11 lane-aligned
MobileNet-v1 depthwise layers at batch 256: 56.6 ms vs 45.5 ms
(0.80x), and 0.83x with 2-8 images grouped per grid step. XLA's
depthwise emitter + epilogue fusion is already near its VPU bound; the
Pallas version pays a whole-image in-register pad (a full sublane
rotate) plus k*k shifted-slice relayouts that XLA's emitter avoids.
The kernel is kept (a) as the documented negative, (b) as the only
in-tree example of the Blocked-pipeline-for-unaligned-maps pattern:
manual `make_async_copy` HBM slices require (8,128)-aligned trailing
dims, so the W in {28,14,7} maps can only be staged via whole-image
Blocked blocks (see ops/dw_pallas.py docstring).

It is NOT wired into the dispatcher (compile._depthwise_conv2d keeps
the XLA path everywhere).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from bcnn_tpu.ops import conv as conv_ops
from bcnn_tpu.ops.activations import apply_activation
from bcnn_tpu.ops.dw_pallas import depthwise_fused, supported
from bcnn_tpu.types import Activation


CASES = [
    # (h, w, c, k, stride, act) — MobileNet shapes + odd/unaligned ones
    (28, 28, 256, 3, 1, Activation.RELU),
    (14, 14, 512, 3, 1, Activation.NONE),
    (56, 56, 128, 3, 2, Activation.LRELU),
    (28, 28, 256, 3, 2, Activation.RELU),
    (7, 7, 1024, 3, 1, Activation.CLAMP),
    (14, 14, 512, 5, 1, Activation.RELU),
    (15, 13, 128, 3, 1, Activation.RELU),
    (15, 13, 128, 3, 2, Activation.RELU),
]


@pytest.mark.parametrize("h,w,c,k,stride,act", CASES)
def test_matches_xla_path(h, w, c, k, stride, act):
    rng = np.random.default_rng(h * w + c + k + stride)
    pad = k // 2
    x = jnp.asarray(rng.standard_normal((4, h, w, c)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((k, k, 1, c)), jnp.float32) * 0.1
    b = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    ref = apply_activation(
        conv_ops.depthwise_conv2d(x, wt, stride, pad) + b, act
    )
    got = depthwise_fused(x, wt, b, stride, pad, act, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_supported_gate():
    # lane-aligned C only; pad must be k//2; fusable activations only
    assert supported(3, 1, 1, Activation.RELU, 128, 28, 28)
    assert not supported(3, 1, 1, Activation.RELU, 32, 112, 112)
    assert not supported(3, 1, 0, Activation.RELU, 128, 28, 28)
    assert not supported(3, 3, 1, Activation.RELU, 128, 28, 28)
    assert not supported(3, 1, 1, Activation.PRELU, 128, 28, 28)
    # over-VMEM image falls back
    assert not supported(3, 1, 1, Activation.RELU, 1024, 512, 512)

"""Unit tests for kernels vs. reference math (SURVEY.md §4: conv fwd vs
direct computation, maxpool border semantics, BN train/predict, activations,
the softmax pass-through gradient quirk, eltwise stride broadcast)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bcnn_tpu import ops
from bcnn_tpu.types import Activation


def direct_conv_nchw(x, w, stride, pad, groups=1):
    """Straightforward NCHW conv like the reference's im2col+GEMM result."""
    n, c, h, wd = x.shape
    o, cpg, k, _ = w.shape
    oh = (h + 2 * pad - k) // stride + 1
    ow = (wd + 2 * pad - k) // stride + 1
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    out = np.zeros((n, o, oh, ow), np.float32)
    opg = o // groups
    for b in range(n):
        for oc in range(o):
            g = oc // opg
            for i in range(oh):
                for j in range(ow):
                    patch = xp[
                        b,
                        g * cpg : (g + 1) * cpg,
                        i * stride : i * stride + k,
                        j * stride : j * stride + k,
                    ]
                    out[b, oc, i, j] = np.sum(patch * w[oc])
    return out


@pytest.mark.parametrize(
    "shape,k,stride,pad,groups",
    [
        ((2, 3, 8, 8), 3, 1, 1, 1),
        ((1, 4, 7, 7), 3, 2, 1, 1),
        ((2, 4, 8, 8), 1, 1, 0, 1),
        ((1, 4, 6, 6), 3, 1, 1, 2),
        ((1, 2, 5, 5), 5, 1, 2, 1),
    ],
)
def test_conv2d_matches_direct(shape, k, stride, pad, groups):
    rng = np.random.RandomState(0)
    n, c, h, w = shape
    o = 6 if 6 % groups == 0 else groups
    x = rng.randn(*shape).astype(np.float32)
    wt = rng.randn(o, c // groups, k, k).astype(np.float32)
    ref = direct_conv_nchw(x, wt, stride, pad, groups)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    w_hwio = jnp.asarray(wt.transpose(2, 3, 1, 0))
    out = ops.conv2d(x_nhwc, w_hwio, stride, pad, groups)
    out_nchw = np.asarray(out.transpose(0, 3, 1, 2))
    np.testing.assert_allclose(out_nchw, ref, rtol=1e-4, atol=1e-4)


def test_depthwise_conv_matches_grouped():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 6, 6).astype(np.float32)
    wt = rng.randn(4, 1, 3, 3).astype(np.float32)  # per-channel filters
    ref = direct_conv_nchw(x, wt, 1, 1, groups=4)
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    w_hwio = jnp.asarray(wt.transpose(2, 3, 1, 0))  # (3,3,1,4)
    out = ops.depthwise_conv2d(x_nhwc, w_hwio, 1, 1)
    np.testing.assert_allclose(
        np.asarray(out.transpose(0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("k,s,p", [(3, 2, 1), (3, 2, 0), (5, 1, 2), (2, 2, 0)])
def test_conv_transpose_shape_and_adjointness(k, s, p):
    """Deconv output: s*(h-1)+k-2p (bcnn_deconv_layer.c:97-101); as the
    transpose of conv, <conv(x), y> == <x, deconv(y)>."""
    rng = np.random.RandomState(2)
    hi = 5
    out = s * (hi - 1) + k - 2 * p
    x = jnp.asarray(rng.randn(1, hi, hi, 4).astype(np.float32))
    # w is the HWIO kernel of the *forward* conv being transposed:
    # I = deconv output channels (2), O = deconv input channels (4)
    w = jnp.asarray(rng.randn(k, k, 2, 4).astype(np.float32))
    y = ops.conv2d_transpose(x, w, s, p)
    assert y.shape == (1, out, out, 2)
    z = jnp.asarray(rng.randn(1, out, out, 2).astype(np.float32))
    conv_z = ops.conv2d(z, w, s, p)
    assert conv_z.shape == x.shape
    lhs = jnp.sum(conv_z * x)
    rhs = jnp.sum(z * y)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


@pytest.mark.parametrize("k,s", [(3, 2), (3, 1), (2, 2), (5, 1)])
def test_deconv_ref_quirk_degenerates_to_transpose_at_pad0(k, s):
    """At pad == 0 the reference's col2im misread vanishes (oh*ow == h*w,
    no drift), so the quirk replication must equal the standard transpose
    conv — this pins both the index map and the weight orientation."""
    rng = np.random.RandomState(3)
    hi = 5
    x = jnp.asarray(rng.randn(2, hi, hi, 4).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, 3, 4).astype(np.float32))
    want = ops.conv2d_transpose(x, w, s, 0)
    got = ops.conv.conv2d_transpose_ref_quirk(x, w, s, 0)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
    )


def test_deconv_ref_quirk_pad_changes_output():
    """pad > 0 engages the misread: output differs from the standard
    transpose everywhere the drift lands (the divergence the quirk mode
    exists to replicate)."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 6, 6, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 2, 3).astype(np.float32))
    std = ops.conv2d_transpose(x, w, 2, 1)
    quirk = ops.conv.conv2d_transpose_ref_quirk(x, w, 2, 1)
    assert std.shape == quirk.shape  # both size with the pad
    assert not np.allclose(np.asarray(std), np.asarray(quirk), atol=1e-3)


@pytest.mark.parametrize("k,c", [(7, 3), (3, 3), (3, 1), (5, 4)])
def test_conv_s2d2_equals_direct(k, c):
    """Space-to-depth stride-2 rewrite (perf path for thin inputs) is the
    same contraction reassociated — must match the direct lowering."""
    from bcnn_tpu.ops.conv import _conv_raw, _conv_s2d2

    rng = np.random.RandomState(5)
    pad = k // 2
    x = jnp.asarray(rng.randn(2, 17, 17, c).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, c, 8).astype(np.float32))
    want = _conv_raw(x, w, 2, pad, 1, jax.lax.Precision.HIGHEST,
                     jnp.float32)
    got = _conv_s2d2(x, w, pad, jax.lax.Precision.HIGHEST, jnp.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("k,s", [(3, 1), (3, 2), (5, 1)])
def test_depthwise_fma_equals_grouped(k, s):
    """Shifted-FMA depthwise (perf path) vs the grouped-conv lowering."""
    from bcnn_tpu.ops.conv import _conv_raw, _depthwise_fma

    rng = np.random.RandomState(6)
    pad = k // 2
    x = jnp.asarray(rng.randn(2, 12, 12, 16).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, 1, 16).astype(np.float32))
    want = _conv_raw(x, w, s, pad, 16, jax.lax.Precision.HIGHEST,
                     jnp.float32)
    got = _depthwise_fma(x, w, s, pad, jnp.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_int8_s2d_bit_identical():
    """Integer accumulation is exact under reassociation: the int8 s2d
    rewrite is BIT-identical to the direct strided int8 conv. (Both
    alternative formulations are dispatch-OFF — pinned negative result,
    ops/conv._conv_best — this guards the math for future revisits.)"""
    import jax.lax as lax

    from bcnn_tpu.ops.conv import _conv_s2d2

    rng = np.random.RandomState(7)
    x2 = jnp.asarray(rng.randint(-127, 128, (2, 15, 15, 3), dtype=np.int8))
    w2 = jnp.asarray(rng.randint(-127, 128, (7, 7, 3, 8), dtype=np.int8))
    want = lax.conv_general_dilated(
        x2, w2, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    got = _conv_s2d2(x2, w2, 3, None, jnp.int32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_maxpool_border_semantics():
    """SAME 2x2/s2 on odd size: last window reads -inf outside, so output
    equals max of the in-range elements (bcnn_maxpool_layer.c:163-183)."""
    x = jnp.arange(25, dtype=jnp.float32).reshape(1, 5, 5, 1)
    out = ops.maxpool(x, 2, 2, 3, 3)  # SAME: (5+1)//2 = 3
    assert out.shape == (1, 3, 3, 1)
    expect = np.array(
        [[6, 8, 9], [16, 18, 19], [21, 23, 24]], np.float32
    ).reshape(1, 3, 3, 1)
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_maxpool_stride1_same():
    """yolov3-tiny uses k2/s1 SAME maxpool: output size == input size."""
    x = jnp.asarray(np.random.RandomState(3).randn(1, 4, 4, 2), jnp.float32)
    out = ops.maxpool(x, 2, 1, 4, 4)
    assert out.shape == (1, 4, 4, 2)
    np.testing.assert_allclose(
        float(out[0, 3, 3, 0]), float(x[0, 3, 3, 0])
    )  # bottom-right window sees only itself


def test_batch_norm_train_stats_and_running_update():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(4, 3, 3, 2), jnp.float32)
    scales = jnp.ones(2)
    biases = jnp.zeros(2)
    rm = jnp.zeros(2)
    rv = jnp.zeros(2)
    y, nm, nv = ops.batch_norm(x, scales, biases, rm, rv, training=True)
    np.testing.assert_allclose(np.asarray(jnp.mean(y, (0, 1, 2))), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.std(y, (0, 1, 2))), 1, atol=1e-3)
    # running update: 0.9*0 + 0.1*batch
    np.testing.assert_allclose(
        np.asarray(nm), 0.1 * np.asarray(jnp.mean(x, (0, 1, 2))), rtol=1e-5
    )
    # biased variance
    np.testing.assert_allclose(
        np.asarray(nv),
        0.1 * np.asarray(jnp.var(x, (0, 1, 2))),
        rtol=1e-4,
    )


def test_batch_norm_folded_predict():
    x = jnp.asarray(np.random.RandomState(5).randn(2, 3, 3, 2), jnp.float32)
    s = jnp.asarray([2.0, 0.5])
    b = jnp.asarray([1.0, -1.0])
    y, _, _ = ops.batch_norm(
        x, s, b, jnp.zeros(2), jnp.ones(2), training=False, folded=True
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(x * s + b), rtol=1e-6)


def test_activations_match_reference_formulas():
    x = jnp.asarray([-2.0, -0.5, 0.0, 0.5, 2.0])
    np.testing.assert_allclose(
        np.asarray(ops.apply_activation(x, Activation.LRELU)),
        [-0.2, -0.05, 0.0, 0.5, 2.0],
        rtol=1e-6,
    )  # slope 0.1, the implementation's value
    np.testing.assert_allclose(
        np.asarray(ops.apply_activation(x, Activation.RAMP)),
        np.asarray(x * (x > 0) + 0.1 * x),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(ops.apply_activation(x, Activation.CLAMP)),
        [0.0, 0.0, 0.0, 0.5, 1.0],
    )
    slopes = jnp.asarray([0.25])
    np.testing.assert_allclose(
        np.asarray(
            ops.apply_activation(
                x.reshape(1, 1, 5, 1), Activation.PRELU, slopes
            )
        ).ravel(),
        [-0.5, -0.125, 0.0, 0.5, 2.0],
    )


def test_softmax_passthrough_grad():
    """Reference softmax backward copies the gradient unchanged
    (bcnn_softmax_layer.c:161-175)."""
    x = jnp.asarray(np.random.RandomState(6).randn(2, 1, 1, 5), jnp.float32)
    y = ops.softmax_passthrough_grad(x)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(y, -1)), np.ones((2, 1, 1)), rtol=1e-6
    )
    g = jax.grad(lambda x: jnp.sum(ops.softmax_passthrough_grad(x) * 3.0))(x)
    np.testing.assert_allclose(np.asarray(g), 3.0 * np.ones_like(g))


def test_eltwise_stride_broadcast():
    """dst[b,c,j*s0,i*s0] += src1[b,c,j*s1,i*s1] (bcnn_mat.c:159-178)."""
    x0 = jnp.zeros((2, 4, 4, 2))
    x1 = jnp.ones((2, 2, 2, 2))
    out = ops.eltwise_add(x0, x1, stride=(2, 1), min_dim=(2, 2, 2))
    out = np.asarray(out)
    assert out[0, 0, 0, 0] == 1.0 and out[0, 2, 2, 1] == 1.0
    assert out[0, 1, 1, 0] == 0.0
    assert out.sum() == 2 * 4 * 2  # batch handled (unlike the ref fast path)


def test_upsample_and_lrn_shapes():
    x = jnp.asarray(np.random.RandomState(7).randn(1, 3, 3, 2), jnp.float32)
    up = ops.upsample_nn(x, 2)
    assert up.shape == (1, 6, 6, 2)
    np.testing.assert_allclose(np.asarray(up[0, 0, 0]), np.asarray(up[0, 1, 1]))
    y = ops.lrn(x, local_size=3, alpha=1e-4, beta=0.75, k=2.0)
    assert y.shape == x.shape
    # k=2, tiny alpha -> y ~ x * 2^-0.75
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x) * 2.0 ** -0.75, rtol=1e-3
    )


def test_lrn_vectorized_matches_unrolled():
    """The cumsum-window LRN must reproduce the reference-transcribed
    recurrence bit-for-bit-ish across channel counts (incl. C=256, where
    the unrolled form would emit hundreds of chained HLO ops) and across
    window/channel regimes incl. the degenerate C < window cases."""
    from bcnn_tpu.ops.misc import _lrn_unrolled

    rng = np.random.RandomState(0)
    for cdim in (1, 2, 3, 5, 16, 64, 256):
        for ls in (1, 2, 3, 5, 7, 11):
            x = jnp.asarray(
                rng.randn(2, 4, 4, cdim).astype(np.float32) * 2.0
            )
            a = np.asarray(ops.lrn(x, ls, 1e-2, 0.75, 2.0))
            b = np.asarray(_lrn_unrolled(x, ls, 1e-2, 0.75, 2.0))
            np.testing.assert_allclose(
                a, b, rtol=2e-5, atol=2e-6,
                err_msg=f"C={cdim} local_size={ls}",
            )


def test_lrn_hlo_size_constant_in_channels():
    """HLO op count must not grow with C (shared-remote-compiler safety)."""

    def count(cdim):
        x = jax.ShapeDtypeStruct((1, 2, 2, cdim), jnp.float32)
        mod = jax.jit(
            lambda t: ops.lrn(t, 5, 1e-4, 0.75, 1.0)
        ).lower(x).as_text()
        return mod.count("\n")

    small, big = count(8), count(512)
    assert big <= small + 10, (small, big)


def test_maxpool_2x2_s2_matches_reduce_window():
    """maxpool's 2x2/s2 case must match a plain reduce_window in forward
    AND gradient, whatever lowering it uses. (A reshape+argmax custom-VJP
    fast path was tried and measured 20% SLOWER than XLA's
    select_and_scatter on v5e — see BENCHMARKS.md — so the generic
    lowering stays; this test pins the contract either way.)"""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 8, 6, 5).astype(np.float32))

    def generic(x):
        return lax.reduce_window(
            x, -jnp.inf, lax.max,
            window_dimensions=(1, 2, 2, 1),
            window_strides=(1, 2, 2, 1),
            padding=((0, 0), (0, 0), (0, 0), (0, 0)),
        )

    y_fast = ops.maxpool(x, 2, 2, 4, 3)
    np.testing.assert_array_equal(np.asarray(y_fast), np.asarray(generic(x)))

    g = jnp.asarray(rng.randn(3, 4, 3, 5).astype(np.float32))
    gx_fast = jax.grad(lambda x: jnp.sum(ops.maxpool(x, 2, 2, 4, 3) * g))(x)
    gx_gen = jax.grad(lambda x: jnp.sum(generic(x) * g))(x)
    np.testing.assert_allclose(
        np.asarray(gx_fast), np.asarray(gx_gen), rtol=1e-6, atol=1e-7
    )


def test_maxpool_2x2_s2_tie_routes_to_first():
    """On an exact tie the gradient goes to the FIRST row-major window
    element — the reference's strict-'>' scan keeps the first max
    (bcnn_maxpool_layer.c:163-176); XLA's select_and_scatter agrees."""
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((1, 2, 2, 1), jnp.float32)  # all four tie
    gx = jax.grad(lambda x: jnp.sum(ops.maxpool(x, 2, 2, 1, 1)))(x)
    gx = np.asarray(gx).reshape(2, 2)
    np.testing.assert_array_equal(gx, [[1.0, 0.0], [0.0, 0.0]])


def test_maxpool_2x2_s2_int8_fast_path():
    """int8 activations (quantizer-commuting pool in the int8 flow) pool
    correctly with the type-min identity."""
    x = jnp.asarray(
        np.random.RandomState(1).randint(-128, 127, (2, 4, 4, 3), np.int8)
    )
    y = ops.maxpool(x, 2, 2, 2, 2)
    assert y.dtype == jnp.int8
    want = np.asarray(x).reshape(2, 2, 2, 2, 2, 3).max(axis=(2, 4))
    np.testing.assert_array_equal(np.asarray(y), want)


def test_prelu_reference_backward_quirk():
    """The PReLU backward replicates the reference's output-based math
    (bcnn_backward_activation_cpu:211-222):
      grad_slope[c] = sum dy * y * (y < 0)   -> slope * (true gradient)
      dx            = dy * (y > 0 ? 1 : slope)
    so with the reference's ZERO slope init the slopes are frozen forever
    (its PReLU trains as a permanent ReLU), and with nonzero slopes the
    slope gradient is the true one scaled by the slope itself."""
    import jax

    from bcnn_tpu import ops

    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 3, 3, 4), jnp.float32
    )

    def loss(s):
        return jnp.sum(ops.apply_activation(x, Activation.PRELU, s) ** 2)

    # positive slopes: y<0 iff x<0, so grad == slope * true-grad
    s = jnp.asarray([0.5, 0.8, 0.25, 1.5])
    g = jax.grad(loss)(s)

    def true_loss(s):
        return jnp.sum(jnp.where(x > 0, x, s * x) ** 2)

    g_true = jax.grad(true_loss)(s)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_true) * np.asarray(s), rtol=1e-5
    )

    # NEGATIVE slope: y = s*x > 0 everywhere y would contribute, so the
    # reference's (y < 0) mask never fires — slope grad is exactly zero
    sneg = jnp.asarray([-0.3, -0.5, -1.0, -0.1])
    gneg = jax.grad(loss)(sneg)
    np.testing.assert_array_equal(np.asarray(gneg), np.zeros(4))

    # zero init: frozen forever
    g0 = jax.grad(loss)(jnp.zeros(4))
    np.testing.assert_array_equal(np.asarray(g0), np.zeros(4))

    # dx rule: dy * (y > 0 ? 1 : slope)
    def loss_x(xv):
        return jnp.sum(ops.apply_activation(xv, Activation.PRELU, s) ** 2)

    gx = jax.grad(loss_x)(x)
    y = np.where(np.asarray(x) > 0, np.asarray(x), np.asarray(s) * np.asarray(x))
    expect = 2 * y * np.where(y > 0, 1.0, np.asarray(s))
    np.testing.assert_allclose(np.asarray(gx), expect, rtol=1e-5)


def test_maxpool2x2_reshape_matches_reduce_window():
    """The default 2x2/s2 maxpool path (argmax-storing reshape VJP,
    ops/pool.py) must match the reduce_window lowering BIT-exactly:
    values, grads, tie-break (first max in row-major window order — the
    reference's strictly-greater scan, bcnn_maxpool_layer.c:145-192),
    and the odd-dimension -inf high-padding case."""
    import jax
    import jax.numpy as jnp

    import bcnn_tpu.ops.pool as pool

    rng = np.random.RandomState(0)
    for (h, w, oh, ow) in [(8, 8, 4, 4), (7, 9, 4, 5), (13, 13, 7, 7)]:
        x = rng.randn(3, h, w, 5).astype(np.float32)
        x[:, 0:2, 0:2, :] = 7.0           # 4-way tie in one window
        x[:, 2, 2, :] = x[:, 3, 3, :] = 5.0

        def f_rw(v):
            pad_h = max(0, (oh - 1) * 2 + 2 - h)
            pad_w = max(0, (ow - 1) * 2 + 2 - w)
            return jax.lax.reduce_window(
                v, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
            )

        def f_rs(v):
            return pool._maxpool2x2_reshape(v, oh, ow, h, w)

        xj = jnp.asarray(x)
        y1, y2 = f_rw(xj), f_rs(xj)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
        g = jnp.asarray(
            rng.randn(*np.asarray(y1).shape).astype(np.float32)
        )
        d1 = jax.grad(lambda v: jnp.vdot(f_rw(v), g))(xj)
        d2 = jax.grad(lambda v: jnp.vdot(f_rs(v), g))(xj)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))

"""int8 post-training quantization: accuracy vs fp32 and plumbing."""

import numpy as np
import pytest

from bcnn_tpu import Mode, Session
from bcnn_tpu.models import lenet_mnist, yolov3_tiny
from bcnn_tpu.ops.quant import calibrate, quantize_weights


def test_int8_forward_close_to_fp32():
    net = lenet_mnist(batch_size=8, mode=Mode.PREDICT)
    sess = Session(net, seed=0).compile_net()
    rng = np.random.RandomState(0)
    calib = [rng.randn(8, 1, 28, 28).astype(np.float32) for _ in range(3)]
    x = rng.randn(8, 1, 28, 28).astype(np.float32)

    (ref,), _ = sess.predict_on_batch(x, outputs=["softmax"])
    ref = np.asarray(ref).reshape(8, 10)

    scales = calibrate(net, sess.params, sess.state, calib)
    qw = quantize_weights(net, sess.params)
    assert len(qw) == 4  # 2 conv + 2 fc
    net.quant = {"act_scales": scales, "weights": qw}
    sess._forward_cache = {}  # force retrace with the quant path
    (got,), _ = sess.predict_on_batch(x, outputs=["softmax"])
    got = np.asarray(got).reshape(8, 10)

    # top-1 agreement and close probabilities
    assert (got.argmax(1) == ref.argmax(1)).mean() >= 0.9
    assert np.abs(got - ref).max() < 0.1


def test_int8_depthwise_mobilenet_block():
    from bcnn_tpu.models import mobilenet_v1

    net = mobilenet_v1(batch_size=2, classes=10, mode=Mode.PREDICT,
                       width_mult=0.25)
    sess = Session(net, seed=0).compile_net()
    import jax.numpy as jnp

    for k in list(sess.state):
        if "run_var" in k:
            sess.state[k] = jnp.ones_like(sess.state[k])
    rng = np.random.RandomState(3)
    x = rng.rand(2, 3, 224, 224).astype(np.float32) * 2 - 1
    (ref,), _ = sess.predict_on_batch(x, outputs=["softmax"])
    scales = calibrate(net, sess.params, sess.state, [x])
    qw = quantize_weights(net, sess.params)
    # all convs AND depthwise AND fc quantized
    from bcnn_tpu.types import LayerType

    n_q = sum(
        1 for n in net.nodes
        if n.type in (LayerType.CONV2D, LayerType.DEPTHWISE_CONV2D,
                      LayerType.FULL_CONNECTED)
    )
    assert len(qw) == n_q
    net.quant = {"act_scales": scales, "weights": qw}
    sess._forward_cache = {}
    (got,), _ = sess.predict_on_batch(x, outputs=["softmax"])
    ref_a = np.asarray(ref).reshape(2, -1)
    got_a = np.asarray(got).reshape(2, -1)
    assert (got_a.argmax(1) == ref_a.argmax(1)).all()
    assert np.abs(got_a - ref_a).max() < 0.15


def test_int8_yolo_head_decode_consistent():
    net = yolov3_tiny(batch_size=1, width=128, height=128, classes=4,
                      mode=Mode.PREDICT)
    sess = Session(net, seed=0).compile_net()
    rng = np.random.RandomState(1)
    # untrained running stats are zeros; var=0 turns BN into a 1000x gain
    # per layer, which isn't a meaningful quantization test — use unit vars
    import jax.numpy as jnp

    for k in list(sess.state):
        if "run_var" in k:
            sess.state[k] = jnp.ones_like(sess.state[k])
    x = rng.randn(1, 3, 128, 128).astype(np.float32)
    (ref,), _ = sess.predict_on_batch(x, outputs=["lid17"])
    scales = calibrate(net, sess.params, sess.state, [x])
    net.quant = {
        "act_scales": scales,
        "weights": quantize_weights(net, sess.params),
    }
    sess._forward_cache = {}
    (got,), _ = sess.predict_on_batch(x, outputs=["lid17"])
    # head outputs are mostly post-sigmoid; int8 keeps them close
    assert np.abs(np.asarray(got) - np.asarray(ref)).mean() < 0.05


def test_int8_activation_flow_bit_identical_and_reaches_backbone():
    """End-to-end int8 activations (plan_int8_flow): producers emit int8
    from their fused epilogues, maxpool/upsample/copy-concat pass it
    through, consumers read it directly. Because quantize-at-producer ==
    quantize-at-consumer for these exact-commute ops, outputs must be
    BIT-IDENTICAL to the quantize-at-every-consumer path — and the plan
    must actually cover the yolov3-tiny backbone."""
    import jax.numpy as jnp

    from bcnn_tpu import Mode, Session
    from bcnn_tpu.compile import execute
    from bcnn_tpu.models import yolov3_tiny
    from bcnn_tpu.ops.quant import (
        calibrate,
        plan_int8_flow,
        quantize_weights,
    )

    net = yolov3_tiny(batch_size=2, width=96, height=96, classes=4,
                      mode=Mode.PREDICT)
    sess = Session(net, seed=0).compile_net()
    for k in list(sess.state):
        if "run_var" in k:
            sess.state[k] = jnp.ones_like(sess.state[k])
    rng = np.random.RandomState(0)
    calib = rng.rand(2, 3, 96, 96).astype(np.float32)
    scales = calibrate(net, sess.params, sess.state, [calib])
    qw = quantize_weights(net, sess.params)

    x = rng.rand(2, 3, 96, 96).astype(np.float32)
    outs = {}
    for flow in (False, True):
        # flow_joiners off: joiners (eltwise / multi-src concat) quantize
        # at a shared scale and are value-tolerant by design — the
        # bit-identity contract holds for the exact-commute subset only
        net.quant = {
            "act_scales": scales, "weights": qw, "act_flow": flow,
            "flow_joiners": False,
        }
        sess._forward_cache = {}
        (a, b), _ = sess.predict_on_batch(
            x, outputs=["lid17", "lid24"]
        )
        outs[flow] = (np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(outs[False][0], outs[True][0])
    np.testing.assert_array_equal(outs[False][1], outs[True][1])

    # the plan must cover the backbone: count int8 tensors in the trace
    plan = plan_int8_flow(net, net.quant)
    assert len(plan) >= 10, f"flow plan too small: {sorted(plan)}"
    ex = execute(
        net, sess.params, sess.state,
        {"input": jnp.asarray(x)}, Mode.PREDICT, None,
    )
    n_int8 = sum(
        1 for v in ex.values.values() if v.dtype == jnp.int8
    )
    assert n_int8 >= 10, f"only {n_int8} int8 tensors materialized"


def test_int8_flow_joiners_cover_residual_trunk():
    """flow_joiners (shared-scale int8 eltwise add / multi-src concat)
    must (a) extend the int8 plan through a ResNet residual trunk that
    the exact-commute rules alone cannot reach, and (b) keep outputs
    within the PTQ accuracy budget of the plain (dequant-everywhere)
    int8 path — the value-tolerant gate the bit-identity contract does
    not cover."""
    import jax.numpy as jnp

    from bcnn_tpu.compile import execute
    from bcnn_tpu.models import resnet18
    from bcnn_tpu.ops.quant import plan_int8_flow
    from bcnn_tpu.types import LayerType

    net = resnet18(batch_size=2, classes=10, mode=Mode.PREDICT)
    sess = Session(net, seed=0).compile_net()
    for k in list(sess.state):
        if "run_var" in k:
            sess.state[k] = jnp.ones_like(sess.state[k])
    rng = np.random.RandomState(5)
    x = rng.rand(2, 3, 224, 224).astype(np.float32) * 2 - 1
    scales = calibrate(net, sess.params, sess.state, [x])
    qw = quantize_weights(net, sess.params)

    base = {"act_scales": scales, "weights": qw}
    plan_off = plan_int8_flow(net, {**base, "flow_joiners": False})
    plan_on = plan_int8_flow(net, {**base, "flow_joiners": True})
    # every eltwise input the joiner plan covers is a tensor the exact
    # plan could not; the trunk must be substantially covered
    elt_srcs = {
        s for n in net.nodes if n.type == LayerType.ELTWISE
        for s in n.src[:2]
    }
    assert not (elt_srcs & set(plan_off)), "exact plan reached eltwise?"
    n_elt_cov = len(elt_srcs & set(plan_on))
    assert n_elt_cov >= 8, (
        f"joiners cover only {n_elt_cov} of {len(elt_srcs)} eltwise inputs"
    )

    # int8 quality gate: joiner flow stays close to the plain int8 path
    outs = {}
    for joiners in (False, True):
        net.quant = {**base, "flow_joiners": joiners}
        sess._forward_cache = {}
        (o,), _ = sess.predict_on_batch(x, outputs=["softmax"])
        outs[joiners] = np.asarray(o).reshape(2, -1)
    assert (outs[True].argmax(1) == outs[False].argmax(1)).all()
    assert np.abs(outs[True] - outs[False]).max() < 0.15

    # int8 tensors actually materialize through the trunk
    net.quant = {**base, "flow_joiners": True}
    ex = execute(
        net, sess.params, sess.state,
        {"input": jnp.asarray(x)},
        Mode.PREDICT, None,
    )
    n_int8 = sum(1 for v in ex.values.values() if v.dtype == jnp.int8)
    assert n_int8 >= len(plan_on) - 2, (n_int8, len(plan_on))


def test_int8_flow_fanout_chain_scale_cannot_clip_direct_consumer():
    """Regression (round-3 review): a tensor feeding BOTH a quantized conv
    directly and a maxpool->conv chain must not be stored at the chain's
    downstream scale when that differs from its own calibrated scale —
    the pre-fix resolver silently adopted the chain scale, clipping the
    direct consumer's input (values beyond 127*s_chain saturate) and
    breaking the bit-identity contract of the exact-commute flow subset.
    The planner must leave such a tensor fp32 (each consumer quantizes
    for itself, which IS the bit-exact behavior)."""
    import jax.numpy as jnp

    from bcnn_tpu import Activation, FillerType, Mode, Net, Padding
    from bcnn_tpu.ops.quant import plan_int8_flow

    net = Net(Mode.PREDICT)
    net.set_input_shape(8, 8, 1, 2)
    net.add_convolutional_layer(4, 3, 1, 1, 1, 0, FillerType.XAVIER,
                                Activation.NONE, 0, "input", "t")
    net.add_convolutional_layer(4, 3, 1, 1, 1, 0, FillerType.XAVIER,
                                Activation.NONE, 0, "t", "direct")
    net.add_maxpool_layer(2, 2, Padding.VALID, "t", "pool")
    net.add_convolutional_layer(4, 3, 1, 1, 1, 0, FillerType.XAVIER,
                                Activation.NONE, 0, "pool", "chained")
    sess = Session(net, seed=3).compile_net()

    rng = np.random.RandomState(0)
    calib = rng.rand(2, 1, 8, 8).astype(np.float32)
    scales = calibrate(net, sess.params, sess.state, [calib])
    t_i = net.get_tensor_index_by_name("t")
    p_i = net.get_tensor_index_by_name("pool")
    if scales[p_i] >= scales[t_i]:
        # force the interesting case: t's extreme is negative, so maxpool
        # (which keeps window maxima) drops it and calibrates smaller
        for k in ("input_w", "input_b"):  # t's producer (keys are <src>_*)
            sess.params[k] = -sess.params[k]
        scales = calibrate(net, sess.params, sess.state, [calib])
    assert scales[p_i] < scales[t_i], (
        "precondition: chain scale below calibrated scale"
        f" ({scales[p_i]} vs {scales[t_i]})"
    )

    qw = quantize_weights(net, sess.params)
    base = {"act_scales": scales, "weights": qw, "act_flow": True,
            "flow_joiners": False}
    plan = plan_int8_flow(net, base)
    assert t_i not in plan, (
        "fan-out tensor with a mismatched chain demand must stay fp32, "
        f"got scale {plan.get(t_i)} (calibrated {scales[t_i]})"
    )
    # the chain itself remains coverable: pool's output feeds one conv
    assert plan.get(p_i) == scales[p_i]

    # and the flow path stays bit-identical to quantize-at-consumer
    x = rng.rand(2, 1, 8, 8).astype(np.float32)
    outs = {}
    for flow in (False, True):
        net.quant = {**base, "act_flow": flow}
        sess._forward_cache = {}
        (a, b), _ = sess.predict_on_batch(
            x, outputs=["direct", "chained"]
        )
        outs[flow] = (np.asarray(a), np.asarray(b))
        net.quant = None
    np.testing.assert_array_equal(outs[False][0], outs[True][0])
    np.testing.assert_array_equal(outs[False][1], outs[True][1])

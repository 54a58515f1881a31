"""Post-training int8 quantization for inference.

The reference reserves a `quantize` flag in its conv builder API
(bcnn_add_convolutional_layer's `quantize` argument, bcnn.h) but never
implements it; here it's real, because the v5e MXU doubles throughput on
int8 (394 TOPS vs 197 bf16 TFLOPS) and int8 activations halve the HBM
traffic of the memory-bound high-resolution layers.

Scheme (standard symmetric PTQ):
  - weights: per-output-channel symmetric int8, scales from |w|max;
  - activations: per-tensor symmetric int8, scales from a calibration pass
    (abs-max over representative batches);
  - conv/fc accumulate in int32 on the MXU, dequantize with the fused
    scale sx*sw[c], then bias/BN/activation in fp32 as usual.

Usage:
    scales = calibrate(net, sess.params, sess.state, calib_batches)
    qparams = quantize_weights(net, sess.params)
    net.quant = {"act_scales": scales, "weights": qparams}
    # Session.predict_on_batch / detect_on_batch then take the int8 path
    # for CONV2D and FULL_CONNECTED nodes.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..types import LayerType, Mode


def quantize_weights(net, params) -> Dict[str, Dict]:
    """Per-output-channel int8 for conv (HWIO -> scale over O) and fc
    ((in,out) -> scale over out). Returns {param_key: {"q": int8 array,
    "scale": fp32 per-channel}}."""
    out = {}
    for node in net.nodes:
        if node.type in (LayerType.CONV2D, LayerType.DEPTHWISE_CONV2D):
            key = net.tensors[node.src[1]].key
            w = np.asarray(params[key], np.float32)  # (k,k,I,O)
            amax = np.abs(w).max(axis=(0, 1, 2))
            scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
            q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
            out[key] = {"q": jnp.asarray(q), "scale": jnp.asarray(scale)}
        elif node.type == LayerType.TRANSPOSE_CONV2D:
            key = net.tensors[node.src[1]].key
            # deconv HWIO is (k,k,n,c_src): deconv OUTPUT channels are
            # axis 2 (the forward-conv input side) — per-output-channel
            # scales reduce over (0,1,3)
            w = np.asarray(params[key], np.float32)
            amax = np.abs(w).max(axis=(0, 1, 3))
            scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
            q = np.clip(
                np.round(w / scale[None, None, :, None]), -127, 127
            ).astype(np.int8)
            out[key] = {"q": jnp.asarray(q), "scale": jnp.asarray(scale)}
        elif node.type == LayerType.FULL_CONNECTED:
            key = net.tensors[node.src[1]].key
            w = np.asarray(params[key], np.float32)  # (in, out)
            amax = np.abs(w).max(axis=0)
            scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
            q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
            out[key] = {"q": jnp.asarray(q), "scale": jnp.asarray(scale)}
    return out


def calibrate(net, params, state, batches: List[np.ndarray]) -> Dict[int, float]:
    """Observe the conv/fc input tensors over calibration batches; returns
    {src_tensor_index: activation_scale}."""
    from ..compile import execute

    watch = []
    for node in net.nodes:
        if node.type in (
            LayerType.CONV2D,
            LayerType.DEPTHWISE_CONV2D,
            LayerType.TRANSPOSE_CONV2D,
            LayerType.FULL_CONNECTED,
        ):
            watch.append(node.src[0])
    watch = sorted(set(watch))

    amax = {i: 0.0 for i in watch}
    for x in batches:
        ex = execute(
            net, params, state,
            {"input": jnp.asarray(x, jnp.float32)}, Mode.PREDICT, None,
        )
        for i in watch:
            amax[i] = max(amax[i], float(jnp.max(jnp.abs(ex.values[i]))))
    return {
        i: (m / 127.0 if m > 0 else 1.0) for i, m in amax.items()
    }


def quantize_tensor(x: jax.Array, scale: float) -> jax.Array:
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def conv2d_int8(
    x: jax.Array, wq: jax.Array, x_scale: float, w_scale: jax.Array,
    stride: int, pad: int, groups: int = 1,
) -> jax.Array:
    """int8 x int8 -> int32 MXU conv, dequantized to fp32.
    x already int8 (N,H,W,C); wq int8 (k,k,I,O); w_scale (O,)."""
    acc = jax.lax.conv_general_dilated(
        x,
        wq,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (x_scale * w_scale)


def conv2d_transpose_int8(
    x: jax.Array, wq: jax.Array, x_scale: float, w_scale: jax.Array,
    stride: int, pad: int,
) -> jax.Array:
    """int8 deconv: same transposed geometry as ops.conv.conv2d_transpose
    (explicit pads k-1-p on the dilated input), int32 MXU accumulation,
    fused dequant. wq int8 (k,k,n,c_src); w_scale (n,)."""
    k = wq.shape[0]
    e = k - 1 - pad
    acc = jax.lax.conv_transpose(
        x,
        wq,
        strides=(stride, stride),
        padding=((e, e), (e, e)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (x_scale * w_scale)


def fc_int8(
    x: jax.Array, wq: jax.Array, x_scale: float, w_scale: jax.Array
) -> jax.Array:
    acc = jax.lax.dot_general(
        x, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (x_scale * w_scale)


def plan_int8_flow(net, quant) -> Dict[int, float]:
    """Static analysis for end-to-end int8 activations: which activation
    tensors can live in HBM as int8 between layers.

    The round-1 int8 path dequantized every conv output to fp32, so
    inter-layer traffic stayed 4 B/px plus an extra int8 copy at each
    consumer (the +16%-only speedup of BENCHMARKS.md round 1). This plan
    lets the conv epilogue EMIT int8 directly and lets consumers read it
    as-is: tensor t is int8-viable with scale s iff every consumer is
    (a) a quantized conv/depthwise/deconv/FC reading t as data input
        with calibrated scale s = act_scales[t], or
    (b) an op that commutes EXACTLY with the monotone quantizer —
        maxpool (max of rounded == rounded max), nearest upsample
        (replication), single-source concat (copy), PREDICT dropout
        (identity) — whose own output is int8-viable with the same s.
    Because quantize-at-producer then equals quantize-at-consumer
    value-for-value, the network outputs are BIT-IDENTICAL to the
    round-1 int8 path; only the HBM dtype changes (4x fewer activation
    bytes on the memory-bound backbone).
    """
    from ..types import LayerType as L

    act_scales = quant["act_scales"]
    weights = quant["weights"]

    consumers: Dict[int, list] = {}
    for node in net.nodes:
        if node.type == L.CONCAT:
            srcs = list(node.src)
        elif node.type == L.ELTWISE:
            srcs = list(node.src[:2])
        elif node.src:
            srcs = [node.src[0]]
        else:
            srcs = []
        for s in srcs:
            consumers.setdefault(s, []).append(node)

    def quant_consumer_scale(c, t):
        if c.type not in (
            L.CONV2D, L.DEPTHWISE_CONV2D, L.TRANSPOSE_CONV2D,
            L.FULL_CONNECTED,
        ):
            return None
        if not c.src or c.src[0] != t:
            return None
        key = net.tensors[c.src[1]].key
        if key not in weights or t not in act_scales:
            return None
        return act_scales[t]

    allow_pass = quant.get("flow_pass", True)
    viable: Dict[int, float] = {}
    for node in reversed(net.nodes):
        if not node.dst:
            continue
        d = node.dst[0]
        cons = consumers.get(d, [])
        if not cons:
            continue  # graph output: keep fp32 for the host
        req = []
        ok = True
        for c in cons:
            s = quant_consumer_scale(c, d)
            if s is not None:
                req.append(s)
                continue
            passthrough = allow_pass and (
                c.type in (L.MAXPOOL, L.UPSAMPLE, L.DROPOUT)
                or (c.type == L.CONCAT and len(c.src) == 1)
            )
            if passthrough and c.dst and c.dst[0] in viable:
                req.append(viable[c.dst[0]])
                continue
            ok = False
            break
        if ok and req and all(r == req[0] for r in req):
            viable[d] = req[0]
    return viable

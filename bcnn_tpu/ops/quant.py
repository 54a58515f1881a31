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

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


def watch_tensors(net) -> List[int]:
    """Tensor indices whose activation scale the int8 paths need: every
    conv/dw/deconv/fc data input plus joiner (eltwise/concat) inputs for
    the shared-scale int8 flow. Shared by PTQ calibration and QAT."""
    watch = []
    for node in net.nodes:
        if node.type in (
            LayerType.CONV2D,
            LayerType.DEPTHWISE_CONV2D,
            LayerType.TRANSPOSE_CONV2D,
            LayerType.FULL_CONNECTED,
        ):
            watch.append(node.src[0])
        elif node.type == LayerType.ELTWISE:
            watch.extend(node.src[:2])
        elif node.type == LayerType.CONCAT and len(node.src) > 1:
            watch.extend(node.src)
    return sorted(set(watch))


def _kl_threshold(hist: np.ndarray, n_quant: int = 128) -> int:
    """TensorRT-style entropy calibration over a |x| histogram: choose
    the clip bin i (>= n_quant) minimizing KL(P_clip || Q_i), where
    P_clip folds the tail into the last kept bin and Q_i is the kept
    range re-expressed with n_quant levels (each level's mass spread
    uniformly over its nonzero source bins). Returns the bin index
    (exclusive upper edge of the kept range)."""
    n_bins = len(hist)
    total = hist.sum()
    if total == 0:
        return n_bins
    best_i, best_kl = n_bins, np.inf
    for i in range(n_quant, n_bins + 1):
        ref = hist[:i].astype(np.float64).copy()
        ref[i - 1] += hist[i:].sum()  # clip: outliers saturate
        p = ref / ref.sum()
        # merge the i kept bins into n_quant levels
        kept = hist[:i].astype(np.float64)
        edges = (np.arange(n_quant + 1) * i) // n_quant
        q = np.zeros(i, np.float64)
        for lv in range(n_quant):
            lo, hi = edges[lv], edges[lv + 1]
            seg = kept[lo:hi]
            nz = seg > 0
            if nz.any():
                q[lo:hi][nz] = seg.sum() / nz.sum()
        qs = q.sum()
        if qs == 0:
            continue
        q /= qs
        m = (p > 0) & (q > 0)
        kl = float(np.sum(p[m] * np.log(p[m] / q[m])))
        # bins where p>0 but q==0 contribute +inf; penalize by skipping
        if ((p > 0) & (q == 0)).any():
            continue
        if kl < best_kl:
            best_kl, best_i = kl, i
    return best_i


def calibrate(
    net,
    params,
    state,
    batches: List[np.ndarray],
    method: str = "absmax",
    percentile: float = 99.9,
    kl_bins: int = 2048,
) -> Dict[int, float]:
    """Observe the conv/fc (and joiner) input tensors over calibration
    batches; returns {src_tensor_index: activation_scale}.

    method:
      - "absmax": scale = max |x| / 127 (exact range cover; one saturated
        outlier inflates the scale and wastes int8 resolution for the
        bulk of the distribution);
      - "percentile": scale = P(|x|, percentile) / 127, aggregated by max
        over batches — the standard outlier-robust calibrator; values
        past the percentile saturate at ±127;
      - "kl": TensorRT-style entropy calibration — accumulate a
        kl_bins histogram of |x| over all batches (range fixed by a
        first abs-max pass), pick the clip threshold minimizing
        KL(clipped || int8-quantized); scale = threshold / 127. Best
        when the distribution has a long informative tail that percentile
        would clip too aggressively or absmax would over-cover.
    The PTQ accuracy studies (tests/test_quant_accuracy.py) compare all
    three per architecture; absmax stays the default because the studied
    classification nets show no outlier pathology (BENCHMARKS.md).
    DETECTION discriminates (round 5, held-out mAP@0.5 on a trained
    yolov3-tiny, BENCHMARKS.md): percentile 0.920 > absmax 0.821 >
    kl 0.711 vs fp32 0.967 — the yolo head's box-regression tail is
    informative, so entropy calibration clips it too hard and absmax
    wastes resolution on rare spikes. Use method="percentile" when
    quantizing detectors."""
    from ..compile import execute

    watch = watch_tensors(net)

    if method not in ("absmax", "percentile", "kl"):
        raise ValueError(f"unknown calibration method: {method!r}")

    # One jitted program returning only the watched tensors. The previous
    # eager op-by-op execute dispatched every primitive separately, which
    # on the axon remote-compile tunnel means one server-side compile per
    # op — measured minutes (sometimes wedged >10 min) for one yolov3-tiny
    # calibration batch, vs one ~30 s net-sized compile here. params/state
    # are arguments, not closures, so the weights stay runtime operands
    # instead of being baked into the HLO as constants.
    @jax.jit
    def _watched(params, state, x):
        ex = execute(net, params, state, {"input": x}, Mode.PREDICT, None)
        return {i: ex.values[i] for i in watch}

    def run(x):
        return _watched(params, state, jnp.asarray(x, jnp.float32))

    if method == "kl":
        # pass 1: global |x| range per watched tensor
        amax = {i: 0.0 for i in watch}
        for x in batches:
            vals = run(x)
            for i in watch:
                amax[i] = max(amax[i], float(jnp.max(jnp.abs(vals[i]))))
        # pass 2: histogram accumulation
        hists = {i: np.zeros(kl_bins, np.int64) for i in watch}
        for x in batches:
            vals = run(x)
            for i in watch:
                if amax[i] <= 0:
                    continue
                v = np.asarray(jnp.abs(vals[i]), np.float32).ravel()
                h, _ = np.histogram(v, bins=kl_bins, range=(0.0, amax[i]))
                hists[i] += h
        scales = {}
        for i in watch:
            if amax[i] <= 0:
                scales[i] = 1.0
                continue
            cut = _kl_threshold(hists[i])
            thresh = (cut + 0.5) * (amax[i] / kl_bins)
            scales[i] = min(thresh, amax[i]) / 127.0
        return scales

    amax = {i: 0.0 for i in watch}
    for x in batches:
        vals = run(x)
        for i in watch:
            v = jnp.abs(vals[i])
            if method == "absmax":
                m = float(jnp.max(v))
            else:
                m = float(jnp.percentile(v.astype(jnp.float32), percentile))
            amax[i] = max(amax[i], m)
    return {
        i: (m / 127.0 if m > 0 else 1.0) for i, m in amax.items()
    }


def quantize_tensor(x: jax.Array, scale: float) -> jax.Array:
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


# ------------------------------------------------------------------ #
# Quantization-aware training (QAT)
#
# The reference reserves a `quantize` argument on its conv builder
# (inc/bcnn/bcnn.h bcnn_add_convolutional_layer) but never implements
# it; here it is real. QAT simulates the deployed int8 program inside
# the fp32 training graph: conv/fc inputs and weights pass through a
# quantize-dequantize ("fake quant") with a straight-through estimator,
# so the optimizer sees — and adapts to — the exact rounding the int8
# serving path will apply. Activation ranges are tracked as an EMA of
# per-batch abs-max in `state` (keys "qat_amax/<tensor idx>", created by
# init_params when net.qat is set, threaded through make_train_step
# like BN running stats). qat_export() then freezes the trained net
# into the same {"act_scales", "weights"} dict PTQ produces, so the
# whole int8 serving stack (activation flow plan, AOT export) is reused
# unchanged.
# ------------------------------------------------------------------ #


def fake_quant_ste(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric int8 quantize-dequantize with the clipped
    straight-through estimator: forward value is the dequantized grid
    point; gradient is identity inside the representable range
    [-127*scale, 127*scale] and zero outside (saturated values carry no
    useful gradient). `scale` broadcasts against x (per-tensor scalar or
    per-channel keepdims array) and is treated as a constant."""
    s = jax.lax.stop_gradient(scale)
    q = jnp.clip(jnp.round(x / s), -127.0, 127.0) * s
    inside = jnp.abs(x) <= 127.0 * s
    return jnp.where(
        inside, x + jax.lax.stop_gradient(q - x), jax.lax.stop_gradient(q)
    )


def fake_quant_weight(w: jax.Array, reduce_axes) -> jax.Array:
    """Per-output-channel fake quant of a weight tensor; reduce_axes are
    the non-output axes (conv/dw HWIO -> (0,1,2); deconv (0,1,3); fc
    (0,)), matching quantize_weights' scale layout so the exported int8
    weights land on the grid training optimized."""
    amax = jnp.max(jnp.abs(w), axis=tuple(reduce_axes), keepdims=True)
    scale = jnp.where(amax > 0, amax, 127.0) / 127.0
    return fake_quant_ste(w, scale)


QAT_WEIGHT_AXES = {
    LayerType.CONV2D: (0, 1, 2),
    LayerType.DEPTHWISE_CONV2D: (0, 1, 2),
    LayerType.TRANSPOSE_CONV2D: (0, 1, 3),
    LayerType.FULL_CONNECTED: (0,),
}


def qat_state_keys(net) -> List[str]:
    return [f"qat_amax/{i}" for i in watch_tensors(net)]


def qat_export(net, params, state) -> Dict:
    """Freeze a QAT-trained (params, state) into the net.quant dict the
    int8 PREDICT path consumes (same shape calibrate()+quantize_weights
    produce). Activation scales come from the trained EMA abs-max."""
    act_scales = {}
    for i in watch_tensors(net):
        m = float(np.asarray(state.get(f"qat_amax/{i}", 0.0)))
        act_scales[i] = m / 127.0 if m > 0 else 1.0
    return {
        "act_scales": act_scales,
        "weights": quantize_weights(net, params),
    }


def conv2d_int8(
    x: jax.Array, wq: jax.Array, x_scale: float, w_scale: jax.Array,
    stride: int, pad: int, groups: int = 1,
) -> jax.Array:
    """int8 x int8 -> int32 MXU conv, dequantized to fp32.
    x already int8 (N,H,W,C); wq int8 (k,k,I,O); w_scale (O,).

    The alternative formulations in ops/conv (_depthwise_fma int32,
    _conv_s2d2) are bit-identical here (exact integer reassociation,
    tests/test_ops.py) but measured SLOWER in-model on v5e (MobileNet
    int8 13.9 -> 28.7 ms/256; ResNet int8 14.1 -> 14.0 ms) — direct
    lowering kept; see ops/conv._conv_best for the pinned negative
    result."""
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
    (a) a quantized conv/depthwise/deconv/FC reading t as data input —
        the int8 dequant uses s directly, so any s is accepted
        (preferred: the calibrated act_scales[t], which keeps the result
        BIT-IDENTICAL to the quantize-at-every-consumer path), or
    (b) an op that commutes EXACTLY with the monotone quantizer —
        maxpool (max of rounded == rounded max), nearest upsample
        (replication), single-source concat (copy), PREDICT dropout
        (identity) — whose own output is int8-viable with the same s, or
    (c) [flow_joiners, default on] a JOINER — eltwise add or multi-source
        concat — all of whose data inputs settle on ONE shared scale
        s_e = max over the joiner's calibrated input scales. The int8
        eltwise add is exact in int32 given the shared scale; the
        accuracy cost is that inputs are quantized at the (coarser)
        shared scale rather than their own — value-tolerant, gated by
        the PTQ accuracy studies (tests/test_quant_accuracy.py), not by
        bit-identity. This is what extends the 4x byte saving through
        ResNet/Darknet-53 residual trunks
        (bcnn_eltwise_layer.c:111-163 semantics preserved).

    Resolution per producer: joiner/pass-through demands are fixed and
    must agree; conv-like consumers are flexible. With no fixed demand
    the calibrated scale is used (bit-exact case b/a).

    Sibling coupling (a joiner needs BOTH producers viable) is resolved
    by a fixpoint: start with every calibrated joiner enabled, run the
    reverse pass, disable any joiner whose inputs did not all come out
    viable at its shared scale, repeat until stable.
    """
    from ..types import LayerType as L

    act_scales = quant["act_scales"]
    weights = quant["weights"]

    def data_srcs(c):
        if c.type == L.CONCAT:
            return list(c.src)
        if c.type == L.ELTWISE:
            return list(c.src[:2])
        return [c.src[0]] if c.src else []

    def is_joiner(c):
        return c.type == L.ELTWISE or (
            c.type == L.CONCAT and len(c.src) > 1
        )

    consumers: Dict[int, list] = {}
    for node in net.nodes:
        for s in data_srcs(node):
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
    allow_join = quant.get("flow_joiners", True)

    joiner_scale: Dict[int, float] = {}
    joiners: Dict[int, object] = {}
    enabled = set()
    for nd in net.nodes:
        if not is_joiner(nd):
            continue
        ss = [act_scales.get(s) for s in data_srcs(nd)]
        if allow_join and all(v is not None for v in ss):
            joiner_scale[id(nd)] = max(ss)
            joiners[id(nd)] = nd
            enabled.add(id(nd))

    while True:
        viable: Dict[int, float] = {}
        for node in reversed(net.nodes):
            if not node.dst:
                continue
            d = node.dst[0]
            cons = consumers.get(d, [])
            if not cons:
                continue  # graph output: keep fp32 for the host
            fixed_p, fixed_j, flex, ok = [], [], [], True
            for c in cons:
                s = quant_consumer_scale(c, d)
                if s is not None:
                    flex.append(s)
                    continue
                if is_joiner(c) and id(c) in enabled:
                    fixed_j.append(joiner_scale[id(c)])
                    continue
                passthrough = allow_pass and (
                    c.type in (L.MAXPOOL, L.UPSAMPLE, L.DROPOUT)
                    or (c.type == L.CONCAT and len(c.src) == 1)
                )
                if passthrough and c.dst and c.dst[0] in viable:
                    fixed_p.append(viable[c.dst[0]])
                    continue
                ok = False
                break
            if not ok:
                continue
            # Resolve the demands. A direct quantized consumer wants the
            # CALIBRATED scale (every flex entry is act_scales[d]); a
            # passthrough chain wants exactly its downstream plan scale
            # (int8 codes pass through the chain unchanged, so any other
            # store scale would be dequantized wrong later); a joiner
            # wants its shared scale. All same-kind demands must agree,
            # and a chain scale must equal the calibrated scale when a
            # direct consumer exists — silently adopting a chain scale
            # below the calibrated one (as the pre-fix resolver did)
            # clips the direct consumer's input and breaks the
            # bit-identity contract. A joiner's shared scale MAY be
            # coarser than the calibrated scale (it is a max over input
            # scales including this tensor's, so it never clips); that
            # coarsening is what the value-tolerant, accuracy-gated
            # flow_joiners mode signs up for.
            if fixed_p and any(f != fixed_p[0] for f in fixed_p):
                continue
            if fixed_j and any(f != fixed_j[0] for f in fixed_j):
                continue
            if fixed_p and flex and fixed_p[0] != flex[0]:
                continue
            if fixed_j:
                sj = fixed_j[0]
                if fixed_p and fixed_p[0] != sj:
                    continue
                if flex and sj < flex[0]:
                    continue  # defensive: below-range shared scale clips
                viable[d] = sj
            elif fixed_p:
                viable[d] = fixed_p[0]
            elif flex:
                viable[d] = flex[0]
        stale = {
            j
            for j in enabled
            if any(
                viable.get(s) != joiner_scale[j]
                for s in data_srcs(joiners[j])
            )
        }
        if not stale:
            return viable
        enabled -= stale


def ptq_synthetic(net, sess, n: int = 4, seed: int = 1,
                  method: str = "absmax") -> Dict:
    """Bench/example-harness helper: PTQ-quantize a randomly INITIALIZED
    (never trained) net. Random nets carry near-zero BN run_var, which
    explodes the folded 1/sqrt(var) scale, so running stats are reset to
    sane values first; calibration then runs on one synthetic uniform
    batch shaped like the net's input. Installs and returns net.quant.
    Real models calibrate with calibrate()/quantize_weights() on
    representative data instead."""
    for k in list(sess.state):
        if "run_var" in k:
            sess.state[k] = jnp.ones_like(sess.state[k])
    t0 = net.tensors[0]
    calib = np.random.RandomState(seed).rand(
        min(n, t0.n), t0.c, t0.h, t0.w
    ).astype(np.float32)
    net.quant = {
        "act_scales": calibrate(
            net, sess.params, sess.state, [calib], method=method
        ),
        "weights": quantize_weights(net, sess.params),
    }
    return net.quant

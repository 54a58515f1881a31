"""Graph executor: compiles the declarative Net into jitted JAX functions.

This replaces the reference's interpreter (bcnn_forward: linear scan calling
node->forward fn pointers, src/bcnn_net.c:410-429) with a single traced
program per mode: the Python loop below runs once at trace time, XLA sees the
whole graph and fuses across layer boundaries (bias+BN+activation fold into
the conv epilogue, etc.). Autodiff of the traced program replaces every
hand-written backward (bcnn_backward, the *_layer backward kernels).

Conventions:
  - `params`:  dict key -> array, the learned tensors (PARAM specs);
  - `state`:   dict key -> array, BN running stats (STATE specs);
  - `values`:  per-trace dict tensor-index -> array; activations NHWC;
  - inputs/labels cross the API boundary in the reference's NCHW layout.

In-place reference ops (activation/dropout write their src,
bcnn_activation_layer.c:158) are modeled by rebinding *both* src and dst
indices to the new value, preserving the "same name before/after" semantics
configs rely on.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from . import ops
from .graph import Net, Node, TensorKind
from .ops.losses import compute_metric, euclidean_surrogate
from .types import Activation, LayerType, Loss, Mode


def nchw_to_nhwc(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 3, 1, 2))


def init_params(
    net: Net, seed: int = 0
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Create (params, state) pytrees from the tensor specs' fillers.
    Mirrors the builders' bcnn_tensor_fill calls; unfilled tensors are
    zeros (calloc semantics, bh_align_calloc)."""
    key = jax.random.PRNGKey(seed)
    params: Dict[str, jax.Array] = {}
    state: Dict[str, jax.Array] = {}
    for i, t in enumerate(net.tensors):
        if t.kind == TensorKind.PARAM:
            if t.filler is not None:
                params[t.key] = t.filler(
                    jax.random.fold_in(key, i), t.mem_shape
                )
            else:
                params[t.key] = jnp.zeros(t.mem_shape, jnp.float32)
        elif t.kind == TensorKind.STATE:
            state[t.key] = jnp.zeros(t.mem_shape, jnp.float32)
    if getattr(net, "qat", None):
        from .ops.quant import qat_state_keys

        for k in qat_state_keys(net):
            state[k] = jnp.zeros((), jnp.float32)
    return params, state


def _flatten_nchw(x: jax.Array) -> jax.Array:
    """NHWC activation -> (N, c*h*w) flat in the reference's NCHW order."""
    if x.ndim == 4:
        x = nhwc_to_nchw(x)
    return x.reshape(x.shape[0], -1)


# layers whose reference backward OVERWRITES the src grad buffer instead
# of accumulating into it (see run()'s routing comment for the citations)
_OVERWRITE_BWD = frozenset(
    {
        LayerType.CONV2D,
        LayerType.TRANSPOSE_CONV2D,
        LayerType.BATCHNORM,
        LayerType.LRN,
    }
)


def _data_srcs(node: Node):
    """The tensor indices a node reads as DATA (grad-carrying inputs),
    mirroring which src slots the reference's backward writes."""
    if node.type == LayerType.CONCAT:
        return list(node.src)
    if node.type == LayerType.ELTWISE:
        return list(node.src[:2])
    return [node.src[0]] if node.src else []


def build_grad_routing(net: Net):
    """Static SSA pass: for every produced tensor VERSION with more than
    one consumer of which at least one overwrites its grad in the
    reference backward, record the ordered consumer list. Key:
    (tensor index, producing node position) -> [(consumer pos, ov)]."""
    version_producer: Dict[int, int] = {}
    consumers: Dict[Tuple[int, int], list] = {}
    for i, node in enumerate(net.nodes):
        for s in _data_srcs(node):
            key = (s, version_producer.get(s, -1))
            lst = consumers.setdefault(key, [])
            if lst and lst[-1][0] == i:
                continue  # same node reading twice: one tap, summed edges
            lst.append((i, node.type in _OVERWRITE_BWD))
        for d in node.dst:
            version_producer[d] = i
    return {
        k: lst
        for k, lst in consumers.items()
        if k[1] >= 0  # graph inputs carry no grad in the reference
        and len(lst) >= 2
        and any(ov for _, ov in lst)
    }


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _grad_split(flags: Tuple[bool, ...], x: jax.Array):
    """Identity fan-out whose backward combines the consumer cotangents
    the way the reference's reverse node scan writes the shared grad
    buffer: consumers are processed from LATEST node to EARLIEST
    (backward order); an accumulating consumer adds its cotangent, an
    overwriting one replaces the running value."""
    return tuple(x for _ in flags)


def _grad_split_fwd(flags, x):
    return _grad_split(flags, x), None


def _grad_split_bwd(flags, _, gs):
    val = None
    for g, ov in reversed(list(zip(gs, flags))):
        if ov:
            val = g
        else:
            val = g if val is None else val + g
    return (val,)


_grad_split.defvjp(_grad_split_fwd, _grad_split_bwd)


class _Executor:
    """One traced pass over the graph."""

    def __init__(
        self,
        net: Net,
        params: Dict[str, jax.Array],
        state: Dict[str, jax.Array],
        mode: Mode,
        rng: Optional[jax.Array],
    ):
        self.net = net
        self.params = params
        self.state = dict(state)
        self.mode = mode
        self.rng = rng
        self.values: Dict[int, jax.Array] = {}
        self.surrogate = jnp.zeros((), jnp.float32)
        self.metrics = []  # per cost node reported value
        # net.yolo_stats: per-yolo-layer per-batch training diagnostics
        # (the reference prints them every TRAIN batch, bcnn_yolo.c:408-414)
        self.yolo_stats = []
        # compute_dtype applies in ALL modes: convs/FC take bf16 MXU inputs
        # with fp32 accumulation and fp32 master params; the conv backward
        # runs in bf16 too via the custom VJPs in ops/conv.py. Parity tests
        # leave compute_dtype unset (fp32 everywhere).
        self.compute_dtype = getattr(net, "compute_dtype", None)
        # opt-in (net.act_dtype): keep activations in a reduced dtype
        # between layers in PREDICT. A round-1 measurement pinned this as
        # a 5x slowdown; round 3 re-validated on the current program and
        # it is a 29-41% WIN (26.0 vs 33.7 ms batch 256, 48.1 vs 67.8 ms
        # batch 512 — BENCHMARKS.md): the forward writes+reads every
        # boundary tensor once, and with compute_dtype=bf16 the consumer
        # conv rounds its input to bf16 either way, so the cast costs one
        # rounding it already paid. Stays opt-in: the fp32 default is the
        # reference-parity path (1e-4 detections).
        self.act_dtype = (
            getattr(net, "act_dtype", None) if mode == Mode.PREDICT else None
        )
        # opt-in (net.train_act_dtype): store inter-layer activations in a
        # reduced dtype during TRAINING. Unlike act_dtype (inference), this
        # targets the BACKWARD's bytes: JAX cotangents carry the primal's
        # dtype, so a bf16 layer boundary halves the grad-chain HBM traffic
        # AND dedups the conv VJP residual (the x16 the mixed VJP saves IS
        # the stored activation — today the fp32 y and its bf16 copy are
        # both written). Epilogue math (bias/BN/act) stays fp32; only the
        # stored boundary tensor is cast. Numerics gated by
        # tests/test_mixed_precision.py.
        self.train_act_dtype = (
            getattr(net, "train_act_dtype", None)
            if mode == Mode.TRAIN
            else None
        )
        # int8 activation flow: tensors whose HBM dtype can be int8 end to
        # end (bit-identical results — see ops/quant.py plan_int8_flow).
        # Producers requantize in their fused epilogue; pass-through ops
        # (maxpool/upsample/copy-concat/dropout) operate on int8 directly;
        # quantized consumers skip their input quantize.
        quant = getattr(net, "quant", None)
        self.int8_flow: Dict[int, float] = {}
        if quant and mode == Mode.PREDICT and quant.get("act_flow", True):
            from .ops.quant import plan_int8_flow

            self.int8_flow = plan_int8_flow(net, quant)
        # QAT (net.qat = True or {"ema": 0.99}): TRAIN/VALID simulate the
        # int8 program with fake-quant + STE (ops/quant.py); activation
        # abs-max EMAs live in state ("qat_amax/<idx>"). PREDICT ignores
        # qat — deploy via ops.quant.qat_export -> net.quant instead.
        qat = getattr(net, "qat", None)
        self.qat = qat if (qat and mode != Mode.PREDICT) else None
        if self.qat:
            from .ops.quant import watch_tensors

            self.qat_ema = (
                float(qat.get("ema", 0.99)) if isinstance(qat, dict) else 0.99
            )
            self.qat_watch = set(watch_tensors(net))
            self._qat_seen: set = set()

    def key_of(self, idx: int) -> str:
        return self.net.tensors[idx].key

    def p(self, idx: int) -> jax.Array:
        return self.params[self.key_of(idx)]

    def run(self, lo: int = 0, hi: Optional[int] = None, taps_in=None):
        # Optional node RANGE [lo, hi): used by the pipeline-parallel
        # executor (parallel/pipeline.py) to run one stage of the graph.
        # `taps_in` seeds gradient-routing taps created by earlier stages
        # whose consumer lives in this range; self.taps afterwards holds
        # every live tap (including ones for later stages to export).
        #
        # reference-faithful gradient ROUTING for branched graphs (TRAIN):
        # the reference's per-layer backwards differ in how they write the
        # shared src grad buffer — conv dX ends in a zeroing col2im
        # (bcnn_mat.c bcnn_col2im), deconv dX is a beta=0 GEMM
        # (bcnn_deconv_layer.c:236-244), standalone BN COPIES its dx
        # (bcnn_batchnorm_layer.c:326-329), LRN overwrites via bcnn_pow —
        # while maxpool/concat/eltwise/fc/dw/upsample/avgpool/softmax/
        # yolo/cost all ACCUMULATE (+=). Backward runs in reverse node
        # order, so when a tensor feeds both a skip connection and an
        # earlier conv, the conv's backward runs LAST and OVERWRITES the
        # accumulated skip gradient — the reference silently drops skip
        # gradients through overwriting consumers (this is how its own
        # ResNet example trains). _grad_split replicates that combination
        # rule exactly; versions without an overwriting consumer keep the
        # default autodiff sum (identical to the reference's += chain).
        # net.ref_grad_routing=False opts out (pure autodiff accumulation
        # — the mathematically correct routing — at the cost of exact
        # trajectory parity on branched graphs).
        route = (
            build_grad_routing(self.net)
            if self.mode == Mode.TRAIN
            and getattr(self.net, "ref_grad_routing", True)
            else {}
        )
        if hi is None:
            hi = len(self.net.nodes)
        taps: Dict[Tuple[int, int], jax.Array] = dict(taps_in or {})
        for i in range(lo, hi):
            node = self.net.nodes[i]
            rng = (
                jax.random.fold_in(self.rng, i) if self.rng is not None else None
            )
            swapped = {}
            for s in set(_data_srcs(node)):
                tap = taps.get((s, i))
                if tap is not None:
                    swapped[s] = self.values[s]
                    self.values[s] = tap
            getattr(self, f"_{node.type.name.lower()}")(node, rng)
            for s, old in swapped.items():
                if s not in node.dst:  # in-place nodes keep their write
                    self.values[s] = old
            # net.value_hooks: {tensor index -> fn(array) -> array},
            # applied to a node's freshly produced value. Profiling /
            # experiment surface (e.g. jax.lax.optimization_barrier to
            # pin a fusion boundary, jax.debug hooks); empty in
            # production paths.
            hooks = getattr(self.net, "value_hooks", None)
            if hooks:
                for d in node.dst:
                    fn = hooks.get(d)
                    if fn is not None:
                        self.values[d] = fn(self.values[d])
            for d in node.dst:
                rec = route.get((d, i))
                if rec:
                    flags = tuple(ov for _, ov in rec)
                    outs = _grad_split(flags, self.values[d])
                    for (pos, _), o in zip(rec, outs):
                        taps[(d, pos)] = o
        self.taps = taps
        if self.qat and self.mode == Mode.TRAIN:
            # observe watched tensors no conv consumed this pass (joiner
            # inputs for the shared-scale int8 flow), matching what
            # calibrate() sees — end-of-pass values, after in-place ops
            for idx in sorted(self.qat_watch - self._qat_seen):
                if idx in self.values:
                    self._qat_observe(idx, self.values[idx])
        return self

    # ------------------------------------------------------------------ #

    def _apply_conv_epilogue(self, node: Node, y, rng, bias_idx, extra):
        """Shared bias/BN/activation tail used by conv-like layers.
        `extra` maps roles to src positions."""
        p = node.param
        training = self.mode == Mode.TRAIN
        dt = y.dtype
        if p.get("batch_norm"):
            mean_k = self.key_of(node.src[extra["mean"]])
            var_k = self.key_of(node.src[extra["var"]])
            scales = self.p(node.src[extra["scales"]]).astype(dt)
            biases = self.p(bias_idx).astype(dt)
            y, nm, nv = ops.batch_norm(
                y,
                scales,
                biases,
                self.state[mean_k],
                self.state[var_k],
                training=training,
                folded=self.net.bn_folded and self.mode == Mode.PREDICT,
                frozen_stats=bool(
                    getattr(self.net, "bn_frozen_stats", False)
                ),
            )
            if training:
                self.state[mean_k] = nm
                self.state[var_k] = nv
        else:
            y = y + self.p(bias_idx).astype(dt)
        act = p["activation"]
        slopes = None
        if act == Activation.PRELU:
            slopes = self.p(node.src[extra["slopes"]]).astype(dt)
        y = ops.apply_activation(y, act, slopes)
        return y

    def _qat_observe(self, idx: int, x: jax.Array) -> jax.Array:
        """Update (TRAIN) or read (VALID) the EMA abs-max for tensor idx;
        returns the fake-quant scale. First observation seeds the EMA."""
        k = f"qat_amax/{idx}"
        obs = jax.lax.stop_gradient(
            jnp.max(jnp.abs(x.astype(jnp.float32)))
        )
        old = self.state.get(k, jnp.zeros((), jnp.float32))
        if self.mode == Mode.TRAIN:
            new = jnp.where(
                old > 0, self.qat_ema * old + (1 - self.qat_ema) * obs, obs
            )
            self.state[k] = new
            self._qat_seen.add(idx)
        else:  # VALID: frozen ranges (fall back to the batch before any
            new = jnp.where(old > 0, old, obs)  # training has happened)
        return jnp.maximum(new, 1e-8) / 127.0

    def _qat_on(self, node: Node) -> bool:
        """net.qat truthy quantizes every conv/fc; {"per_layer": True}
        honors the builder's per-layer `quantize` flag (the argument the
        reference reserves on bcnn_add_convolutional_layer / fullc but
        never implements)."""
        if not self.qat:
            return False
        if isinstance(self.qat, dict) and self.qat.get("per_layer"):
            return bool(node.param.get("quantize"))
        return True

    def _qat_xw(self, node: Node, x: jax.Array, w: jax.Array):
        """Fake-quant a conv/fc data input (per-tensor, EMA-tracked) and
        its weight (per-output-channel) for QAT."""
        from .ops.quant import QAT_WEIGHT_AXES, fake_quant_ste, fake_quant_weight

        x = fake_quant_ste(x, self._qat_observe(node.src[0], x))
        return x, fake_quant_weight(w, QAT_WEIGHT_AXES[node.type])

    def _quant_entry(self, node: Node):
        """int8 PTQ lookup for this node (PREDICT only; see ops/quant.py).
        When the flow plan routes the input tensor as int8, the plan's
        scale is authoritative (it may be a joiner's shared scale rather
        than the tensor's own calibrated scale)."""
        quant = getattr(self.net, "quant", None)
        if not quant or self.mode != Mode.PREDICT:
            return None
        key = self.net.tensors[node.src[1]].key
        wq = quant["weights"].get(key)
        sx = quant["act_scales"].get(node.src[0])
        if wq is None or sx is None:
            return None
        return wq, self.int8_flow.get(node.src[0], sx)

    def _deq(self, idx: int, x):
        """Dequantize an int8-flow tensor back to fp32 (mixed-input
        fallback for joiners the plan could not fully cover)."""
        if x.dtype == jnp.int8:
            return x.astype(jnp.float32) * self.int8_flow[idx]
        return x

    def _quant_in(self, x, sx):
        """int8-flow input: already int8 (plan guarantees the scale is
        exactly sx), else quantize here."""
        from .ops.quant import quantize_tensor

        return x if x.dtype == jnp.int8 else quantize_tensor(x, sx)

    def _maybe_emit_int8(self, node: Node, y):
        """Requantize this node's output inside its fused epilogue when
        the flow plan says every consumer reads int8."""
        s = self.int8_flow.get(node.dst[0])
        if s is None:
            return y
        from .ops.quant import quantize_tensor

        return quantize_tensor(y, s)

    def _cast_act(self, y):
        """Boundary cast to the reduced activation dtype (fuses into the
        producer's epilogue; identity unless a knob is set and y is
        fp32). Covers TRAIN (train_act_dtype) and the PREDICT tensors the
        conv out_dtype plumbing misses (quantized convs' fp32 outputs,
        deconv)."""
        ad = self.train_act_dtype or self.act_dtype
        if ad is not None and y.dtype == jnp.float32:
            return y.astype(ad)
        return y

    def _conv2d(self, node: Node, rng):
        p = node.param
        x = self.values[node.src[0]]
        q = self._quant_entry(node)
        if q is not None:
            from .ops.quant import conv2d_int8

            wq, sx = q
            y = conv2d_int8(
                self._quant_in(x, sx), wq["q"], sx, wq["scale"],
                p["stride"], p["pad"], p["num_groups"],
            )
        else:
            w = self.p(node.src[1])
            if self._qat_on(node):
                x, w = self._qat_xw(node, x, w)
            y = ops.conv2d(
                x,
                w,
                p["stride"],
                p["pad"],
                p["num_groups"],
                self.compute_dtype,
                self.act_dtype,
            )
        extra = {"mean": 3, "var": 4, "scales": 5}
        extra["slopes"] = 6 if p.get("batch_norm") else 3
        y = self._apply_conv_epilogue(node, y, rng, node.src[2], extra)
        self.values[node.dst[0]] = self._cast_act(
            self._maybe_emit_int8(node, y)
        )

    def _depthwise_conv2d(self, node: Node, rng):
        p = node.param
        x = self.values[node.src[0]]
        q = self._quant_entry(node)
        if q is not None:
            from .ops.quant import conv2d_int8

            wq, sx = q
            y = conv2d_int8(
                self._quant_in(x, sx), wq["q"], sx, wq["scale"],
                p["stride"], p["pad"], groups=x.shape[-1],
            )
        else:
            w = self.p(node.src[1])
            if self._qat_on(node):
                x, w = self._qat_xw(node, x, w)
            y = ops.depthwise_conv2d(
                x, w, p["stride"], p["pad"], self.compute_dtype,
                self.act_dtype,
            )
        # depthwise builder supports bias + activation (BN flag parsed but the
        # reference wires no BN tensors for it)
        y = y + self.p(node.src[2]).astype(y.dtype)
        y = ops.apply_activation(y, p["activation"])
        self.values[node.dst[0]] = self._cast_act(
            self._maybe_emit_int8(node, y)
        )

    def _transpose_conv2d(self, node: Node, rng):
        p = node.param
        x = self.values[node.src[0]]
        q = self._quant_entry(node)
        if q is not None:
            from .ops.quant import conv2d_transpose_int8

            wq, sx = q
            y = conv2d_transpose_int8(
                self._quant_in(x, sx), wq["q"], sx, wq["scale"],
                p["stride"], p["pad"],
            )
        elif p["pad"] > 0 and getattr(self.net, "ref_deconv_quirk", False):
            # replicate the reference's pad-0-col2im misread bit-for-bit
            # (see ops.conv.conv2d_transpose_ref_quirk)
            y = ops.conv.conv2d_transpose_ref_quirk(
                x, self.p(node.src[1]), p["stride"], p["pad"]
            )
        else:
            w = self.p(node.src[1])
            if self._qat_on(node):
                x, w = self._qat_xw(node, x, w)
            y = ops.conv2d_transpose(
                x, w, p["stride"], p["pad"], self.compute_dtype
            )
        y = y + self.p(node.src[2])
        y = ops.apply_activation(y, p["activation"])
        self.values[node.dst[0]] = self._cast_act(
            self._maybe_emit_int8(node, y)
        )

    def _full_connected(self, node: Node, rng):
        p = node.param
        x = self.values[node.src[0]]
        q = self._quant_entry(node)
        if q is not None:
            from .ops.quant import fc_int8

            wq, sx = q
            n = x.shape[0]
            if x.ndim == 4:
                x = jnp.transpose(x, (0, 3, 1, 2))  # NCHW flatten order
            xf = x.reshape(n, -1)
            y = fc_int8(self._quant_in(xf, sx), wq["q"], sx, wq["scale"])
            y = (y + self.p(node.src[2])).reshape(n, 1, 1, -1)
        else:
            w = self.p(node.src[1])
            if self._qat_on(node):
                x, w = self._qat_xw(node, x, w)
            y = ops.full_connected(
                x, w, self.p(node.src[2]), self.compute_dtype,
            )
        y = ops.apply_activation(y, p["activation"])
        self.values[node.dst[0]] = self._maybe_emit_int8(node, y)

    def _activation(self, node: Node, rng):
        p = node.param
        x = self.values[node.src[0]]
        slopes = None
        if p["activation"] == Activation.PRELU:
            slopes = self.p(node.src[1])
        # dst index == src index (in-place layer), single rebind suffices
        self.values[node.dst[0]] = ops.apply_activation(
            x, p["activation"], slopes
        )

    def _batchnorm(self, node: Node, rng):
        x = self.values[node.src[0]]
        if self.train_act_dtype is not None:
            # keep the exact-quirk BN stats/backward in fp32; the boundary
            # cast below restores the reduced storage dtype
            x = x.astype(jnp.float32)
        mean_k = self.key_of(node.src[1])
        var_k = self.key_of(node.src[2])
        training = self.mode == Mode.TRAIN
        y, nm, nv = ops.batch_norm(
            x,
            self.p(node.src[3]),
            self.p(node.src[4]),
            self.state[mean_k],
            self.state[var_k],
            training=training,
            folded=self.net.bn_folded and self.mode == Mode.PREDICT,
            frozen_stats=bool(getattr(self.net, "bn_frozen_stats", False)),
        )
        if training:
            self.state[mean_k] = nm
            self.state[var_k] = nv
        self.values[node.dst[0]] = self._cast_act(y)

    def _lrn(self, node: Node, rng):
        p = node.param
        x = self.values[node.src[0]]
        self.values[node.dst[0]] = ops.lrn(
            x, p["local_size"], p["alpha"], p["beta"], p["k"]
        )

    def _maxpool(self, node: Node, rng):
        p = node.param
        d = self.net.tensors[node.dst[0]]
        self.values[node.dst[0]] = ops.maxpool(
            self.values[node.src[0]], p["size"], p["stride"], d.h, d.w
        )

    def _avgpool(self, node: Node, rng):
        self.values[node.dst[0]] = ops.global_avgpool(
            self.values[node.src[0]]
        )

    def _softmax(self, node: Node, rng):
        self.values[node.dst[0]] = ops.softmax_passthrough_grad(
            self.values[node.src[0]]
        )

    def _dropout(self, node: Node, rng):
        p = node.param
        x = self.values[node.src[0]]
        self.values[node.dst[0]] = ops.dropout(
            x, p["rate"], p["scale"], rng, self.mode == Mode.TRAIN
        )

    def _concat(self, node: Node, rng):
        xs = [self.values[i] for i in node.src]
        if len(xs) == 1:
            # copy: int8 passes through untouched (exact)
            self.values[node.dst[0]] = ops.concat_channels(xs)
            return
        scs = [self.int8_flow.get(i) for i in node.src]
        out_s = self.int8_flow.get(node.dst[0])
        if (
            all(x.dtype == jnp.int8 for x in xs)
            and None not in scs
            and all(s == scs[0] for s in scs)
            and out_s == scs[0]
        ):
            # shared-scale int8 concat is a pure copy
            self.values[node.dst[0]] = ops.concat_channels(xs)
            return
        y = ops.concat_channels(
            [self._deq(i, x) for i, x in zip(node.src, xs)]
        )
        # mixed-dtype inputs promote the concat to fp32; the boundary
        # cast keeps branched trunks at the reduced storage dtype
        self.values[node.dst[0]] = self._cast_act(
            self._maybe_emit_int8(node, y)
        )

    def _eltwise(self, node: Node, rng):
        p = node.param
        a = self.values[node.src[0]]
        b = self.values[node.src[1]]
        if a.dtype == jnp.int8 and b.dtype == jnp.int8:
            # shared-scale int8 add (plan_int8_flow guarantees equal
            # scales): exact in int32, one dequant multiply after
            s = self.int8_flow[node.src[0]]
            y = ops.eltwise_add(
                a.astype(jnp.int32), b.astype(jnp.int32),
                p["stride"], p["min_dim"],
            ).astype(jnp.float32) * s
        else:
            y = ops.eltwise_add(
                self._deq(node.src[0], a),
                self._deq(node.src[1], b),
                p["stride"],
                p["min_dim"],
            )
        y = ops.apply_activation(y, p["activation"])
        # residual-sum boundaries carry the trunk's highest traffic; keep
        # them at the reduced storage dtype (fp32-promoted when one input
        # was fp32, e.g. the int8 dequant fallback or a BN output)
        self.values[node.dst[0]] = self._cast_act(
            self._maybe_emit_int8(node, y)
        )

    def _upsample(self, node: Node, rng):
        self.values[node.dst[0]] = ops.upsample_nn(
            self.values[node.src[0]], node.param["size"]
        )

    def _yolov3(self, node: Node, rng):
        from .ops import yolo as yolo_ops

        p = dict(node.param)
        p["net_w"] = self.net.tensors[0].w
        p["net_h"] = self.net.tensors[0].h
        # head math (exp/logistic, box targets) in fp32 regardless of the
        # perf path's activation dtype
        x = self.values[node.src[0]].astype(jnp.float32)
        label = self.values.get(1)
        want_stats = (
            self.mode == Mode.TRAIN
            and bool(getattr(self.net, "yolo_stats", False))
        )
        y, aux = yolo_ops.yolo_forward(
            x, label, p, self.mode, self.net.batch_size,
            with_stats=want_stats,
        )
        self.values[node.dst[0]] = y
        if aux is not None:
            self.surrogate = self.surrogate + aux[0]
            self.metrics.append(aux[1])
            if want_stats:
                self.yolo_stats.append(aux[2])

    def _reshape(self, node: Node, rng):
        raise NotImplementedError(
            "RESHAPE has no implementation in the reference either "
            "(enum only, bcnn.h:157)"
        )

    def _cost(self, node: Node, rng):
        p = node.param
        x = _flatten_nchw(self.values[node.src[0]])
        label = self.values.get(1)
        if label is None:
            return  # no ground truth fed: forward-only, like :248-251
        label = label.reshape(label.shape[0], -1)
        if p["loss"] == Loss.EUCLIDEAN:
            self.surrogate = self.surrogate + euclidean_surrogate(
                x, label, p["scale"]
            )
            if self.mode != Mode.PREDICT:
                self.metrics.append(
                    compute_metric(x, label, p["loss_metric"])
                )
        elif p["loss"] == Loss.LIFTED_STRUCT:
            from .ops.lifted_struct import lifted_struct_surrogate
            from .types import Metric

            sur = lifted_struct_surrogate(x, label, p["scale"])
            self.surrogate = self.surrogate + sur
            if self.mode != Mode.PREDICT:
                if p["loss_metric"] in (
                    Metric.SSE, Metric.MSE, Metric.CRPS
                ):
                    # the reference reports 0 here (compute_error reads the
                    # never-written dst grad); report the actual loss instead
                    self.metrics.append(sur / max(p["scale"], 1e-12))
                else:
                    self.metrics.append(
                        compute_metric(x, label, p["loss_metric"])
                    )


def execute(
    net: Net,
    params: Dict[str, jax.Array],
    state: Dict[str, jax.Array],
    inputs: Dict[str, jax.Array],
    mode: Mode,
    rng: Optional[jax.Array] = None,
) -> _Executor:
    """inputs: name -> NCHW array ('input' required, 'label' optional)."""
    ex = _Executor(net, params, state, mode, rng)
    for name, arr in inputs.items():
        if name == "input":
            idx = 0
        elif name == "label":
            idx = 1
        else:  # extra named inputs (bcnn_add_input)
            idx = net.get_tensor_index_by_name(name)
        if arr.ndim == 4 and name != "label":
            arr = nchw_to_nhwc(arr)  # labels keep reference NCHW layout
        ex.values[idx] = arr
    return ex.run()


def output_value(ex: _Executor, i: int) -> jax.Array:
    """Read tensor i for the host: int8-flow tensors dequantize with
    their planned scale, 4-D activations return in reference NCHW."""
    v = ex.values[i]
    if v.dtype == jnp.int8:
        v = v.astype(jnp.float32) * ex.int8_flow[i]
    return nhwc_to_nchw(v) if v.ndim == 4 else v


def get_loss(ex: _Executor) -> jax.Array:
    """bcnn_get_loss (bcnn_net.c:431-450): mean of cost/yolo node outputs."""
    if not ex.metrics:
        return jnp.zeros((), jnp.float32)
    return sum(ex.metrics) / len(ex.metrics)


def make_forward(net: Net, output_names, mode: Mode):
    """Jitted forward returning the requested tensors in NCHW layout."""
    out_idx = [net.get_tensor_index_by_name(n) for n in output_names]

    @jax.jit
    def forward(params, state, inputs, rng=None):
        ex = execute(net, params, state, inputs, mode, rng)
        return tuple(output_value(ex, i) for i in out_idx), ex.state

    return forward


def make_detect_fn(
    net: Net,
    thresh: float,
    max_dets: int,
    use_pallas: bool = False,
    topk_first: bool = True,
):
    """Unjitted full-detection program — forward + decode + on-device NMS,
    returning (boxes (N,K,4), scores (N,K,classes), objectness (N,K)).
    The single source of truth for the serving pipeline: jitted live by
    Session.detect_on_batch and baked into AOT artifacts by
    deploy.export_detect (so the two cannot drift)."""
    from .ops.yolo import device_decode_nms, device_detect_topk
    from .ops.yolo_pallas import decode_fused, decode_grid_jnp
    from .types import LayerType

    yolo_nodes = [
        (n.src[0], dict(n.param))
        for n in net.nodes
        if n.type == LayerType.YOLOV3
    ]
    if not yolo_nodes:
        raise ValueError("detection program requires a net with YOLO layers")
    net_w, net_h = net.tensors[0].w, net.tensors[0].h

    def detect(params, state, batch):
        ex = execute(net, params, state, batch, Mode.PREDICT, None)
        raws = [ex.values[src_idx] for src_idx, _ in yolo_nodes]
        if topk_first:
            return device_detect_topk(
                raws, [prm for _, prm in yolo_nodes],
                net_w, net_h, max_dets=max_dets, thresh=thresh,
            )
        all_b, all_o, all_p = [], [], []
        for raw, (_, prm) in zip(raws, yolo_nodes):
            dec = decode_fused if use_pallas else decode_grid_jnp
            b, o, p = dec(raw, prm, net_w, net_h)
            all_b.append(b)
            all_o.append(o)
            all_p.append(p)
        boxes = jnp.concatenate(all_b, axis=1)
        obj = jnp.concatenate(all_o, axis=1)
        probs = jnp.concatenate(all_p, axis=1)
        return device_decode_nms(
            boxes, obj, probs, max_dets=max_dets, thresh=thresh
        )

    return detect


def _make_train_loss_fn(net: Net, device_augment: Optional[dict]):
    """The shared TRAIN-mode loss closure: optional fused on-device
    augmentation (uint8 batch in, data/device_augment.py), then
    forward in TRAIN mode. Returns (surrogate, (state, loss, yolo_stats)).
    Used by make_train_step and make_train_scan so both loop shapes
    support the raw-records + device-augment production feed."""
    from .types import LayerType

    is_detection = any(n.type == LayerType.YOLOV3 for n in net.nodes)
    if device_augment is not None and is_detection:
        # fail at build time, not silently corrupt labels at train time
        if float(device_augment.get("max_distortion", 0.0)) > 0.0:
            raise ValueError(
                "device_augment: max_distortion cannot be combined with "
                "detection training (no box transform represents it)"
            )

    def loss_fn(params, state, batch, rng):
        if device_augment is not None:
            rng, akey = jax.random.split(rng)
            if is_detection:
                from .data.device_augment import (
                    augment_batch_with_boxes_nchw,
                )

                x, lab = augment_batch_with_boxes_nchw(
                    batch["input"], batch["label"], akey, device_augment
                )
                batch = dict(batch, input=x, label=lab)
            else:
                from .data.device_augment import augment_batch_nchw

                batch = dict(
                    batch,
                    input=augment_batch_nchw(
                        batch["input"], akey, device_augment
                    ),
                )
        ex = execute(net, params, state, batch, Mode.TRAIN, rng)
        return ex.surrogate, (ex.state, get_loss(ex), ex.yolo_stats)

    return loss_fn


def make_train_step(
    net: Net,
    remat: Optional[bool] = None,
    device_augment: Optional[dict] = None,
    accum_steps: Optional[int] = None,
):
    """One bcnn_train_on_batch equivalent (bcnn_net.c:452-463):
    forward -> backward (autodiff) -> update -> loss, as a single jitted,
    buffer-donating program.

    remat (or net.remat): rematerialize the forward during the backward
    pass (jax.checkpoint) — trades FLOPs for HBM, for activations that
    don't fit (e.g. large-resolution detection training).

    accum_steps (or net.accum_steps): gradient accumulation — run the
    batch as N sequential microbatches inside this same jitted step
    (lax.scan), summing gradients and metric sums, then ONE optimizer
    update. Gradients and surrogates are batch SUMS in this framework
    (matching the reference's accumulate-into-grad kernels), so the
    accumulated step equals the full-batch step exactly for nets without
    batch-coupled ops; training-mode BN sees per-MICROBATCH batch stats
    (the standard accumulation semantics, same as parallel/pipeline.py).
    Peak activation memory drops to one microbatch's working set — the
    lever for batch sizes whose live set exceeds HBM.

    device_augment (or net.device_augment): an Augmenter-style config dict
    — the north-star "bip fuses into on-device preprocessing": the batch
    arrives as raw uint8 pixels (NCHW) and flip/shift/scale/rotation/
    contrast/brightness + [-1,1] normalization run inside this same jitted
    step (data/device_augment.py), so the host only decodes files."""
    from .learner import apply_updates

    if remat is None:
        remat = bool(getattr(net, "remat", False))
    if device_augment is None:
        device_augment = getattr(net, "device_augment", None)
    if accum_steps is None:
        accum_steps = int(getattr(net, "accum_steps", 1) or 1)
    if accum_steps > 1 and net.batch_size % accum_steps:
        raise ValueError(
            f"batch_size {net.batch_size} not divisible by "
            f"accum_steps {accum_steps}"
        )

    want_stats = bool(getattr(net, "yolo_stats", False))

    loss_fn = _make_train_loss_fn(net, device_augment)

    if remat:
        loss_fn = jax.checkpoint(loss_fn, static_argnums=())

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    if accum_steps > 1:
        n, mb = accum_steps, net.batch_size // accum_steps

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step(params, state, opt_state, batch, rng):
            xs = {
                k: v.reshape(n, mb, *v.shape[1:]) for k, v in batch.items()
            }
            keys = jax.vmap(lambda m: jax.random.fold_in(rng, m))(
                jnp.arange(n)
            )
            zero_g = jax.tree.map(jnp.zeros_like, params)

            def body(carry, xs_m):
                st, gsum, lsum = carry
                micro, key = xs_m
                (_, (st, loss, ystats)), g = grad_fn(params, st, micro, key)
                gsum = jax.tree.map(jnp.add, gsum, g)
                return (st, gsum, lsum + loss), ystats

            (new_state, grads, loss_sum), ystats = jax.lax.scan(
                body,
                (state, zero_g, jnp.zeros((), jnp.float32)),
                (xs, keys),
            )
            new_params, new_opt = apply_updates(net, params, grads, opt_state)
            if want_stats:
                # stats are batch SUMS: microbatch sums add up exactly
                return new_params, new_state, new_opt, loss_sum, jax.tree.map(
                    lambda s: jnp.sum(s, axis=0), ystats
                )
            return new_params, new_state, new_opt, loss_sum

        return train_step

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, state, opt_state, batch, rng):
        (_, (new_state, loss, ystats)), grads = grad_fn(
            params, state, batch, rng
        )
        new_params, new_opt = apply_updates(net, params, grads, opt_state)
        if want_stats:
            return new_params, new_state, new_opt, loss, ystats
        return new_params, new_state, new_opt, loss

    return train_step


def make_train_scan(net: Net, device_augment: Optional[dict] = None):
    """Multi-step training in ONE device program: lax.scan over the train
    step with pre-staged batches (K, B, ...) — no host round-trip per step.
    This is the TPU-native answer to the reference's per-batch loop
    (bcnn_cl_train): on a tunneled chip per-step dispatch costs an RTT;
    scanning K steps amortizes it to one. Returns per-step losses.

    device_augment (or net.device_augment): the production feed — batches
    arrive as RAW UINT8 records (K, B, C, H, W) and flip/shift/contrast/
    brightness + [-1,1] normalization run inside the scan body on device
    (data/device_augment.py). Besides freeing the host of augmentation,
    uint8 staging shrinks the host->device transfer 4x vs fp32 — the
    dominant cost on a tunneled chip."""
    from .learner import apply_updates

    want_stats = bool(getattr(net, "yolo_stats", False))

    if device_augment is None:
        device_augment = getattr(net, "device_augment", None)
    loss_fn = _make_train_loss_fn(net, device_augment)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_scan(params, state, opt_state, batches, rng):
        def body(carry, xs):
            params, state, opt_state = carry
            x, y, key = xs
            (_, (state2, loss, ystats)), grads = grad_fn(
                params, state, {"input": x, "label": y}, key
            )
            params2, opt2 = apply_updates(net, params, grads, opt_state)
            return (params2, state2, opt2), (loss, ystats)

        keys = jax.random.split(rng, batches["input"].shape[0])
        (params, state, opt_state), (losses, ystats) = jax.lax.scan(
            body, (params, state, opt_state),
            (batches["input"], batches["label"], keys),
        )
        if want_stats:  # per-step stats, leading axis K
            return params, state, opt_state, losses, ystats
        return params, state, opt_state, losses

    return train_scan


def make_train_scan_resident(net: Net,
                             device_augment: Optional[dict] = None):
    """make_train_scan over a DEVICE-RESIDENT dataset: the whole record
    set lives in HBM (uploaded once, e.g. RawRecordLoader.read_all) and
    each scan step gathers its batch by index on device.

    Why: on a tunneled/remote chip the sustained-training wall is the
    per-dispatch host->device batch upload (measured ~17 s per K=5
    batch-256 uint8 dispatch vs ~0.5 s device compute — BENCHMARKS.md
    "sustained" section), which no software pipeline can hide because
    the link is ~30x slower than the step. A dataset that fits in HBM
    (e.g. 512 letterboxed 416x416 images = 266 MB of 16 GB) turns the
    per-dispatch transfer into a (K, B) int32 index upload — a few KB —
    and the gather itself is one HBM-speed take per step. The reference
    has no analogue (its loader re-reads from disk per batch,
    src/cli/bcnn_cl.c:104-146); this is the TPU-native fix for the
    feed-bound regime.

    Signature: train_scan(params, state, opt_state, dataset, idx, rng)
    where dataset = {"input": (N, C, H, W), "label": (N, L)} device
    arrays (uint8 images when device_augment is on, pre-normalized fp32
    otherwise) and idx is (K, B) int32. dataset is NOT donated — it is
    reused across dispatches. Same numerics as make_train_scan on the
    staged equivalent batches (tests/test_train_scan.py)."""
    from .learner import apply_updates

    want_stats = bool(getattr(net, "yolo_stats", False))
    if device_augment is None:
        device_augment = getattr(net, "device_augment", None)
    loss_fn = _make_train_loss_fn(net, device_augment)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_scan(params, state, opt_state, dataset, idx, rng):
        def body(carry, xs):
            params, state, opt_state = carry
            i, key = xs
            x = jnp.take(dataset["input"], i, axis=0)
            y = jnp.take(dataset["label"], i, axis=0)
            (_, (state2, loss, ystats)), grads = grad_fn(
                params, state, {"input": x, "label": y}, key
            )
            params2, opt2 = apply_updates(net, params, grads, opt_state)
            return (params2, state2, opt2), (loss, ystats)

        keys = jax.random.split(rng, idx.shape[0])
        (params, state, opt_state), (losses, ystats) = jax.lax.scan(
            body, (params, state, opt_state), (idx, keys),
        )
        if want_stats:
            return params, state, opt_state, losses, ystats
        return params, state, opt_state, losses

    return train_scan


def make_eval_step(net: Net):
    """bcnn_predict_on_batch in VALID mode: forward + metric, no state
    mutation (running stats untouched outside TRAIN)."""

    def eval_step(params, state, batch):
        ex = execute(net, params, state, batch, Mode.VALID, None)
        # also return the last non-cost activation (the net output), like
        # bcnn_predict_on_batch returns the out tensor
        return get_loss(ex)

    return jax.jit(eval_step)

"""Inter-op (pipeline) parallelism: stage-partitioned execution.

The reference is strictly single-device (SURVEY.md §2.8) — PP is a
rebuild extension, like TP/SP. The scaling-book SPMD pipelining recipe
(a `shard_map` + `ppermute` rotation over a stack of IDENTICAL blocks)
does not map onto bcnn graphs: a CNN's activation shapes are
heterogeneous along depth (spatial dims shrink, channels grow), so no
fixed-shape buffer can rotate through the stages. The TPU-native design
here is therefore *multi-program* pipelining:

  - the node list is split into contiguous stages balanced by a FLOP
    estimate (the graph is already topologically ordered, bcnn_net.c:236);
  - each stage compiles to its own jitted program whose parameters live
    only on that stage's device(s) — a stage may itself be data-parallel
    over a submesh (DP x PP);
  - microbatches flow through `jax.device_put` boundaries (ICI on real
    hardware). JAX dispatch is asynchronous, so the GPipe schedule's
    overlap emerges naturally: the host loop enqueues stage k on
    microbatch m while stage k-1 is still computing microbatch m+1 on a
    different device;
  - the backward is GPipe-with-rematerialization: only stage-boundary
    activations are stashed per microbatch; each stage's backward program
    recomputes its forward under `jax.vjp`. Gradients are batch-SUMS in
    this framework (matching the reference's accumulate-into-grad
    kernels, learner.apply_updates), so summing microbatch gradients
    reproduces the full-batch gradient exactly.

Exactness notes (test-pinned in tests/test_pipeline.py):
  - n_microbatches=1 is bit-for-bit the single-device step (same RNG,
    same BN batch stats, same grad routing — cross-stage routing taps are
    forwarded as extra boundary values);
  - n_microbatches>1 matches single-device exactly for nets without
    batch-coupled ops (grads are batch SUMS);
  - n_microbatches>1 WITH BN is exactly the single-device
    gradient-accumulation program `make_train_step(accum_steps=k)`:
    per-microbatch BN batch stats, identical fold_in(rng, m) keys,
    summed gradients, one update (test_pp_microbatched_bn_matches_
    accumulation_step) — i.e. PP's semantics on BN nets IS accumulation
    semantics, pinned against a runnable single-device program;
  - for full per-sample independence (no stats coupling at all) set
    `net.bn_frozen_stats` (ops/norm.py): BN normalizes with step-start
    running stats as constants while still updating the running EMAs —
    microbatched PP then matches the equivalent single-device program
    tightly AND the conv+BN net demonstrably converges
    (test_pp_microbatched_bn_frozen_stats_exact / _bn_net_converges).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..compile import (
    _Executor,
    build_grad_routing,
    nchw_to_nhwc,
)
from ..graph import Net, TensorKind
from ..types import LayerType, Mode

# ---------------------------------------------------------------------- #
# Stage splitting
# ---------------------------------------------------------------------- #


def _node_flops(net: Net, node) -> float:
    """Rough per-node FLOP estimate for stage balancing (MACs x 2)."""
    if not node.dst:
        return 0.0
    out = net.tensors[node.dst[0]]
    out_sz = max(out.size(), 1)
    p = node.param
    if node.type == LayerType.CONV2D:
        cin = net.tensors[node.src[0]].c // max(p.get("num_groups", 1), 1)
        return 2.0 * out_sz * p["size"] * p["size"] * cin
    if node.type == LayerType.DEPTHWISE_CONV2D:
        return 2.0 * out_sz * p["size"] * p["size"]
    if node.type == LayerType.TRANSPOSE_CONV2D:
        cin = net.tensors[node.src[0]].c
        return 2.0 * out_sz * p["size"] * p["size"] * cin
    if node.type == LayerType.FULL_CONNECTED:
        return 2.0 * out_sz * net.tensors[node.src[0]].size3d()
    return float(out_sz)


def split_stages(net: Net, n_stages: int) -> List[Tuple[int, int]]:
    """Contiguous [lo, hi) node ranges, greedily balanced by FLOPs."""
    n_nodes = len(net.nodes)
    if not 1 <= n_stages <= n_nodes:
        raise ValueError(f"n_stages={n_stages} for {n_nodes} nodes")
    costs = [_node_flops(net, nd) for nd in net.nodes]
    ranges: List[Tuple[int, int]] = []
    lo, acc = 0, 0.0
    remaining = sum(costs)
    for i, c in enumerate(costs):
        acc += c
        stages_left = n_stages - len(ranges)
        nodes_left = n_nodes - i - 1
        if len(ranges) == n_stages - 1:
            break  # last stage takes the tail
        # re-target on REMAINING cost (front-loaded nets would otherwise
        # exhaust the budget in stage 0 and starve the later cuts); force
        # a cut when only one node per remaining stage is left
        if (
            acc >= remaining / stages_left or nodes_left == stages_left - 1
        ) and nodes_left >= stages_left - 1:
            ranges.append((lo, i + 1))
            lo, remaining, acc = i + 1, remaining - acc, 0.0
    ranges.append((lo, n_nodes))
    return ranges


# ---------------------------------------------------------------------- #
# Stage IO analysis
# ---------------------------------------------------------------------- #


class _StageIO:
    """Static boundary sets for one stage."""

    def __init__(self):
        self.pipe_in: List[int] = []    # tensor idx from earlier stages
        self.pipe_out: List[int] = []   # tensor idx read by later stages
        self.ext_in: List[int] = []     # host-fed tensors (input/label/...)
        self.taps_in: List[Tuple[int, int]] = []   # grad-routing taps
        self.taps_out: List[Tuple[int, int]] = []
        self.param_keys: List[str] = []
        self.state_keys: List[str] = []


def stage_io(net: Net, ranges, mode: Mode) -> List[_StageIO]:
    stage_of_node = {}
    for k, (lo, hi) in enumerate(ranges):
        for i in range(lo, hi):
            stage_of_node[i] = k

    produced_by: Dict[int, int] = {}  # tensor idx -> stage that last wrote it
    ever_produced = set()
    for k, (lo, hi) in enumerate(ranges):
        for i in range(lo, hi):
            for d in net.nodes[i].dst:
                ever_produced.add(d)

    ios = [_StageIO() for _ in ranges]
    for k, (lo, hi) in enumerate(ranges):
        io = ios[k]
        written_here = set()
        pipe, ext = set(), set()
        pkeys, skeys = [], []
        for i in range(lo, hi):
            node = net.nodes[i]
            for s in node.src:
                t = net.tensors[s]
                if t.kind == TensorKind.PARAM:
                    if t.key not in pkeys:
                        pkeys.append(t.key)
                elif t.kind == TensorKind.STATE:
                    if t.key not in skeys:
                        skeys.append(t.key)
                elif s not in written_here:
                    if s in produced_by:
                        pipe.add(s)
                    elif s not in ever_produced:
                        ext.add(s)
                    # else: produced later in THIS stage before any read —
                    # impossible in a topological graph
            # cost nodes read the label (tensor 1) implicitly
            if node.type in (LayerType.COST, LayerType.YOLOV3):
                if 1 not in ever_produced and len(net.tensors) > 1:
                    ext.add(1)
            for d in node.dst:
                written_here.add(d)
        for d in written_here:
            produced_by[d] = k
        io.pipe_in = sorted(pipe)
        io.ext_in = sorted(ext)
        io.param_keys = pkeys
        io.state_keys = skeys

    # pipe_out: everything a later stage imports, attributed to the last
    # stage that wrote it before the importer
    last_writer: Dict[int, int] = {}
    for k, (lo, hi) in enumerate(ranges):
        for s in ios[k].pipe_in:
            ios[last_writer[s]].pipe_out.append(s)
        for i in range(lo, hi):
            for d in net.nodes[i].dst:
                last_writer[d] = k
    for io in ios:
        io.pipe_out = sorted(set(io.pipe_out))

    # grad-routing taps that cross a stage boundary (TRAIN only)
    if mode == Mode.TRAIN and getattr(net, "ref_grad_routing", True):
        route = build_grad_routing(net)
        for (d, prod_pos), rec in route.items():
            pk = stage_of_node[prod_pos]
            for (cons_pos, _ov) in rec:
                ck = stage_of_node[cons_pos]
                if ck != pk:
                    ios[pk].taps_out.append((d, cons_pos))
                    ios[ck].taps_in.append((d, cons_pos))
        for io in ios:
            io.taps_out = sorted(set(io.taps_out))
            io.taps_in = sorted(set(io.taps_in))
    return ios


def _metric_count(net: Net, lo: int, hi: int, mode: Mode) -> int:
    """How many scalars this stage appends to ex.metrics."""
    if mode == Mode.PREDICT:
        return 0
    n = 0
    for i in range(lo, hi):
        t = net.nodes[i].type
        if t == LayerType.COST:
            n += 1
        elif t == LayerType.YOLOV3 and mode == Mode.TRAIN:
            n += 1
    return n


# ---------------------------------------------------------------------- #
# Stage programs
# ---------------------------------------------------------------------- #


def _make_stage_fn(net: Net, lo: int, hi: int, io: _StageIO, mode: Mode,
                   extract: Sequence[int] = ()):
    """Pure stage program: runs nodes [lo, hi) from boundary values.
    Returns (pipe_out, taps_out, extracted, surrogate, metrics, new_state).
    """

    def stage_fn(params, state, pipe_vals, taps_vals, ext_vals, rng):
        ex = _Executor(net, params, state, mode, rng)
        for idx, v in zip(io.pipe_in, pipe_vals):
            ex.values[idx] = v
        for idx, v in ext_vals.items():
            if v.ndim == 4 and idx != 1:
                v = nchw_to_nhwc(v)  # labels keep reference NCHW layout
            ex.values[idx] = v
        ex.run(lo, hi, taps_in=dict(zip(io.taps_in, taps_vals)))
        pipe_out = tuple(ex.values[i] for i in io.pipe_out)
        taps_out = tuple(ex.taps[key] for key in io.taps_out)
        extracted = tuple(ex.values[i] for i in extract)
        return (pipe_out, taps_out, extracted, ex.surrogate,
                tuple(ex.metrics), ex.state)

    return stage_fn


def _subdict(d: Dict[str, Any], keys) -> Dict[str, Any]:
    return {k: d[k] for k in keys if k in d}


def _sharding_for(devices) -> Tuple[Any, Any]:
    """(param_sharding, batch_sharding) for one stage's device list."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(devices) == 1:
        s = jax.sharding.SingleDeviceSharding(devices[0])
        return s, s
    mesh = Mesh(np.asarray(devices), ("batch",))
    return NamedSharding(mesh, P()), NamedSharding(mesh, P("batch"))


class Pipeline:
    """Stage-partitioned executor over an explicit device assignment.

    stage_devices: one device list per stage (singleton lists = pure PP;
    longer lists make that stage data-parallel over its submesh).
    """

    def __init__(
        self,
        net: Net,
        stage_devices: Sequence[Sequence[Any]],
        mode: Mode = Mode.TRAIN,
        n_microbatches: int = 1,
        boundaries: Optional[List[Tuple[int, int]]] = None,
        output_names: Sequence[str] = (),
        schedule: str = "gpipe",
    ):
        if schedule not in ("gpipe", "1f1b"):
            raise ValueError(f"unknown schedule {schedule!r}")
        self.net = net
        self.mode = mode
        self.schedule = schedule
        self.n_micro = n_microbatches
        if net.batch_size % n_microbatches:
            raise ValueError(
                f"batch_size {net.batch_size} not divisible by "
                f"n_microbatches {n_microbatches}"
            )
        self.n_stages = len(stage_devices)
        self.stage_devices = [list(d) for d in stage_devices]
        self.ranges = boundaries or split_stages(net, self.n_stages)
        if len(self.ranges) != self.n_stages:
            raise ValueError("boundaries/stage_devices length mismatch")
        self.ios = stage_io(net, self.ranges, mode)
        self.metric_counts = [
            _metric_count(net, lo, hi, mode) for lo, hi in self.ranges
        ]
        out_idx = [net.get_tensor_index_by_name(n) for n in output_names]
        self.extract = [
            [i for i in out_idx if self._stage_of_tensor(i) == k]
            for k in range(self.n_stages)
        ]
        self.out_order = out_idx
        self.shardings = [_sharding_for(d) for d in self.stage_devices]

        self._fwd = []
        self._bwd = []
        for k, (lo, hi) in enumerate(self.ranges):
            fn = _make_stage_fn(net, lo, hi, self.ios[k], mode,
                                self.extract[k])
            self._fwd.append(jax.jit(fn))
            if mode == Mode.TRAIN:
                self._bwd.append(jax.jit(self._make_bwd(fn)))

    def _stage_of_tensor(self, idx: int) -> int:
        last = None
        for k, (lo, hi) in enumerate(self.ranges):
            for i in range(lo, hi):
                if idx in self.net.nodes[i].dst:
                    last = k
        if last is None:
            raise ValueError(
                f"tensor {idx} ({self.net.tensors[idx].name!r}) is not "
                "produced by any node; pipeline outputs must be node "
                "outputs (host-fed inputs cannot be requested)"
            )
        return last

    @staticmethod
    def _make_bwd(stage_fn):
        """Backward program: recompute the stage forward under jax.vjp
        (GPipe rematerialization) and pull boundary cotangents through."""

        def stage_bwd(params, state, pipe_vals, taps_vals, ext_vals, rng,
                      cot_pipe, cot_taps):
            def f(p, pv, tv):
                po, to, _ex, sur, _m, _s = stage_fn(
                    p, state, pv, tv, ext_vals, rng
                )
                return po, to, sur
            _, vjp = jax.vjp(f, params, pipe_vals, taps_vals)
            one = jnp.ones((), jnp.float32)
            return vjp((cot_pipe, cot_taps, one))

        return stage_bwd

    # ---------------------------------------------------------------- #

    def shard(self, params, state, opt_state=None):
        """Split the full pytrees into per-stage subtrees placed on each
        stage's devices. Returns (params_list, state_list[, opt_list])."""
        ps, ss, os_ = [], [], []
        for k, io in enumerate(self.ios):
            psh, _ = self.shardings[k]
            put = lambda t: jax.device_put(t, psh)  # noqa: E731
            ps.append(jax.tree.map(put, _subdict(params, io.param_keys)))
            ss.append(jax.tree.map(put, _subdict(state, io.state_keys)))
            if opt_state is not None:
                sub = {
                    "seen": opt_state["seen"],
                    "velocity": _subdict(
                        opt_state["velocity"], io.param_keys),
                    "adam_m": _subdict(opt_state["adam_m"], io.param_keys),
                    "adam_v": _subdict(opt_state["adam_v"], io.param_keys),
                }
                os_.append(jax.tree.map(put, sub))
        if opt_state is not None:
            return ps, ss, os_
        return ps, ss

    def gather(self, parts: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
        """Merge per-stage subtrees back into one host tree (later stages
        win on duplicates, matching reverse-scan name semantics)."""
        out: Dict[str, Any] = {}
        for sub in parts:
            for k, v in sub.items():
                out[k] = jax.device_get(v)
        return out

    def _micro_ext(self, io: _StageIO, batch: Dict[str, jax.Array], m: int):
        """{tensor idx: microbatch slice} for this stage's host-fed inputs.
        Absent batch keys are simply omitted (like execute's values.get(1):
        a cost node without ground truth is forward-only)."""
        mb = self.net.batch_size // self.n_micro
        vals = {}
        for idx in io.ext_in:
            name = "input" if idx == 0 else (
                "label" if idx == 1 else self.net.tensors[idx].name
            )
            if name not in batch:
                continue
            vals[idx] = batch[name][m * mb:(m + 1) * mb]
        return vals

    # ---------------------------------------------------------------- #

    def forward(self, params_list, state_list, batch):
        """Microbatched pipelined forward. Returns the requested output
        tensors (NCHW on host order), concatenated over microbatches."""
        collected = {i: [] for i in self.out_order}
        for m in range(self.n_micro):
            vals: Dict[int, jax.Array] = {}
            for k in range(self.n_stages):
                io = self.ios[k]
                _, bsh = self.shardings[k]
                pipe = tuple(
                    jax.device_put(vals[i], bsh) for i in io.pipe_in
                )
                ext = {
                    i: jax.device_put(v, bsh)
                    for i, v in self._micro_ext(io, batch, m).items()
                }
                po, _to, ex_vals, _s, _mt, _st = self._fwd[k](
                    params_list[k], state_list[k], pipe, (), ext, None
                )
                for i, v in zip(io.pipe_out, po):
                    vals[i] = v
                for i, v in zip(self.extract[k], ex_vals):
                    collected[i].append(v)
        outs = []
        for i in self.out_order:
            v = jnp.concatenate(collected[i], axis=0)
            if v.ndim == 4:
                from ..compile import nhwc_to_nchw

                v = nhwc_to_nchw(v)
            outs.append(v)
        return tuple(outs)

    def _forward_micro(self, params_list, states, batch, m, rng_m):
        """Forward one microbatch through every stage. Mutates `states`
        in place (BN running stats evolve in microbatch order). Returns
        (per-stage stash of boundary inputs, metric scalars)."""
        stash = [None] * self.n_stages
        metrics = []
        vals: Dict[int, jax.Array] = {}
        taps: Dict[Tuple[int, int], jax.Array] = {}
        for k in range(self.n_stages):
            io = self.ios[k]
            _, bsh = self.shardings[k]
            pipe = tuple(jax.device_put(vals[i], bsh) for i in io.pipe_in)
            tv = tuple(
                jax.device_put(taps[key], bsh) for key in io.taps_in
            )
            ext = {
                i: jax.device_put(v, bsh)
                for i, v in self._micro_ext(io, batch, m).items()
            }
            stash[k] = (pipe, tv, ext, rng_m, states[k])
            po, to, _ex, _sur, mt, new_state = self._fwd[k](
                params_list[k], states[k], pipe, tv, ext, rng_m
            )
            states[k] = new_state
            for i, v in zip(io.pipe_out, po):
                vals[i] = v
            for key, v in zip(io.taps_out, to):
                taps[key] = v
            metrics.extend(mt)
        return stash, metrics

    def _backward_micro(self, params_list, stash, grads):
        """Backward one microbatch (reverse stage order, cotangents routed
        by tensor idx), accumulating into per-stage `grads` in place."""
        cot_vals: Dict[int, jax.Array] = {}
        cot_taps: Dict[Tuple[int, int], jax.Array] = {}
        for k in reversed(range(self.n_stages)):
            io = self.ios[k]
            pipe, tv, ext, rng_m, st = stash[k]
            _, bsh = self.shardings[k]
            cp = tuple(
                jax.device_put(cot_vals[i], bsh)
                if i in cot_vals else jnp.zeros_like(v)
                for i, v in zip(io.pipe_out,
                                self._out_shapes(k, pipe, tv, ext))
            ) if io.pipe_out else ()
            ct = tuple(
                jax.device_put(cot_taps[key], bsh)
                if key in cot_taps else jnp.zeros_like(v)
                for key, v in zip(io.taps_out,
                                  self._tap_shapes(k, pipe, tv, ext))
            ) if io.taps_out else ()
            gp, gpipe, gtaps = self._bwd[k](
                params_list[k], st, pipe, tv, ext, rng_m, cp, ct
            )
            grads[k] = gp if grads[k] is None else jax.tree.map(
                jnp.add, grads[k], gp
            )
            for i, g in zip(io.pipe_in, gpipe):
                cot_vals[i] = cot_vals[i] + g if i in cot_vals else g
            for key, g in zip(io.taps_in, gtaps):
                cot_taps[key] = (
                    cot_taps[key] + g if key in cot_taps else g
                )

    def train_on_batch(self, params_list, state_list, opt_list, batch, rng):
        """One full-batch training step: microbatched pipelined forward,
        backward with boundary-only stashing (jax.vjp recomputes inside
        the stage), per-stage optimizer update on summed gradients.
        Returns (params, state, opt, loss).

        schedule="gpipe": all forwards enqueue first, then all backwards —
        maximum cross-stage overlap via async dispatch, boundary stash
        O(n_micro x n_stages).
        schedule="1f1b": each microbatch's backward runs right after its
        forward, freeing its stash — peak boundary memory O(n_stages).
        Both produce identical numbers (microbatch gradients are SUMS and
        the forward state order is unchanged)."""
        from ..learner import apply_updates

        assert self.mode == Mode.TRAIN
        n_metrics = sum(self.metric_counts)
        metric_sum = None
        states = list(state_list)
        grads = [None] * self.n_stages

        def fold(m):
            return rng if self.n_micro == 1 else jax.random.fold_in(rng, m)

        if self.schedule == "1f1b":
            for m in range(self.n_micro):
                stash, mt = self._forward_micro(
                    params_list, states, batch, m, fold(m)
                )
                for s in mt:
                    metric_sum = s if metric_sum is None else metric_sum + s
                self._backward_micro(params_list, stash, grads)
        else:  # gpipe
            stashes = []
            for m in range(self.n_micro):
                stash, mt = self._forward_micro(
                    params_list, states, batch, m, fold(m)
                )
                stashes.append(stash)
                for s in mt:
                    metric_sum = s if metric_sum is None else metric_sum + s
            for stash in stashes:
                self._backward_micro(params_list, stash, grads)

        # ---- per-stage optimizer update on batch-summed grads
        new_params, new_opt = [], []
        for k in range(self.n_stages):
            p2, o2 = apply_updates(
                self.net, params_list[k], grads[k], opt_list[k]
            )
            new_params.append(p2)
            new_opt.append(o2)
        loss = (
            metric_sum / n_metrics if n_metrics else jnp.zeros((), jnp.float32)
        )
        return new_params, states, new_opt, loss

    # zero-cotangent templates ---------------------------------------- #

    def _out_shapes(self, k, pipe, tv, ext):
        """Zero templates for this stage's pipe outputs."""
        io = self.ios[k]
        return [self._zero_like_tensor(i) for i in io.pipe_out]

    def _tap_shapes(self, k, pipe, tv, ext):
        io = self.ios[k]
        return [self._zero_like_tensor(d) for d, _pos in io.taps_out]

    def _zero_like_tensor(self, idx: int):
        t = self.net.tensors[idx]
        mb = self.net.batch_size // self.n_micro
        # activations are NHWC on device
        return jnp.zeros((mb, t.h, t.w, t.c), jnp.float32)

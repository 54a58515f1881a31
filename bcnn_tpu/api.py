"""Stateful convenience wrapper mirroring the reference's net lifecycle.

The reference flow (inc/bcnn/bcnn.h):
    bcnn_init_net -> build layers -> bcnn_compile_net ->
    bcnn_train_on_batch / bcnn_predict_on_batch -> bcnn_save_weights

Here `Session` owns the (params, state, opt_state) pytrees and the jitted
step functions; `compile_net()` (re)builds them after graph edits, like
bcnn_compile_net (bcnn_net.c:356-359) re-allocates the workload.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import compile as compile_mod
from .compile import (
    execute,
    get_loss,
    init_params,
    make_train_step,
    nhwc_to_nchw,
)
from .graph import Net
from .types import Mode


class Session:
    """Stateful net handle. Pass `mesh` (a jax.sharding.Mesh, e.g. from
    parallel.make_mesh()) to train data-parallel: params replicate, batches
    shard on their leading axis, and the train step runs under GSPMD —
    numerically identical to single-device (global-batch-sum loss)."""

    def __init__(self, net: Net, seed: int = 0, mesh=None):
        self.net = net
        self.seed = seed
        self.mesh = mesh
        self.params: Dict[str, jax.Array] = {}
        self.state: Dict[str, jax.Array] = {}
        self.opt_state = None
        self.loader = None
        self._train_step = None
        self._train_scan = None
        self._resident = None
        self._forward_cache = {}
        self._rng = jax.random.PRNGKey(seed ^ 0x5EED)
        self._step_count = 0
        # set by train_on_batch / train_scan_on_batches when net.yolo_stats:
        # list (per yolo layer) of stat dicts (scan: arrays with leading k)
        self.last_yolo_stats = None

    # -- lifecycle ------------------------------------------------------ #

    def compile_net(self):
        """bcnn_compile_net analogue: materialize params/state and reset
        compiled functions. Keeps existing param values when shapes agree
        (so weight loading before compile survives)."""
        params, state = init_params(self.net, self.seed)
        # weights staged by config.load_net(model_path=...) take precedence
        loaded_p = getattr(self.net, "_loaded_params", None)
        if loaded_p is not None:
            self.params = {k: jnp.asarray(v) for k, v in loaded_p.items()}
            self.state = {
                k: jnp.asarray(v)
                for k, v in getattr(self.net, "_loaded_state", {}).items()
            }
        for k, v in self.params.items():
            if k in params and params[k].shape == v.shape:
                params[k] = v
        for k, v in self.state.items():
            if k in state and state[k].shape == v.shape:
                state[k] = v
        self.params, self.state = params, state
        if self.net.mode != Mode.PREDICT and self.net.learner is not None:
            from .learner import init_opt_state

            self.opt_state = init_opt_state(self.net, self.params)
        if self.mesh is not None:
            from .parallel import replicate

            self.params = replicate(self.mesh, self.params)
            self.state = replicate(self.mesh, self.state)
            if self.opt_state is not None:
                self.opt_state = replicate(self.mesh, self.opt_state)
        self._train_step = None
        self._train_scan = None
        self._resident = None
        self._forward_cache = {}
        return self

    # -- data loader + mode plumbing -------------------------------------- #

    def set_data_loader(
        self,
        loader_type,
        train_path,
        train_path_extra=None,
        test_path=None,
        test_path_extra=None,
    ):
        """bcnn_set_data_loader (bcnn.h:466 / bcnn_data.c:377-390)."""
        from .data import make_loader

        self.loader = make_loader(
            self.net,
            loader_type,
            train_path,
            train_path_extra,
            test_path,
            test_path_extra,
        )
        self.loader.set_mode(self.net.mode)
        return self

    def set_mode(self, mode: Mode):
        """bcnn_set_mode (bcnn_net.c:490-504): switches mode and rewinds the
        eval stream."""
        self.net.set_mode(mode)
        if getattr(self, "loader", None) is not None:
            self.loader.set_mode(Mode(mode))

    # -- reference-style entry points ------------------------------------ #

    def train_on_batch(
        self, x: Optional[np.ndarray] = None,
        label: Optional[np.ndarray] = None,
    ) -> float:
        """bcnn_train_on_batch (bcnn_net.c:452-463): one load/fwd/bwd/update;
        returns the reported loss (metric mean, bcnn_get_loss). With no
        arguments the configured data loader supplies the batch, like the
        reference."""
        if x is None:
            x, label = self.loader.next_batch()
        if self._train_step is None:
            if self.mesh is not None:
                from .parallel import make_dp_train_step

                self._train_step = make_dp_train_step(self.net, self.mesh)
            else:
                self._train_step = make_train_step(self.net)
        self._rng, sub = jax.random.split(self._rng)
        batch = {
            "input": jnp.asarray(x, jnp.float32),
            "label": jnp.asarray(label, jnp.float32),
        }
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from .parallel import shard_batch

            batch = shard_batch(self.mesh, batch)
            sub = jax.device_put(
                sub, NamedSharding(self.mesh, PartitionSpec())
            )
        out = self._train_step(
            self.params, self.state, self.opt_state, batch, sub
        )
        if len(out) == 5:  # net.yolo_stats: per-yolo-layer diagnostics
            self.params, self.state, self.opt_state, loss, ystats = out
            self.last_yolo_stats = jax.tree.map(
                lambda v: float(np.asarray(v)), ystats
            )
        else:
            self.params, self.state, self.opt_state, loss = out
        self._step_count += 1
        return loss

    def train_scan_on_batches(self, k: int) -> float:
        """k loader batches through ONE device program
        (compile.make_train_scan): the production loop shape — no host
        round-trip per step (removes the measured ~9.5 ms per-dispatch
        tunnel cost, BENCHMARKS.md). Returns the SUM of the k steps'
        reported losses, so callers accumulate it exactly like k
        train_on_batch calls. Without dropout/device-augment the k-step
        trajectory matches k sequential steps to float-reassociation
        tolerance (the scan and straight-line programs fuse/round
        differently under XLA — test-pinned in test_cli.py); with them,
        the per-step RNG stream also differs."""
        device_augment = getattr(self.net, "device_augment", None)
        unsupported = [
            name for name, on in (
                ("device_augment",
                 device_augment is not None and self.mesh is not None),
                ("remat", bool(getattr(self.net, "remat", False))),
                ("accum_steps",
                 int(getattr(self.net, "accum_steps", 1) or 1) > 1),
            ) if on
        ]
        if unsupported:
            raise ValueError(
                "train_scan_on_batches does not support "
                f"{'/'.join(unsupported)} (make_train_scan runs the bare "
                "step); use train_on_batch for those nets"
            )
        xs, ys = [], []
        for _ in range(k):
            x, y = self.loader.next_batch()
            xs.append(x)
            ys.append(y)
        # with device_augment the loader yields RAW UINT8 records; stage
        # them as-is (4x smaller upload) — normalization runs on device
        in_dtype = jnp.uint8 if device_augment is not None else jnp.float32
        xs_in = jnp.asarray(np.stack(xs), in_dtype)
        xs_lab = jnp.asarray(np.stack(ys), jnp.float32)
        self._rng, sub = jax.random.split(self._rng)
        if self.mesh is not None:
            from .parallel import make_dp_train_scan

            if self._train_scan is None:
                self._train_scan = make_dp_train_scan(self.net, self.mesh)
            out = self._train_scan(
                self.params, self.state, self.opt_state, xs_in, xs_lab,
                sub,
            )
        else:
            if self._train_scan is None:
                from .compile import make_train_scan

                self._train_scan = make_train_scan(self.net)
            out = self._train_scan(
                self.params, self.state, self.opt_state,
                {"input": xs_in, "label": xs_lab}, sub,
            )
        if len(out) == 5:  # net.yolo_stats: per-step stats, leading axis k
            self.params, self.state, self.opt_state, losses, ystats = out
            self.last_yolo_stats = jax.tree.map(
                lambda v: np.asarray(v), ystats
            )
        else:
            self.params, self.state, self.opt_state, losses = out
        self._step_count += k
        return float(jnp.sum(losses))

    def train_scan_resident_on_batches(self, k: int,
                                       shuffle: bool = False) -> float:
        """train_scan_on_batches over the DEVICE-RESIDENT feed: on first
        call the Session's RawRecordLoader is decoded whole
        (loader.read_all) and uploaded to device memory once; every call
        then dispatches one K-step scan whose per-step batches are
        gathered on device from a (k, B) int32 index slab — per-dispatch
        host traffic is the index array (compile.make_train_scan_resident;
        DP mesh: parallel.make_dp_train_scan_resident with the dataset
        replicated per device). Requires net.device_augment (records
        store raw uint8; use {} for normalize-only). shuffle=False walks
        the loader's own sequential mod-n order; shuffle=True draws a
        deterministic per-epoch permutation (EpochIndexStream). This is
        the loop shape that holds sustained == burst in the 5,000-step
        soak (BENCHMARKS.md)."""
        from .data.records import EpochIndexStream, RawRecordLoader

        device_augment = getattr(self.net, "device_augment", None)
        if device_augment is None:
            raise ValueError(
                "train_scan_resident_on_batches requires "
                "net.device_augment (records are raw uint8; {} gives "
                "device-side normalization only)"
            )
        if not isinstance(self.loader, RawRecordLoader):
            raise ValueError(
                "train_scan_resident_on_batches needs a RawRecordLoader "
                "(records_from_loader writes one); got "
                f"{type(self.loader).__name__}"
            )
        for name, on in (
            ("remat", bool(getattr(self.net, "remat", False))),
            ("accum_steps",
             int(getattr(self.net, "accum_steps", 1) or 1) > 1),
        ):
            if on:
                raise ValueError(
                    f"train_scan_resident_on_batches does not support "
                    f"{name}; use train_on_batch"
                )
        if self._resident is None:
            xa, ya = self.loader.read_all()
            ds = {"input": jnp.asarray(xa), "label": jnp.asarray(ya)}
            stream = EpochIndexStream(
                self.loader.n, self.net.batch_size,
                seed=self.seed, shuffle=shuffle,
            )
            if self.mesh is not None:
                from .parallel import make_dp_train_scan_resident, replicate

                ds = replicate(self.mesh, ds)
                scan = make_dp_train_scan_resident(self.net, self.mesh)
            else:
                from .compile import make_train_scan_resident

                scan = make_train_scan_resident(self.net)
            self._resident = (scan, ds, stream)
        scan, ds, stream = self._resident
        if stream.shuffle != shuffle:
            raise ValueError(
                "shuffle is fixed at the first "
                f"train_scan_resident_on_batches call ({stream.shuffle}); "
                "compile_net() resets the resident state"
            )
        idx = jnp.asarray(stream.next(k))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            idx = jax.device_put(
                idx, NamedSharding(self.mesh, P(None, "batch"))
            )
        self._rng, sub = jax.random.split(self._rng)
        out = scan(self.params, self.state, self.opt_state, ds, idx, sub)
        if len(out) == 5:
            self.params, self.state, self.opt_state, losses, ystats = out
            self.last_yolo_stats = jax.tree.map(
                lambda v: np.asarray(v), ystats
            )
        else:
            self.params, self.state, self.opt_state, losses = out
        self._step_count += k
        return float(jnp.sum(losses))

    def predict_on_batch(
        self, x: Optional[np.ndarray] = None,
        label: Optional[np.ndarray] = None,
        outputs: Optional[Sequence[str]] = None,
    ) -> Tuple[Tuple[jax.Array, ...], jax.Array]:
        """bcnn_predict_on_batch (bcnn_net.c:465-483): forward in the net's
        current mode; returns (outputs, loss). Default output is the last
        non-cost tensor produced (the net's out tensor). With no arguments
        the configured data loader supplies the batch."""
        if x is None:
            x, label = self.loader.next_batch()
        mode = self.net.mode if self.net.mode != Mode.TRAIN else Mode.VALID
        if outputs is None:
            outputs = [self._default_output_name()]
        # id(net.quant) keys the cache so enabling/disabling int8 retraces
        key = (tuple(outputs), mode, id(getattr(self.net, "quant", None)))
        if key not in self._forward_cache:
            self._forward_cache[key] = _make_predict(self.net, outputs, mode)
        batch = {"input": jnp.asarray(x, jnp.float32)}
        if label is not None:
            batch["label"] = jnp.asarray(label, jnp.float32)
        outs, loss = self._forward_cache[key](self.params, self.state, batch)
        return outs, loss

    # -- split-phase API (bcnn_forward / bcnn_backward / bcnn_update) ----- #
    # The fused train_on_batch is the fast path; these support reference-
    # style custom loops. forward() caches activations, backward() computes
    # and caches gradients, update() applies the optimizer step.

    def forward(self, x=None, label=None):
        """bcnn_forward: runs the current-mode forward, caching every
        tensor value for get_tensor()."""
        if x is None:
            x, label = self.loader.next_batch()
        self._cur_batch = {
            "input": jnp.asarray(x, jnp.float32),
        }
        if label is not None:
            self._cur_batch["label"] = jnp.asarray(label, jnp.float32)
        self._rng, sub = jax.random.split(self._rng)
        self._cur_rng = sub
        ex = compile_mod.execute(
            self.net, self.params, self.state, self._cur_batch,
            self.net.mode, sub,
        )
        # dequantize any int8-flow tensors so get_tensor_value stays fp32
        self._cur_values = {
            i: (
                v.astype(jnp.float32) * ex.int8_flow[i]
                if v.dtype == jnp.int8
                else v
            )
            for i, v in ex.values.items()
        }
        if self.net.mode == Mode.TRAIN:
            self.state = ex.state
        self._cur_loss = compile_mod.get_loss(ex)
        return self._cur_loss

    def backward(self):
        """bcnn_backward: gradients of the surrogate loss w.r.t. params,
        cached for update()."""

        def loss_fn(params):
            ex = compile_mod.execute(
                self.net, params, self.state, self._cur_batch,
                Mode.TRAIN, self._cur_rng,
            )
            return ex.surrogate

        self._cur_grads = jax.grad(loss_fn)(self.params)
        return self._cur_grads

    def update(self):
        """bcnn_update: one optimizer step with the cached gradients."""
        from .learner import apply_updates

        self.params, self.opt_state = apply_updates(
            self.net, self.params, self._cur_grads, self.opt_state
        )

    def get_tensor_value(self, name: str):
        """bcnn_get_tensor_by_name for activations: the tensor's value from
        the last forward(), in reference NCHW layout."""
        idx = self.net.get_tensor_index_by_name(name)
        v = self._cur_values[idx]
        return np.asarray(nhwc_to_nchw(v) if v.ndim == 4 else v)

    def get_batch_size(self) -> int:
        return self.net.batch_size

    def get_num_threads(self) -> int:
        return self.net.num_threads

    def fill_tensor_with_image(
        self, img_u8, batch_index: int, x_buffer,
        norm_coeff=1 / 127.5, swap_to_bgr=0,
        mean_r=127.5, mean_g=127.5, mean_b=127.5,
    ):
        """bcnn_fill_tensor_with_image (bcnn_data.c:42-68): normalize one
        HWC uint8 image into row `batch_index` of a host NCHW batch."""
        from .data.augment import convert_img_to_float

        x_buffer[batch_index] = convert_img_to_float(
            img_u8, norm_coeff, swap_to_bgr, mean_r, mean_g, mean_b
        )
        return x_buffer

    def _default_output_name(self) -> str:
        from .types import LayerType

        for node in reversed(self.net.nodes):
            if node.type not in (LayerType.COST,):
                return self.net.tensors[node.dst[0]].name
        raise ValueError("net has no non-cost nodes")

    def yolo_get_detections(
        self,
        x: np.ndarray,
        w: int,
        h: int,
        netw: int,
        neth: int,
        thresh: float,
        relative: int = 1,
        batch_item: int = 0,
    ):
        """bcnn_yolo_get_detections (bcnn_yolo.c:548-643): forward, collect
        boxes over all yolo nodes above `thresh`, letterbox-correct, NMS.
        Returns a list of dicts (x,y,w,h,objectness,prob array) — suppressed
        boxes keep their slot with objectness 0, like the reference."""
        from .ops import yolo as yolo_ops
        from .types import LayerType

        yolo_nodes = [
            n for n in self.net.nodes if n.type == LayerType.YOLOV3
        ]
        if not yolo_nodes:
            return []
        names = [self.net.tensors[n.dst[0]].name for n in yolo_nodes]
        outs, _ = self.predict_on_batch(x, outputs=names)
        dets = []
        for node, out in zip(yolo_nodes, outs):
            arr = np.asarray(out)[batch_item]  # NCHW -> (C,H,W)
            arr = np.transpose(arr, (1, 2, 0))  # (H,W,C)
            p = dict(node.param)
            dets += yolo_ops.decode_layer(
                arr, p, self.net.tensors[0].w, self.net.tensors[0].h, thresh
            )
        if not dets:
            return []
        for d in dets:
            d["x"], d["y"], d["w"], d["h"] = yolo_ops.correct_region_boxes(
                d["x"], d["y"], d["w"], d["h"], w, h, netw, neth, relative
            )
        return yolo_ops.nms_obj(dets)

    def detect_on_batch(
        self,
        x: np.ndarray,
        thresh: float = 0.5,
        max_dets: int = 100,
        use_pallas: Optional[bool] = None,
        topk_first: bool = True,
    ):
        """Fully on-device batched detection: forward + fused decode + NMS
        in one jitted program, no host round-trips until the final gather —
        the serving-throughput path (the host-exact path is
        yolo_get_detections). Returns (boxes (N,K,4), scores (N,K,Kcls),
        objectness (N,K)) as device arrays.

        topk_first (default) selects candidates on the raw objectness
        logits and decodes only those — value-identical to the
        decode-everything path but skips materializing the (N, M, K)
        probability tensor (ops/yolo.device_detect_topk). use_pallas
        selects the decode kernel of the decode-everything path only;
        it is ignored (and kept out of the compile cache key) when
        topk_first is set."""
        import jax

        from .compile import make_detect_fn

        if topk_first:
            use_pallas = False  # unused; normalize the cache key
        elif use_pallas is None:
            use_pallas = jax.devices()[0].platform not in ("cpu",)
        key = (
            "detect", thresh, max_dets, use_pallas, topk_first,
            id(getattr(self.net, "quant", None)),
        )
        if key not in self._forward_cache:
            self._forward_cache[key] = jax.jit(
                make_detect_fn(
                    self.net, thresh, max_dets,
                    use_pallas=use_pallas, topk_first=topk_first,
                )
            )
        batch = {"input": jnp.asarray(x, jnp.float32)}
        return self._forward_cache[key](self.params, self.state, batch)

    def freeze_qat(self):
        """Freeze a QAT-trained net (net.qat, ops/quant.py) into the
        net.quant int8 dict: activation scales from the trained EMA
        abs-max state, per-channel int8 weights from the final params.
        PREDICT / detect / export then take the int8 path unchanged."""
        from .ops.quant import qat_export

        self.net.quant = qat_export(self.net, self.params, self.state)
        return self.net.quant

    # -- checkpoint / resume (full state, beyond the reference's
    #    weights-only bcnn_save_weights) ---------------------------------- #

    def save_checkpoint(self, path: str):
        from .checkpoint import save_checkpoint

        save_checkpoint(
            path,
            self.params,
            self.state,
            self.opt_state,
            extra={"step_count": self._step_count},
        )

    def load_checkpoint(self, path: str):
        from .checkpoint import load_checkpoint

        self.params, self.state, opt, extra = load_checkpoint(path)
        if opt:
            self.opt_state = opt
        self._step_count = int(extra.get("step_count", 0))
        return self

    def save_weights(self, path: str):
        """bcnn_save_weights: the bit-compatible .bcnnmodel format."""
        from .serialization import save_weights

        save_weights(self.net, self.params, self.state, path)

    def load_weights(self, path: str):
        """bcnn_load_weights: .bcnnmodel or Darknet .weights."""
        from .serialization import load_weights

        p = {k: np.asarray(v) for k, v in self.params.items()}
        s = {k: np.asarray(v) for k, v in self.state.items()}
        load_weights(self.net, p, s, path)
        self.params = {k: jnp.asarray(v) for k, v in p.items()}
        self.state = {k: jnp.asarray(v) for k, v in s.items()}
        return self

    def export_serving(
        self,
        path: str,
        detect: bool = False,
        outputs=None,
        thresh: float = 0.5,
        max_dets: int = 100,
        platforms=None,
    ):
        """AOT-export the PREDICT forward (or, with detect=True, the full
        detection pipeline: forward + decode + on-device NMS) as a
        self-contained StableHLO artifact with weights baked in — the
        TPU-native deployment target alongside tools/bcnn2tflite.py
        (reference: tools/tflite_converter/). Load with
        bcnn_tpu.deploy.load_exported; no framework code needed at serve
        time."""
        from . import deploy

        if detect:
            if outputs is not None:
                raise ValueError(
                    "outputs= applies to forward export only; the detect "
                    "pipeline returns (boxes, scores, objectness)"
                )
            return deploy.export_detect(
                self.net, self.params, self.state, path,
                thresh=thresh, max_dets=max_dets, platforms=platforms,
            )
        if thresh != 0.5 or max_dets != 100:
            raise ValueError(
                "thresh/max_dets apply to detect=True export only"
            )
        return deploy.export_forward(
            self.net, self.params, self.state, path,
            outputs=outputs, platforms=platforms,
        )

    def get_tensor(self, name: str):
        """Host copy of a param/state tensor in reference (flat NCHW blob)
        order where applicable."""
        t = self.net.tensor(name)
        if t.key in self.params:
            return np.asarray(self.params[t.key])
        if t.key in self.state:
            return np.asarray(self.state[t.key])
        raise KeyError(name)


def _make_predict(net: Net, output_names, mode: Mode):
    out_idx = [net.get_tensor_index_by_name(n) for n in output_names]

    @jax.jit
    def predict(params, state, batch):
        ex = execute(net, params, state, batch, mode, None)
        outs = [compile_mod.output_value(ex, i) for i in out_idx]
        return tuple(outs), get_loss(ex)

    return predict

"""Weight serialization: .bcnnmodel (bit-compatible) and Darknet .weights.

Formats mirror src/bcnn_net.c:
  - save (bcnn_save_weights :595-681): magic "BCNN" + 3 x u32 version, then
    per node, in graph order: conv-family & fc write bias then weight blobs;
    CONV2D with BN appends running mean, variance, scales; PReLU activation
    nodes write their slopes; standalone BATCHNORM writes mean, variance,
    scales, biases. (The reference's save omits a conv layer's PReLU slopes
    even though its *loader* reads them (:1310-1332) — we write them so
    save/load round-trips; files from nets without conv-PReLU are bit-exact.)
  - load (bcnn_load_weights :1485-1558 + per-layer loaders :1222-1480):
    format from extension (.weights -> darknet, .onnx unsupported);
    Darknet ordering differs: BN scales come *before* mean/var and conv
    weights come *last*; the darknet header is 3 x i32 + seen counter
    (u64 when version >= 0.2); fc weights need a transpose for
    transposed-era darknet files (major or minor > 1000, :1427-1459).
  - BN fold at load when PREDICT (:1281-1292, :1394-1404):
        b <- b - s*m / sqrt(v + 1e-6);  s <- s / sqrt(v + 1e-6)
    after which the predict path computes y = y*s + b directly.

Blob element layouts are the reference's flat NCHW-style orders; in-memory
arrays are TPU layouts (conv HWIO, fc (in,out)) — converted here, at the
boundary, only.
"""

from __future__ import annotations

import struct
from typing import BinaryIO, Dict

import numpy as np

from .graph import Net, Node
from .types import Activation, LayerType, Mode

BCNN_MAGIC = b"BCNN"
VERSION = (0, 2, 0)
BN_FOLD_EPS = 1e-6

_CONV_FAMILY = (
    LayerType.CONV2D,
    LayerType.TRANSPOSE_CONV2D,
    LayerType.DEPTHWISE_CONV2D,
)


# --------------------------------------------------------------------- #
# memory <-> blob layout converters
# --------------------------------------------------------------------- #

def _w_mem_to_blob(net: Net, node: Node, w: np.ndarray) -> np.ndarray:
    t = net.tensors[node.src[1]]
    if node.type == LayerType.FULL_CONNECTED:
        return np.ascontiguousarray(w.T).ravel()  # (in,out) -> (out,in)
    # conv family: mem (k,k,I,O); blob order differs per layer
    if node.type == LayerType.TRANSPOSE_CONV2D:
        # blob (c_src, n, k, k); mem (k,k,n,c_src)
        return np.ascontiguousarray(w.transpose(3, 2, 0, 1)).ravel()
    # conv/depthwise blob (O, Ipg, k, k); mem (k,k,Ipg,O)
    return np.ascontiguousarray(w.transpose(3, 2, 0, 1)).ravel()


def _w_blob_to_mem(net: Net, node: Node, blob: np.ndarray) -> np.ndarray:
    t = net.tensors[node.src[1]]
    mem_shape = t.mem_shape
    if node.type == LayerType.FULL_CONNECTED:
        in_sz, out_sz = mem_shape
        return np.ascontiguousarray(blob.reshape(out_sz, in_sz).T)
    k, _, i_dim, o_dim = mem_shape
    if node.type == LayerType.TRANSPOSE_CONV2D:
        # blob (c_src=o_dim, n=i_dim, k, k)
        return np.ascontiguousarray(
            blob.reshape(o_dim, i_dim, k, k).transpose(2, 3, 1, 0)
        )
    return np.ascontiguousarray(
        blob.reshape(o_dim, i_dim, k, k).transpose(2, 3, 1, 0)
    )


def _conv_prelu_src_index(node: Node) -> int:
    # slopes at src[3] without BN, src[6] with (bcnn_net.c:1311-1313)
    return 3 + 3 * int(bool(node.param.get("batch_norm")))


# --------------------------------------------------------------------- #
# save
# --------------------------------------------------------------------- #

def save_weights(net: Net, params: Dict, state: Dict, filename: str):
    def get(idx):
        t = net.tensors[idx]
        src = params if t.key in params else state
        return np.asarray(src[t.key], np.float32)

    with open(filename, "wb") as fp:
        fp.write(BCNN_MAGIC)
        fp.write(struct.pack("<3I", *VERSION))
        for node in net.nodes:
            if node.type in _CONV_FAMILY or (
                node.type == LayerType.FULL_CONNECTED
            ):
                w = get(node.src[1])
                b = get(node.src[2])
                b.ravel().tofile(fp)
                _w_mem_to_blob(net, node, w).tofile(fp)
                if node.type == LayerType.CONV2D and node.param.get(
                    "batch_norm"
                ):
                    get(node.src[3]).ravel().tofile(fp)  # run mean
                    get(node.src[4]).ravel().tofile(fp)  # run var
                    get(node.src[5]).ravel().tofile(fp)  # scales
                if (
                    node.type == LayerType.CONV2D
                    and node.param.get("activation") == Activation.PRELU
                ):
                    get(node.src[_conv_prelu_src_index(node)]).ravel().tofile(
                        fp
                    )
            elif node.type == LayerType.ACTIVATION:
                if node.param.get("activation") == Activation.PRELU:
                    get(node.src[1]).ravel().tofile(fp)
            elif node.type == LayerType.BATCHNORM:
                get(node.src[1]).ravel().tofile(fp)  # mean
                get(node.src[2]).ravel().tofile(fp)  # var
                get(node.src[3]).ravel().tofile(fp)  # scales
                get(node.src[4]).ravel().tofile(fp)  # biases


def save_weights_darknet(
    net: Net, params: Dict, state: Dict, filename: str, seen: int = 0
):
    """Write Darknet `.weights` — the exact byte stream the reference's
    format-1 loader consumes (bcnn_load_weights, bcnn_net.c:1506-1552).

    The reference can only LOAD this format (its save is bcnn-format-only,
    bcnn_save_weights :595-681); this writer is an interop extension so
    nets trained here can feed the reference binary (and any Darknet
    tooling). Per-layer order, format 1 (bcnn_net.c:1222-1353):
      conv family: biases, [BN scales, means, variances], weights,
                   [conv-PReLU slopes];
      standalone batchnorm: scales, means, variances (NO biases — the
                   reference leaves them at their in-memory values);
      fully-connected: biases, weights (out,in);
      standalone PReLU activation slopes are NOT in this format (:1543).
    Header: 3 x i32 version + u64 seen counter (version (0,2,0) selects the
    u64 branch and avoids the transposed-era FC path, :1514-1527).
    """
    def get(idx):
        t = net.tensors[idx]
        src = params if t.key in params else state
        return np.asarray(src[t.key], np.float32)

    with open(filename, "wb") as fp:
        fp.write(struct.pack("<3i", *VERSION))
        fp.write(struct.pack("<Q", seen))
        for node in net.nodes:
            if node.type in _CONV_FAMILY:
                get(node.src[2]).ravel().tofile(fp)  # biases
                if node.type == LayerType.CONV2D and node.param.get(
                    "batch_norm"
                ):
                    get(node.src[5]).ravel().tofile(fp)  # scales
                    get(node.src[3]).ravel().tofile(fp)  # run mean
                    get(node.src[4]).ravel().tofile(fp)  # run var
                _w_mem_to_blob(net, node, get(node.src[1])).tofile(fp)
                if (
                    node.type == LayerType.CONV2D
                    and node.param.get("activation") == Activation.PRELU
                ):
                    get(node.src[_conv_prelu_src_index(node)]).ravel().tofile(
                        fp
                    )
            elif node.type == LayerType.BATCHNORM:
                get(node.src[3]).ravel().tofile(fp)  # scales
                get(node.src[1]).ravel().tofile(fp)  # means
                get(node.src[2]).ravel().tofile(fp)  # variances
            elif node.type == LayerType.FULL_CONNECTED:
                get(node.src[2]).ravel().tofile(fp)
                _w_mem_to_blob(net, node, get(node.src[1])).tofile(fp)


# --------------------------------------------------------------------- #
# load
# --------------------------------------------------------------------- #

def model_find_format(filename: str) -> int:
    """0 = bcnn, 1 = darknet, 2 = onnx (bcnn_net.c:1461-1480)."""
    ext = filename.rsplit(".", 1)[-1]
    if ext == "weights":
        return 1
    if ext == "onnx":
        return 2
    return 0


def _read(fp: BinaryIO, n: int, what: str) -> np.ndarray:
    a = np.fromfile(fp, np.float32, n)
    if a.size != n:
        raise ValueError(
            f"Inconsistent {what} size: expected {n} but found {a.size}"
        )
    return a


def load_weights(net: Net, params: Dict, state: Dict, filename: str):
    """Mutates params/state in place (numpy); returns (params, state).
    Folds BN constants when net.mode == PREDICT and marks net.bn_folded."""
    fmt = model_find_format(filename)
    if fmt == 2:
        raise NotImplementedError("onnx weights not supported (as reference)")
    need_transpose = False
    with open(filename, "rb") as fp:
        if fmt == 0:
            magic = fp.read(4)
            if magic != BCNN_MAGIC:
                raise ValueError(f"Invalid format for model file {filename}")
            struct.unpack("<3I", fp.read(12))
        else:
            major, minor, revision = struct.unpack("<3i", fp.read(12))
            if (major * 10 + minor) >= 2 and major < 1000 and minor < 1000:
                struct.unpack("<Q", fp.read(8))
            else:
                struct.unpack("<i", fp.read(4))
            need_transpose = (major > 1000) or (minor > 1000)

        fold = net.mode == Mode.PREDICT

        for node in net.nodes:
            if node.type in _CONV_FAMILY:
                _load_conv(net, node, fp, fmt, params, state, fold)
            elif node.type == LayerType.ACTIVATION:
                if (
                    node.param.get("activation") == Activation.PRELU
                    and fmt == 0
                ):
                    t = net.tensors[node.src[1]]
                    params[t.key] = _read(
                        fp, int(np.prod(t.mem_shape)), "prelu slopes"
                    ).reshape(t.mem_shape)
            elif node.type == LayerType.BATCHNORM:
                _load_batchnorm(net, node, fp, fmt, params, state, fold)
            elif node.type == LayerType.FULL_CONNECTED:
                _load_fullc(net, node, fp, params, need_transpose)
        if fold:
            net.bn_folded = True
    return params, state


def _fold_bn(b: np.ndarray, s: np.ndarray, m: np.ndarray, v: np.ndarray):
    """bcnn_net.c:1281-1292."""
    denom = np.sqrt(v + BN_FOLD_EPS)
    return b - (s * m) / denom, s / denom


def _load_conv(net, node, fp, fmt, params, state, fold):
    tw = net.tensors[node.src[1]]
    tb = net.tensors[node.src[2]]
    w_sz = int(np.prod(tw.mem_shape))
    b_sz = int(np.prod(tb.mem_shape))
    b = _read(fp, b_sz, f"biases {tb.name}")
    if fmt == 0:
        w_blob = _read(fp, w_sz, f"weights {tw.name}")
    if node.type == LayerType.CONV2D and node.param.get("batch_norm"):
        tm = net.tensors[node.src[3]]
        tv = net.tensors[node.src[4]]
        ts = net.tensors[node.src[5]]
        c = int(np.prod(ts.mem_shape))
        if fmt == 1:
            s = _read(fp, c, "batchnorm scales")
        m = _read(fp, c, "batchnorm means")
        v = _read(fp, c, "batchnorm variances")
        if fmt == 0:
            s = _read(fp, c, "batchnorm scales")
        if fold:
            b, s = _fold_bn(b, s, m, v)
        state[tm.key] = m
        state[tv.key] = v
        params[ts.key] = s
    if fmt == 1:
        w_blob = _read(fp, w_sz, f"weights {tw.name}")
    params[tb.key] = b
    params[tw.key] = _w_blob_to_mem(net, node, w_blob)
    if node.type == LayerType.CONV2D and node.param.get(
        "activation"
    ) == Activation.PRELU:
        tsl = net.tensors[node.src[_conv_prelu_src_index(node)]]
        params[tsl.key] = _read(
            fp, int(np.prod(tsl.mem_shape)), "prelu slopes"
        )


def _load_batchnorm(net, node, fp, fmt, params, state, fold):
    tm = net.tensors[node.src[1]]
    tv = net.tensors[node.src[2]]
    ts = net.tensors[node.src[3]]
    tb = net.tensors[node.src[4]]
    c = net.tensors[node.dst[0]].c
    if fmt == 1:
        s = _read(fp, c, "scales")
    m = _read(fp, c, "means")
    v = _read(fp, c, "variances")
    if fmt == 0:
        s = _read(fp, c, "scales")
        b = _read(fp, c, "biases")
    else:
        b = np.asarray(params[tb.key], np.float32).copy()
    if fold:
        b, s = _fold_bn(b, s, m, v)
    state[tm.key] = m
    state[tv.key] = v
    params[ts.key] = s
    params[tb.key] = b


def _load_fullc(net, node, fp, params, need_transpose):
    tw = net.tensors[node.src[1]]
    tb = net.tensors[node.src[2]]
    in_sz, out_sz = tw.mem_shape
    params[tb.key] = _read(fp, out_sz, f"biases {tb.name}")
    w_blob = _read(fp, in_sz * out_sz, f"weights {tw.name}")
    if need_transpose:
        # old darknet stores (in, out); bcnn_transpose converts to (out, in)
        # before the standard blob->mem step (bcnn_net.c:1448-1451)
        w_blob = np.ascontiguousarray(
            w_blob.reshape(in_sz, out_sz).T
        ).ravel()
    params[tw.key] = _w_blob_to_mem(net, node, w_blob)

"""Pallas TPU kernel: fused YOLO head activation + box decode.

The plain XLA path materializes the activated head (sigmoid slices), then
re-reads it to decode boxes and again to form class scores — three HBM
round trips over the (N,H,W,A*(5+K)) tensor. This kernel does one pass:
each grid step pulls one (n, row) stripe of the raw conv output into VMEM
and emits decoded boxes (x,y,w,h relative), objectness, and
objectness-weighted class probabilities directly, ready for NMS
(ops/yolo.py device_decode_nms).

Math identical to get_yolo_box (bcnn_yolo.c:137-145) + the fill loop of
bcnn_yolo_get_detections (:604-639):
  bx=(col+sig(tx))/W, by=(row+sig(ty))/H, bw=exp(tw)*aw/netw,
  bh=exp(th)*ah/neth, obj=sig(to), p_k=obj*sig(tc_k).

Falls back to the jnp implementation (decode_grid_jnp) off-TPU; the test
suite checks the kernel in interpreter mode against the fallback.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, aw_ref, ah_ref, boxes_ref, obj_ref, probs_ref,
            *, num, classes, net_w, net_h, grid_w, grid_h):
    e = 5 + classes
    row = pl.program_id(1)
    x = x_ref[0, 0, :, :]  # (W, A*(5+K))
    w = grid_w
    col = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0).astype(jnp.float32)
    for a in range(num):
        xa = x[:, a * e : (a + 1) * e]  # (W, 5+K)
        bx = (col + jax.nn.sigmoid(xa[:, 0:1])) / grid_w
        by = (
            row.astype(jnp.float32) + jax.nn.sigmoid(xa[:, 1:2])
        ) / grid_h
        bw = jnp.exp(xa[:, 2:3]) * (aw_ref[a] / net_w)
        bh = jnp.exp(xa[:, 3:4]) * (ah_ref[a] / net_h)
        obj = jax.nn.sigmoid(xa[:, 4:5])
        boxes_ref[0, 0, :, a * 4 + 0 : a * 4 + 1] = bx
        boxes_ref[0, 0, :, a * 4 + 1 : a * 4 + 2] = by
        boxes_ref[0, 0, :, a * 4 + 2 : a * 4 + 3] = bw
        boxes_ref[0, 0, :, a * 4 + 3 : a * 4 + 4] = bh
        obj_ref[0, 0, :, a : a + 1] = obj
        probs_ref[0, 0, :, a * classes : (a + 1) * classes] = (
            obj * jax.nn.sigmoid(xa[:, 5:])
        )


def decode_fused(
    x: jax.Array, param: Dict, net_w: int, net_h: int,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """x: raw conv output (N,H,W,A*(5+K)).
    Returns boxes (N,H*W*A,4), obj (N,H*W*A), probs (N,H*W*A,K)."""
    n, h, w, c = x.shape
    num, classes = param["num"], param["classes"]
    anchors = param["anchors"]
    mask = param["mask"]
    aw = jnp.asarray([anchors[2 * m] for m in mask], jnp.float32)
    ah = jnp.asarray([anchors[2 * m + 1] for m in mask], jnp.float32)

    kernel = functools.partial(
        _kernel, num=num, classes=classes,
        net_w=net_w, net_h=net_h, grid_w=w, grid_h=h,
    )
    boxes, obj, probs = pl.pallas_call(
        kernel,
        grid=(n, h),
        in_specs=[
            pl.BlockSpec(
                (1, 1, w, c), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, w, num * 4), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, w, num), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, w, num * classes), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w, num * 4), jnp.float32),
            jax.ShapeDtypeStruct((n, h, w, num), jnp.float32),
            jax.ShapeDtypeStruct((n, h, w, num * classes), jnp.float32),
        ],
        interpret=interpret,
    )(x, aw, ah)
    # (N,H,W,A*4) -> (N, H*W*A, 4): per-location anchor-major like the
    # reference's (n, loc) iteration order is (a, loc); we use (loc, a)
    # consistently across boxes/obj/probs so NMS sees matched rows
    boxes = boxes.reshape(n, h * w, num, 4).reshape(n, -1, 4)
    obj = obj.reshape(n, -1)
    probs = probs.reshape(n, h * w, num, classes).reshape(n, -1, classes)
    return boxes, obj, probs


def decode_grid_jnp(
    x: jax.Array, param: Dict, net_w: int, net_h: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pure-XLA fallback with identical outputs."""
    from .yolo import _decode_grid, yolo_head

    n, h, w, c = x.shape
    num, classes = param["num"], param["classes"]
    y = yolo_head(x, num, classes).reshape(n, h, w, num, 5 + classes)
    bx, by, bw, bh = _decode_grid(
        y, param["anchors"], param["mask"], net_w, net_h
    )
    boxes = jnp.stack([bx, by, bw, bh], axis=-1).reshape(n, -1, 4)
    obj = y[..., 4].reshape(n, -1)
    probs = (y[..., 4:5] * y[..., 5:]).reshape(n, -1, classes)
    return boxes, obj, probs

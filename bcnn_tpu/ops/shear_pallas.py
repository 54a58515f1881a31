"""Pallas TPU kernel: per-row fractional shift (the shear-sweep hot loop).

The round-5 Paeth three-shear rotation (`data/device_augment._rotate_3shear`,
reference semantics bip_rotate_image /root/reference/src/bip/src/bip.c:1202)
lowered each shear to a `fori_loop` of 2*kmax+1 dense fma sweeps
(`_row_shift`): gather-free and 3.5-9.1x over the bilinear gather, but the
loop streams its full-size accumulator through HBM on every one of the
~85-250 sweeps — BENCHMARKS.md pinned it at ~40x the one-read-one-write
byte floor and named a VMEM-resident kernel as the remaining ~10x.

This is that kernel. Two structural ideas:

- **The window lives in VMEM.** One grid step owns a whole (rows, win_p)
  channel plane (~1 MB fp32 at 416); every sweep reads VMEM, HBM sees one
  read + one write.
- **The sweep is per-GROUP, not global.** A shear's shift d(row) is linear
  with |slope| <= sin(theta_max), so within a sublane group of 8 adjacent
  rows the two-tap support spans at most ceil(7*slope)+3 integer shifts —
  a STATIC bound from the config's rotation_range. Each group does
  k_local (4-8) fma sweeps anchored at its own dynamic base column
  instead of the 2*kmax+1 (85-250) global sweeps the XLA formulation
  needs (there, the slice offset must be the shared loop index to stay a
  slice under vmap; here a dynamic per-group lane offset is one VMEM
  dynamic slice).

Weights and taps are EXACTLY `_row_shift`'s: out[r,j] = sum_k
hat(d_r - (k - kmax)) * imgp[r, k + j] over the k it enumerates — the
kernel enumerates only the k with nonzero hat for some row in the group
and adds them in the same ascending-k order with the same fp32
arithmetic. Results match the XLA sweep to within one fma-contraction
rounding (observed max 1 ulp at uint8 scale, 1.5e-5 on [0,255] values —
whether w*seg+acc contracts to an fma is the backend's choice and
differs between the two lowerings); test-gated at 1e-4 absolute, far
under the shear chain's own 2/255 documented tolerance vs the gather.

Dispatch: `data/device_augment._row_shift` routes here by default on
TPU (BCNN_SHEAR_PALLAS=0 reverts to the XLA sweep for re-measurement,
=1 forces the kernel in interpret mode off-TPU for the parity tests).

MEASURED (same-session A/B, batch-256 images+boxes program at 416,
round 5, values bit-identical on chip): rotation_range=10:
284.0 -> 122.0 ms/batch (2.3x); range=30: 702.9 -> 126.6 ms (5.6x) —
~21x over the original bilinear gather at both ranges, and the kernel
time is nearly range-independent because the group sweep count k_local
grows only with sin(theta_max), not with the global span kmax. Two
Mosaic walls shaped the final form (both probed on-chip):
a dynamic LANE-start slice is rejected outright ("cannot statically
prove index is a multiple of 128"), so the dynamic anchor became ONE
tpu.dynamic_rotate per group + static unaligned slices; and
dynamic_rotate itself requires a 128-aligned lane width (8x464
rejected, 8x512 fine), so the window pads to a lane multiple.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_G = 8  # sublane group height (fp32 tile)


def _kernel(d_ref, img_ref, out_ref, *, kmax, out_w, k_local, n_groups):
    """d_ref: (R8, 1) fp32; img_ref: (1, R8, WP); out_ref: (1, R8, OW)."""

    win_p = img_ref.shape[2]

    def group(gi, carry):
        r0 = pl.multiple_of(gi * _G, _G)
        dg = d_ref[pl.ds(r0, _G), :]  # (8,1) per-row shifts
        base = jnp.floor(dg) + float(kmax)  # first tap column per row
        kg = jnp.min(base).astype(jnp.int32)  # group anchor (dynamic)
        # Mosaic cannot prove alignment for a dynamic LANE start, so the
        # dynamic part of the tap offset is ONE lane rotate by the group
        # anchor (dynamic_rotate takes traced shifts) and the k_local tap
        # offsets become STATIC unaligned slices (both probed on-chip).
        # The roll's wrapped tail never reaches the sliced range:
        # kg + k_local + out_w - 2 < win_p by the caller's pad invariant.
        rows = img_ref[0, pl.ds(r0, _G), :]  # (8, win_p)
        rolled = pltpu.roll(rows, shift=win_p - kg, axis=1)
        acc = jnp.zeros((_G, out_w), jnp.float32)
        for t in range(k_local):  # static unroll, ascending k
            # weight exactly as the XLA sweep computes it: d - (k - kmax)
            # with the INTEGER subtraction first (d + kmax - k rounds
            # differently and costs one ulp of weight)
            shift = (kg + t - kmax).astype(jnp.float32)
            w = jnp.maximum(0.0, 1.0 - jnp.abs(dg - shift))
            acc = acc + w * rolled[:, t : t + out_w]
        out_ref[0, pl.ds(r0, _G), :] = acc
        return carry

    jax.lax.fori_loop(0, n_groups, group, 0)


@functools.partial(
    jax.jit, static_argnames=("kmax", "out_w", "k_local", "interpret")
)
def row_shift_pallas(imgp, d, kmax, out_w, k_local, interpret=False):
    """Per-row two-tap fractional shift along axis 1.

    imgp: (r, win_p, c) fp32, columns = _row_shift's padded window PLUS
    >= k_local extra fill columns on the right (the group sweep may READ
    up to k_local-1 columns past a row's own taps; their hat weight is
    exactly 0 so any finite fill works). d: (r,) with |d| <= kmax - 1.
    Returns (r, out_w, c) == _row_shift's output bit-for-bit.
    """
    r, win_p, c = imgp.shape
    assert win_p >= out_w + 2 * kmax + k_local, (win_p, out_w, kmax, k_local)
    rpad = (-r) % _G
    if rpad:
        # edge-replicate d so a mixed tail group keeps its tap spread
        # within k_local; the pad rows' outputs are sliced off below
        d = jnp.concatenate([d, jnp.broadcast_to(d[-1], (rpad,))])
        imgp = jnp.pad(imgp, ((0, rpad), (0, 0), (0, 0)))
    r8 = r + rpad

    # tpu.dynamic_rotate requires a 128-aligned lane width (measured:
    # 8x464 rejected "unsupported unaligned shape", 8x512 fine) — pad the
    # window to a lane multiple; the wrapped/padded tail never reaches the
    # sliced range (pad invariant above), so the pad value is irrelevant
    wpad = (-win_p) % 128
    if wpad:
        imgp = jnp.pad(imgp, ((0, 0), (0, wpad), (0, 0)))
    win_p += wpad

    img_cf = jnp.transpose(imgp, (2, 0, 1))  # (c, r8, win_p'): x on lanes
    d2 = d[:, None].astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            kmax=kmax,
            out_w=out_w,
            k_local=k_local,
            n_groups=r8 // _G,
        ),
        out_shape=jax.ShapeDtypeStruct((c, r8, out_w), jnp.float32),
        grid=(c,),
        in_specs=[
            pl.BlockSpec((r8, 1), lambda ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r8, win_p), lambda ci: (ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r8, out_w), lambda ci: (ci, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(d2, img_cf)
    return jnp.transpose(out, (1, 2, 0))[:r]

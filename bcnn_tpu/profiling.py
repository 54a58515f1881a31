"""Tracing / profiling utilities.

The reference has only a monotonic-clock timer (bh_timer) and commented-out
per-node timing in bcnn_forward (bcnn_net.c:416-420). Here:

  - `trace(logdir)`: context manager around jax.profiler for full XLA
    traces (view in TensorBoard / xprof);
  - `profile_forward(session, x)`: the per-node wall-clock debug mode —
    runs the graph eagerly node by node, syncing after each, and returns
    per-node timings. Eager dispatch overhead makes absolute numbers
    pessimistic; use it for *relative* hot-spot hunting, and the XLA trace
    for ground truth.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Tuple

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_forward(
    session, x, mode=None, runs: int = 3
) -> List[Tuple[str, str, float]]:
    """Returns [(layer_type, dst_tensor_name, best_ms)] per node."""
    from .compile import _Executor, nchw_to_nhwc
    from .types import Mode

    net = session.net
    mode = mode if mode is not None else Mode.PREDICT
    import jax.numpy as jnp

    xj = jnp.asarray(x, jnp.float32)
    timings = []
    best: Dict[int, float] = {}
    for _ in range(runs):
        ex = _Executor(
            net, session.params, session.state, mode,
            jax.random.PRNGKey(0),
        )
        ex.values[0] = nchw_to_nhwc(xj)
        for i, node in enumerate(net.nodes):
            rng = jax.random.fold_in(jax.random.PRNGKey(0), i)
            t0 = time.perf_counter()
            getattr(ex, f"_{node.type.name.lower()}")(node, rng)
            if node.dst and node.dst[0] in ex.values:
                jax.block_until_ready(ex.values[node.dst[0]])
            dt = (time.perf_counter() - t0) * 1e3
            best[i] = min(best.get(i, float("inf")), dt)
    for i, node in enumerate(net.nodes):
        name = net.tensors[node.dst[0]].name if node.dst else "-"
        timings.append((node.type.name, name, best[i]))
    return timings


def memory_report(fn, *args, **kwargs) -> Dict[str, float]:
    """Compile `fn` for the given example args and report the program's
    device-memory footprint from XLA's memory analysis — the TPU-native
    answer to the reference's hand-sized workspaces
    (bcnn_compile_net, bcnn_net.c:337-352): argument/output/temp/generated
    code sizes and the peak HBM the program needs. Keys in bytes.

    Also returns XLA cost analysis ('flops', 'bytes_accessed') when the
    backend provides it — the inputs to a roofline estimate
    (see BENCHMARKS.md for the methodology)."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    out: Dict[str, float] = {}
    mem = compiled.memory_analysis()
    if mem is not None:
        for k in (
            "argument_size_in_bytes",
            "output_size_in_bytes",
            "temp_size_in_bytes",
            "generated_code_size_in_bytes",
            "alias_size_in_bytes",
        ):
            v = getattr(mem, k, None)
            if v is not None:
                out[k] = float(v)
        if "argument_size_in_bytes" in out and "temp_size_in_bytes" in out:
            out["peak_bytes_estimate"] = (
                out["argument_size_in_bytes"]
                + out.get("output_size_in_bytes", 0.0)
                + out["temp_size_in_bytes"]
                - out.get("alias_size_in_bytes", 0.0)
            )
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else None
    if ca:
        if "flops" in ca:
            out["flops"] = float(ca["flops"])
        if "bytes accessed" in ca:
            out["bytes_accessed"] = float(ca["bytes accessed"])
    return out


def print_profile(timings: List[Tuple[str, str, float]]):
    total = sum(t for _, _, t in timings)
    print(f"{'layer':<20} {'tensor':<16} {'ms':>8} {'%':>6}")
    for typ, name, ms in timings:
        print(f"{typ:<20} {name:<16} {ms:8.3f} {100 * ms / total:5.1f}%")
    print(f"{'total':<37} {total:8.3f}")

"""bench.py is the driver's measurement entry point — smoke it in-process
on the CPU mesh for each inference mode so a refactor can't silently
break the recorded metric. (train mode compiles the full backward —
exercised by test_train/test_mixed_precision instead.)"""

import json
import os
import runpy

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("mode", ["forward", "detect", "int8", "serve"])
def test_bench_modes_emit_one_json_line(mode, capsys, monkeypatch):
    monkeypatch.setenv("BENCH_MODE", mode)
    monkeypatch.setenv("BENCH_BATCH", "4")
    monkeypatch.setenv("BENCH_RUNS", "4")
    monkeypatch.setenv("BENCH_SIZE", "160")  # keep the CPU compile cheap
    runpy.run_path(os.path.join(ROOT, "bench.py"), run_name="__main__")
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, out
    rec = json.loads(out[0])
    assert rec["unit"] == "img/s/chip"
    assert rec["value"] > 0
    # vs_baseline is rounded to 3 decimals in the emitted line
    assert rec["vs_baseline"] == pytest.approx(
        rec["value"] / 5000.0, abs=6e-4
    )
    assert np.isfinite(rec["best_ms"]) and rec["best_ms"] > 0
    assert rec["n_rounds"] >= 2 and "median_best_ms" in rec
    if mode == "serve":
        # the driver default: headline = complete int8 serving pipeline,
        # bare-forward continuity number in the same line (VERDICT r3 #4)
        assert rec["metric"].endswith("serve_int8")
        assert rec["forward_img_s"] > 0 and rec["forward_best_ms"] > 0


def test_bench_default_mode_is_serve(monkeypatch):
    # the official BENCH_rNN.json must measure what a deployment runs
    monkeypatch.delenv("BENCH_MODE", raising=False)
    src = open(os.path.join(ROOT, "bench.py")).read()
    assert 'os.environ.get("BENCH_MODE", "serve")' in src

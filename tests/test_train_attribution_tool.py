"""Offline checks for tools/train_attribution.py: the table math
(per-block floor = max of the block's own byte/flop deltas, boundary
correction, sentinel) against a synthetic row log — so the analysis
that BENCHMARKS.md's attribution section rests on can't silently
regress. The on-chip measurement itself is exercised by --quick on CPU
in CI-free environments (not here: it costs compiles)."""

import json
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "train_attribution.py")


def test_table_from_rows(tmp_path):
    rows = [
        {"cut": 1, "name": "c1", "ms": 10.0, "gflop": 100.0,
         "gbytes": 4.095, "floor_ms": 5.0, "bnd_ms": 1.0,
         "compile_s": 1.0},
        # block 2: flops-heavy (985 GF -> 5.0 ms flop floor) on a
        # bytes-light delta (0.819 GB -> 1.0 ms): per-block floor must
        # be 5.0 (max of deltas), not the 1.0 a delta-of-maxes gives
        {"cut": 2, "name": "c2", "ms": 20.0, "gflop": 1085.0,
         "gbytes": 4.914, "floor_ms": 6.0, "bnd_ms": 0.5,
         "compile_s": 1.0},
        {"cut": "full", "name": "full", "ms": 25.0, "compile_s": 1.0},
        {"cut": 2, "name": "c2", "ms": 20.2, "gflop": 1085.0,
         "gbytes": 4.914, "floor_ms": 6.0, "bnd_ms": 0.5,
         "compile_s": 1.0},  # sentinel re-run: +1%
    ]
    log = tmp_path / "rows.log"
    log.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    r = subprocess.run(
        [sys.executable, TOOL, "--table-from", str(log)],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = r.stdout
    # block 1: corr = 10 - 1 + 0 = 9, floor = max(4.095/819*1e3=5.0,
    # 100/197=0.51) = 5.0 -> x-floor 1.80
    assert "| c1 | 10.0 | +9.0 |" in out and "| 1.80 |" in out
    # block 2: corr = 10 - 0.5 + 1 = 10.5, floor = max(1.0, 5.0) = 5.0
    assert "| c2 | 20.0 | +10.5 |" in out and "| 2.10 |" in out
    # YOLO bracket: full - cut2 + bnd2 = 25 - 20 + 0.5 = +5.5
    assert "+5.5" in out
    # sentinel drift = (20.2 - 20.0) / 20.0 = +1.0%
    assert "+1.0%" in out

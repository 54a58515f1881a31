"""Smoke-gate for examples/train_soak.py (the sustained-run harness the
BENCHMARKS.md "sustained" section is produced with): a tiny two-segment
CPU run must log, checkpoint, RESUME from the checkpoint, and aggregate
a sane report — so the on-chip 5k-step soak never trips over harness
bugs mid-run."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SOAK = os.path.join(REPO, "examples", "train_soak.py")


def run_soak(args, cwd):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, SOAK] + args,
        capture_output=True, text=True, env=env, cwd=cwd, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return r.stdout


def test_soak_two_segments_resume_and_report(tmp_path):
    d = str(tmp_path / "soak")
    o = str(tmp_path / "data")
    common = [
        "--batch", "2", "--scan", "2", "--size", "64", "--src-size", "96",
        "--images", "4", "--eval-every", "4", "--ckpt-every", "4",
        "--mem-every", "1", "--dir", d, "--outdir", o, "--act", "fp32",
    ]
    # segment 1: 4 dispatches (8 steps)
    run_soak(common + ["--steps", "8"], REPO)
    assert os.path.exists(os.path.join(d, "ckpt_latest.npz"))
    # segment 2: resume to 16 steps total, with the held-out mAP eval on
    # (exercises the detect-pipeline eval path and its log/report fields)
    out = run_soak(
        common + ["--steps", "16", "--resume", "--eval-map", "4"], REPO
    )
    rep = json.loads(out.strip().splitlines()[-1])
    assert rep["steps"] == 16
    assert rep["map50_val_last"] is not None
    assert 0.0 <= rep["map50_val_last"] <= 1.0
    assert rep["map50_trajectory"]
    assert rep["segments"] == 2
    assert rep["steps_redone_after_kill"] == 0
    assert rep["img_s_whole_run"] > 0
    assert rep["eval_n"] >= 2
    assert rep["ckpt_n"] >= 2
    # the per-dispatch timing path produced percentile samples
    assert rep["img_s_steady"] and rep["img_s_steady"] > 0
    assert rep["step_ms_p50"] and rep["step_ms_p50"] > 0
    # eval losses are finite nonzero floats (TRAIN-mode loss: the yolo
    # cost is mode-gated; a 0.0 here means the eval program regressed
    # to VALID semantics)
    a, b = rep["eval_first_last_loss"]
    assert a == a and b == b and a > 0 and b > 0
    # the --report entry point reproduces the same aggregate
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, SOAK, "--dir", d, "--report"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rep2 = json.loads(r.stdout)
    assert rep2["steps"] == 16

    # a THIRD segment started from the same checkpoint but with work
    # "lost" (simulate a kill after the checkpoint by rewinding the
    # target): resume again — dispatch indices overlap is reported
    run_soak(common + ["--steps", "24", "--resume"], REPO)
    rep3 = json.loads(run_soak(["--dir", d, "--report"], REPO))
    assert rep3["steps"] == 24
    assert rep3["segments"] == 3


def test_soak_resident_feed_resume(tmp_path):
    """Stream segment -> kill -> resume with --feed resident (dataset in
    device memory, index-only dispatches): params/opt/rng continue from
    the checkpoint; the report aggregates across the feed change."""
    d = str(tmp_path / "soak")
    o = str(tmp_path / "data")
    common = [
        "--batch", "2", "--scan", "2", "--size", "64", "--src-size", "96",
        "--images", "4", "--eval-every", "3", "--ckpt-every", "3",
        "--dir", d, "--outdir", o, "--act", "fp32",
    ]
    run_soak(common + ["--steps", "6"], REPO)
    out = run_soak(
        common + ["--steps", "16", "--resume", "--feed", "resident"], REPO
    )
    rep = json.loads(out.strip().splitlines()[-1])
    assert rep["steps"] == 16
    assert rep["segments"] == 2
    assert rep["img_s_whole_run"] > 0
    a, b = rep["eval_first_last_loss"]
    assert a == a and b == b and a > 0 and b > 0

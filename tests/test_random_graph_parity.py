"""Property-style parity: RANDOMLY generated layer stacks run through both
implementations (ours vs the compiled reference) and must agree. Catches
wiring/shape/epilogue bugs beyond the hand-written zoo."""

import os
import subprocess

import numpy as np
import pytest

from tests.test_reference_parity import (
    REF, build_and_save, harness, run_mine_predict,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree unavailable"
)


def gen_conf(rng, depth=5):
    """Random but always-valid bcnn-dialect config. Tracks shapes so pools
    never underflow; sticks to the reference's well-defined subset."""
    c, h, w = rng.choice([1, 3]), 16, 16
    lines = [
        "[net]",
        f"input_width={w}",
        f"input_height={h}",
        f"input_channels={c}",
        "batch_size=1",
        "",
    ]
    prev = "input"
    acts = ["relu", "lrelu", "tanh", "none", "logistic"]
    idx = 0
    for layer_i in range(depth):
        # first layer: conv/dw only (the reference forbids bn/pool-ish
        # layers as layer 0 or they'd read the unset input fallback)
        pool = ["conv", "dw"] if layer_i == 0 else [
            "conv", "maxpool", "bn", "dw"
        ]
        choice = rng.choice(pool)
        if choice == "conv":
            filters = int(rng.choice([4, 8, 6]))
            size = int(rng.choice([1, 3]))
            stride = int(rng.choice([1, 2])) if h >= 8 else 1
            if size == 1:
                # the REFERENCE is wrong for 1x1 stride!=1: it skips im2col
                # for all size-1 convs (bcnn_conv_layer.c:445-447), valid
                # only at stride 1 — so random graphs avoid that corner
                # (we implement it correctly; see docs/PARITY.md)
                stride = 1
            pad = size // 2
            bn = int(rng.rand() < 0.5)
            act = acts[rng.randint(len(acts))]
            dst = f"t{idx}"
            lines += [
                "[conv]", f"filters={filters}", f"size={size}",
                f"stride={stride}", f"pad={pad}", f"bn={bn}",
                f"activation={act}", f"src={prev}", f"dst={dst}", "",
            ]
            h = (h + 2 * pad - size) // stride + 1
            w = h
            c = filters
            prev = dst
        elif choice == "dw":
            act = acts[rng.randint(len(acts))]
            dst = f"t{idx}"
            lines += [
                "[dw-conv]", "size=3", "stride=1", "pad=1",
                f"activation={act}", f"src={prev}", f"dst={dst}", "",
            ]
            prev = dst
        elif choice == "maxpool" and h >= 4:
            dst = f"t{idx}"
            pt = ["same", "valid"][rng.randint(2)]
            lines += [
                "[maxpool]", "size=2", "stride=2",
                f"padding_type={pt}", f"src={prev}", f"dst={dst}", "",
            ]
            h = (h + 1) // 2 if pt == "same" else h // 2
            w = h
            prev = dst
        elif choice == "bn":
            dst = f"t{idx}"
            lines += ["[bn]", f"src={prev}", f"dst={dst}", ""]
            prev = dst
        idx += 1
    # head: fc + softmax
    lines += [
        "[connected]", "output=5", f"src={prev}", "dst=fc", "",
        "[softmax]", "src=fc", "dst=soft", "",
    ]
    return "\n".join(lines), lines[2].split("=")[1]


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_random_graph_forward_parity(harness, tmp_path, seed):
    rng = np.random.RandomState(seed)
    conf_text, _ = gen_conf(rng)
    conf, weights = build_and_save(conf_text, tmp_path, seed=seed + 100)
    # input channels from the generated conf
    c = int(
        [l for l in conf_text.splitlines() if "input_channels" in l][0]
        .split("=")[1]
    )
    x = rng.randn(1, c, 16, 16).astype(np.float32)
    xfile = tmp_path / "x.raw"
    x.ravel().tofile(xfile)
    out = tmp_path / "soft.raw"
    r = subprocess.run(
        [harness, "forward", str(conf), str(weights), str(xfile), "soft",
         str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, (conf_text, r.stderr[-500:])
    ref = np.fromfile(out, np.float32)
    (mine,), _, _ = run_mine_predict(str(conf), str(weights), x, ["soft"])
    # rtol 1e-2: the reference's PREDICT-mode 3x3/s1 convs take its
    # Winograd F(2x2,3x3) path, which itself deviates ~1e-3 relative from
    # exact convolution; stacked layers with folded-BN gains amplify it.
    # (The hand-written zoo and the detection parity tests bound the tight
    # cases; this test guards structure/wiring across random graphs.)
    np.testing.assert_allclose(
        mine.ravel(), ref, rtol=1e-2, atol=1e-4,
        err_msg=f"random graph (seed {seed}) diverged:\n{conf_text}",
    )

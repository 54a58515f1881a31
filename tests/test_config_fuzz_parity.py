"""Config-PARSER surface fuzzing (round 4, VERDICT r3 #6): randomly
generated .cfg files in the DARKNET dialect — auto lid naming, pad flags,
strides, activations, [route] with negative AND positive indices,
[shortcut] with negative from=, maxpool variants, upsample — parsed and
built by BOTH frameworks from the same cfg + .weights pair, forwards
compared. The bcnn-dialect surface is fuzzed by
test_random_graph_parity.py; together they cover the dual grammar of
bcnn_net.c:757-1112.

Every divergence found here must be ledgered in docs/PARITY.md as
quirk-or-fix before the seed is admitted.
"""

import os
import subprocess

import numpy as np
import pytest

from tests.test_darknet_e2e import synth_darknet_weights
from tests.test_reference_parity import REF, harness  # noqa: F401 (fixture)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree unavailable"
)

ACTS = ["leaky", "linear", "logistic", "relu"]


def gen_darknet_cfg(rng, depth=7):
    """Random always-valid darknet-dialect cfg. Tracks per-section output
    shapes so routes/shortcuts stay shape-compatible and pools never
    underflow. Avoids documented reference defects (1x1 stride!=1 conv
    im2col skip) like the bcnn-dialect generator."""
    c, h = 3, 16
    lines = [
        "[net]", "width=16", "height=16", "channels=3", "batch=1", "",
    ]
    shapes = {}  # section idx -> (c, h)
    sec = 0

    def conv(filters, size, stride, padflag, bn, act):
        nonlocal c, h, sec
        sec += 1
        lines.extend([
            "[convolutional]",
            *([f"batch_normalize={bn}"] if bn else []),
            f"filters={filters}", f"size={size}", f"stride={stride}",
            f"pad={padflag}", f"activation={act}", "",
        ])
        pad = size // 2 if padflag else 0
        c, h = filters, (h + 2 * pad - size) // stride + 1
        shapes[sec] = (c, h)

    conv(int(rng.choice([4, 8])), 3, 1, 1, int(rng.rand() < 0.5),
         ACTS[rng.randint(len(ACTS))])
    for _ in range(depth):
        pool = ["conv", "conv", "maxpool", "route", "shortcut", "upsample"]
        choice = rng.choice(pool)
        if choice == "conv":
            size = int(rng.choice([1, 3]))
            stride = int(rng.choice([1, 2])) if (h >= 8 and size == 3) else 1
            padflag = int(rng.rand() < 0.8) if size == 3 else int(
                rng.rand() < 0.5
            )
            if size == 3 and not padflag and h <= 4:
                padflag = 1  # keep spatial dims alive
            conv(int(rng.choice([4, 6, 8])), size, stride, padflag,
                 int(rng.rand() < 0.5), ACTS[rng.randint(len(ACTS))])
        elif choice == "maxpool" and h >= 4:
            stride = int(rng.choice([1, 2]))
            sec += 1
            lines.extend(["[maxpool]", "size=2", f"stride={stride}", ""])
            # builder default padding_type=SAME: out = ceil(h/stride)
            h = -(-h // stride)
            shapes[sec] = (c, h)
        elif choice == "route":
            cands = [j for j, (cc, hh) in shapes.items() if hh == h]
            if not cands:
                continue
            j = cands[rng.randint(len(cands))]
            sec += 1
            if rng.rand() < 0.5 and j != sec - 1:
                # two-input route: previous section + an earlier one,
                # each spelled randomly as a negative relative index
                # (tgt - sec) or a positive absolute darknet layer index
                # (tgt - 1); both resolve to lid{tgt} (bcnn_net.c:925-967)
                refs = []
                for tgt in (sec - 1, j):
                    if rng.rand() < 0.5:
                        refs.append(str(tgt - sec))
                    else:
                        refs.append(str(tgt - 1))
                lines.extend(["[route]", f"layers={refs[0]},{refs[1]}", ""])
                c = shapes[sec - 1][0] + shapes[j][0]
            else:
                ref = str(j - sec) if rng.rand() < 0.5 else str(j - 1)
                lines.extend(["[route]", f"layers={ref}", ""])
                c = shapes[j][0]
            shapes[sec] = (c, h)
        elif choice == "shortcut":
            cands = [
                j for j, (cc, hh) in shapes.items()
                if hh == h and cc == c and j < sec
            ]
            if not cands:
                continue
            j = cands[rng.randint(len(cands))]
            sec += 1
            act = ["linear", "leaky"][rng.randint(2)]
            lines.extend([
                "[shortcut]", f"from={j - sec}", f"activation={act}", "",
            ])
            shapes[sec] = (c, h)
        elif choice == "upsample" and h <= 8:
            sec += 1
            lines.extend(["[upsample]", "stride=2", ""])
            h *= 2
            shapes[sec] = (c, h)
    # 1x1 linear head pins a single comparable output
    conv(5, 1, 1, 0, 0, "linear")
    return "\n".join(lines), f"lid{sec}"


def build_mine_darknet(cfg_path, tmp_path, seed):
    """Parse the darknet cfg (fmt=1), synthesize a .weights file, then
    reload through the real user path (load_net with .weights)."""
    from bcnn_tpu import Mode, Net
    from bcnn_tpu.config import (
        LayerParam, add_layer, layer_param_set, net_set_param, parse_ini,
    )

    net0 = Net(Mode.PREDICT)
    sections = parse_ini(cfg_path)
    for k, v in sections[0].keys:
        net_set_param(net0, k, v)
    for i in range(1, len(sections)):
        lp = LayerParam()
        for k, v in sections[i].keys:
            layer_param_set(lp, i, k, v, fmt=1)
        if lp.src_id is None:
            lp.src_id = [f"lid{i - 1}"]
        if lp.dst_id is None:
            lp.dst_id = f"lid{i}"
        add_layer(net0, sections[i].name, lp)
    weights = str(tmp_path / "fuzz.weights")
    synth_darknet_weights(net0, weights, seed=seed)
    return weights


@pytest.mark.parametrize("seed", list(range(40, 56)))
def test_darknet_dialect_forward_parity(harness, tmp_path, seed):
    rng = np.random.RandomState(seed)
    cfg_text, out_name = gen_darknet_cfg(rng)
    cfg = tmp_path / "fuzz.cfg"
    cfg.write_text(cfg_text)
    weights = build_mine_darknet(str(cfg), tmp_path, seed)

    x = rng.randn(1, 3, 16, 16).astype(np.float32)
    xfile = tmp_path / "x.raw"
    x.ravel().tofile(xfile)
    out = tmp_path / "out.raw"
    r = subprocess.run(
        [harness, "forward", str(cfg), weights, str(xfile), out_name,
         str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, (cfg_text, r.stderr[-800:])
    ref = np.fromfile(out, np.float32)

    from tests.test_reference_parity import run_mine_predict

    (mine,), _, _ = run_mine_predict(str(cfg), weights, x, [out_name])
    assert mine.size == ref.size, (cfg_text, mine.shape, ref.shape)
    # rtol 1e-2: reference PREDICT 3x3/s1 convs run its Winograd path
    # (~1e-3 relative deviation itself), amplified by folded-BN gains
    np.testing.assert_allclose(
        mine.ravel(), ref, rtol=1e-2, atol=1e-4,
        err_msg=f"darknet-dialect fuzz (seed {seed}) diverged:\n{cfg_text}",
    )

"""Config-fuzzer TRAINING trajectories (round 5, VERDICT r4 #6): the
darknet-dialect random-graph generator from test_config_fuzz_parity.py,
composed with the TRAINER — each seed's random cfg gets a classification
tail ([avgpool] -> [softmax] -> [cost]), identical synthesized initial
.weights, and 25 SGD/Adam steps driven through the reference's own
bcnn-cl binary AND this framework's CLI from the same conf; the printed
train-error trajectories are compared. This composes the parser surface
(auto lid naming, route/shortcut indices, pad flags) with the trainer
quirks (grad routing, BN train-mode stats, LR decay, seen-based Adam)
where a divergence would actually bite. Ref: bcnn_net.c:757-1112 +
bcnn_learner.c:167-175.

Every divergence found here must be ledgered in docs/PARITY.md as
quirk-or-fix before the seed is admitted.
"""

import os
import subprocess

import numpy as np
import pytest

from tests.test_config_fuzz_parity import build_mine_darknet, gen_darknet_cfg
from tests.test_reference_parity import REF
from tests.test_training_parity import BCNN_CL, parse_train_errors, ref_cl  # noqa: F401

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree unavailable"
)

TRAIN_NET = """[net]
data_format=classification
source_train={lst}
input_model={init}
output_model={out}
eval_test=0
eval_period=5
save_model=100000
num_pred=4
max_batches=26
input_width=16
input_height=16
input_channels=3
batch_size={bs}
{optim}
"""

OPTIMS = [
    "optimizer=sgd\nmomentum=0.9\ndecay=0.0005\nlearning_rate=0.004",
    "optimizer=adam\nbeta1=0.9\nbeta2=0.999\nlearning_rate=0.002",
    "optimizer=sgd\nmomentum=0.9\nlearning_rate=0.004\n"
    "decay_type=step\nstep=8\ngamma=0.5",
]


def write_classification_set(tmp_path, n=24, hw=16, classes=5, seed=0):
    """Tiny PNG classification list: class-coded bright square on noise
    (learnable, so trajectories move instead of idling at init)."""
    from bcnn_tpu import bip

    rng = np.random.RandomState(seed)
    lines = []
    for i in range(n):
        c = int(rng.randint(classes))
        img = (rng.rand(hw, hw, 3) * 120).astype(np.uint8)
        r, col = divmod(c, 3)
        img[2 + r * 6: 8 + r * 6, 2 + col * 5: 7 + col * 5] = (
            230, 40 + 40 * c, 30
        )
        p = tmp_path / f"cls{i}.png"
        bip.write_image(str(p), img)
        lines.append(f"{p} {c}")
    lst = tmp_path / "cls_list.txt"
    lst.write_text("\n".join(lines) + "\n")
    return str(lst)


@pytest.mark.parametrize("seed", list(range(60, 70)))
def test_darknet_dialect_training_trajectory(ref_cl, tmp_path, seed):  # noqa: F811
    rng = np.random.RandomState(seed)
    body, head = gen_darknet_cfg(rng, depth=5)
    # strip the generator's inference [net] block; keep the layer body
    layers = body.split("\n\n", 1)[1]
    # classification tail in the same (darknet) dialect: implicit lid
    # src/dst naming, loss/metric keys parsed by both frameworks' fmt=1
    # section grammar (bcnn_net.c [cost]/[softmax]/[avgpool] dispatch)
    tail = "[avgpool]\n\n[softmax]\n\n[cost]\nloss=euclidean\nmetric=rmse\n"
    lst = write_classification_set(tmp_path, classes=5)

    # identical initial weights: synthesize a darknet .weights for the
    # PREDICT-parsed graph (same tensor order in TRAIN mode)
    cfg_fwd = tmp_path / "fwd.cfg"
    cfg_fwd.write_text(body)
    init_w = build_mine_darknet(str(cfg_fwd), tmp_path, seed)

    optim = OPTIMS[seed % len(OPTIMS)]
    # [shortcut] cfgs run at batch 1: the reference's equal-shape eltwise
    # adds src1 to BATCH ITEM 0 ONLY (min_dim excludes the batch axis,
    # bcnn_eltwise_layer.c:119-121) — a ledgered reference bug this
    # framework deliberately does NOT replicate (docs/PARITY.md
    # "Deviations"); at batch 1 both semantics coincide, so shortcut
    # graphs stay comparable instead of being excluded. Found by this
    # very test (seed 62) — the divergence bisected exactly to the
    # ledger entry.
    bs = 1 if "[shortcut]" in layers else 4
    conf = tmp_path / "train.conf"
    conf.write_text(
        TRAIN_NET.format(lst=lst, init=init_w, bs=bs,
                         out=str(tmp_path / "ref_out"), optim=optim)
        + layers + "\n" + tail
    )

    r = subprocess.run(
        [ref_cl, "train", str(conf)],
        capture_output=True, text=True, cwd=tmp_path,
    )
    assert r.returncode == 0, (conf.read_text(), r.stderr[-1500:])
    ref_e = parse_train_errors(r.stderr)
    assert len(ref_e) >= 5, r.stderr[-800:]

    import contextlib
    import io

    from bcnn_tpu.cli import main

    buf = io.StringIO()
    with contextlib.redirect_stderr(buf):
        assert main(["train", str(conf)]) == 0
    mine_e = parse_train_errors(buf.getvalue())
    assert len(mine_e) == len(ref_e), (mine_e, ref_e)
    # 25 steps of a random graph are CHAOTIC amplifiers of O(1e-8) GEMM
    # reassociation (Adam's step-1 update is ~lr*sign(g) for small g; BN
    # train-stats rsqrt near eps), so the trajectory check is an
    # ENVELOPE that catches semantic divergence (the eltwise batch bug
    # read 0.2+ here) — the bit-level gate is the one-step weight parity
    # below, measured BEFORE amplification.
    np.testing.assert_allclose(
        np.asarray(mine_e), np.asarray(ref_e), atol=0.03,
        err_msg=f"seed {seed}: trajectories diverged\n{conf.read_text()}",
    )

    # --- one-step weight parity: the sharp semantic check ------------
    conf1 = tmp_path / "step1.conf"
    out_r = str(tmp_path / "step1_ref.bcnnmodel")
    out_m = str(tmp_path / "step1_mine.bcnnmodel")
    one = TRAIN_NET.replace("max_batches=26", "max_batches=1")
    conf1.write_text(
        one.format(lst=lst, init=init_w, bs=bs, out=out_r, optim=optim)
        + layers + "\n" + tail
    )
    r = subprocess.run(
        [ref_cl, "train", str(conf1)],
        capture_output=True, text=True, cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr[-800:]
    conf1.write_text(
        one.format(lst=lst, init=init_w, bs=bs, out=out_m, optim=optim)
        + layers + "\n" + tail
    )
    buf = io.StringIO()
    with contextlib.redirect_stderr(buf):
        assert main(["train", str(conf1)]) == 0
    pr, _ = _load_model_tensors(tmp_path, body, tail, out_r)
    pm, _ = _load_model_tensors(tmp_path, body, tail, out_m)
    adam = "adam" in optim
    lr = 0.002 if adam else 0.004
    for k in pr:
        d = np.abs(pr[k] - pm[k])
        if adam:
            # Adam's first step is lr * g/(|g|+eps): O(1e-8) gradient
            # reassociation flips near-zero entries by up to 2*lr while
            # the bulk stays exact — bound the worst entry by the flip
            # and require the TYPICAL entry tight
            assert d.max() <= 2.1 * lr, (seed, k, d.max())
            assert np.median(d) <= 1e-6, (seed, k, float(np.median(d)))
        else:
            assert d.max() <= 1e-5, (seed, k, d.max())


def _load_model_tensors(tmp_path, body, tail, model):
    """Build the fmt=1 graph and load a saved .bcnnmodel's tensors."""
    from bcnn_tpu import Mode, Net, Session
    from bcnn_tpu.config import (
        LayerParam, add_layer, layer_param_set, net_set_param, parse_ini,
    )
    from bcnn_tpu.serialization import load_weights

    full_cfg = tmp_path / "full_for_load.cfg"
    full_cfg.write_text(body + "\n" + tail)
    net = Net(Mode.TRAIN)
    sections = parse_ini(str(full_cfg))
    for k, v in sections[0].keys:
        net_set_param(net, k, v)
    for i in range(1, len(sections)):
        lp = LayerParam()
        for k, v in sections[i].keys:
            layer_param_set(lp, i, k, v, fmt=1)
        if lp.src_id is None:
            lp.src_id = [f"lid{i - 1}"]
        if lp.dst_id is None:
            lp.dst_id = f"lid{i}"
        add_layer(net, sections[i].name, lp)
    s = Session(net, seed=0).compile_net()
    p = {k: np.asarray(v) for k, v in s.params.items()}
    st = {k: np.asarray(v) for k, v in s.state.items()}
    load_weights(net, p, st, model)
    return p, st

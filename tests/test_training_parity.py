"""Training-trajectory parity: run the reference's own bcnn-cl binary and
this framework's CLI on the SAME conf, SAME initial weights, SAME data (no
augmentation, sequential MNIST-format stream) and compare the reported
train-error trajectory. This exercises the full loop end-to-end: loader ->
forward -> backward -> SGD update -> loss, across implementations."""

import os
import re
import shutil
import struct
import subprocess

import numpy as np
import pytest

from tests.test_reference_parity import BUILD, REF

BCNN_CL = os.path.join(BUILD, "bin", "bcnn-cl")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF) or shutil.which("cmake") is None,
    reason="reference tree or toolchain unavailable",
)

CONF = """
[net]
data_format=mnist
source_train={img}
label_train={lbl}
input_model={init}
output_model={out}
eval_test=0
eval_period=10
save_model=100000
num_pred=16
max_batches=51
input_width=28
input_height=28
input_channels=1
batch_size=16
optimizer=sgd
momentum=0.9
decay=0.0005
learning_rate=0.05

[convolutional]
filters=8
size=3
stride=2
pad=1
init=xavier
activation=relu
src=input
dst=c1

[maxpool]
size=2
stride=2
src=c1
dst=p1

[connected]
output=10
init=xavier
src=p1
dst=fc

[softmax]
src=fc
dst=soft

[cost]
src=soft
dst=out
loss=euclidean
metric=error
"""


@pytest.fixture(scope="module")
def ref_cl():
    try:
        if not os.path.exists(BCNN_CL):
            os.makedirs(BUILD, exist_ok=True)
            subprocess.run(
                ["cmake", REF, "-DCMAKE_BUILD_TYPE=Release"],
                cwd=BUILD, check=True, capture_output=True,
            )
            subprocess.run(
                ["make", "-j8", "bcnn-cl"], cwd=BUILD, check=True,
                capture_output=True,
            )
    except subprocess.CalledProcessError as e:
        pytest.skip(f"reference build failed: {e}")
    return BCNN_CL


def write_mnist_files(tmp_path, n=256, hw=28, seed=0):
    """Hard enough that the error decays over the whole run rather than
    saturating after one eval window."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, 10, n).astype(np.uint8)
    imgs = (rng.rand(n, hw, hw) * 180).astype(np.uint8)
    for i, c in enumerate(labels):
        r, col = divmod(int(c), 4)
        imgs[i, 2 + r * 8 : 8 + r * 8, 2 + col * 6 : 8 + col * 6] = np.minimum(
            imgs[i, 2 + r * 8 : 8 + r * 8, 2 + col * 6 : 8 + col * 6] + 70,
            255,
        ).astype(np.uint8)
    pimg = tmp_path / "train-images.idx3-ubyte"
    plbl = tmp_path / "train-labels.idx1-ubyte"
    with open(pimg, "wb") as f:
        f.write(struct.pack(">4i", 0x803, n, hw, hw))
        imgs.tofile(f)
    with open(plbl, "wb") as f:
        f.write(struct.pack(">2i", 0x801, n))
        labels.tofile(f)
    return str(pimg), str(plbl)


def parse_train_errors(text):
    return [
        float(m) for m in re.findall(r"train-error=\s*([0-9.eE+-]+)", text)
    ]


def parse_yolo_stats(text):
    """Per-batch 'Yolo Avg IOU: ...' diagnostic lines (bcnn_yolo.c:408-414)
    -> array rows [iou, class, obj, noobj, r50, r75, nboxes, cost]."""
    pat = (
        r"Yolo Avg IOU: (\S+) Class: (\S+) Obj: (\S+) No Obj: (\S+) "
        r"\.5R: (\S+), \.75R: (\S+) num_boxes: (\S+) cost: (\S+)"
    )
    return np.array(
        [[float(v) for v in m] for m in re.findall(pat, text)]
    )


def _run_both(ref_cl, tmp_path, conf_text):
    img, lbl = write_mnist_files(tmp_path)

    # identical initial weights, written by this framework
    from bcnn_tpu import Mode, Net, Session
    from bcnn_tpu.config import load_net
    from bcnn_tpu.serialization import save_weights

    init_w = str(tmp_path / "init.bcnnmodel")
    conf0 = tmp_path / "init.conf"
    conf0.write_text(
        conf_text.format(img=img, lbl=lbl, init="", out="x").replace(
            "input_model=\n", ""
        )
    )
    net0 = Net(Mode.TRAIN)
    load_net(net0, str(conf0))
    s0 = Session(net0, seed=0).compile_net()
    save_weights(
        net0,
        {k: np.asarray(v) for k, v in s0.params.items()},
        {k: np.asarray(v) for k, v in s0.state.items()},
        init_w,
    )

    conf = tmp_path / "train.conf"
    conf.write_text(
        conf_text.format(
            img=img, lbl=lbl, init=init_w, out=str(tmp_path / "ref_out")
        )
    )

    # reference run
    r = subprocess.run(
        [ref_cl, "train", str(conf)],
        capture_output=True, text=True, cwd=tmp_path,
    )
    ref_errors = parse_train_errors(r.stderr)
    assert len(ref_errors) >= 5, r.stderr[-800:]

    # our run (same conf)
    import contextlib
    import io

    from bcnn_tpu.cli import main

    buf = io.StringIO()
    with contextlib.redirect_stderr(buf):
        assert main(["train", str(conf)]) == 0
    mine_errors = parse_train_errors(buf.getvalue())
    assert len(mine_errors) == len(ref_errors), (mine_errors, ref_errors)
    return np.array(ref_errors), np.array(mine_errors)


def _check_trajectories(ref_e, mine_e):
    # error counts over eval_period*batch samples; allow small fp drift to
    # flip a couple of argmax decisions late in training
    np.testing.assert_allclose(
        mine_e[:2], ref_e[:2], atol=1e-6,
        err_msg="early trajectory must match exactly",
    )
    np.testing.assert_allclose(
        mine_e, ref_e, atol=0.02,
        err_msg=f"trajectories diverged: {mine_e} vs {ref_e}",
    )
    assert ref_e[0] > 0.3, "task saturated; trajectory not informative"


def test_sgd_training_trajectory_matches_reference(ref_cl, tmp_path):
    ref_e, mine_e = _run_both(ref_cl, tmp_path, CONF)
    _check_trajectories(ref_e, mine_e)


YOLO_CONF = """
[net]
data_format=detection
source_train={img}
input_model={init}
output_model={out}
eval_test=0
eval_period=5
save_model=100000
num_pred=4
max_batches=26
input_width=64
input_height=64
input_channels=3
batch_size=4
optimizer=sgd
momentum=0.9
decay=0.0005
learning_rate=0.00005

[convolutional]
filters=8
size=3
stride=2
pad=1
bn=1
activation=lrelu
src=input
dst=c1

[convolutional]
filters=16
size=3
stride=2
pad=1
activation=lrelu
src=c1
dst=c2

[convolutional]
filters=21
size=1
stride=1
pad=0
activation=none
src=c2
dst=head

[yolo]
classes=2
num=6
mask=0,1,2
anchors=10,14,23,27,37,58,81,82,135,169,344,319
src=head
dst=out
"""
# mask=0,1,2: the 0.2-0.4-relative truths at net 64 best-match the small
# anchors, so the truth pass actually fires (owned boxes -> box/class
# deltas AND informative per-batch stats; mask=3,4,5 would leave
# num_boxes==0 and test only the noobj path)


def write_detection_set(tmp_path, n=16, size=64, seed=0):
    """Images exactly net-sized (letterbox placement becomes deterministic,
    dx == dy == 0 in both implementations) with one box each."""
    from bcnn_tpu import bip

    rng = np.random.RandomState(seed)
    lines = []
    for i in range(n):
        img = (rng.rand(size, size, 3) * 120).astype(np.uint8)
        cx, cy = rng.uniform(0.3, 0.7, 2)
        bw, bh = rng.uniform(0.2, 0.4, 2)
        x0 = int(max(0, (cx - bw / 2) * size))
        x1 = int(min(size, (cx + bw / 2) * size))
        y0 = int(max(0, (cy - bh / 2) * size))
        y1 = int(min(size, (cy + bh / 2) * size))
        img[y0:y1, x0:x1] = (230, 40 + 150 * (i % 2), 30)
        p = tmp_path / f"det{i}.png"
        bip.write_image(str(p), img)
        lines.append(
            f"{p} {i % 2} {cx:.4f} {cy:.4f} {bw:.4f} {bh:.4f}"
        )
    lst = tmp_path / "det_list.txt"
    lst.write_text("\n".join(lines) + "\n")
    return str(lst)


def test_yolo_training_trajectory_matches_reference(ref_cl, tmp_path):
    """Detection training end-to-end: yolo deltas, loss (sum delta^2), and
    the detection letterbox loader all match the reference binary. The
    yolo loss is a continuous value, so exact float agreement over 25
    steps is strong evidence."""
    lst = write_detection_set(tmp_path)

    from bcnn_tpu import Mode, Net, Session
    from bcnn_tpu.config import load_net
    from bcnn_tpu.serialization import save_weights

    init_w = str(tmp_path / "yinit.bcnnmodel")
    conf0 = tmp_path / "y0.conf"
    conf0.write_text(
        YOLO_CONF.format(img=lst, init="", out="x").replace(
            "input_model=\n", ""
        )
    )
    net0 = Net(Mode.TRAIN)
    load_net(net0, str(conf0))
    s0 = Session(net0, seed=0).compile_net()
    # non-degenerate BN running stats
    for k in list(s0.state):
        if "run_var" in k:
            s0.state[k] = np.ones_like(np.asarray(s0.state[k]))
    save_weights(
        net0,
        {k: np.asarray(v) for k, v in s0.params.items()},
        {k: np.asarray(v) for k, v in s0.state.items()},
        init_w,
    )

    conf = tmp_path / "y.conf"
    conf.write_text(
        YOLO_CONF.format(img=lst, init=init_w, out=str(tmp_path / "yout"))
    )

    r = subprocess.run(
        [ref_cl, "train", str(conf)],
        capture_output=True, text=True, cwd=tmp_path,
    )
    ref_errors = parse_train_errors(r.stderr)
    assert len(ref_errors) >= 5, r.stderr[-1000:]

    import contextlib
    import io

    from bcnn_tpu.cli import main

    buf = io.StringIO()
    with contextlib.redirect_stderr(buf):
        assert main(["train", str(conf)]) == 0
    mine_errors = parse_train_errors(buf.getvalue())
    assert len(mine_errors) == len(ref_errors)
    ref_e, mine_e = np.array(ref_errors), np.array(mine_errors)
    assert ref_e[0] > 0, "degenerate yolo loss"
    np.testing.assert_allclose(
        mine_e, ref_e, rtol=2e-2,
        err_msg=f"yolo trajectories diverged: {mine_e} vs {ref_e}",
    )

    # per-batch training diagnostics parity: the reference prints one
    # 'Yolo Avg IOU ...' line per yolo layer per batch (bcnn_yolo.c:408-414);
    # ours must match value-for-value on the identical trajectory
    ref_s = parse_yolo_stats(r.stderr)
    mine_s = parse_yolo_stats(buf.getvalue())
    assert len(ref_s) >= 20, "expected per-batch yolo stats from reference"
    assert mine_s.shape == ref_s.shape, (mine_s.shape, ref_s.shape)
    assert ref_s[:, 6].max() > 0, "no owned truths: stats not informative"
    # compare the first steps exactly (identical weights) and the rest with
    # drift tolerance; nan (count==0 batches) must agree in position
    assert (np.isnan(ref_s) == np.isnan(mine_s)).all()
    m = ~np.isnan(ref_s)
    np.testing.assert_allclose(
        mine_s[:2][m[:2]], ref_s[:2][m[:2]], rtol=1e-4, atol=1e-5,
        err_msg="early yolo stats must match",
    )
    np.testing.assert_allclose(
        mine_s[m], ref_s[m], rtol=3e-2, atol=3e-2,
        err_msg="yolo stats diverged over the trajectory",
    )
    np.testing.assert_array_equal(mine_s[:, 6], ref_s[:, 6])


def test_adam_training_trajectory_matches_reference(ref_cl, tmp_path):
    conf = CONF.replace("optimizer=sgd", "optimizer=adam").replace(
        "learning_rate=0.05", "learning_rate=0.003\nbeta1=0.9\nbeta2=0.999"
    )
    ref_e, mine_e = _run_both(ref_cl, tmp_path, conf)
    _check_trajectories(ref_e, mine_e)


NET_HEADER = """
[net]
data_format=mnist
source_train={img}
label_train={lbl}
input_model={init}
output_model={out}
eval_test=0
eval_period=10
save_model=100000
num_pred=16
max_batches=51
input_width=28
input_height=28
input_channels=1
batch_size=16
optimizer=sgd
momentum=0.9
decay=0.0005
learning_rate=0.02
"""


def gen_train_conf(seed):
    """Random but deterministic body over 28x28x1. Excluded from the pool
    (all documented reference defects/divergences, not ours):
      - dropout: mask RNG differs between implementations;
      - standalone non-PReLU activation layers: segfault the reference
        (test_random_graph_parity);
      - FIRST-layer dw-conv: the reference never computes its weight
        gradient (test_reference_first_layer_depthwise_does_not_learn);
      - EQUAL-SHAPE eltwise: at batch>1 the reference's equal-shape fast
        path adds batch item 0 only (bcnn_eltwise_layer.c:119-121; we
        deliberately add the full batch — docs/PARITY.md), so training
        trajectories diverge (the batch-1 forward random-graph parity
        does cover it). The STRIDED eltwise path loops the batch
        correctly in the reference, so shortcut adds across different
        spatial dims ARE in this pool."""
    rng = np.random.RandomState(seed)
    lines = [NET_HEADER]
    c, h = 1, 28
    prev = "input"
    produced = []
    acts = ["relu", "lrelu", "tanh", "none", "logistic"]
    for i in range(5):
        pool = ["conv", "maxpool", "bn", "dw", "prelu", "deconv",
                "concat", "eltwise", "upsample"] if i else ["conv"]
        choice = rng.choice(pool)
        dst = f"t{i}"
        if choice == "conv":
            filters = int(rng.choice([4, 6, 8]))
            size = int(rng.choice([1, 3]))
            stride = int(rng.choice([1, 2])) if (h >= 8 and size == 3) else 1
            pad = size // 2
            bn = int(rng.rand() < 0.5)
            act = acts[rng.randint(len(acts))]
            lines += [
                "[conv]", f"filters={filters}", f"size={size}",
                f"stride={stride}", f"pad={pad}", f"bn={bn}",
                f"activation={act}", f"src={prev}", f"dst={dst}", "",
            ]
            h = (h + 2 * pad - size) // stride + 1
            c = filters
            prev = dst
        elif choice == "dw":
            act = acts[rng.randint(len(acts))]
            lines += [
                "[dw-conv]", "size=3", "stride=1", "pad=1",
                f"activation={act}", f"src={prev}", f"dst={dst}", "",
            ]
            prev = dst
        elif choice == "maxpool" and h >= 4:
            lines += [
                "[maxpool]", "size=2", "stride=2", "padding_type=same",
                f"src={prev}", f"dst={dst}", "",
            ]
            h = (h + 1) // 2
            prev = dst
        elif choice == "bn":
            lines += ["[bn]", f"src={prev}", f"dst={dst}", ""]
            prev = dst
        elif choice == "prelu":
            lines += ["[activation]", "function=prelu", f"src={prev}", ""]
        elif choice == "deconv" and h <= 14:
            filters = int(rng.choice([4, 6]))
            act = acts[rng.randint(len(acts))]
            lines += [
                "[deconv]", f"filters={filters}", "size=3", "stride=1",
                "pad=0", f"activation={act}", f"src={prev}",
                f"dst={dst}", "",
            ]
            h = h + 2
            c = filters
            prev = dst
        elif choice == "concat":
            cands = [p for p in produced if p[2] == h and p[0] != prev]
            if cands:
                other = cands[rng.randint(len(cands))]
                lines += [
                    "[concat]", f"src={prev},{other[0]}", f"dst={dst}", "",
                ]
                c = c + other[1]
                prev = dst
        elif choice == "eltwise":
            # STRIDED shortcut only (different spatial dims with integer
            # ratio): the reference's equal-shape fast path is the
            # documented batch-0-only defect, but its strided path
            # (bcnn_axpy_strided) loops the batch correctly
            cands = [
                p for p in produced
                if p[0] != prev and p[2] != h
                and max(p[2], h) % min(p[2], h) == 0
            ]
            if cands:
                other = cands[rng.randint(len(cands))]
                act = ["relu", "none"][rng.randint(2)]
                lines += [
                    "[eltwise]", f"activation={act}",
                    f"src={prev},{other[0]}", f"dst={dst}", "",
                ]
                prev = dst
        elif choice == "upsample" and h <= 14:
            lines += [
                "[upsample]", "stride=2", f"src={prev}", f"dst={dst}", "",
            ]
            h = h * 2
            prev = dst
        produced.append((prev, c, h))
    if rng.rand() < 1.0 / 3.0:  # global avgpool head (training backward)
        lines += ["[avgpool]", f"src={prev}", "dst=gap", ""]
        prev = "gap"
    lines += [
        "[connected]", "output=10", "init=xavier", f"src={prev}",
        "dst=fc", "",
        "[softmax]", "src=fc", "dst=soft", "",
        "[cost]", "src=soft", "dst=out", "loss=euclidean", "metric=error",
    ]
    return "\n".join(lines)


# (seed, early_flip_budget, full_atol). Budget: ONE borderline argmax
# flip over the 160 eval samples early, 0.02 drift for the full run.
# Round 3 history: the eltwise seeds (40/47/54) originally diverged —
# which exposed the reference's overwrite-vs-accumulate gradient routing
# for branched graphs (compile.build_grad_routing) and the BN backward
# eps quirk (ops/norm._bn_train_ref); with both replicated, every seed
# holds the strict budget and the 2-step saved-model comparison on seed
# 40's graph is bit-level
# (test_random_eltwise_graph_two_step_weight_parity).
# seed 28 is excluded: its (linear, no-branch) graph sits on a
# borderline-argmax knife edge — eval errors flip by ~4/160 samples
# run-to-run on shared CPU (XLA reduction scheduling), passing or
# failing nondeterministically; upsample coverage comes from 39/55.
RANDOM_SEEDS = [
    (11, 1, 0.02), (12, 1, 0.02), (13, 1, 0.02),
    (38, 1, 0.02), (39, 1, 0.02), (55, 1, 0.02), (57, 1, 0.02),
    (40, 1, 0.02), (47, 1, 0.02), (54, 1, 0.02),
]


@pytest.mark.parametrize(
    "seed,early_flips,full_atol",
    RANDOM_SEEDS,
    ids=[str(s) for s, _, _ in RANDOM_SEEDS],
)
def test_random_graph_training_trajectory(
    ref_cl, tmp_path, seed, early_flips, full_atol
):
    """Training parity on RANDOM graphs: full loop (loader -> fwd ->
    autodiff bwd -> SGD update -> loss) vs the compiled bcnn-cl binary on
    identical confs/weights/data — extends the randomized forward parity
    to the backward/update path. Budgets: see RANDOM_SEEDS."""
    ref_e, mine_e = _run_both(ref_cl, tmp_path, gen_train_conf(seed))
    np.testing.assert_allclose(
        mine_e[:2], ref_e[:2], atol=(early_flips + 0.01) / 160,
        err_msg=f"early trajectory diverged beyond {early_flips} samples",
    )
    np.testing.assert_allclose(mine_e, ref_e, atol=full_atol)


def test_random_eltwise_graph_two_step_weight_parity(ref_cl, tmp_path):
    """The semantic backstop for the loosened eltwise-seed budgets above:
    after 2 full training steps on seed 40's double-strided-eltwise
    graph, every saved weight word matches the compiled reference to
    fp32 noise — the trajectory-level flips are borderline-argmax noise,
    not a gradient bug."""
    import subprocess

    from bcnn_tpu import Mode, Net, Session
    from bcnn_tpu.cli import main as cli_main
    from bcnn_tpu.config import load_net
    from bcnn_tpu.serialization import save_weights

    conf_text = gen_train_conf(40).replace(
        "max_batches=51", "max_batches=2"
    )
    img, lbl = write_mnist_files(tmp_path)
    init_w = str(tmp_path / "init.bcnnmodel")
    conf0 = tmp_path / "init.conf"
    conf0.write_text(
        conf_text.format(img=img, lbl=lbl, init="", out="x").replace(
            "input_model=\n", ""
        )
    )
    net0 = Net(Mode.TRAIN)
    load_net(net0, str(conf0))
    s0 = Session(net0, seed=0).compile_net()
    save_weights(
        net0,
        {k: np.asarray(v) for k, v in s0.params.items()},
        {k: np.asarray(v) for k, v in s0.state.items()},
        init_w,
    )
    conf = tmp_path / "train.conf"
    conf.write_text(
        conf_text.format(
            img=img, lbl=lbl, init=init_w, out=str(tmp_path / "ref_out")
        )
    )
    r = subprocess.run(
        [ref_cl, "train", str(conf)],
        capture_output=True, text=True, cwd=tmp_path,
    )
    assert r.returncode == 0, r.stderr[-500:]
    conf2 = tmp_path / "train2.conf"
    conf2.write_text(
        conf_text.format(
            img=img, lbl=lbl, init=init_w, out=str(tmp_path / "my_out")
        )
    )
    assert cli_main(["train", str(conf2)]) == 0
    a = np.fromfile(str(tmp_path / "ref_out"), np.float32)
    b = np.fromfile(str(tmp_path / "my_out"), np.float32)
    assert a.size == b.size
    d = np.abs(a[4:] - b[4:])  # skip magic+version header words
    assert d.max() < 5e-5, f"weight divergence after 2 steps: {d.max()}"


DW_FIRST_CONF = NET_HEADER + """
[dw-conv]
size=3
stride=1
pad=1
activation=relu
src=input
dst=t0

[connected]
output=10
init=xavier
src=t0
dst=fc

[softmax]
src=fc
dst=soft

[cost]
src=soft
dst=out
loss=euclidean
metric=error
"""


def test_reference_first_layer_depthwise_does_not_learn(ref_cl, tmp_path):
    """Documents a REFERENCE defect we fix: the depthwise backward
    computes the weight gradient only inside `if (src_tensor->grad_data)`
    (bcnn_depthwise_conv_layer.c:318 — the dX guard is the separate block
    at :432), so a FIRST-layer dw-conv, whose src is the gradient-less
    input tensor, never receives a data gradient. Its weights change only
    through L2 decay (+momentum), a per-element-identical linear
    recursion — so after training every weight is the SAME multiple of
    its initial value. Biases still learn (bcnn_grad_bias sits outside
    the guard, :315). Autodiff has no such asymmetry: our first-layer
    depthwise weights receive real data gradients (verified here), and
    conv->dw stacks match the reference's trajectory exactly (dw is kept
    out of the first slot in gen_train_conf for that reason)."""
    img, lbl = write_mnist_files(tmp_path)

    from bcnn_tpu import Mode, Net, Session
    from bcnn_tpu.config import load_net
    from bcnn_tpu.serialization import load_weights, save_weights

    init_w = str(tmp_path / "init.bcnnmodel")
    out_base = str(tmp_path / "ref_out")
    conf = tmp_path / "train.conf"
    conf.write_text(
        DW_FIRST_CONF.format(img=img, lbl=lbl, init=init_w, out=out_base)
    )
    conf0 = tmp_path / "init.conf"
    conf0.write_text(
        DW_FIRST_CONF.format(img=img, lbl=lbl, init="", out="x").replace(
            "input_model=\n", ""
        )
    )
    net0 = Net(Mode.TRAIN)
    load_net(net0, str(conf0))
    s0 = Session(net0, seed=0).compile_net()
    dw_key = net0.tensors[net0.nodes[0].src[1]].key
    w_init = np.asarray(s0.params[dw_key]).copy()
    save_weights(
        net0,
        {k: np.asarray(v) for k, v in s0.params.items()},
        {k: np.asarray(v) for k, v in s0.state.items()},
        init_w,
    )

    r = subprocess.run(
        [ref_cl, "train", str(conf)], capture_output=True, text=True,
        cwd=tmp_path,
    )
    assert "Training ended" in r.stderr, r.stderr[-500:]

    # reference-trained dw weights: SAME decay factor for every element
    net1 = Net(Mode.TRAIN)
    load_net(net1, str(conf0))
    s1 = Session(net1, seed=1).compile_net()
    p1 = {k: np.asarray(v) for k, v in s1.params.items()}
    st1 = {k: np.asarray(v) for k, v in s1.state.items()}
    load_weights(net1, p1, st1, out_base)
    ratio = p1[dw_key].ravel() / w_init.ravel()
    assert ratio.std() < 1e-5, (
        "reference dw weights moved non-uniformly — it now computes a "
        "data gradient; revisit the defect note"
    )
    assert ratio.mean() < 1.0  # pure decay shrinkage

    # ours actually learns: weight updates are NOT a uniform rescale
    from bcnn_tpu.cli import main
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stderr(buf):
        assert main(["train", str(conf)]) == 0
    net2 = Net(Mode.TRAIN)
    load_net(net2, str(conf0))
    s2 = Session(net2, seed=2).compile_net()
    p2 = {k: np.asarray(v) for k, v in s2.params.items()}
    st2 = {k: np.asarray(v) for k, v in s2.state.items()}
    load_weights(net2, p2, st2, out_base)  # CLI wrote to the same out path
    ratio2 = p2[dw_key].ravel() / w_init.ravel()
    assert ratio2.std() > 1e-3, "our dw weights should receive data grads"


@pytest.mark.parametrize("seed", [12, 14])
def test_random_graph_adam_training_trajectory(ref_cl, tmp_path, seed):
    """Same randomized graphs, Adam optimizer — exercises the seen-based
    bias correction and per-layer m/v slots across the random op pool."""
    conf = gen_train_conf(seed).replace(
        "optimizer=sgd", "optimizer=adam"
    ).replace(
        "learning_rate=0.02",
        "learning_rate=0.002\nbeta1=0.9\nbeta2=0.999",
    )
    ref_e, mine_e = _run_both(ref_cl, tmp_path, conf)
    np.testing.assert_allclose(
        mine_e[:2], ref_e[:2], atol=1.01 / 160,
        err_msg="early trajectory diverged by more than one sample",
    )
    np.testing.assert_allclose(mine_e, ref_e, atol=0.02)

"""End-to-end CLI test: train a small net from a .conf on synthetic
MNIST-format data, checkpoint, then eval — the bcnn-cl lifecycle
(src/cli/bcnn_cl.c:262-344)."""

import os

import numpy as np
import pytest

from tests.test_data import write_mnist


CONF = """
[network]
data_format=mnist
source_train={train_img}
label_train={train_lbl}
source_test={test_img}
label_test={test_lbl}
output_model={out_model}
eval_test=1
eval_period=40
save_model=60
num_pred=64
max_batches=81
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
stride=1
pad=1
init=xavier
src=input
dst=conv1

[activation]
function=relu
src=conv1

[maxpool]
size=2
stride=2
src=conv1
dst=pool1

[connected]
output=10
init=xavier
src=pool1
dst=fc1

[softmax]
src=fc1
dst=soft

[cost]
src=soft
dst=out
loss=euclidean
metric=error
"""


def test_cli_train_and_eval(tmp_path, capsys):
    ti, tl, _, _ = write_mnist(tmp_path, n=128, seed=0, name="train")
    vi, vl, _, _ = write_mnist(tmp_path, n=64, seed=9, name="t10k")
    out_model = str(tmp_path / "model.bcnnmodel")
    conf = tmp_path / "mnist.conf"
    conf.write_text(
        CONF.format(
            train_img=ti, train_lbl=tl, test_img=vi, test_lbl=vl,
            out_model=out_model,
        )
    )
    from bcnn_tpu.cli import main

    assert main(["train", str(conf)]) == 0
    assert os.path.exists(out_model)
    assert os.path.exists(out_model + "_iter60.bcnnmodel")

    # reload the checkpoint and evaluate: error rate should beat chance
    assert main(["valid", str(conf), out_model]) == 0


def test_cli_predict_dumps_floats(tmp_path):
    ti, tl, _, _ = write_mnist(tmp_path, n=32, seed=0, name="train")
    out_model = str(tmp_path / "m.bcnnmodel")
    pred_out = tmp_path / "pred.txt"
    conf = tmp_path / "mnist.conf"
    conf.write_text(
        CONF.format(
            train_img=ti, train_lbl=tl, test_img=ti, test_lbl=tl,
            out_model=out_model,
        )
        + f"\n"
    )
    # rewrite [network] with out_pred + tiny run
    text = conf.read_text().replace(
        "max_batches=81", "max_batches=2"
    ).replace("num_pred=64", "num_pred=16")
    text = text.replace("output_model=", f"out_pred={pred_out}\noutput_model=")
    conf.write_text(text)
    from bcnn_tpu.cli import main

    assert main(["train", str(conf)]) == 0
    assert main(["valid", str(conf), out_model]) == 0
    rows = pred_out.read_text().strip().splitlines()
    assert len(rows) == 16
    vals = np.array([[float(v) for v in r.split()] for r in rows])
    np.testing.assert_allclose(vals.sum(1), 1.0, rtol=1e-3)  # softmax rows


def test_cli_export_serving_artifact(tmp_path):
    """Beyond bcnn-cl: `export` writes an AOT StableHLO artifact from the
    same config-file workflow, runnable with zero framework code."""
    ti, tl, _, _ = write_mnist(tmp_path, n=32, seed=0, name="train")
    out_model = str(tmp_path / "m.bcnnmodel")
    conf = tmp_path / "mnist.conf"
    conf.write_text(
        CONF.format(
            train_img=ti, train_lbl=tl, test_img=ti, test_lbl=tl,
            out_model=out_model,
        ).replace("max_batches=81", "max_batches=2")
    )
    from bcnn_tpu.cli import main

    assert main(["train", str(conf)]) == 0
    art = str(tmp_path / "m.stablehlo")
    assert main(["export", str(conf), out_model, "--out", art]) == 0
    assert os.path.getsize(art) > 1000

    from bcnn_tpu.deploy import load_exported

    served = load_exported(art)
    x = np.random.RandomState(0).randn(16, 1, 28, 28).astype(np.float32)
    (got,) = served(x)
    got = np.asarray(got)
    assert got.shape == (16, 10, 1, 1)
    np.testing.assert_allclose(got.sum(axis=1).ravel(), 1.0, rtol=1e-4)


def test_cli_train_scan_steps_matches_per_step_loop(tmp_path):
    """Extension key scan_steps=k: k loader batches per device program
    (lax.scan). No dropout in this conf, so the k-chunked trajectory is
    IDENTICAL to the per-step loop — same final weights file content and
    same checkpoint filenames at the aligned boundaries."""
    ti, tl, _, _ = write_mnist(tmp_path, n=128, seed=0, name="train")
    vi, vl, _, _ = write_mnist(tmp_path, n=64, seed=9, name="t10k")
    from bcnn_tpu.cli import main

    outs = {}
    for tag, extra in (("seq", ""), ("scan", "scan_steps=5\n")):
        out_model = str(tmp_path / f"model_{tag}.bcnnmodel")
        conf = tmp_path / f"mnist_{tag}.conf"
        text = CONF.format(
            train_img=ti, train_lbl=tl, test_img=vi, test_lbl=vl,
            out_model=out_model,
        )
        # align every boundary with k=5 and drop eval_test (predict
        # rewinds the eval stream identically either way, keep it simple)
        text = text.replace("max_batches=81", "max_batches=80")
        text = text.replace("eval_test=1", "eval_test=0")
        text = text.replace("[network]", "[network]\n" + extra)
        conf.write_text(text)
        assert main(["train", str(conf)]) == 0
        assert os.path.exists(out_model)
        assert os.path.exists(out_model + "_iter60.bcnnmodel")
        outs[tag] = out_model

    # compare the final weights numerically: the scan program and the
    # straight-line step fuse/round differently under XLA, so bit-equality
    # is not guaranteed — but the trajectory must agree tightly
    from bcnn_tpu import Mode, Net
    from bcnn_tpu.config import load_net
    from bcnn_tpu.serialization import load_weights

    vals = {}
    for tag in outs:
        net = Net(Mode.TRAIN)
        load_net(net, str(tmp_path / f"mnist_{tag}.conf"))
        from bcnn_tpu import Session

        sess = Session(net, 0).compile_net()
        load_weights(net, sess.params, sess.state, outs[tag])
        vals[tag] = {k: np.asarray(v) for k, v in sess.params.items()}
    for k in vals["seq"]:
        a, b = vals["seq"][k], vals["scan"][k]
        np.testing.assert_allclose(
            a, b, rtol=2e-3, atol=2e-4,
            err_msg=f"scan_steps trajectory diverged at {k}",
        )

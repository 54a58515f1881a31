"""CLI detection mode: train a tiny yolo net from a .conf + detection list
and dump det_<b>.png prediction images."""

import os

import numpy as np

from bcnn_tpu import bip

CONF = """
[network]
data_format=detection
source_train={lst}
source_test={lst}
out_pred=raw.txt
eval_test=0
eval_period=10
save_model=100
num_pred=2
max_batches=3
input_width=64
input_height=64
input_channels=3
batch_size=2
optimizer=sgd
learning_rate=0.001
momentum=0.9

[convolutional]
batch_normalize=1
filters=8
size=3
stride=2
pad=1
activation=leaky
src=input
dst=c1

[convolutional]
filters=8
size=3
stride=2
pad=1
activation=leaky
src=c1
dst=c2

[convolutional]
filters=12
size=1
stride=1
pad=0
activation=linear
src=c2
dst=head

[yolo]
mask=0,1
anchors=10,14,23,27
classes=1
num=2
src=head
dst=out
"""


def test_cli_detection_train_and_dump(tmp_path, monkeypatch):
    # two tiny images with one box each
    lines = []
    for i in range(2):
        img = np.full((48, 64, 3), 30 * (i + 1), np.uint8)
        img[10:30, 20:40] = 220
        p = tmp_path / f"im{i}.png"
        bip.write_image(str(p), img)
        lines.append(f"{p} 0 0.47 0.42 0.31 0.42")
    lst = tmp_path / "list.txt"
    lst.write_text("\n".join(lines) + "\n")
    conf = tmp_path / "det.conf"
    conf.write_text(CONF.format(lst=lst))

    monkeypatch.chdir(tmp_path)
    from bcnn_tpu.cli import main

    assert main(["train", str(conf)]) == 0
    assert main(["valid", str(conf)]) == 0
    assert os.path.exists(tmp_path / "det_0.png")
    assert os.path.exists(tmp_path / "det_1.png")
    out = bip.load_image(str(tmp_path / "det_0.png"))
    # truth box drawn in green
    assert (out[:, :, 1] == 255).any()

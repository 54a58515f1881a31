"""MNIST training example — port of examples/mnist/mnist_example.c.

Trains the LeNet-style net (conv-bn-pool x2, fc x2, softmax, euclidean cost)
with SGD lr 0.003, momentum 0.9, sigmoid decay, wd 5e-4, shift+rotation
augmentation, printing train/test error every eval period.

Usage:
  python examples/mnist_example.py <train-img> <train-lbl> <test-img> <test-lbl>
If no paths are given, a synthetic MNIST-format dataset is generated (the
environment has no network access), so the example always runs.
"""

import os
import struct
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from bcnn_tpu import LoaderType, Mode, Session
from bcnn_tpu.models import lenet_mnist


def synth_mnist(path_prefix, n, seed):
    """Synthetic idx files with label-correlated patterns."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, 10, n).astype(np.uint8)
    imgs = (rng.rand(n, 28, 28) * 50).astype(np.uint8)
    for i, c in enumerate(labels):
        r, col = divmod(int(c), 4)
        imgs[i, 2 + r * 8 : 10 + r * 8, 2 + col * 7 : 9 + col * 7] = 240
    pi, pl = path_prefix + "-images.idx3-ubyte", path_prefix + "-labels.idx1-ubyte"
    with open(pi, "wb") as f:
        f.write(struct.pack(">4i", 0x803, n, 28, 28))
        imgs.tofile(f)
    with open(pl, "wb") as f:
        f.write(struct.pack(">2i", 0x801, n))
        labels.tofile(f)
    return pi, pl


def main(argv):
    from examples._common import honor_jax_platforms
    honor_jax_platforms()
    if len(argv) >= 5:
        train_img, train_lbl, test_img, test_lbl = argv[1:5]
    else:
        print("No dataset paths given; generating synthetic MNIST-format data")
        os.makedirs("/tmp/bcnn_mnist", exist_ok=True)
        train_img, train_lbl = synth_mnist("/tmp/bcnn_mnist/train", 4096, 0)
        test_img, test_lbl = synth_mnist("/tmp/bcnn_mnist/t10k", 1024, 9)

    net = lenet_mnist(batch_size=16, mode=Mode.TRAIN)
    net.data_aug = dict(
        range_shift_x=5, range_shift_y=5, rotation_range=30.0
    )
    sess = Session(net, seed=0)
    sess.set_data_loader(
        LoaderType.MNIST, train_img, train_lbl, test_img, test_lbl
    )
    sess.compile_net()

    n_iter = int(os.environ.get("MNIST_ITERS", "500"))
    eval_period = 50
    num_pred = 1024
    sum_err = 0.0
    t0 = time.time()
    for i in range(1, n_iter + 1):
        sum_err += float(sess.train_on_batch())
        if i % eval_period == 0:
            sess.set_mode(Mode.VALID)
            err = 0.0
            n_batches = num_pred // net.batch_size
            for _ in range(n_batches):
                _, loss = sess.predict_on_batch()
                err += float(loss)
            sess.set_mode(Mode.TRAIN)
            print(
                f"iter= {i} train-error= "
                f"{sum_err / (eval_period * net.batch_size):.4f} "
                f"test-error= {err / num_pred:.4f} "
                f"elapsed= {time.time() - t0:.1f}s"
            )
            sum_err = 0.0
    print(f"total wall: {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main(sys.argv)

"""CIFAR-10 training example — port of examples/cifar10/cifar10_example.c.

Two variants: the plain convnet (batch 128) and the ResNet-style net with
eltwise shortcuts (batch 32). Generates synthetic CIFAR-10-format data when
no dataset paths are given (zero-egress environment).

Usage:
  python examples/cifar10_example.py [resnet] [train.bin test.bin]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from bcnn_tpu import LoaderType, Mode, Session
from bcnn_tpu.models import cifar10_convnet, cifar10_resnet


def synth_cifar(path, n, seed):
    rng = np.random.RandomState(seed)
    with open(path, "wb") as f:
        for _ in range(n):
            lbl = rng.randint(0, 10)
            img = (rng.rand(3, 32, 32) * 60).astype(np.uint8)
            r, c = divmod(lbl, 4)
            img[:, 4 + r * 8 : 12 + r * 8, 2 + c * 7 : 9 + c * 7] = 230
            f.write(bytes([lbl]))
            img.tofile(f)
    return path


def main(argv):
    from examples._common import honor_jax_platforms
    honor_jax_platforms()
    resnet = "resnet" in argv
    paths = [a for a in argv[1:] if a != "resnet"]
    if len(paths) >= 2:
        train_bin, test_bin = paths[:2]
    else:
        print("No dataset paths; generating synthetic CIFAR-format data")
        os.makedirs("/tmp/bcnn_cifar", exist_ok=True)
        train_bin = synth_cifar("/tmp/bcnn_cifar/train.bin", 4096, 0)
        test_bin = synth_cifar("/tmp/bcnn_cifar/test.bin", 1024, 9)

    net = cifar10_resnet(32) if resnet else cifar10_convnet(128)
    # bip online augmentation, as the reference example configures
    net.data_aug = dict(
        range_shift_x=4, range_shift_y=4, random_fliph=1,
        min_contrast=0.8, max_contrast=1.2,
        min_brightness=-30, max_brightness=30,
    )
    sess = Session(net, seed=0)
    sess.set_data_loader(LoaderType.CIFAR10, train_bin, None, test_bin, None)
    sess.compile_net()

    n_iter = int(os.environ.get("CIFAR_ITERS", "300"))
    eval_period = 50
    sum_err, t0 = 0.0, time.time()
    for i in range(1, n_iter + 1):
        sum_err += float(sess.train_on_batch())
        if i % eval_period == 0:
            sess.set_mode(Mode.VALID)
            err = sum(
                float(sess.predict_on_batch()[1]) for _ in range(4)
            ) / (4 * net.batch_size)
            sess.set_mode(Mode.TRAIN)
            print(
                f"iter= {i} train-error= "
                f"{sum_err / (eval_period * net.batch_size):.4f} "
                f"test-error= {err:.4f} elapsed= {time.time() - t0:.1f}s"
            )
            sum_err = 0.0


if __name__ == "__main__":
    main(sys.argv)

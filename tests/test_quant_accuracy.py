"""int8 accuracy on a TRAINED net (not random weights): train LeNet on a
synthetic-but-nontrivial task, quantize post-training, compare accuracy."""

import numpy as np

from bcnn_tpu import Mode, Session
from bcnn_tpu.models import lenet_mnist
from bcnn_tpu.ops.quant import calibrate, quantize_weights


def make_data(rng, n):
    lab = rng.randint(0, 10, n)
    x = rng.randn(n, 1, 28, 28).astype(np.float32) * 0.35
    for i, c in enumerate(lab):
        r, col = divmod(int(c), 4)
        x[i, 0, 2 + r * 8 : 10 + r * 8, 2 + col * 6 : 9 + col * 6] += 1.2
    y = np.zeros((n, 10, 1, 1), np.float32)
    y[np.arange(n), lab] = 1.0
    return x, y


def accuracy(sess, x, y):
    correct = 0
    b = sess.net.batch_size
    for i in range(0, len(x) - b + 1, b):
        (p,), _ = sess.predict_on_batch(x[i : i + b], outputs=["softmax"])
        pred = np.asarray(p).reshape(b, 10).argmax(1)
        correct += (pred == y[i : i + b].reshape(b, 10).argmax(1)).sum()
    return correct / (len(x) // b * b)


def test_int8_accuracy_after_training():
    rng = np.random.RandomState(0)
    net = lenet_mnist(batch_size=64)
    net.set_sgd_optimizer(0.02, 0.9)
    sess = Session(net, seed=0).compile_net()
    for _ in range(40):
        x, y = make_data(rng, 64)
        sess.train_on_batch(x, y)

    net.set_mode(Mode.VALID)
    xt, yt = make_data(np.random.RandomState(99), 512)
    fp32_acc = accuracy(sess, xt, yt)
    assert fp32_acc > 0.9, f"training failed: {fp32_acc}"

    # post-training quantization with a small calibration set
    xc, _ = make_data(np.random.RandomState(7), 128)
    scales = calibrate(
        net, sess.params, sess.state, [xc[i : i + 64] for i in (0, 64)]
    )
    net.quant = {
        "act_scales": scales,
        "weights": quantize_weights(net, sess.params),
    }
    sess._forward_cache = {}
    int8_acc = accuracy(sess, xt, yt)
    assert int8_acc >= fp32_acc - 0.02, (
        f"int8 accuracy dropped too much: {fp32_acc} -> {int8_acc}"
    )

"""MNIST / CIFAR-10 example nets, transcribed from the reference examples."""

from __future__ import annotations

from ..graph import Net
from ..types import Activation, FillerType, Loss, LrDecay, Metric, Mode, Padding

X = FillerType.XAVIER
R = Activation.RELU
N = Activation.NONE


def lenet_mnist(batch_size: int = 16, mode: Mode = Mode.TRAIN) -> Net:
    """examples/mnist/mnist_example.c:30-55 + solver :130-145."""
    net = Net(mode)
    net.set_input_shape(28, 28, 1, batch_size)
    if mode != Mode.PREDICT:
        net.set_sgd_optimizer(learning_rate=0.003, momentum=0.9)
        net.set_learning_rate_policy(
            LrDecay.SIGMOID, gamma=0.00002, max_batches=50000, step=40000
        )
        net.set_weight_regularizer(0.0005)
    net.add_convolutional_layer(32, 3, 1, 1, 1, 0, X, R, 0, "input", "conv1")
    net.add_batchnorm_layer("conv1", "bn1")
    net.add_maxpool_layer(2, 2, Padding.SAME, "bn1", "pool1")
    net.add_convolutional_layer(32, 3, 1, 1, 1, 0, X, R, 0, "pool1", "conv2")
    net.add_batchnorm_layer("conv2", "bn2")
    net.add_maxpool_layer(2, 2, Padding.SAME, "bn2", "pool2")
    net.add_fullc_layer(256, X, R, 0, "pool2", "fc1")
    net.add_batchnorm_layer("fc1", "bn3")
    net.add_fullc_layer(10, X, R, 0, "bn3", "fc2")
    net.add_softmax_layer("fc2", "softmax")
    net.add_cost_layer(
        Loss.EUCLIDEAN, Metric.ERROR_RATE, 1.0, "softmax", "label", "cost"
    )
    return net


def cifar10_convnet(batch_size: int = 128, mode: Mode = Mode.TRAIN) -> Net:
    """examples/cifar10/cifar10_example.c:33-63 (plain convnet)."""
    net = Net(mode)
    net.set_input_shape(32, 32, 3, batch_size)
    if mode != Mode.PREDICT:
        net.set_sgd_optimizer(learning_rate=0.003, momentum=0.9)
        net.set_weight_regularizer(0.0005)

    def conv(n, src, dst, act=R, stride=1, size=3, pad=1):
        net.add_convolutional_layer(
            n, size, stride, pad, 1, 1, X, act, 0, src, dst
        )

    conv(32, "input", "conv1_1")
    conv(32, "conv1_1", "conv1_2")
    conv(32, "conv1_2", "conv1_3")
    net.add_maxpool_layer(2, 2, Padding.SAME, "conv1_3", "pool1")
    conv(64, "pool1", "conv2_1")
    conv(64, "conv2_1", "conv2_2")
    conv(64, "conv2_2", "conv2_3")
    net.add_maxpool_layer(2, 2, Padding.SAME, "conv2_3", "pool2")
    net.add_fullc_layer(512, X, R, 0, "pool2", "fc1")
    net.add_batchnorm_layer("fc1", "bn3")
    net.add_fullc_layer(10, X, R, 0, "bn3", "fc2")
    net.add_softmax_layer("fc2", "softmax")
    net.add_cost_layer(
        Loss.EUCLIDEAN, Metric.ERROR_RATE, 1.0, "softmax", "label", "cost"
    )
    return net


def cifar10_resnet(batch_size: int = 32, mode: Mode = Mode.TRAIN) -> Net:
    """examples/cifar10/cifar10_example.c:66-130 (ResNet-style variant with
    eltwise shortcuts)."""
    net = Net(mode)
    net.set_input_shape(32, 32, 3, batch_size)
    if mode != Mode.PREDICT:
        net.set_sgd_optimizer(learning_rate=0.003, momentum=0.9)
        net.set_weight_regularizer(0.0005)

    def conv(n, src, dst, act=R, stride=1, size=3, pad=1):
        net.add_convolutional_layer(
            n, size, stride, pad, 1, 1, X, act, 0, src, dst
        )

    conv(64, "input", "conv1")
    # block 1
    conv(64, "conv1", "conv1_1")
    conv(64, "conv1_1", "conv1_2", act=N)
    net.add_eltwise_layer(R, "conv1", "conv1_2", "conv1_add1")
    conv(64, "conv1_add1", "conv1_3")
    conv(64, "conv1_3", "conv1_4", act=N)
    net.add_eltwise_layer(R, "conv1_add1", "conv1_4", "conv1_add2")
    # block 2 (downsample + projection shortcut)
    conv(128, "conv1_add2", "conv2_1", stride=2)
    conv(128, "conv2_1", "conv2_2", act=N)
    conv(128, "conv1_add2", "conv2_res1", act=N, stride=2, size=1, pad=0)
    net.add_eltwise_layer(R, "conv2_res1", "conv2_2", "conv2_add1")
    conv(128, "conv2_add1", "conv2_3")
    conv(128, "conv2_3", "conv2_4", act=N)
    net.add_eltwise_layer(R, "conv2_add1", "conv2_4", "conv2_add2")
    # block 3
    conv(256, "conv2_add2", "conv3_1", stride=2)
    conv(256, "conv3_1", "conv3_2", act=N)
    conv(256, "conv2_add2", "conv3_res1", act=N, stride=2, size=1, pad=0)
    net.add_eltwise_layer(R, "conv3_res1", "conv3_2", "conv3_add1")
    conv(256, "conv3_add1", "conv3_3")
    conv(256, "conv3_3", "conv3_4", act=N)
    net.add_eltwise_layer(R, "conv3_add1", "conv3_4", "conv3_add2")
    # head
    net.add_avgpool_layer("conv3_add2", "avgpool")
    net.add_fullc_layer(10, X, N, 0, "avgpool", "fc")
    net.add_softmax_layer("fc", "softmax")
    net.add_cost_layer(
        Loss.EUCLIDEAN, Metric.ERROR_RATE, 1.0, "softmax", "label", "cost"
    )
    return net

"""Programmatic model builders mirroring the reference's example recipes.

Each returns a built (uncompiled) Net. These are the benchmark configs named
in BASELINE.md: yolov3-tiny (examples/yolo/yolov3-tiny.cfg), the MNIST LeNet
(examples/mnist/mnist_example.c:30-55), the CIFAR-10 convnet and its
ResNet-style variant (examples/cifar10/cifar10_example.c:33-110), and
MobileNet-v1 / ResNet-18 (examples/inference_benchmark targets, built from
their standard Caffe-era architectures).
"""

from .yolov3 import yolov3, yolov3_tiny
from .classic import cifar10_convnet, cifar10_resnet, lenet_mnist
from .imagenet import mobilenet_v1, resnet18

"""Core enums of the bcnn-tpu framework.

These mirror the public enums of the reference public header
(/root/reference/inc/bcnn/bcnn.h:90-236) so that config files, serialized
models and user code keep identical semantics, while the implementation
underneath is a TPU-native JAX/XLA program.
"""

from __future__ import annotations

import enum


class Status(enum.IntEnum):
    """Mirrors bcnn_status (bcnn.h:90-99)."""

    SUCCESS = 0
    INVALID_PARAMETER = 1
    INVALID_DATA = 2
    INVALID_MODEL = 3
    FAILED_ALLOC = 4
    INTERNAL_ERROR = 5
    CUDA_FAILED_ALLOC = 6
    UNKNOWN_ERROR = 7


class Mode(enum.IntEnum):
    """Mirrors bcnn_mode (bcnn.h:105-112).

    PREDICT: inference only (BN constants may be folded at weight load).
    TRAIN:   batch statistics for BN, dropout active, gradients computed.
    VALID:   forward + metric evaluation with running statistics.
    """

    PREDICT = 0
    TRAIN = 1
    VALID = 2


class LoaderType(enum.IntEnum):
    """Mirrors bcnn_loader_type (bcnn.h:117-124)."""

    MNIST = 0
    CIFAR10 = 1
    CLASSIFICATION_LIST = 2
    REGRESSION_LIST = 3
    DETECTION_LIST = 4


class LrDecay(enum.IntEnum):
    """Mirrors bcnn_lr_decay (bcnn.h:129-136)."""

    CONSTANT = 0
    STEP = 1
    INV = 2
    EXP = 3
    POLY = 4
    SIGMOID = 5


class LayerType(enum.IntEnum):
    """Mirrors bcnn_layer_type (bcnn.h:141-159)."""

    CONV2D = 0
    TRANSPOSE_CONV2D = 1
    DEPTHWISE_CONV2D = 2
    ACTIVATION = 3
    FULL_CONNECTED = 4
    MAXPOOL = 5
    AVGPOOL = 6
    SOFTMAX = 7
    DROPOUT = 8
    BATCHNORM = 9
    LRN = 10
    CONCAT = 11
    ELTWISE = 12
    UPSAMPLE = 13
    YOLOV3 = 14
    RESHAPE = 15
    COST = 16


class Activation(enum.IntEnum):
    """Mirrors bcnn_activation (bcnn.h:164-175).

    Note: the reference implementation uses slope 0.1 for LRELU
    (bcnn_activation_layer.c:106) even though the header documents 0.01;
    we replicate the implemented 0.1 behavior.
    """

    NONE = 0
    TANH = 1
    RELU = 2
    RAMP = 3
    SOFTPLUS = 4
    LRELU = 5
    ABS = 6
    CLAMP = 7
    PRELU = 8
    LOGISTIC = 9


class Loss(enum.IntEnum):
    """Mirrors bcnn_loss (bcnn.h:180)."""

    EUCLIDEAN = 0
    LIFTED_STRUCT = 1


class Metric(enum.IntEnum):
    """Mirrors bcnn_loss_metric (bcnn.h:185-192)."""

    ERROR_RATE = 0
    LOGLOSS = 1
    SSE = 2
    MSE = 3
    CRPS = 4
    DICE = 5


class Padding(enum.IntEnum):
    """Mirrors bcnn_padding (bcnn.h:200-204).

    Output size formulas (bcnn_maxpool_layer.c:62-83):
      SAME:  (h + stride - 1) / stride
      VALID: (h - size + stride) / stride
      CAFFE: ceil((h - size) / stride) + 1
    """

    SAME = 0
    VALID = 1
    CAFFE = 2


class Optimizer(enum.IntEnum):
    """Mirrors bcnn_optimizer (bcnn.h:209)."""

    SGD = 0
    ADAM = 1


class LogLevel(enum.IntEnum):
    """Mirrors bcnn_log_level (bcnn.h:214-219)."""

    INFO = 0
    WARNING = 1
    ERROR = 2
    SILENT = 3


class FillerType(enum.IntEnum):
    """Mirrors bcnn_filler_type (bcnn.h:228-232)."""

    FIXED = 0
    XAVIER = 1
    MSRA = 2


# Max number of bounding boxes for detection (bcnn.h:235)
DETECTION_MAX_BOXES = 50

"""bcnn-tpu: a TPU-native rebuild of the bcnn CNN framework.

Same capabilities as the reference (jnbraun/bcnn): graph building, training
(SGD/Adam with bcnn's exact update math), the full layer zoo, config-file
compatibility, .bcnnmodel/Darknet weight IO, data loaders with online
augmentation, YOLOv3 detection — re-designed TPU-first: the graph compiles
to jitted XLA programs (NHWC, MXU convs, fused epilogues), training scales
data-parallel over a jax.sharding.Mesh, and autodiff replaces hand-written
backward kernels.
"""

from .api import Session
from .config import load_net
from .graph import Learner, Net, Node, TensorKind, TensorSpec
from .serialization import load_weights, save_weights
from .types import (
    Activation,
    FillerType,
    LayerType,
    LoaderType,
    LogLevel,
    Loss,
    LrDecay,
    Metric,
    Mode,
    Optimizer,
    Padding,
    Status,
)

__version__ = "0.1.0"

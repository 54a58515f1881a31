"""TPU-native compute ops.

These replace the reference's hand-written kernels (src/kernels/bcnn_mat.c:
blocked SGEMM, im2col/col2im, Winograd NC4HW4 conv, AVX/NEON BLAS-1) with
XLA-compiled JAX primitives: `lax.conv_general_dilated` maps convolutions
onto the MXU directly (XLA performs the implicit-GEMM/Winograd choice and
fuses the elementwise post-ops), and autodiff replaces every hand-written
backward kernel. Pallas kernels are added only where the XLA lowering is
measurably insufficient: ops/shear_pallas.py (the augmentation shear
sweep, shipped — 2.3-5.6x over the XLA formulation on chip) is the one
that won; ops/yolo_pallas.py and ops/dw_pallas.py are kept as measured
negatives (XLA's own fusion/emitters beat them — see their docstrings).

Activations live in NHWC; weights in HWIO; fp32 params with optional bf16
compute (fp32 accumulation via preferred_element_type).
"""

from .activations import apply_activation
from .conv import conv2d, conv2d_transpose, depthwise_conv2d
from .linear import full_connected
from .norm import batch_norm
from .pool import global_avgpool, maxpool
from .softmax import softmax_passthrough_grad
from .misc import concat_channels, dropout, eltwise_add, lrn, upsample_nn

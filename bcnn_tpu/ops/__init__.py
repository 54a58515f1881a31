"""TPU-native compute ops.

These replace the reference's hand-written kernels (src/kernels/bcnn_mat.c:
blocked SGEMM, im2col/col2im, Winograd NC4HW4 conv, AVX/NEON BLAS-1) with
XLA-compiled JAX primitives: `lax.conv_general_dilated` maps convolutions
onto the MXU directly (XLA performs the implicit-GEMM/Winograd choice and
fuses the elementwise post-ops), and autodiff replaces every hand-written
backward kernel. Pallas kernels are added only where XLA fusion is
insufficient (see ops/yolo_pallas.py for fused detection decode).

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

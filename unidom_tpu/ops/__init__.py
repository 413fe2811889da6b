from unidom_tpu.ops.svd3 import svd3, svd3_jacobi  # noqa: F401
from unidom_tpu.ops.quat import qmul, w2quat, qrot, qinv, qrot_inv  # noqa: F401
from unidom_tpu.ops.metrics import chamfer, l2_distance, grid_iou, voxel_iou  # noqa: F401
from unidom_tpu.ops.gradops import (  # noqa: F401
    clamp_grad_norm_tree,
    nan_to_num_tree,
    normalize_grad,
    scrub_grad,
)

"""Pure-jnp graph ops — the numerics oracle for the Pallas kernels.

Counterpart of the reference's `dgcnn/ops.py` (`knn`, `edge_feature`,
`conv2d`, `batch_norm`) [M per SURVEY.md §2 #7].
"""

from dgcnn_tpu.ops.knn import pairwise_sq_dists, knn_indices
from dgcnn_tpu.ops.edge import (
    gather_neighbors,
    edge_features,
    edge_preact_factorized,
    edgeconv_block_reduced,
)
from dgcnn_tpu.ops.norm import batch_norm_init, batch_norm_apply
from dgcnn_tpu.ops.loss import (
    softmax_cross_entropy,
    accuracy,
    per_class_accuracy,
    confusion_matrix,
    mean_iou,
)

__all__ = [
    "pairwise_sq_dists",
    "knn_indices",
    "gather_neighbors",
    "edge_features",
    "edge_preact_factorized",
    "edgeconv_block_reduced",
    "batch_norm_init",
    "batch_norm_apply",
    "softmax_cross_entropy",
    "accuracy",
    "per_class_accuracy",
    "confusion_matrix",
    "mean_iou",
]

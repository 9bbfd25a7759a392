from dgcnn_tpu.kernels.knn_pallas import knn_pallas, knn_pallas_cross
from dgcnn_tpu.kernels.ring_knn import ring_gather, ring_knn
from dgcnn_tpu.kernels.ring_knn_rdma import ring_knn_rdma

__all__ = [
    "knn_pallas",
    "knn_pallas_cross",
    "ring_gather",
    "ring_knn",
    "ring_knn_rdma",
]

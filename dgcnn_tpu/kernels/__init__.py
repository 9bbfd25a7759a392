from dgcnn_tpu.kernels.knn_pallas import knn_pallas, knn_pallas_cross
from dgcnn_tpu.kernels.ring_knn import ring_gather, ring_knn

__all__ = ["knn_pallas", "knn_pallas_cross", "ring_gather", "ring_knn"]

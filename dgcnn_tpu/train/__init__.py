from dgcnn_tpu.train.trainval import TrainState, Trainval

__all__ = ["TrainState", "Trainval"]

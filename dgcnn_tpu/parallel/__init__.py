from dgcnn_tpu.parallel.mesh import (
    DATA_AXIS,
    POINT_AXIS,
    data_sharding,
    make_mesh,
    replicated,
)

__all__ = ["DATA_AXIS", "POINT_AXIS", "data_sharding", "make_mesh", "replicated"]

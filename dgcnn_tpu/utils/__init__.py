from dgcnn_tpu.utils.distributed import host_event_range, maybe_initialize_distributed
from dgcnn_tpu.utils.timing import Timer, device_memory_stats, trace

__all__ = [
    "host_event_range",
    "maybe_initialize_distributed",
    "Timer",
    "device_memory_stats",
    "trace",
]

#!/usr/bin/env python
"""End-to-end serving throughput: the full inference loop, measured.

Unlike profile_step (jitted-step timings), this drives the PUBLIC
serving surface — `train.loop.inference` with file input and h5
write-back — so it covers everything a production deployment pays:
batcher, eval step, the packed device->host transfer, streaming writer,
report lines. The round-3 serving row in BASELINE.md comes from here.

Env: SERVE_N (4096), SERVE_B (4), SERVE_EVENTS (200), SERVE_KNN_EVERY.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("SERVE_N", 4096))
B = int(os.environ.get("SERVE_B", 4))
EVENTS = int(os.environ.get("SERVE_EVENTS", 200))
KNN_EVERY = int(os.environ.get("SERVE_KNN_EVERY", 1))


def main():
    import numpy as np

    from dgcnn_tpu.config import Config
    from dgcnn_tpu.io import SyntheticIO
    from dgcnn_tpu.io.convert import write_stream
    from dgcnn_tpu.train import loop as train_loop
    from dgcnn_tpu.train.checkpoint import save
    from dgcnn_tpu.train.trainval import Trainval

    with tempfile.TemporaryDirectory() as td:
        events_path = os.path.join(td, "events.dgb")
        io = SyntheticIO(
            num_events=EVENTS, num_point=N, seed=0, variable_length=False
        ).initialize()
        write_stream(events_path, iter(io))

        model_cfg = dict(
            model_name="residual-dgcnn", num_class=2, kvalue=20,
            edge_filters=(64,) * 6, num_point=N, knn_every=KNN_EVERY,
            num_devices=1,  # single-chip serving measurement
        )
        # untrained weights are fine for a throughput measurement; save
        # a checkpoint so the loop exercises its real restore path
        tv = Trainval(Config(minibatch_size=B, **model_cfg))
        state = tv.initialize(4)
        ckpt = save(os.path.join(td, "w"), 0, state, model_cfg)

        cfg = Config(
            command="inference", io_type="dgb", input_file=events_path,
            minibatch_size=B, model_path=ckpt,
            output_file=os.path.join(td, "pred.h5"),
            log_dir=os.path.join(td, "log"),
            **model_cfg,
        )
        t0 = time.perf_counter()
        res = train_loop.inference(cfg)
        wall = time.perf_counter() - t0

        # steady-state per-batch time from the loop's own report CSV
        # (first batch carries compilation)
        import csv as _csv

        with open(os.path.join(td, "log", "inference_log.csv")) as fh:
            ts = [float(r["titer"]) for r in _csv.DictReader(fh)]
        steady = float(np.mean(ts[1:])) if len(ts) > 1 else float(ts[0])
        out_bytes = os.path.getsize(os.path.join(td, "pred.h5"))

    pps = B * N / steady
    print(
        json.dumps(
            {
                "metric": f"serving points/s ({B}x{N}, h5 write-back, "
                f"knn_every={KNN_EVERY})",
                "value": round(pps, 1),
                "unit": "points/s",
                "steady_ms_per_batch": round(steady * 1e3, 1),
                "batches": res["batches"],
                "wall_s_incl_compile": round(wall, 1),
                "output_mb": round(out_bytes / 1e6, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

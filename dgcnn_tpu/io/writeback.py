"""Inference prediction write-back.

The reference persists per-event, per-point predictions back into the
event-file format via `store_segment` during the inference loop and closes
the output in `finalize` [H behavior / M name, SURVEY.md §3.2]. The
rebuild keeps that API: predictions (argmax labels) and softmax scores are
accumulated per event and written as an h5/npz/csv file keyed by the
original event ids, de-duplicating repeated events (batch fill-up).
"""

from __future__ import annotations

import csv as _csv

import numpy as np


class SegmentWriter:
    """Accumulate per-event predictions, then write one output file."""

    def __init__(self, path: str, format: str = None):
        self.path = path
        if format is None:
            format = (
                "h5"
                if path.endswith((".h5", ".hdf5"))
                else "npz" if path.endswith(".npz") else "csv"
            )
        self.format = format
        self._events = {}  # id -> dict(points, prediction, scores)

    def store_segment(self, event_id: int, points, prediction, scores=None):
        """Record one event's per-point predictions (first write wins —
        repeated ids from batch fill-up are ignored)."""
        event_id = int(event_id)
        if event_id in self._events:
            return
        rec = {
            "points": np.asarray(points, np.float32),
            "prediction": np.asarray(prediction, np.int32),
        }
        if scores is not None:
            rec["scores"] = np.asarray(scores, np.float32)
        self._events[event_id] = rec

    def __len__(self):
        return len(self._events)

    def finalize(self):
        if not self._events:
            return
        ids = sorted(self._events)
        if self.format == "csv":
            with open(self.path, "w", newline="") as fh:
                w = _csv.writer(fh)
                first = self._events[ids[0]]
                nscore = first.get("scores", np.zeros((0, 0))).shape[-1]
                w.writerow(
                    ["event_id", "x", "y", "z", "value", "prediction"]
                    + [f"score{c}" for c in range(nscore)]
                )
                for eid in ids:
                    rec = self._events[eid]
                    for j in range(len(rec["prediction"])):
                        row = (
                            [eid]
                            + [f"{v:.6g}" for v in rec["points"][j]]
                            + [int(rec["prediction"][j])]
                        )
                        if "scores" in rec:
                            row += [f"{v:.6g}" for v in rec["scores"][j]]
                        w.writerow(row)
            return
        points = np.concatenate([self._events[i]["points"] for i in ids])
        pred = np.concatenate([self._events[i]["prediction"] for i in ids])
        offsets = np.zeros(len(ids) + 1, np.int64)
        np.cumsum([len(self._events[i]["prediction"]) for i in ids], out=offsets[1:])
        arrays = {
            "data": points,
            "prediction": pred,
            "offsets": offsets,
            "event_ids": np.asarray(ids, np.int64),
        }
        if "scores" in self._events[ids[0]]:
            arrays["scores"] = np.concatenate(
                [self._events[i]["scores"] for i in ids]
            )
        if self.format == "h5":
            import h5py

            with h5py.File(self.path, "w") as f:
                for k, v in arrays.items():
                    f.create_dataset(k, data=v)
        elif self.format == "npz":
            np.savez(self.path, **arrays)
        else:
            raise ValueError(f"unknown format {self.format!r}")

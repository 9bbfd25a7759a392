"""Synthetic LArTPC-like event generator.

Stands in for detector data in smoke tests and benchmarks (the reference's
toy CSV workflow [M per SURVEY.md §4]): each event is a mixture of
*track-like* structures (points along straight lines — class 0) and
*shower-like* structures (anisotropic Gaussian blobs — class 1 and up),
with an energy-deposition value channel. Geometry is learnable from local
neighborhoods, so a DGCNN must separate classes well above chance.
"""

from __future__ import annotations

import numpy as np

from dgcnn_tpu.io.readers import Event, IOBase


def make_event(
    rng: np.random.RandomState,
    num_point: int,
    num_class: int = 2,
    with_weights: bool = False,
) -> Event:
    """One event with ~num_point points (exact count == num_point)."""
    pts, labels = [], []
    remaining = num_point
    while remaining > 0:
        cls = rng.randint(0, num_class)
        n = int(min(remaining, rng.randint(num_point // 8 + 1, num_point // 2 + 2)))
        if cls == 0:  # track: points along a line segment + small noise
            a = rng.uniform(-1, 1, 3)
            d = rng.randn(3)
            d /= np.linalg.norm(d) + 1e-9
            t = rng.uniform(0, 1.5, (n, 1))
            p = a + t * d + rng.randn(n, 3) * 0.01
        else:  # shower: anisotropic blob
            c = rng.uniform(-1, 1, 3)
            cov = rng.randn(3, 3) * 0.15
            p = c + rng.randn(n, 3) @ cov
        val = np.abs(rng.randn(n, 1) * 0.5 + 1.0)
        pts.append(np.concatenate([p, val], axis=1))
        labels.append(np.full(n, cls, np.int32))
        remaining -= n
    points = np.concatenate(pts).astype(np.float32)
    labels = np.concatenate(labels)
    perm = rng.permutation(len(points))
    weights = None
    if with_weights:
        # emphasize the rarer class, as the reference's per-point weights do
        counts = np.bincount(labels, minlength=num_class).astype(np.float64)
        w = (len(labels) / np.maximum(counts, 1.0))[labels]
        weights = (w / w.mean()).astype(np.float32)[perm]
    return Event(id=-1, points=points[perm], labels=labels[perm], weights=weights)


class SyntheticIO(IOBase):
    """In-memory reader over generated events (variable lengths)."""

    def __init__(
        self,
        num_events: int = 64,
        num_point: int = 1024,
        num_class: int = 2,
        seed: int = 0,
        variable_length: bool = True,
        with_weights: bool = False,
    ):
        self._n = num_events
        self._num_point = num_point
        self._num_class = num_class
        self._seed = seed
        self._variable = variable_length
        self._with_weights = with_weights
        self._events = None

    def initialize(self):
        rng = np.random.RandomState(self._seed)
        self._events = []
        for i in range(self._n):
            n = (
                int(rng.randint(self._num_point // 2, self._num_point + 1))
                if self._variable
                else self._num_point
            )
            ev = make_event(rng, n, self._num_class, self._with_weights)
            ev.id = i
            self._events.append(ev)
        return self

    def num_events(self):
        return self._n

    def read_event(self, i):
        return self._events[i]


def write_canonical(path: str, events, format: str = "h5"):
    """Write events in the canonical offsets layout (h5 or npz)."""
    points = np.concatenate([e.points for e in events]).astype(np.float32)
    offsets = np.zeros(len(events) + 1, np.int64)
    np.cumsum([len(e) for e in events], out=offsets[1:])
    arrays = {"data": points, "offsets": offsets}
    # all-or-nothing per array, like write_dgb: gating on events[0] alone
    # would crash in concatenate (first has, later lacks) or silently
    # drop weights (first lacks, later have) on mixed event lists
    for key, attr, dtype in (("label", "labels", np.int32),
                             ("weight", "weights", np.float32)):
        have = [getattr(e, attr) is not None for e in events]
        if all(have):
            arrays[key] = np.concatenate(
                [getattr(e, attr) for e in events]
            ).astype(dtype)
        elif any(have):
            print(
                f"write_canonical: {sum(have)}/{len(events)} events carry "
                f"{attr}; mixed lists write NO {key} array",
                flush=True,
            )
    if format == "h5":
        import h5py

        with h5py.File(path, "w") as f:
            for k, v in arrays.items():
                f.create_dataset(k, data=v)
    elif format == "npz":
        np.savez(path, **arrays)
    else:
        raise ValueError(f"unknown format {format!r}")

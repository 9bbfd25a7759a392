"""Bounded-memory helpers for assembling large on-disk datasets.

Shared by the inference write-back (`io.writeback.SegmentWriter`) and the
offline converter (`io.convert`): both stream per-event bytes into temp
sidecar files and assemble the final h5/npz/dgb from memory-maps, so
output size never drives host RSS (VERDICT r2 #4).
"""

from __future__ import annotations

import os

import numpy as np

_CHUNK_BYTES = 64 << 20


def copy_chunked(dst, src):
    """dst[:] = src in bounded chunks (both array-likes, same shape)."""
    n = src.shape[0]
    chunk = max(1, _CHUNK_BYTES // max(int(np.prod(src.shape[1:], dtype=np.int64)) * src.dtype.itemsize, 1))
    for lo in range(0, n, chunk):
        dst[lo : lo + chunk] = src[lo : lo + chunk]


def write_npz_streamed(path: str, arrays):
    """Write an .npz (zip of .npy members) from ``{name: array-like}``
    without holding the arrays in RAM: each member is first written as a
    disk-backed .npy part (chunked copy), then zip-stored from disk.
    np.load reads the result exactly like np.savez output."""
    import zipfile

    from numpy.lib.format import open_memmap

    parts = []
    try:
        for name, src in arrays.items():
            part = f"{path}.tmp.{name}.npy"
            src = src if hasattr(src, "dtype") else np.asarray(src)
            dst = open_memmap(part, mode="w+", dtype=src.dtype, shape=src.shape)
            copy_chunked(dst, src)
            dst.flush()
            del dst
            parts.append((part, f"{name}.npy"))
        with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
            for part, arcname in parts:
                zf.write(part, arcname)
    finally:
        for part, _ in parts:
            try:
                os.unlink(part)
            except FileNotFoundError:
                pass


def write_h5_streamed(path: str, arrays):
    """Write an HDF5 file from ``{name: array-like}`` with chunked copies."""
    import h5py

    with h5py.File(path, "w") as f:
        for name, src in arrays.items():
            src = src if hasattr(src, "dtype") else np.asarray(src)
            copy_chunked(f.create_dataset(name, src.shape, src.dtype), src)

"""Canonical crop policy: one behavior across pad_events, the DGB Python
fallback, and the C++ reader (VERDICT round 1, weak #6)."""

import numpy as np
import pytest

from dgcnn_tpu.config import Config
from dgcnn_tpu.io import SyntheticIO, io_factory
from dgcnn_tpu.io.batching import pad_events
from dgcnn_tpu.io.crop import CROP_MODES, crop_select
from dgcnn_tpu.io.dgb import DGBIO, write_dgb


def test_stride_mode_is_even_coverage():
    sel = crop_select(300, 100, "stride", seed=7, event_id=3)
    np.testing.assert_array_equal(sel, (np.arange(100) * 300) // 100)


@pytest.mark.parametrize("mode", CROP_MODES)
@pytest.mark.parametrize("n,m", [(300, 256), (1000, 128), (131, 130)])
def test_crop_select_valid_selection(mode, n, m):
    sel = crop_select(n, m, mode, seed=42, event_id=5)
    assert sel.shape == (m,)
    assert sel[0] >= 0 and sel[-1] < n
    assert np.all(np.diff(sel) > 0), "indices must be strictly increasing"
    # stratified: row j stays inside its stratum [(j*n)//m, ((j+1)*n)//m)
    j = np.arange(m)
    assert np.all(sel >= (j * n) // m)
    assert np.all(sel < ((j + 1) * n) // m + ((j + 1) * n % m > 0))


def test_random_mode_is_seed_and_event_keyed():
    a = crop_select(1000, 100, "random", seed=1, event_id=0)
    assert np.array_equal(a, crop_select(1000, 100, "random", 1, 0))
    assert not np.array_equal(a, crop_select(1000, 100, "random", 2, 0))
    assert not np.array_equal(a, crop_select(1000, 100, "random", 1, 1))


def test_bad_mode_rejected():
    with pytest.raises(ValueError, match="crop_mode"):
        crop_select(10, 5, "prefix", 0, 0)


@pytest.mark.parametrize("mode", CROP_MODES)
def test_same_batch_bytes_from_all_three_paths(tmp_path, mode):
    """pad_events == DGB Python fallback == DGB C++ — byte-identical,
    including the cropped branch."""
    io = SyntheticIO(num_events=6, num_point=300, seed=3, with_weights=True)
    events = [io.initialize().read_event(i) for i in range(6)]
    path = str(tmp_path / "ev.dgb")
    write_dgb(path, events)

    ids = [4, 0, 2, 2]
    n_pad, crop, seed = 384, 256, 11

    generic = pad_events(
        [events[i] for i in ids], n_pad, crop=crop, crop_mode=mode, seed=seed
    )

    dgb_native = DGBIO(path).initialize()
    assert dgb_native.native_active
    b_nat = dgb_native.read_batch(ids, n_pad, crop=crop, crop_mode=mode, seed=seed)

    dgb_py = DGBIO(path).initialize()
    dgb_py._handle = None
    b_py = dgb_py.read_batch(ids, n_pad, crop=crop, crop_mode=mode, seed=seed)

    for b in (b_nat, b_py):
        np.testing.assert_array_equal(generic.points, b.points)
        np.testing.assert_array_equal(generic.labels, b.labels)
        np.testing.assert_array_equal(generic.weights, b.weights)
        np.testing.assert_array_equal(generic.mask, b.mask)
        np.testing.assert_array_equal(generic.lengths, b.lengths)
    dgb_native.finalize()
    dgb_py.finalize()


def test_shuffled_stream_crops_fresh_subset_each_epoch():
    """Training streams must expose a DIFFERENT crop subset of an
    oversized event each epoch (a run-frozen crop silently shrinks the
    dataset); eval streams (shuffle=False) stay run-stable."""
    from dgcnn_tpu.io.batching import BucketBatcher

    io = SyntheticIO(num_events=2, num_point=400, seed=1, variable_length=False)
    b = BucketBatcher(io.initialize(), 2, num_point=128, shuffle=True, seed=9)

    def points_of(batch, eid):
        i = list(batch.event_ids).index(eid)
        return batch.points[i].copy()

    e1 = next(b.epoch())
    e2 = next(b.epoch())
    assert not np.array_equal(points_of(e1, 0), points_of(e2, 0))

    bv = BucketBatcher(io.initialize(), 2, num_point=128, shuffle=False, seed=9)
    v1 = next(bv.epoch())
    v2 = next(bv.epoch())
    np.testing.assert_array_equal(points_of(v1, 0), points_of(v2, 0))


def test_huge_monotonic_offsets_rejected_by_native_reader(tmp_path):
    """offsets[E] = 2^62 is monotonic but must still be rejected (the
    total*F*4 arithmetic would wrap and leave OOB reads reachable)."""
    from dgcnn_tpu.io import native

    io = SyntheticIO(num_events=2, num_point=64, seed=0)
    events = [io.initialize().read_event(i) for i in range(2)]
    path = tmp_path / "huge.dgb"
    write_dgb(str(path), events)
    data = bytearray(path.read_bytes())
    # header 0x18 bytes, then u64 offsets[E+1]; bump the final offset
    data[0x18 + 2 * 8 : 0x18 + 3 * 8] = (2**62).to_bytes(8, "little")
    path.write_bytes(bytes(data))
    lib = native.load()
    if lib is not None:
        assert not lib.dgb_open(str(path).encode()), (
            "native dgb_open accepted a wrapping offsets table"
        )
    with pytest.raises(ValueError, match="truncated|corrupt"):
        DGBIO(str(path)).initialize()


def test_fixed_layout_readers_reject_key_flags(tmp_path):
    f = tmp_path / "x.csv"
    f.write_text("0,1,2,3,0.5,1\n")
    cfg = Config(io_type="csv", input_file=str(f), weight_key="w")
    with pytest.raises(ValueError, match="do not apply"):
        io_factory(cfg)
    cfg2 = Config(io_type="csv", input_file=str(f))  # defaults pass
    io_factory(cfg2)


def test_corrupt_offsets_rejected(tmp_path):
    io = SyntheticIO(num_events=4, num_point=64, seed=0)
    events = [io.initialize().read_event(i) for i in range(4)]
    path = tmp_path / "bad.dgb"
    write_dgb(str(path), events)
    data = bytearray(path.read_bytes())
    # corrupt offsets[2] (header is 0x18 bytes, then u64 offsets) to a
    # huge value so offsets[3]-offsets[2] would wrap negative
    np.frombuffer(data, np.uint64, count=5, offset=0x18)  # layout sanity
    data[0x18 + 2 * 8 : 0x18 + 3 * 8] = (2**63).to_bytes(8, "little")
    path.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="corrupt DGB offsets"):
        DGBIO(str(path)).initialize()


def test_csv_crop_matches_converted_formats(tmp_path):
    """A CSV dump with NON-contiguous raw event ids (run/event numbers)
    must crop the same rows as its csv2dgb conversion: seeded policies
    key on the event's position in the file (Event.ordinal), never on
    the raw id column, so training data cannot depend on io_type."""
    rng = np.random.default_rng(3)
    raw_ids = [100018, 100021, 100042]  # realistic, far from 0..N-1
    lines = []
    for eid in raw_ids:
        pts = rng.normal(size=(40, 3))
        for p in pts:
            lines.append(f"{eid},{p[0]:.6f},{p[1]:.6f},{p[2]:.6f},1.0,1")
    csv_path = tmp_path / "dump.csv"
    csv_path.write_text("event_id,x,y,z,value,label\n" + "\n".join(lines))

    from dgcnn_tpu.io.convert import main as convert_main
    from dgcnn_tpu.io.readers import CSVIO

    dgb_path = tmp_path / "dump.dgb"
    convert_main(["csv2dgb", str(csv_path), str(dgb_path)])

    csv_io = CSVIO(str(csv_path)).initialize()
    dgb_io = DGBIO(str(dgb_path)).initialize()
    for seed in (0, 7):
        b_csv = pad_events(
            [csv_io.read_event(i) for i in range(3)], 32, crop=16,
            crop_mode="random", seed=seed,
        )
        b_dgb = pad_events(
            [dgb_io.read_event(i) for i in range(3)], 32, crop=16,
            crop_mode="random", seed=seed,
        )
        np.testing.assert_array_equal(b_csv.points, b_dgb.points)
        np.testing.assert_array_equal(b_csv.labels, b_dgb.labels)
    # write-back identity is preserved: the CSV reader still reports the
    # file's raw event ids, not positions
    assert [int(csv_io.read_event(i).id) for i in range(3)] == raw_ids
    dgb_io.finalize()


def test_prune_ignores_sibling_prefixes(tmp_path):
    """prune('w/snap', ...) must never delete 'w/snap-lr01-*.ckpt' — a
    sibling run whose prefix extends this one."""
    from dgcnn_tpu.train import checkpoint

    mine = [tmp_path / f"snap-{s}.ckpt" for s in (100, 200, 300)]
    sibling = [tmp_path / f"snap-lr01-{s}.ckpt" for s in (50, 700)]
    for p in mine + sibling:
        p.write_bytes(b"x")
    removed = checkpoint.prune(str(tmp_path / "snap"), keep=1)
    assert sorted(removed) == [str(p) for p in mine[:2]]
    for p in sibling:
        assert p.exists(), f"sibling checkpoint {p} was deleted"
    assert checkpoint.latest(str(tmp_path / "snap")) == str(mine[2])
    # and the sibling's own prune only sees its own files
    assert checkpoint.latest(str(tmp_path / "snap-lr01")) == str(sibling[1])

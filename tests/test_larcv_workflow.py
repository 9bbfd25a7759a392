"""The documented larcv workflow actually works end-to-end.

The reference reads LArTPC events via the larcv C++/ROOT library [H per
SURVEY.md §2.1]; this runtime has no ROOT by design, and `io_type=larcv`
points users at the dump+convert path (io/readers.py io_factory). This
test proves that path on a realistic larcv-dump-shaped fixture
(tests/fixtures/larcv_dump.csv: integer detector voxel coordinates,
gamma-distributed energy deposits, track/shower morphology and labels —
the sparse3d layout a larcv dump produces), not just on synthetic blobs.
"""

import os

import numpy as np
import pytest

from dgcnn_tpu.config import Config
from dgcnn_tpu.io.convert import main as convert_main
from dgcnn_tpu.io.dgb import DGBIO
from dgcnn_tpu.io.readers import CSVIO, io_factory
from dgcnn_tpu.train.loop import train

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "larcv_dump.csv")


def test_larcv_io_type_points_at_workflow():
    cfg = Config(io_type="larcv", input_file=FIXTURE)
    with pytest.raises(ValueError, match="csv2dgb"):
        io_factory(cfg)


def test_fixture_shape_is_larcv_like():
    io = CSVIO(FIXTURE).initialize()
    assert io.num_events() == 6
    for i in range(io.num_events()):
        ev = io.read_event(i)
        # sparse3d voxels: integer coordinates, positive energies
        np.testing.assert_array_equal(ev.points[:, :3], np.round(ev.points[:, :3]))
        assert (ev.points[:, 3] > 0).all()
        assert set(np.unique(ev.labels)) <= {0, 1}
        assert len(ev) > 100


def test_dump_convert_train_roundtrip(tmp_path):
    dgb = str(tmp_path / "events.dgb")
    convert_main(["csv2dgb", FIXTURE, dgb])

    # converted file is faithful
    src = CSVIO(FIXTURE).initialize()
    out = DGBIO(dgb).initialize()
    assert out.num_events() == src.num_events()
    for i in (0, 5):
        np.testing.assert_allclose(
            out.read_event(i).points, src.read_event(i).points, rtol=1e-6
        )
        np.testing.assert_array_equal(out.read_event(i).labels, src.read_event(i).labels)
    out.finalize()

    # train smoke on the converted file (crop branch exercised: events are
    # larger than num_point)
    cfg = Config(
        command="train",
        io_type="dgb",
        input_file=dgb,
        iteration=6,
        report_step=6,
        checkpoint_step=0,
        minibatch_size=2,
        num_point=128,
        kvalue=6,
        edge_filters=(8,),
        head_feat_dim=16,
        head_mlp=(16,),
        num_devices=1,
        use_pallas=False,
        weight_prefix=str(tmp_path / "w/s"),
        log_dir=str(tmp_path / "log"),
        seed=5,
    )
    metrics = train(cfg)
    assert np.isfinite(metrics["loss"]) and metrics["loss"] > 0

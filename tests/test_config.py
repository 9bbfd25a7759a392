"""Config validation and serialization."""

import pytest

from dgcnn_tpu.config import Config, parse_args


def test_validate_ok():
    Config().validate()


@pytest.mark.parametrize(
    "kw,msg",
    [
        (dict(kvalue=0), "KVALUE"),
        (dict(kvalue=50, num_point=20), "exceeds"),
        (dict(minibatch_size=0), "MINIBATCH"),
        (dict(num_class=1), "NUM_CLASS"),
        (dict(point_shards=0), "point_shards"),
        (dict(command="inference"), "model_path"),
    ],
)
def test_validate_rejects(kw, msg):
    with pytest.raises(ValueError, match=msg):
        Config(**kw).validate()


def test_summary_and_json_roundtrip():
    cfg = Config(kvalue=13, edge_filters=(8, 8))
    s = cfg.summary()
    assert "kvalue" in s and "= 13" in s
    import json

    d = json.loads(cfg.to_json())
    cfg2 = Config.from_dict(d)
    assert cfg2.kvalue == 13 and tuple(cfg2.edge_filters) == (8, 8)


def test_cli_help_does_not_require_jax(capsys):
    with pytest.raises(SystemExit) as e:
        parse_args(["train", "--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "KVALUE" in out and "--kvalue" in out


def test_info_subcommand(capsys):
    from dgcnn_tpu.cli import main

    assert main(["info"]) == 0
    out = capsys.readouterr().out
    assert "dgcnn_tpu" in out and "jax" in out
    assert "backend" in out and "native IO" in out

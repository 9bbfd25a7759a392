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


def test_config_file_defaults_and_cli_override(tmp_path):
    """--config file.json supplies defaults; explicit CLI flags win."""
    import json

    cfgfile = tmp_path / "run.json"
    cfgfile.write_text(json.dumps({
        "kvalue": 11, "minibatch_size": 16, "model_name": "residual-dgcnn",
        "edge_filters": [32, 32, 32], "knn_every": 3,
    }))
    cfg = parse_args(["train", "-c", str(cfgfile), "-io", "synthetic",
                      "-mb", "4"])
    assert cfg.kvalue == 11                      # from file
    assert cfg.model_name == "residual-dgcnn"    # from file
    assert cfg.edge_filters == (32, 32, 32)      # list -> tuple
    assert cfg.knn_every == 3
    assert cfg.minibatch_size == 4               # CLI overrides file
    assert cfg.io_type == "synthetic"

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"no_such_flag": 1}))
    with pytest.raises(SystemExit, match="unknown keys"):
        parse_args(["train", "-c", str(bad)])


def test_config_file_roundtrip_from_checkpoint_config(tmp_path):
    """A checkpoint's embedded config (Config.to_json) reloads as
    --config — full-run reproducibility from the artifact alone."""
    cfg0 = Config(
        num_class=3, kvalue=9, edge_filters=(8, 8), minibatch_size=2,
        io_type="synthetic", knn_every=2,
    )
    p = tmp_path / "saved.json"
    p.write_text(cfg0.to_json())
    cfg = parse_args(["train", "-c", str(p)])
    assert cfg.kvalue == 9 and cfg.num_class == 3
    assert cfg.edge_filters == (8, 8) and cfg.knn_every == 2


def test_short_flags_unaffected_by_config_preparser():
    """-cs (checkpoint_step) must not be eaten as '-c s' by the --config
    token scan (argparse prefix matching broke this once)."""
    cfg = parse_args(["train", "-cs", "500", "-io", "synthetic"])
    assert cfg.checkpoint_step == 500


def test_config_enum_values_validated(tmp_path):
    """Values from --config bypass argparse choices; Config.validate must
    catch enum typos (precision='bf16' would silently train in f32)."""
    import dataclasses

    cfg = Config(num_class=2, kvalue=4, edge_filters=(8,), minibatch_size=1,
                 io_type="synthetic")
    with pytest.raises(ValueError, match="precision must be one of"):
        dataclasses.replace(cfg, precision="bf16").validate()
    with pytest.raises(ValueError, match="lr_schedule must be one of"):
        dataclasses.replace(cfg, lr_schedule="linear").validate()


def test_train_config_iteration_not_applied_to_inference(tmp_path):
    """`iteration` means train STEPS on train but MAX BATCHES on
    inference — a train config file must not silently truncate an
    inference run."""
    import json

    f = tmp_path / "train.json"
    f.write_text(json.dumps({"iteration": 10000, "kvalue": 7}))
    cfg = parse_args(["inference", "-c", str(f), "-io", "synthetic",
                      "-mp", "x.ckpt"])
    assert cfg.kvalue == 7            # model flags apply
    assert cfg.iteration == 0         # train-only key skipped


def test_config_joined_short_form_rejected(tmp_path):
    """-cFILE / --conf abbreviations must error, not silently drop the
    config (the token scan only understands the exact spellings)."""
    import json

    f = tmp_path / "c.json"
    f.write_text(json.dumps({"kvalue": 9}))
    with pytest.raises(SystemExit, match="must be passed"):
        parse_args(["train", f"-c{f}", "-io", "synthetic"])


def test_class_weights_values_validated():
    import dataclasses

    cfg = Config(num_class=2, kvalue=4, edge_filters=(8,), minibatch_size=1,
                 io_type="synthetic")
    with pytest.raises(ValueError, match="positive numbers"):
        dataclasses.replace(cfg, class_weights=(1.0, -2.0)).validate()
    with pytest.raises(ValueError, match="positive numbers"):
        dataclasses.replace(cfg, class_weights=(0.0, 1.0)).validate()
    with pytest.raises(ValueError, match="positive numbers"):
        dataclasses.replace(cfg, class_weights=("1.0", "2.0")).validate()

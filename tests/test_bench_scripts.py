"""Benchmark-harness smoke: the measurement scripts stay runnable.

bench.py / benchmarks/{profile_step,convergence}.py normally run on the
real TPU only; these tiny-config CPU smokes keep their code paths from
rotting between hardware runs (they have broken at exactly the moments
a round wanted numbers)."""

import importlib
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_measure_smoke():
    sys.path.insert(0, ROOT)
    try:
        import bench

        pps, ms = bench.measure(
            256, 1, 1, use_pallas=False, precision="default"
        )
    finally:
        sys.path.remove(ROOT)
    assert pps > 0 and ms > 0


def test_profile_step_smoke(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_N", "256")
    monkeypatch.setenv("BENCH_B", "1")
    monkeypatch.setenv("BENCH_ITERS", "1")
    monkeypatch.setenv("BENCH_PALLAS", "0")
    monkeypatch.setenv("BENCH_KNN_EVERY", "2")
    sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
    try:
        import profile_step

        importlib.reload(profile_step)  # re-read the env knobs
        profile_step.main()
    finally:
        sys.path.remove(os.path.join(ROOT, "benchmarks"))
    out = capsys.readouterr().out
    assert "train step (fwd+bwd+opt)" in out


def test_convergence_run_smoke(monkeypatch):
    sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
    try:
        import convergence

        r = convergence.run(
            steps=3,
            n_point=256,
            edge_filters=(8, 8),
            head=(16, (16,)),
            minibatch=1,
            num_events=2,
            kvalue=4,
            use_pallas=False,
            num_devices=1,
            knn_every=2,
        )
    finally:
        sys.path.remove(os.path.join(ROOT, "benchmarks"))
    assert 0.0 <= r["val_acc"] <= 1.0 and 0.0 <= r["val_miou"] <= 1.0
    assert r["final_loss"] > 0


def test_bench_knn_smoke(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_N", "256")
    monkeypatch.setenv("BENCH_C", "8")
    monkeypatch.setenv("BENCH_K", "5")
    monkeypatch.setenv("BENCH_FULL", "0")
    sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
    try:
        import bench_knn

        importlib.reload(bench_knn)
        bench_knn.main()
    finally:
        sys.path.remove(os.path.join(ROOT, "benchmarks"))
    out = capsys.readouterr().out
    assert "ms" in out


def test_bench_io_smoke(monkeypatch, capsys, tmp_path):
    monkeypatch.setenv("BENCH_EVENTS", "16")
    monkeypatch.setenv("BENCH_POINTS", "128")
    monkeypatch.chdir(tmp_path)  # scripts write fixture files
    sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
    try:
        import bench_io

        importlib.reload(bench_io)
        bench_io.main()
    finally:
        sys.path.remove(os.path.join(ROOT, "benchmarks"))
    out = capsys.readouterr().out
    assert "events/s" in out or "ev/s" in out or "s]" in out, out[-400:]


def test_tpu_gate_smoke(monkeypatch, capsys):
    """tpu_gate.py must stay runnable (tiny CPU config); on hardware it
    is the per-round bit-exactness/serving/convergence gate."""
    monkeypatch.setenv("GATE_N", "384")
    monkeypatch.setenv("GATE_RING_N", "256")
    monkeypatch.setenv("GATE_CONV_STEPS", "8")
    monkeypatch.setenv("GATE_CONV_N", "256")
    sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
    try:
        import tpu_gate

        importlib.reload(tpu_gate)
        rc = tpu_gate.main()
    finally:
        sys.path.remove(os.path.join(ROOT, "benchmarks"))
    out = capsys.readouterr().out
    import json

    line = json.loads(out.strip().splitlines()[-1])
    assert line["knn_mismatches"] == 0
    assert line["knn_samescore_disagreements"] == 0
    assert line["rdma_mismatches"] == 0
    assert line["export_max_abs_diff"] == 0.0
    assert line["export_poly_max_abs_diff"] <= 1e-5
    assert rc == 0 and line["ok"], line


def test_bench_serving_smoke(monkeypatch, capsys):
    monkeypatch.setenv("SERVE_N", "256")
    monkeypatch.setenv("SERVE_B", "2")
    monkeypatch.setenv("SERVE_EVENTS", "6")
    sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
    try:
        import bench_serving

        importlib.reload(bench_serving)
        bench_serving.main()
    finally:
        sys.path.remove(os.path.join(ROOT, "benchmarks"))
    import json

    line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["value"] > 0 and line["batches"] == 3


def test_ab_block_impl_smoke(monkeypatch, capsys):
    """ab_block_impl.py (the interleaved A/B driver behind the block_impl
    default decision) must stay runnable on CPU at a tiny config."""
    monkeypatch.setenv("BENCH_N", "256")
    monkeypatch.setenv("BENCH_B", "1")
    monkeypatch.setenv("BENCH_ITERS", "2")
    sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
    try:
        import ab_block_impl

        importlib.reload(ab_block_impl)
        ab_block_impl.main()
    finally:
        sys.path.remove(os.path.join(ROOT, "benchmarks"))
    out = capsys.readouterr().out
    assert "edge" in out and "fused" in out and "median" in out


def test_sweep_banded_tiles_smoke(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_N", "512")
    monkeypatch.setenv("BENCH_W", "128")
    monkeypatch.setenv("BENCH_ITERS", "1")
    sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
    try:
        import sweep_banded_tiles

        importlib.reload(sweep_banded_tiles)
        sweep_banded_tiles.main()
    finally:
        sys.path.remove(os.path.join(ROOT, "benchmarks"))
    assert "ps/pair" in capsys.readouterr().out

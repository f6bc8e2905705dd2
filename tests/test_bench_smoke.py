"""Smoke tests for the bench harness paths (tiny shapes, virtual CPU).

Guards the driver contract: bench.py must print exactly one JSON line with
metric/value/unit/vs_baseline for both pixel and latent modes.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _run_mode(capsys, **env):
    import importlib
    import bench

    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        importlib.reload(bench)
        bench.main()
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in rec, f"bench JSON missing {key}"
    assert rec["value"] > 0
    return rec


def test_bench_pixel_tiny(capsys):
    rec = _run_mode(capsys, BENCH_TINY="1", BENCH_CHAINS="2", BENCH_ITERS="1",
                    BENCH_MODE="pixel")
    assert "hmc" in rec["metric"]


def test_bench_latent_tiny(capsys):
    rec = _run_mode(capsys, BENCH_TINY="1", BENCH_CHAINS="2", BENCH_ITERS="1",
                    BENCH_MODE="latent")
    assert "latent" in rec["metric"]

"""Multi-host (multi-process) execution tests.

The reference has no distributed backend at all (SURVEY.md section 2.3:
one hard-coded CUDA device, main_sampling.py:1030). These tests launch a
REAL 2-process JAX cluster on CPU (gloo collectives, 2 virtual devices per
process -> 4 global devices) and drive the actual CLI through both
multi-host work decompositions:

  - cooperative: chains sharded over a cross-process global mesh, all
    processes on the same image, process-0-only artifacts/metrics
  - data-sharded: processes split the dataset, metric rows gathered and
    written by process 0

plus unit tests of the single-process fallbacks in parallel.multihost.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
CFG = os.path.join(REPO, "configs", "tiny_test.yaml")
WORKER = os.path.join(REPO, "tests", "mh_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(cli_args, tmp_path, nproc=2, timeout=600):
    """Run `python tests/mh_worker.py <cli_args>` in nproc coordinated
    processes; return their outputs. Fails the test on any nonzero exit."""
    port = _free_port()
    procs = []
    for rank in range(nproc):
        env = dict(os.environ)
        env.update({
            "NSHMC_DIST": "1",
            "NSHMC_COORDINATOR": f"localhost:{port}",
            "NSHMC_NUM_PROCESSES": str(nproc),
            "NSHMC_PROCESS_ID": str(rank),
            # keep workers off the persistent compile cache of the host run
            "JAX_COMPILATION_CACHE_DIR": str(tmp_path / f"cache{rank}"),
        })
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, *cli_args],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=REPO,
        ))
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"MH_WORKER_DONE rank={rank}" in out
    return outs



@pytest.mark.slow
def test_two_process_cooperative_hmc(tmp_path):
    """4 chains sharded over a 4-device cross-process mesh (2 procs x 2
    devices), both processes cooperating on one image."""
    out_dir = tmp_path / "out"
    outs = _launch([
        "--config", CFG, "-i", str(out_dir), "--no-bf16",
        "--algo", "hmc", "--deg", "inpaint_random",
        "--chains", "4", "--mesh", "4",
        "--tau", "0.1", "--epsilon", "0.05",
        "--hmc_epochs", "1", "--hmc_sampling", "1",
        "--subset_end", "1",
    ], tmp_path)
    # primary wrote the merged metrics + artifacts exactly once
    rows = [json.loads(l) for l in
            open(out_dir / "metrics.jsonl").read().splitlines()]
    assert len(rows) == 1
    assert np.isfinite(rows[0]["psnr"])
    assert os.path.exists(out_dir / "0.png")
    assert os.path.exists(out_dir / "std_dev_map_0.png")
    # both ranks reached the same summary (allgathered samples)
    summaries = [l for o in outs for l in o.splitlines()
                 if l.startswith('{"summary"')]
    assert len(summaries) == 1  # printed on the primary only



@pytest.mark.slow
def test_two_process_data_sharded(tmp_path):
    """2 images split across 2 processes (per-host data sharding), metric
    rows gathered to process 0."""
    out_dir = tmp_path / "out"
    _launch([
        "--config", CFG, "-i", str(out_dir), "--no-bf16",
        "--algo", "ddnm", "--deg", "sr2",
        "--subset_end", "2",
    ], tmp_path)
    rows = sorted(
        (json.loads(l) for l in
         open(out_dir / "metrics.jsonl").read().splitlines()),
        key=lambda r: r["idx"])
    assert [r["idx"] for r in rows] == [0, 1]
    assert all(np.isfinite(r["psnr"]) for r in rows)
    # each process saved the artifacts for its own images
    for i in (0, 1):
        assert os.path.exists(out_dir / f"{i}.png")
        assert os.path.exists(out_dir / f"orig_{i}.png")


def test_single_process_fallbacks():
    """multihost helpers degrade to identity in the ordinary 1-process
    runtime (the path every other test exercises implicitly)."""
    from nshmc_tpu.parallel import multihost as mh

    assert mh.process_count() == 1
    assert mh.is_primary()
    assert mh.shard_files(["a", "b", "c"]) == ["a", "b", "c"]
    rows = [{"idx": 0, "psnr": 1.0}]
    assert mh.gather_records(rows) == rows
    mh.sync()  # no-op

    mesh = mh.global_chain_mesh(2)
    assert mesh.devices.size == 2 and mesh.axis_names == ("chain",)

    # make_global_chain_states on a local mesh == plain sharded device_put
    import jax
    states = {"x": np.arange(8, dtype=np.float32).reshape(2, 4)}
    g = mh.make_global_chain_states(mesh, states)
    np.testing.assert_array_equal(np.asarray(g["x"]), states["x"])
    pulled = mh.fetch_local_shards(g)
    np.testing.assert_array_equal(pulled["x"], states["x"])

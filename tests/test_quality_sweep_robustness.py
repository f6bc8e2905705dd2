"""Sweep-harness robustness: a worker that dies mid-slice must surface its
remaining combos as status=error rows (with the worker's exit code and
stderr tail), never silently drop them as '—' cells (VERDICT r3 weak #5 /
ADVICE r2). Uses the QUALITY_SWEEP_TEST_DIE hook to kill the in-process
worker before a chosen combo, exactly like an OOM/segfault would."""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP = os.path.join(ROOT, "scripts", "quality_sweep.py")


def test_killed_inproc_worker_records_error(tmp_path):
    out = tmp_path / "sweep.json"
    env = dict(os.environ)
    env["QUALITY_SWEEP_OUT"] = str(out)
    env["QUALITY_SWEEP_TEST_DIE"] = "hmc:denoise"
    p = subprocess.run(
        [sys.executable, SWEEP, "--inproc", "1",
         "--only", "hmc:denoise", "--timeout", "60"],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=300)
    assert p.returncode == 0, p.stderr[-2000:]
    rows = json.loads(out.read_text())
    row = {(r["algo"], r["deg"]): r for r in rows}[("hmc", "denoise")]
    assert row["status"] == "error"
    assert any("worker exited rc=137" in s
               for s in row.get("stderr_tail", [])), row
    # no stray artifacts in the repo scripts/ dir from this test run
    assert (tmp_path / "quality_sweep_worker0.stderr").exists()

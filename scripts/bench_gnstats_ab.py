"""A/B the remat_save_gn_stats knob on hardware (VERDICT r2 item 2).

The round-2 device trace (scripts/trace_classify.json) attributes ~51% of
device time to GroupNorm-stat reduce fusions; with remat=big those stat
passes run TWICE for every >=128^2 unit (forward + backward recompute).
remat_save_gn_stats=True stores the (B,C) mean/var tensors as remat
residuals (jax.checkpoint_policies.save_only_these_names("gn_stats"),
models/unet.py:386) so the backward recompute skips the stats reduces at
the cost of negligible HBM ((B,C) floats per norm).

Runs bench.py twice (control / treatment) in separate processes at the
same fuse so relay-load drift is the only confound; appends both rows to
scripts/perf_results.jsonl.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "scripts", "perf_results.jsonl")


def run(tag, save_gn):
    env = dict(os.environ)
    env.update({
        "BENCH_FUSE": os.environ.get("AB_FUSE", "4"),
        "BENCH_SAVE_GN_STATS": "1" if save_gn else "0",
    })
    try:
        p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           env=env, capture_output=True, text=True,
                           timeout=3000)
    except subprocess.TimeoutExpired as e:
        rec = {"tag": tag, "status": "error",
               "error": f"timeout after {e.timeout}s"}
        print(json.dumps(rec), flush=True)
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return rec
    line = [l for l in p.stdout.splitlines() if l.startswith("{")]
    rec = None
    if line:
        try:
            d = json.loads(line[-1])["detail"]
            rec = {"tag": tag, "batch": d["chains"], "fused_evals":
                   d["fused_evals_per_call"],
                   "sec_per_eval": d["sec_per_energy_grad_batch"],
                   "evals_per_s": d["energy_grad_evals_per_s"],
                   "compile_s": d["compile_s"], "save_gn_stats": save_gn,
                   "remat": d["remat"], "gn_impl": d["gn_impl"]}
        except (json.JSONDecodeError, KeyError, TypeError) as e:
            rec = {"tag": tag, "status": "error",
                   "error": f"unparseable output ({e}): {line[-1][:300]}"}
    if rec is None:
        rec = {"tag": tag, "status": "error",
               "error": (p.stderr or "no output")[-500:]}
    print(json.dumps(rec), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    return rec


if __name__ == "__main__":
    run("ab-gnstats-control", False)
    run("ab-gnstats-saved", True)

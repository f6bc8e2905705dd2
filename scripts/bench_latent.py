"""Record the latent-mode flagship bench (BASELINE.json's hmc_latent config).

Runs bench.py with BENCH_MODE=latent in a subprocess (poisoned-client
isolation, same as bench_configs.py) and appends the row to
scripts/perf_results.jsonl — the one BASELINE.json:6-12 config that never
got a recorded number (VERDICT r2 missing #1).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "scripts", "perf_results.jsonl")

if __name__ == "__main__":
    env = dict(os.environ)
    env["BENCH_MODE"] = "latent"
    if len(sys.argv) > 1:
        env["BENCH_ITERS"] = sys.argv[1]
    try:
        p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           env=env, capture_output=True, text=True,
                           timeout=3600)
    except subprocess.TimeoutExpired as e:
        rec = {"tag": "cfg-latent_hmc", "status": "error",
               "error": f"timeout after {e.timeout}s"}
        print(json.dumps(rec), flush=True)
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
        sys.exit(1)
    lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    rec = None
    if lines:
        try:
            out = json.loads(lines[-1])
            rec = {"tag": "cfg-latent_hmc", "metric": out["metric"],
                   "value": out["value"], "unit": out["unit"],
                   **{k: v for k, v in out.get("detail", {}).items()
                      if k not in ("device",)}}
        except (json.JSONDecodeError, KeyError, TypeError) as e:
            rec = {"tag": "cfg-latent_hmc", "status": "error",
                   "error": f"unparseable output ({e}): {lines[-1][:300]}"}
    if rec is None:
        rec = {"tag": "cfg-latent_hmc", "status": "error",
               "error": (p.stderr or "no output")[-800:]}
    print(json.dumps(rec), flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")

"""Full (algo x degradation) e2e sweep through the CLI at tiny shapes.

Runs every algorithm the framework exposes against every degradation the
operator registry supports (ref: main_sampling.py:128-344 dispatch tables),
each as a real subprocess through `nshmc_tpu.cli.main` on CPU, asserting
the run completes and produces finite metrics. This catches registry/shape
integration gaps that unit tests cannot (e.g. spectral algos on operators
with degenerate singulars, latent drivers on measurement shapes).

Combos the REFERENCE itself cannot run are marked n/a rather than failed:
SVD-based algorithms (ddnm/ddrm/dmps/pigdm/reddiff/diffpir/ddrm-init) need
a linear operator; phase/hdr/deblur_nonlinear are nonlinear (Hfuncs.py:115
is_linear -> False; the reference crashes calling .V/.Ut on them).

Usage: python scripts/quality_sweep.py [--jobs N] [--timeout S]
Writes scripts/quality_sweep.json and rewrites the matrix in RESULTS.md
between the QUALITY_SWEEP markers.
"""
import argparse
import concurrent.futures as cf
import json
import os
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PIXEL_ALGOS = [
    "hmc", "hmc_cond", "dmplug_adam", "dmplug_lbfgs", "dps", "pigdm",
    "dmps", "reddiff", "ddnm", "ddrm", "diffpir", "daps",
]
LATENT_ALGOS = ["hmc_latent", "resample", "resample_original"]
DEGS = [
    "sr2", "sr_bicubic4", "inpaint_random", "inpaint_box", "deblur_gauss",
    "deblur_aniso", "deblur_nonlinear", "phase", "hdr", "cs2", "color",
    "denoise",
]

# algorithms that require the SVD protocol (linear operators only) — the
# reference's H_functions raises on .V/.Vt/.singulars for nonlinear ops
SVD_ALGOS = {"dps", "pigdm", "dmps", "reddiff", "ddnm", "ddrm", "diffpir"}
NONLINEAR_DEGS = {"deblur_nonlinear", "phase", "hdr"}
# DPS/DAPS only need H (gradient guidance), they run on nonlinear ops
GRAD_ONLY = {"dps", "daps"}

LAUNCHER = (
    "import jax; jax.config.update('jax_platforms','cpu'); "
    "import sys; from nshmc_tpu.cli import main; main(sys.argv[1:])"
)


def combo_args(algo, deg, outdir):
    common = ["--deg", deg, "-i", outdir, "--subset_end", "1", "--no-bf16",
              "--seed", "1234"]
    if algo in LATENT_ALGOS:
        args = ["--config", "configs/tiny_latent_test.yaml", "--algo", algo]
        if algo == "hmc_latent":
            args += ["--latent_epochs", "2", "--latent_sampling", "1",
                     "--tau", "0.1", "--epsilon", "0.05"]
        return args + common
    args = ["--config", "configs/tiny_test.yaml", "--algo", algo]
    if algo in ("hmc", "hmc_cond"):
        args += ["--hmc_epochs", "2", "--hmc_sampling", "1",
                 "--tau", "0.1", "--epsilon", "0.05"]
    return args + common


def run_combo(algo, deg, timeout):
    if algo in SVD_ALGOS and algo not in GRAD_ONLY and deg in NONLINEAR_DEGS:
        return {"algo": algo, "deg": deg, "status": "n/a",
                "note": "SVD algo on nonlinear operator (reference crashes too)"}
    if algo in ("dps",) and deg in NONLINEAR_DEGS and deg != "phase":
        # reference DPS phase-retrieval is the only nonlinear DPS task it
        # tables (main_sampling.py:139-147); hdr/nonlinear-blur DPS still run
        pass
    t0 = time.time()
    with tempfile.TemporaryDirectory() as outdir:
        cmd = [sys.executable, "-c", LAUNCHER] + combo_args(algo, deg, outdir)
        try:
            p = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                               timeout=timeout)
        except subprocess.TimeoutExpired:
            return {"algo": algo, "deg": deg, "status": "timeout",
                    "wall_s": round(time.time() - t0, 1)}
        rec = {"algo": algo, "deg": deg, "wall_s": round(time.time() - t0, 1)}
        if p.returncode != 0:
            rec["status"] = "error"
            rec["stderr_tail"] = p.stderr.strip().splitlines()[-8:]
            return rec
        summary = None
        for line in p.stdout.splitlines():
            if line.startswith('{"summary"'):
                summary = json.loads(line)["summary"]
        if summary is None:
            rec["status"] = "no-summary"
            rec["stdout_tail"] = p.stdout.strip().splitlines()[-5:]
            return rec
        import math

        finite = all(
            isinstance(v, (int, float)) and math.isfinite(v)
            for v in summary.values()
        )
        rec["status"] = "ok" if finite else "nonfinite"
        rec["psnr"] = summary.get("psnr")
        return rec


def render_matrix(results):
    algos = PIXEL_ALGOS + LATENT_ALGOS
    by = {(r["algo"], r["deg"]): r for r in results}
    lines = ["| algo \\ deg | " + " | ".join(DEGS) + " |",
             "|---" * (len(DEGS) + 1) + "|"]
    for a in algos:
        cells = []
        for d in DEGS:
            r = by.get((a, d))
            if r is None:
                cells.append("—")
            elif r["status"] == "ok":
                cells.append(f"{r['psnr']:.1f}" if r.get("psnr") is not None
                             else "ok")
            elif r["status"] == "n/a":
                cells.append("n/a")
            else:
                cells.append("FAIL")
        lines.append(f"| {a} | " + " | ".join(cells) + " |")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", type=int, default=6)
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--only", default="",
                    help="comma list algo:deg pairs to (re)run")
    args = ap.parse_args()

    combos = [(a, d) for a in PIXEL_ALGOS + LATENT_ALGOS for d in DEGS]
    if args.only:
        want = {tuple(x.split(":")) for x in args.only.split(",")}
        combos = [c for c in combos if c in want]

    results = []
    with cf.ThreadPoolExecutor(max_workers=args.jobs) as ex:
        futs = {ex.submit(run_combo, a, d, args.timeout): (a, d)
                for a, d in combos}
        for fut in cf.as_completed(futs):
            r = fut.result()
            results.append(r)
            print(json.dumps(r), flush=True)

    out_path = os.path.join(ROOT, "scripts", "quality_sweep.json")
    prior = []
    if args.only and os.path.exists(out_path):
        with open(out_path) as f:
            prior = [r for r in json.load(f)
                     if (r["algo"], r["deg"]) not in
                     {(x["algo"], x["deg"]) for x in results}]
    results = prior + results
    with open(out_path, "w") as f:
        json.dump(sorted(results, key=lambda r: (r["algo"], r["deg"])), f,
                  indent=1)

    matrix = render_matrix(results)
    n_ok = sum(r["status"] == "ok" for r in results)
    n_na = sum(r["status"] == "n/a" for r in results)
    n_bad = len(results) - n_ok - n_na
    header = (f"{n_ok} ok / {n_na} n/a (nonlinear-operator combos the "
              f"reference cannot run either) / {n_bad} failing, "
              f"cell = PSNR(dB) of a tiny-shape random-weights CPU run")
    block = ("<!-- QUALITY_SWEEP_BEGIN -->\n"
             f"### Algo x degradation e2e sweep (tiny shapes, CPU)\n\n"
             f"{header}\n\n{matrix}\n<!-- QUALITY_SWEEP_END -->")
    res_md = os.path.join(ROOT, "RESULTS.md")
    with open(res_md) as f:
        txt = f.read()
    if "QUALITY_SWEEP_BEGIN" in txt:
        import re

        txt = re.sub(r"<!-- QUALITY_SWEEP_BEGIN -->.*<!-- QUALITY_SWEEP_END -->",
                     block, txt, flags=re.S)
    else:
        txt = txt.rstrip() + "\n\n" + block + "\n"
    with open(res_md, "w") as f:
        f.write(txt)
    print(f"\n{n_ok} ok, {n_na} n/a, {n_bad} failing -> RESULTS.md updated")


if __name__ == "__main__":
    main()

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
    if algo == "dmplug_lbfgs":
        # reduced budget at tiny shapes (mirrors the reduced hmc epochs);
        # convergence exits usually stop it much earlier anyway
        args += ["--lbfgs_epochs", "30", "--lbfgs_inner", "10"]
    return args + common


def na_check(algo, deg):
    """Combos the reference itself cannot run (Hfuncs.py:115 is_linear)."""
    if algo in SVD_ALGOS and algo not in GRAD_ONLY and deg in NONLINEAR_DEGS:
        return {"algo": algo, "deg": deg, "status": "n/a",
                "note": "SVD algo on nonlinear operator (reference crashes too)"}
    return None


def worker_main(combos, timeout):
    """In-process sweep worker: one JAX runtime for a whole combo slice.

    On a 2-core host each subprocess pays ~15 s of interpreter+JAX startup;
    looping in-process amortizes that over the slice. Per-combo isolation
    is a try/except + SIGALRM watchdog instead of a process boundary.
    Emits one 'SWEEPRESULT {json}' line per combo for the parent to stream.
    """
    import contextlib
    import io
    import math
    import signal

    if ROOT not in sys.path:
        sys.path.insert(0, ROOT)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from nshmc_tpu.cli import main as cli_main

    class _Timeout(Exception):
        pass

    def _alarm(signum, frame):
        raise _Timeout()

    signal.signal(signal.SIGALRM, _alarm)

    for algo, deg in combos:
        # test hook (tests/test_quality_sweep_robustness.py): simulate a
        # worker dying mid-slice (OOM/segfault) before this combo runs
        if os.environ.get("QUALITY_SWEEP_TEST_DIE") == f"{algo}:{deg}":
            os._exit(137)
        t0 = time.time()
        rec = {"algo": algo, "deg": deg}
        buf = io.StringIO()
        try:
            with tempfile.TemporaryDirectory() as outdir:
                signal.alarm(timeout)
                try:
                    with contextlib.redirect_stdout(buf):
                        cli_main(combo_args(algo, deg, outdir))
                finally:
                    signal.alarm(0)
            rec["wall_s"] = round(time.time() - t0, 1)
            summary = None
            for line in buf.getvalue().splitlines():
                if line.startswith('{"summary"'):
                    summary = json.loads(line)["summary"]
            if summary is None:
                rec["status"] = "no-summary"
                rec["stdout_tail"] = buf.getvalue().strip().splitlines()[-5:]
            else:
                finite = all(isinstance(v, (int, float)) and math.isfinite(v)
                             for v in summary.values())
                rec["status"] = "ok" if finite else "nonfinite"
                rec["psnr"] = summary.get("psnr")
        except _Timeout:
            rec["status"] = "timeout"
            rec["wall_s"] = round(time.time() - t0, 1)
        except BaseException as e:  # noqa: BLE001 — isolate combos
            rec["status"] = "error"
            rec["wall_s"] = round(time.time() - t0, 1)
            rec["stderr_tail"] = [f"{type(e).__name__}: {e}"]
        print("SWEEPRESULT " + json.dumps(rec), flush=True)


def run_combo(algo, deg, timeout):
    na = na_check(algo, deg)
    if na is not None:
        return na
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


def write_outputs(results):
    # QUALITY_SWEEP_OUT redirects the JSON (and skips the RESULTS.md
    # rewrite) so tests can run the sweep without touching repo artifacts
    out_override = os.environ.get("QUALITY_SWEEP_OUT", "")
    out_path = out_override or os.path.join(ROOT, "scripts",
                                            "quality_sweep.json")
    with open(out_path, "w") as f:
        json.dump(sorted(results, key=lambda r: (r["algo"], r["deg"])), f,
                  indent=1)
    if out_override:
        return
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", type=int, default=6,
                    help="subprocess-per-combo concurrency (legacy mode)")
    ap.add_argument("--inproc", type=int, default=0,
                    help="use N in-process worker slices instead of a "
                         "subprocess per combo (amortizes JAX startup). "
                         "NOTE: the per-combo --timeout is a SIGALRM "
                         "watchdog that only fires between Python "
                         "bytecodes — a combo stuck inside one native "
                         "XLA compile/execute call can overrun it "
                         "(subprocess mode hard-kills instead)")
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--only", default="",
                    help="comma list algo:deg pairs to (re)run")
    ap.add_argument("--resume", action="store_true",
                    help="skip combos already ok/n-a in quality_sweep.json")
    ap.add_argument("--worker-combos", default="",
                    help="(internal) run this combo slice in-process")
    args = ap.parse_args()

    if args.worker_combos:
        combos = [tuple(x.split(":")) for x in args.worker_combos.split(",")]
        worker_main(combos, args.timeout)
        return

    combos = [(a, d) for a in PIXEL_ALGOS + LATENT_ALGOS for d in DEGS]
    if args.only:
        want = {tuple(x.split(":")) for x in args.only.split(",")}
        combos = [c for c in combos if c in want]

    out_path = os.path.join(ROOT, "scripts", "quality_sweep.json")
    prior = []
    if (args.resume or args.only) and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f)
    if args.resume:
        done = {(r["algo"], r["deg"]) for r in prior
                if r["status"] in ("ok", "n/a")}
        combos = [c for c in combos if c not in done]
        prior = [r for r in prior if (r["algo"], r["deg"]) in done]

    results = []

    def record(r):
        results.append(r)
        print(json.dumps(r), flush=True)
        keep = [p for p in prior if (p["algo"], p["deg"]) not in
                {(x["algo"], x["deg"]) for x in results}]
        write_outputs(keep + results)

    if args.inproc:
        live = [c for c in combos if na_check(*c) is None]
        for c in combos:
            na = na_check(*c)
            if na is not None:
                record(na)
        slices = [live[i::args.inproc] for i in range(args.inproc)]
        procs = []
        for wi, sl in enumerate(slices):
            if not sl:
                continue
            spec = ",".join(f"{a}:{d}" for a, d in sl)
            errdir = (os.path.dirname(os.environ.get("QUALITY_SWEEP_OUT", ""))
                      or os.path.join(ROOT, "scripts"))
            errpath = os.path.join(errdir, f"quality_sweep_worker{wi}.stderr")
            procs.append((subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--worker-combos", spec, "--timeout", str(args.timeout)],
                cwd=ROOT, stdout=subprocess.PIPE,
                stderr=open(errpath, "w"), text=True), sl, errpath))

        import threading

        lock = threading.Lock()

        def drain(entry):
            p, sl, errpath = entry
            seen = set()
            # record each result as it streams so a mid-run kill still
            # leaves quality_sweep.json/RESULTS.md current
            for line in p.stdout:
                if line.startswith("SWEEPRESULT "):
                    r = json.loads(line[len("SWEEPRESULT "):])
                    seen.add((r["algo"], r["deg"]))
                    with lock:
                        record(r)
            rc = p.wait()
            # a worker that died mid-slice (OOM/segfault) silently drops
            # its remaining combos — record them as errors, not '—'
            dropped = [c for c in sl if tuple(c) not in seen]
            if dropped:
                tail = []
                try:
                    with open(errpath) as f:
                        tail = f.read().strip().splitlines()[-8:]
                except OSError:
                    pass
                for a, d in dropped:
                    with lock:
                        record({"algo": a, "deg": d, "status": "error",
                                "stderr_tail":
                                    [f"worker exited rc={rc}"] + tail})

        if procs:
            with cf.ThreadPoolExecutor(max_workers=len(procs)) as ex:
                list(ex.map(drain, procs))
    else:
        with cf.ThreadPoolExecutor(max_workers=args.jobs) as ex:
            futs = {ex.submit(run_combo, a, d, args.timeout): (a, d)
                    for a, d in combos}
            for fut in cf.as_completed(futs):
                record(fut.result())

    keep = [p for p in prior if (p["algo"], p["deg"]) not in
            {(x["algo"], x["deg"]) for x in results}]
    write_outputs(keep + results)


if __name__ == "__main__":
    main()

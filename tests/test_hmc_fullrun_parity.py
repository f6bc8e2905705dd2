"""Whole-run sampler-statistics parity vs the ACTUAL reference samplers.

Runs the real reference `hmc()` (main_sampling.py:660-774) and
`hmc_latent()` (main_sampling_latent.py:623-762) — imported via
tests/_reference_shim.py, torch CPU, tiny shapes — to COMPLETION of their
full hard-coded budgets (100 accepted epochs pixel / 70 attempts latent),
and compares whole-run statistics against our jitted `run_chain` /
`run_latent_chain` engines on the same model weights, operator and
measurement:

  - acceptance rate (pooled over seeds/chains, binomial-error tolerance)
  - step-size backoff trajectory: final tau at exit (pixel: parsed from the
    reference's per-epoch prints; the x0.95-per-extra-rejection rule
    compounds multiplicatively, so agreement here is sensitive to the whole
    accept/reject/backoff interaction)
  - posterior moments of the returned sample stacks (mean/std within MC
    error) and mean PSNR to the ground-truth image
  - the sigma_y annealing trail (deterministic: parsed reference prints
    must equal our `_sigma_y` formula exactly per epoch)

RNG is NOT shared (reference uses global torch RNG; SURVEY.md section 7c):
all comparisons are statistical, with tolerances set from the per-run
binomial/MC spread observed across seeds. Step-level and trajectory-level
parity (shared-RNG) live in test_hmc_parity.py / test_latent_hmc_parity.py;
this test closes the remaining gap — the accept/backoff/anneal interaction
over a complete run (VERDICT r3 missing #3).
"""
import contextlib
import io
import os
import re
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from _reference_shim import import_main_sampling, import_main_sampling_latent

from nshmc_tpu.models.unet import UNetConfig, UNetModel
from nshmc_tpu.models.port import port_adm_state_dict
from nshmc_tpu.operators import SuperResolution
from nshmc_tpu.schedules import DiffusionSchedule, DDIMSequence
from nshmc_tpu.sampling.ddim import make_decoder
from nshmc_tpu.hmc.engine import (
    HMCConfig, init_chains, make_pixel_loss_fn, run_chain,
)
from nshmc_tpu.hmc.latent import (
    LatentHMCConfig, init_latent_chains, make_latent_loss_fn,
    run_latent_hmc,
)

D = 16
TINY = dict(
    image_size=D, num_channels=32, num_res_blocks=1, channel_mult="1,2",
    learn_sigma=True, class_cond=False, attention_resolutions="8",
    num_heads=2, num_head_channels=16, num_heads_upsample=-1,
    use_scale_shift_norm=True, dropout=0.0, resblock_updown=True,
    use_fp16=False, use_new_attention_order=False,
)

REF_SEEDS = (7, 8)
N_CHAINS = 8


def _psnr_batch(samples_01, orig_01):
    mse = np.mean((samples_01 - orig_01) ** 2, axis=tuple(range(1, samples_01.ndim)))
    return 10 * np.log10(1.0 / np.maximum(mse, 1e-12))


# ---------------------------------------------------------------------------
# pixel
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pixel_setup():
    ms = import_main_sampling()
    from guided_diffusion.unet_ffhq import create_model
    from obs_functions.Hfuncs import SuperResolution as TSR

    torch.manual_seed(0)
    tmodel = create_model(model_path="/nonexistent", **TINY).eval()
    t_op = TSR(3, D, 2, "cpu")

    ucfg = UNetConfig.from_model_yaml(**TINY)
    ucfg = UNetConfig(**{**ucfg.__dict__, "remat": False})
    params = port_adm_state_dict(tmodel.state_dict(), ucfg)
    jmodel = UNetModel(ucfg)
    j_op = SuperResolution.create(3, D, 2)

    sched = DiffusionSchedule.create(num_timesteps=1000)
    seq = DDIMSequence.create(1000, 3)

    rng = np.random.default_rng(1)
    x_orig_t = torch.tensor(rng.uniform(-1, 1, (1, 3, D, D)).astype(np.float32))
    torch.manual_seed(123)
    y0_t = (t_op.H(x_orig_t) + 0.05 * torch.randn(1, (D // 2) ** 2 * 3)).detach()
    y0_j = jnp.asarray(np.asarray(y0_t))[0]
    return ms, tmodel, t_op, jmodel, params, j_op, sched, seq, x_orig_t, y0_t, y0_j


def _run_reference_pixel(ms, tmodel, t_op, sched, seq, x_orig_t, y0_t, seed,
                         tmp_path):
    """One complete reference hmc() run; returns whole-run statistics."""
    b = torch.tensor(np.asarray(sched.betas, np.float64), dtype=torch.float32)
    opt = types.SimpleNamespace(
        tau=0.1, epsilon=0.05, sigma_0=0.2, m=1.0, algo="hmc", noise="ddpm",
        image_folder=str(tmp_path))
    from algos.unconditional import Unconditional
    algo = Unconditional(tmodel, t_op, opt.sigma_0)

    calls = {"n": 0}
    orig_it = ms.iterative_sampling

    def counting(*a, **k):
        calls["n"] += 1
        return orig_it(*a, **k)

    ms.iterative_sampling = counting
    try:
        torch.manual_seed(seed)
        x = torch.randn(1, 3, D, D)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            samples = ms.hmc(x, 1, b, list(seq.seq), list(seq.seq_next),
                             algo, opt, y0_t, t_op, x_orig_t)
    finally:
        ms.iterative_sampling = orig_it

    out = buf.getvalue()
    L = max(1, int(opt.tau / opt.epsilon))
    attempts = calls["n"] // (L + 1)
    # per-accepted-epoch trail: 'epoch N PSNR: p sigma_y: s tau: t'
    trail = re.findall(
        r"epoch (\d+) PSNR: (\S+) sigma_y: (\S+) tau: (\S+)", out)
    assert len(trail) == 100, f"expected 100 accepted epochs, got {len(trail)}"
    sigma_trail = np.array([float(t[2]) for t in trail])
    final_tau = float(trail[-1][3])
    return dict(
        attempts=attempts,
        accepts=len(trail),
        final_tau=final_tau,
        sigma_trail=sigma_trail,
        samples=np.asarray(samples.detach()),  # (20, 3, D, D) in [-1, 1]
    )


@pytest.mark.slow
def test_pixel_fullrun_statistical_parity(pixel_setup, tmp_path):
    (ms, tmodel, t_op, jmodel, params, j_op, sched, seq,
     x_orig_t, y0_t, y0_j) = pixel_setup

    cfg = HMCConfig(sigma_0=0.2, tau=0.1, epsilon=0.05, epochs=60,
                    sampling=20, max_attempts=600)

    # --- reference runs (full hard-coded 100-accepted-epoch budget) --------
    refs = [_run_reference_pixel(ms, tmodel, t_op, sched, seq, x_orig_t,
                                 y0_t, seed, tmp_path)
            for seed in REF_SEEDS]

    # sigma_y anneal trail is DETERMINISTIC given epoch: exact match with our
    # formula (the print happens after epoch+=1 with sigma from the old e)
    from nshmc_tpu.hmc.engine import _sigma_y
    for r in refs:
        ours = np.array([
            float(_sigma_y(cfg, jnp.asarray(e, jnp.int32))) for e in range(100)
        ])
        np.testing.assert_allclose(r["sigma_trail"], ours, rtol=1e-5)

    # --- our engine: the jitted production path (run_chain) ----------------
    decode = make_decoder(lambda x, t: jmodel.apply(params, x, t), sched, seq)
    loss_fn = make_pixel_loss_fn(decode, j_op, y0_j)
    states = init_chains(jax.random.PRNGKey(3), cfg, N_CHAINS, (D, D, 3))
    out = jax.jit(
        jax.vmap(lambda s: run_chain(loss_fn, cfg, s))
    )(states)
    jax.block_until_ready(out.x)

    assert bool((out.epoch == cfg.total_epochs).all()), (
        f"chains did not complete: epochs={np.asarray(out.epoch)}")

    # --- acceptance rate ---------------------------------------------------
    ref_rate = sum(r["accepts"] for r in refs) / sum(r["attempts"] for r in refs)
    j_rate = float(np.sum(np.asarray(out.accepted))
                   / np.sum(np.asarray(out.attempts)))
    # per-run binomial spread at ~150 attempts is ~0.04; pooled tolerance 3x
    assert abs(ref_rate - j_rate) < 0.12, (ref_rate, j_rate)

    # --- backoff trajectory: final tau -------------------------------------
    # tau decays x0.95 per rejection-beyond-the-first-consecutive; the exit
    # value compounds every backoff event of the whole run
    ref_log_tau = np.mean([np.log(r["final_tau"]) for r in refs])
    j_log_tau = float(np.mean(np.log(np.asarray(out.tau))))
    assert abs(ref_log_tau - j_log_tau) < np.log(3.0), (
        np.exp(ref_log_tau), np.exp(j_log_tau))
    # both must have actually backed off (acceptance < 1 at these params)
    assert np.exp(ref_log_tau) < cfg.tau and np.exp(j_log_tau) < cfg.tau

    # --- posterior moments of the kept sample stacks -----------------------
    ref_samples = np.concatenate([r["samples"] for r in refs])  # (N,3,D,D)
    j_samples = np.asarray(out.samples)  # (chains, 20, D, D, 3)
    j_flat = j_samples.reshape(-1, D, D, 3).transpose(0, 3, 1, 2)

    assert abs(ref_samples.mean() - j_flat.mean()) < 0.1
    assert abs(ref_samples.std() - j_flat.std()) < 0.1

    orig01 = (np.asarray(x_orig_t) + 1) / 2
    ref_psnr = _psnr_batch((ref_samples + 1) / 2, orig01).mean()
    j_psnr = _psnr_batch((j_flat + 1) / 2, orig01).mean()
    assert abs(ref_psnr - j_psnr) < 1.5, (ref_psnr, j_psnr)


# ---------------------------------------------------------------------------
# latent
# ---------------------------------------------------------------------------

Z, DL = 8, 16  # latent 8^2 -> decoded pixel 16^2


class _TStubLDM:
    """Stub latent model exposing exactly what hmc_latent touches: schedule
    buffers, no-grad apply_model (ddpm.py:892), differentiable decoder."""

    def __init__(self, betas, w_eps, w_dec):
        self.betas = torch.tensor(betas, dtype=torch.float32)
        self.alphas_cumprod = torch.cumprod(1.0 - self.betas, dim=0)
        self.alphas_cumprod_prev = torch.cat(
            [torch.ones(1), self.alphas_cumprod[:-1]])
        self.w_eps = torch.tensor(w_eps)  # (3, 3, 3, 3) conv kernel
        self.w_dec = torch.tensor(w_dec)  # scalar-ish decoder gain

    @torch.no_grad()
    def apply_model(self, z, t, cond):
        return torch.nn.functional.conv2d(z, self.w_eps, padding=1)

    def differentiable_decode_first_stage(self, z):
        up = torch.repeat_interleave(
            torch.repeat_interleave(z, 2, dim=-2), 2, dim=-1)
        return torch.tanh(self.w_dec * up)


def test_latent_fullrun_statistical_parity(tmp_path):
    msl = import_main_sampling_latent()
    from obs_functions.Hfuncs import SuperResolution as TSR
    from algos.unconditional_latent import Unconditional_Latent

    T = 100
    sched = DiffusionSchedule.create("quad", 0.0015, 0.0195, T)
    betas = np.asarray(sched.betas, np.float32)
    rng = np.random.default_rng(0)
    w_eps = (rng.standard_normal((3, 3, 3, 3)) * 0.1).astype(np.float32)
    w_dec = np.float32(0.8)

    tmodel = _TStubLDM(betas, w_eps, w_dec)
    t_op = TSR(3, DL, 2, "cpu")

    x_orig_t = torch.tensor(rng.uniform(-1, 1, (1, 3, DL, DL)).astype(np.float32))
    torch.manual_seed(321)
    y0_t = (t_op.H(x_orig_t) + 0.1 * torch.randn(1, (DL // 2) ** 2 * 3)).detach()
    y0_j = jnp.asarray(np.asarray(y0_t))[0]

    seqo = DDIMSequence.create(T, 3)
    cfg = LatentHMCConfig(sigma_0=0.2, sigma_y0=1.0, tau=0.1, epsilon=0.05,
                          epochs=50, sampling=10)

    # --- reference runs ----------------------------------------------------
    def run_ref(seed):
        opt = types.SimpleNamespace(
            tau=cfg.tau, epsilon=cfg.epsilon, sigma_0=cfg.sigma_0,
            sigma_y=cfg.sigma_y0, m=1.0, algo="hmc_latent", noise="ddpm",
            image_folder=str(tmp_path))
        algo = Unconditional_Latent(tmodel, t_op, opt.sigma_0)
        torch.manual_seed(seed)
        z = torch.randn(1, 3, Z, Z)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            samples = msl.hmc_latent(z, 1, list(seqo.seq), list(seqo.seq_next),
                                     algo, opt, y0_t, t_op, x_orig_t)
        out = buf.getvalue()
        accepts = len(re.findall(r"accept: True", out))
        total = len(re.findall(r"accept: (?:True|False)", out))
        assert total == cfg.total_attempts
        return dict(accepts=accepts, total=total,
                    samples=np.asarray(samples.detach()))

    refs = [run_ref(s) for s in (11, 12, 13)]

    # --- our engine --------------------------------------------------------
    def j_model_fn(z, t):
        w = jnp.asarray(w_eps.transpose(2, 3, 1, 0))  # OIHW -> HWIO
        out = jax.lax.conv_general_dilated(
            z, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.lax.stop_gradient(out)

    decode_z = make_decoder(j_model_fn, sched, seqo)

    def decode_first_stage(z0):
        up = jnp.repeat(jnp.repeat(z0, 2, axis=1), 2, axis=2)
        return jnp.tanh(w_dec * up)

    j_op = SuperResolution.create(3, DL, 2)
    loss_fn = make_latent_loss_fn(decode_z, decode_first_stage, j_op, y0_j)
    states = init_latent_chains(jax.random.PRNGKey(5), cfg, N_CHAINS,
                                (Z, Z, 3))
    out = jax.jit(lambda s: run_latent_hmc(loss_fn, cfg, s))(states)
    jax.block_until_ready(out.z)

    # --- acceptance rate ---------------------------------------------------
    ref_rate = (sum(r["accepts"] for r in refs)
                / sum(r["total"] for r in refs))
    j_rate = float(np.mean(np.asarray(out.accepted)) / cfg.total_attempts)
    assert abs(ref_rate - j_rate) < 0.15, (ref_rate, j_rate)

    # --- posterior moments of kept latent samples --------------------------
    # both sides keep the last <=10 post-anneal accepted DDIM-decoded z0
    ref_s = np.concatenate([r["samples"] for r in refs])  # (N, 3, Z, Z)
    kept = np.asarray(out.n_kept)
    j_list = []
    for c in range(N_CHAINS):
        k = min(int(kept[c]), cfg.keep_samples)
        if k > 0:
            j_list.append(np.asarray(out.samples[c, -k:]))
    j_s = np.concatenate(j_list)  # (M, Z, Z, 3)
    assert len(ref_s) > 0 and len(j_s) > 0
    assert abs(ref_s.mean() - j_s.mean()) < 0.15
    assert abs(ref_s.std() - j_s.std()) < 0.15

    # --- sigma at exit: any post-anneal accept pins sigma_y = sigma_0 ------
    assert np.allclose(np.asarray(out.sigma_y), cfg.sigma_0, atol=1e-6) or (
        j_rate < 0.2)

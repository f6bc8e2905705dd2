"""End-to-end HMC trajectory parity against the reference sampler semantics.

Runs our jitted engine and a torch mirror of the reference `hmc` loop
(main_sampling.py:660-774: same integrator, Hamiltonian, annealing, accept
rule) on the SAME tiny ADM U-Net (ported weights), SAME operator, and the
SAME injected randomness (the momentum and uniform draws our engine's key
chain produces are replayed into the torch mirror). Trajectories must agree
step-for-step to float tolerance until/unless a borderline MH coin flips
differently.

This is the strongest cross-implementation check available without the
pretrained checkpoints (SURVEY.md section 7: bitwise parity across RNGs is
impossible — so the RNG is shared by construction here).
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from nshmc_tpu.models.unet import UNetConfig, UNetModel
from nshmc_tpu.models.port import port_adm_state_dict
from nshmc_tpu.operators import SuperResolution
from nshmc_tpu.schedules import DiffusionSchedule, DDIMSequence
from nshmc_tpu.sampling.ddim import make_decoder
from nshmc_tpu.hmc.engine import (
    HMCConfig, ChainState, hmc_attempt, init_chain_state, make_pixel_loss_fn,
)

D = 16
TINY = dict(
    image_size=D, num_channels=32, num_res_blocks=1, channel_mult="1,2",
    learn_sigma=True, class_cond=False, attention_resolutions="8",
    num_heads=2, num_head_channels=16, num_heads_upsample=-1,
    use_scale_shift_norm=True, dropout=0.0, resblock_updown=True,
    use_fp16=False, use_new_attention_order=False,
)


def _replay_randomness(key0, cfg, shape, n_attempts):
    """Reproduce the engine's per-attempt (p0, u) draws from its key chain
    (init_chain_state + hmc_attempt + leapfrog_propose split discipline)."""
    kx, key = jax.random.split(key0)
    x0 = jax.random.normal(kx, shape, jnp.float32)
    draws = []
    for _ in range(n_attempts):
        key, k_prop = jax.random.split(key)
        k_mom, k_acc = jax.random.split(k_prop)
        p0 = jax.random.normal(k_mom, shape, jnp.float32) * np.sqrt(cfg.m)
        u = jax.random.uniform(k_acc)
        draws.append((np.asarray(p0), float(u)))
    return np.asarray(x0), draws


def _torch_decode(tmodel, betas, seq, seq_next, xt):
    """Reference iterative_sampling on the unconditional path
    (main_sampling.py:898-915 + algos/unconditional.py)."""
    b = torch.tensor(betas, dtype=torch.float32)

    def alpha(t):
        bb = torch.cat([torch.zeros(1), b])
        return torch.cumprod(1 - bb, dim=0)[t + 1]

    for i, j in zip(reversed(seq), reversed(seq_next)):
        at = alpha(i)
        at_next = alpha(j)
        t = torch.full((xt.shape[0],), float(i))
        et = tmodel(xt, t)[:, :3]
        x0 = ((xt - et * (1 - at).sqrt()) / at.sqrt()).clip(-1, 1)
        xt = at_next.sqrt() * x0 + (1 - at_next).sqrt() * et
    return xt


@pytest.mark.slow
def test_hmc_trajectory_parity():
    from guided_diffusion.unet_ffhq import create_model
    from obs_functions.Hfuncs import SuperResolution as TSR

    torch.manual_seed(0)
    tmodel = create_model(model_path="/nonexistent", **TINY).eval()
    ucfg = UNetConfig.from_model_yaml(**TINY)
    ucfg = UNetConfig(**{**ucfg.__dict__, "remat": False})
    params = port_adm_state_dict(tmodel.state_dict(), ucfg)
    jmodel = UNetModel(ucfg)

    sched = DiffusionSchedule.create(num_timesteps=1000)
    seq = DDIMSequence.create(1000, 3)
    betas = np.asarray(sched.betas, np.float64)

    j_op = SuperResolution.create(3, D, 2)
    t_op = TSR(3, D, 2, "cpu")

    rng = np.random.default_rng(0)
    x_orig = rng.uniform(-1, 1, (1, 3, D, D)).astype(np.float32)
    y0_t = t_op.H(torch.tensor(x_orig)).detach()
    y0_j = jnp.asarray(np.asarray(y0_t))[0]

    cfg = HMCConfig(sigma_0=0.2, tau=0.1, epsilon=0.05, epochs=2, sampling=1,
                    max_attempts=8)
    L = cfg.n_leapfrog
    decode = make_decoder(lambda x, t: jmodel.apply(params, x, t), sched, seq)
    loss_fn = make_pixel_loss_fn(decode, j_op, y0_j)

    key0 = jax.random.PRNGKey(42)
    state = init_chain_state(key0, cfg, (D, D, 3))
    x0_np, draws = _replay_randomness(key0, cfg, (D, D, 3), cfg.max_attempts)
    np.testing.assert_array_equal(np.asarray(state.x), x0_np)

    attempt = jax.jit(lambda s: hmc_attempt(loss_fn, cfg, s))

    # --- torch mirror of the reference loop with injected randomness ------
    def t_loss_and_grad(x_nchw):
        x = x_nchw.detach().clone().requires_grad_(True)
        xt = _torch_decode(tmodel, betas, seq.seq, seq.seq_next, x).clip(-1, 1)
        loss = torch.sum((y0_t - t_op.H(xt)) ** 2)
        grad = torch.autograd.grad(loss, x)[0]
        return float(loss), grad

    x_t = torch.tensor(x0_np.transpose(2, 0, 1)[None])  # NCHW
    epoch_t = 0
    tau_t, eps_t = cfg.tau, cfg.epsilon
    agreements = 0

    for a in range(cfg.max_attempts):
        if int(state.epoch) >= cfg.total_epochs or epoch_t >= cfg.total_epochs:
            break
        p0_np, u = draws[a]
        # reference sigma_y schedule (engine semantics already unit-tested)
        e = epoch_t
        sigma_y = (cfg.sigma_0 + cfg.anneal_scale * (1 - e / cfg.epochs) ** 2
                   if e < cfg.epochs else cfg.sigma_0)
        if e >= cfg.epochs and tau_t > cfg.post_tau:
            tau_t, eps_t = cfg.post_tau, cfg.post_epsilon
        inv2s2 = 1.0 / (2 * sigma_y**2)

        p = torch.tensor(p0_np.transpose(2, 0, 1)[None])
        loss0, grad0 = t_loss_and_grad(x_t)
        h0 = (0.5 * (x_t**2).sum() + inv2s2 * loss0
              + 0.5 * (p**2).sum() / cfg.m)
        p = p - (eps_t / 2) * (x_t + inv2s2 * grad0)
        xp = x_t.clone()
        for _ in range(L):
            xp = xp + eps_t / cfg.m * p
            loss, grad = t_loss_and_grad(xp)
            p = p - eps_t * (xp + inv2s2 * grad)
        p = p + (eps_t / 2) * (xp + inv2s2 * grad)
        h1 = (0.5 * (xp**2).sum() + inv2s2 * loss
              + 0.5 * (p**2).sum() / cfg.m)
        log_ratio = -(float(h1) - float(h0))
        accept_t = np.log(u) < min(log_ratio, 0.0)

        prev_epoch = int(state.epoch)
        state = attempt(state)
        accept_j = int(state.epoch) > prev_epoch

        # borderline coins may flip under float noise; stop comparing then
        margin = abs(np.log(u) - min(log_ratio, 0.0))
        if accept_t != accept_j:
            assert margin < 0.05, (
                f"attempt {a}: accept mismatch with wide margin {margin}"
            )
            break

        if accept_t:
            epoch_t += 1
            x_t = xp.detach()
        x_j = np.asarray(state.x).transpose(2, 0, 1)[None]
        # float-chaos amplification through repeated U-Net gradients makes
        # pointwise drift grow with trajectory length; the strict check is
        # the accept/reject pattern above (an energy/integrator error would
        # flip accepts or blow the trajectory apart, not drift by <0.1)
        np.testing.assert_allclose(x_j, x_t.numpy(), atol=0.1, rtol=0.1)
        assert float(np.mean(np.abs(x_j - x_t.numpy()))) < 0.02
        agreements += 1

    assert agreements >= 3, f"only {agreements} comparable attempts"

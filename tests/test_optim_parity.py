"""Numerical parity of the optimization-in-the-loop algorithms against the
reference torch implementations: schedule-free AdamW update order, DiffPIR's
inner proximal solve, RED-diff's carried variational update, DAPS's ODE
ladder and (noise-injected) Langevin sampler, dmplug-Adam steps, and the
ReSample latent step (both branches).

Same pattern as tests/test_algo_parity.py: tiny ADM U-Net with PORTED
weights on both sides, matched operators, deterministic paths compared
bitwise-near; stochastic draws are replayed from our key chain into the
torch mirror (torch.randn_like monkeypatched when driving the actual
reference code).

The reference files hard-code `.cuda()` in a few places
(algos/diffpir.py:36, daps.py:19, resample.py:38); `torch.Tensor.cuda` and
`torch.tensor(...).cuda` are redirected to identity so the REAL reference
code runs on CPU.
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
from nshmc_tpu.operators import Inpainting
from nshmc_tpu.schedules import DiffusionSchedule
from nshmc_tpu.solvers.sf_adamw import sf_adamw_init, sf_adamw_step

D, C = 16, 3
TINY = dict(
    image_size=D, num_channels=32, num_res_blocks=1, channel_mult="1,2",
    learn_sigma=True, class_cond=False, attention_resolutions="8",
    num_heads=2, num_head_channels=16, num_heads_upsample=-1,
    use_scale_shift_norm=True, dropout=0.0, resblock_updown=True,
    use_fp16=False, use_new_attention_order=False,
)


@pytest.fixture(autouse=True)
def _cpu_cuda(monkeypatch):
    """Make the reference's hard-coded .cuda() calls CPU no-ops."""
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)


@pytest.fixture(scope="module")
def stack():
    from guided_diffusion.unet_ffhq import create_model
    from obs_functions.Hfuncs import Inpainting as TInpainting

    torch.manual_seed(0)
    tmodel = create_model(model_path="/nonexistent", **TINY).eval()
    cfg = UNetConfig.from_model_yaml(**TINY)
    cfg = UNetConfig(**{**cfg.__dict__, "remat": False})
    params = port_adm_state_dict(tmodel.state_dict(), cfg)
    jmodel = UNetModel(cfg)

    rng = np.random.default_rng(0)
    perm = rng.permutation(D * D)[: int(D * D * 0.5)]
    mr = 3 * perm
    missing = np.sort(np.concatenate([mr, mr + 1, mr + 2]))
    t_op = TInpainting(C, D, torch.tensor(missing, dtype=torch.long), "cpu")
    j_op = Inpainting.create(C, D, missing)

    sched = DiffusionSchedule.create(num_timesteps=1000)
    xt = rng.standard_normal((1, C, D, D)).astype(np.float32)
    x_orig = rng.uniform(-1, 1, (1, C, D, D)).astype(np.float32)
    y0 = np.asarray(t_op.H(torch.tensor(x_orig)))

    return dict(
        tmodel=tmodel, t_op=t_op, j_op=j_op, sched=sched, xt=xt, y0=y0,
        jmodel_fn=lambda x, t: jmodel.apply(params, x, t),
    )


def _ats(sched, t, t_next):
    return (float(sched.alpha_bar(jnp.asarray(t))),
            float(sched.alpha_bar(jnp.asarray(t_next))))


def _t4(v):
    return torch.full((1, 1, 1, 1), v)


def _nhwc(x_nchw):
    return jnp.asarray(np.asarray(x_nchw).transpose(0, 2, 3, 1))


def _nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# schedule-free AdamW (ref: optim/sf_adamw.py:15-210)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kw", [
    dict(lr=0.1),
    dict(lr=0.05, weight_decay=0.3),
    dict(lr=0.02, warmup_steps=5, r=1.0, weight_lr_power=1.5),
])
def test_sf_adamw_trajectory_parity(kw):
    """Exact update-order parity over a 40-step trajectory on a quadratic:
    grad evaluated at the averaged iterate x (the reference's closure-free
    usage, algos/diffpir.py:40-44), then the z/x two-sequence update."""
    from optim.sf_adamw import AdamWScheduleFree

    rng = np.random.default_rng(1)
    target = rng.standard_normal((5, 7)).astype(np.float32)
    x0 = rng.standard_normal((5, 7)).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, (5, 7)).astype(np.float32)

    p = torch.nn.Parameter(torch.tensor(x0))
    opt = AdamWScheduleFree([p], foreach=False, **{
        k: v for k, v in kw.items()})
    x_j = jnp.asarray(x0)
    st = sf_adamw_init(x_j)

    for k in range(40):
        opt.zero_grad()
        loss = torch.sum(torch.tensor(scale) * (p - torch.tensor(target)) ** 2)
        loss.backward()
        opt.step()

        g = jax.grad(
            lambda x: jnp.sum(jnp.asarray(scale) * (x - jnp.asarray(target)) ** 2)
        )(x_j)
        x_j, st = sf_adamw_step(x_j, g, st, **kw)
        # fp32 accumulation drift only (torch lerp_ vs explicit arithmetic);
        # a wrong update ORDER diverges by 1e-2+ within a few steps
        np.testing.assert_allclose(
            np.asarray(x_j), p.detach().numpy(), atol=5e-5, rtol=2e-4,
            err_msg=f"step {k}")


# ---------------------------------------------------------------------------
# DiffPIR (ref: algos/diffpir.py:6-53)
# ---------------------------------------------------------------------------

def test_diffpir_x0_parity(stack):
    from algos.diffpir import DiffPIR as TDiffPIR
    from nshmc_tpu.algos.optim_based import DiffPIR

    t, t_next = 500, 250
    at, at_next = _ats(stack["sched"], t, t_next)

    talgo = TDiffPIR(stack["tmodel"], stack["t_op"], 0.1, lam=1.0, lr=0.1)
    x0_ref, add_up_ref = talgo.cal_x0(
        torch.tensor(stack["xt"]), torch.full((1,), float(t)),
        _t4(at), _t4(at_next), torch.tensor(stack["y0"]),
    )

    jalgo = DiffPIR(operator=stack["j_op"], sigma_0=0.1, lam=1.0, lr=0.1)
    x0_j, add_up_j, _ = jalgo.cal_x0(
        stack["jmodel_fn"], _nhwc(stack["xt"]), (), t,
        jnp.asarray(at), jnp.asarray(at_next), jnp.asarray(stack["y0"]),
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        _nchw(x0_j), x0_ref.detach().numpy(), atol=1e-3, rtol=1e-2)

    # map_back is deterministic given add_up: compare with add_up zeroed
    mb_ref = talgo.map_back(x0_ref.detach(), None, torch.zeros(1),
                            _t4(at_next), _t4(at))
    mb_j = jalgo.map_back(x0_j, None, jnp.zeros(()), jnp.asarray(at_next),
                          jnp.asarray(at))
    np.testing.assert_allclose(
        _nchw(mb_j), mb_ref.numpy(), atol=1e-3, rtol=1e-2)


# ---------------------------------------------------------------------------
# RED-diff (ref: algos/reddiff.py:5-46)
# ---------------------------------------------------------------------------

def test_reddiff_carried_state_parity(stack):
    """Two chained steps: the second consumes the first's x0_t_last exactly
    as the reference dispatch does (main_sampling.py:907-912)."""
    from algos.reddiff import RED_diff as TREDdiff
    from nshmc_tpu.algos.guided import REDdiff

    talgo = TREDdiff(stack["tmodel"], stack["t_op"], 0.1, eta=2.0)
    jalgo = REDdiff(operator=stack["j_op"], sigma_0=0.1, eta=2.0)

    xt_t = torch.tensor(stack["xt"])
    xt_j = _nhwc(stack["xt"])
    state = jalgo.init_state(xt_j)
    x0_last_t = None

    for (t, t_next) in [(750, 500), (500, 250)]:
        at, at_next = _ats(stack["sched"], t, t_next)
        x0_ref, _ = talgo.cal_x0(
            xt_t, x0_last_t, torch.full((1,), float(t)),
            _t4(at), _t4(at_next), torch.tensor(stack["y0"]),
        )
        x0_last_t = x0_ref

        x0_j, _, state = jalgo.cal_x0(
            stack["jmodel_fn"], xt_j, state, t,
            jnp.asarray(at), jnp.asarray(at_next), jnp.asarray(stack["y0"]),
            jax.random.PRNGKey(0),
        )
        np.testing.assert_allclose(
            _nchw(x0_j), x0_ref.detach().numpy(), atol=1e-3, rtol=1e-2,
            err_msg=f"t={t}")
        # advance xt identically on both sides (deterministic part only)
        xt_t = _t4(at_next).sqrt() * x0_ref.detach()
        xt_j = jnp.sqrt(at_next) * x0_j


# ---------------------------------------------------------------------------
# DAPS (ref: algos/daps.py:13-96)
# ---------------------------------------------------------------------------

def _make_tdaps(stack, sigma_0, betas, order=5, nonlinear=False):
    """Instantiate the reference DAPS without its __init__ (which calls
    .cuda() on the betas tensor at daps.py:19)."""
    from algos.daps import DAPS as TDAPS

    talgo = TDAPS.__new__(TDAPS)
    talgo.model = stack["tmodel"]
    talgo.H_funcs = stack["t_op"]
    talgo.sigma_0 = sigma_0
    talgo.cls_fn = None
    talgo.nonlinear = nonlinear
    talgo.eta0 = 1e-4
    talgo.delta = 1e-2
    talgo.order = order
    talgo.betas = torch.tensor(betas, dtype=torch.float32)
    return talgo


def test_daps_ode_parity(stack):
    from nshmc_tpu.algos.optim_based import DAPS

    betas = np.asarray(stack["sched"].betas, np.float32)
    talgo = _make_tdaps(stack, 0.1, betas)
    x0_ref = talgo.ode(torch.tensor(stack["xt"]), 500)

    jalgo = DAPS(operator=stack["j_op"], sigma_0=0.1)
    x0_j = jalgo.ode(stack["jmodel_fn"], stack["sched"],
                     _nhwc(stack["xt"]), 500)
    np.testing.assert_allclose(
        _nchw(x0_j), x0_ref.numpy(), atol=1e-3, rtol=1e-2)


def test_daps_langevin_parity(stack, monkeypatch):
    """Drives the REAL reference langevin (daps.py:57-80) with our key
    chain's noise replayed through a monkeypatched torch.randn_like."""
    from nshmc_tpu.algos.optim_based import DAPS

    jalgo = DAPS(operator=stack["j_op"], sigma_0=0.1, langevin_steps=25)
    betas = np.asarray(stack["sched"].betas, np.float32)
    talgo = _make_tdaps(stack, 0.1, betas)

    at = float(stack["sched"].alpha_bar(jnp.asarray(500)))
    eta = 1e-4 * (1e-2 + 500 / 1000 * (1 - 1e-2))
    rng = np.random.default_rng(2)
    x0 = rng.uniform(-1, 1, (1, C, D, D)).astype(np.float32)

    key = jax.random.PRNGKey(7)
    x_j = jalgo.langevin(_nhwc(x0), jnp.asarray(stack["y0"]),
                         jnp.asarray(eta), jnp.asarray(at), key)

    # replay the same noises into the torch loop (NHWC draw -> NCHW)
    keys = jax.random.split(key, 25)
    noises = iter([
        np.asarray(jax.random.normal(k, (1, D, D, C))).transpose(0, 3, 1, 2)
        for k in keys
    ])
    monkeypatch.setattr(
        torch, "randn_like", lambda x: torch.tensor(next(noises)))
    x_ref = talgo.langevin(torch.tensor(x0), torch.tensor(stack["y0"]),
                           eta, _t4(at), N=25)
    np.testing.assert_allclose(
        _nchw(x_j), x_ref.numpy(), atol=2e-3, rtol=1e-2)


def test_daps_langevin_noiseless_linear_branch(stack, monkeypatch):
    """sigma_0 == 0 & linear selects the pure data-fit potential
    (daps.py:66-67)."""
    from nshmc_tpu.algos.optim_based import DAPS

    jalgo = DAPS(operator=stack["j_op"], sigma_0=0.0, langevin_steps=10)
    betas = np.asarray(stack["sched"].betas, np.float32)
    talgo = _make_tdaps(stack, 0.0, betas)

    at = float(stack["sched"].alpha_bar(jnp.asarray(250)))
    eta = 1e-4
    rng = np.random.default_rng(3)
    x0 = rng.uniform(-1, 1, (1, C, D, D)).astype(np.float32)
    key = jax.random.PRNGKey(8)

    x_j = jalgo.langevin(_nhwc(x0), jnp.asarray(stack["y0"]),
                         jnp.asarray(eta), jnp.asarray(at), key)
    keys = jax.random.split(key, 10)
    noises = iter([
        np.asarray(jax.random.normal(k, (1, D, D, C))).transpose(0, 3, 1, 2)
        for k in keys
    ])
    monkeypatch.setattr(
        torch, "randn_like", lambda x: torch.tensor(next(noises)))
    x_ref = talgo.langevin(torch.tensor(x0), torch.tensor(stack["y0"]),
                           eta, _t4(at), N=10)
    np.testing.assert_allclose(
        _nchw(x_j), x_ref.numpy(), atol=2e-3, rtol=1e-2)


# ---------------------------------------------------------------------------
# dmplug-Adam (ref: main_sampling.py:593-658)
# ---------------------------------------------------------------------------

def test_dmplug_adam_step_parity(stack):
    """First 5 Adam(lr=1e-2) steps on ||y0 - H(decode(x))||^2 through the
    3-step DDIM decode must match torch.optim.Adam on the mirror loss."""
    from nshmc_tpu.schedules import DDIMSequence
    from nshmc_tpu.sampling.ddim import make_decoder
    import optax

    sched = stack["sched"]
    seq = DDIMSequence.create(1000, 3)
    decode = make_decoder(stack["jmodel_fn"], sched, seq)
    y0_j = jnp.asarray(stack["y0"])
    op = stack["j_op"]

    def loss_j(x):
        r = y0_j - op.H_img(decode(x))
        return jnp.sum(r ** 2)

    # torch mirror of iterative_sampling + unconditional (same as
    # tests/test_hmc_parity.py::_torch_decode, final clip included per
    # main_sampling.py:613)
    betas = torch.tensor(np.asarray(sched.betas, np.float32))

    def alpha(t):
        bb = torch.cat([torch.zeros(1), betas])
        return torch.cumprod(1 - bb, dim=0)[t + 1]

    def t_decode(xt):
        for i, j in zip(reversed(seq.seq), reversed(seq.seq_next)):
            at, at_next = alpha(i), alpha(j)
            t = torch.full((xt.shape[0],), float(i))
            et = stack["tmodel"](xt, t)[:, :3]
            x0 = ((xt - et * (1 - at).sqrt()) / at.sqrt()).clip(-1, 1)
            xt = at_next.sqrt() * x0 + (1 - at_next).sqrt() * et
        return xt

    rng = np.random.default_rng(4)
    x0 = rng.standard_normal((1, C, D, D)).astype(np.float32)

    p = torch.nn.Parameter(torch.tensor(x0))
    topt = torch.optim.Adam([p], lr=1e-2)

    x_j = _nhwc(x0)
    jopt = optax.adam(1e-2)
    jstate = jopt.init(x_j)
    vg = jax.jit(jax.value_and_grad(loss_j))

    for k in range(5):
        topt.zero_grad()
        xt = t_decode(p).clip(-1, 1)
        loss = torch.sum((torch.tensor(stack["y0"]) - stack["t_op"].H(xt)) ** 2)
        loss.backward()
        topt.step()

        lj, g = vg(x_j)
        np.testing.assert_allclose(float(lj), float(loss), rtol=2e-3)
        updates, jstate = jopt.update(g, jstate)
        x_j = optax.apply_updates(x_j, updates)
        np.testing.assert_allclose(
            _nchw(x_j), p.detach().numpy(), atol=2e-3, rtol=1e-2,
            err_msg=f"step {k}")


# ---------------------------------------------------------------------------
# ReSample (ref: algos/resample.py:7-108) — latent step, both branches
# ---------------------------------------------------------------------------

class _TStubLDM:
    """Minimal latent model with the two methods the reference ReSample
    uses: a no-grad eps net (apply_model is @torch.no_grad in the real LDM,
    ddpm.py:892) and a differentiable decoder."""

    @torch.no_grad()
    def apply_model(self, x, t, cond):
        return 0.1 * torch.sin(x)

    def differentiable_decode_first_stage(self, z):
        up = torch.nn.functional.interpolate(z, scale_factor=2, mode="nearest")
        return torch.tanh(1.5 * up)


def _j_stub_model(x, t):
    return jax.lax.stop_gradient(0.1 * jnp.sin(x))


def _j_stub_decode(z):
    up = jnp.repeat(jnp.repeat(z, 2, axis=1), 2, axis=2)
    return jnp.tanh(1.5 * up)


@pytest.mark.parametrize("t,t_next", [
    (150, 100),   # DPS-only branch (150 % 20 != 0)
    (200, 150),   # hard-consistency + stochastic-resample branch
])
def test_resample_step_parity(stack, monkeypatch, t, t_next):
    from algos.resample import ReSample as TReSample
    from nshmc_tpu.algos.resample import ReSample
    from obs_functions.Hfuncs import SuperResolution as TSR
    from nshmc_tpu.operators import SuperResolution

    Z = 8  # latent size; decoded pixel size 16
    t_op = TSR(C, 2 * Z, 2, "cpu")
    j_op = SuperResolution.create(C, 2 * Z, 2)

    sched = stack["sched"]
    at, at_next = _ats(sched, t, t_next)
    rng = np.random.default_rng(5)
    zt = rng.standard_normal((1, C, Z, Z)).astype(np.float32)
    x_pix = rng.uniform(-1, 1, (1, C, 2 * Z, 2 * Z)).astype(np.float32)
    y0 = np.asarray(t_op.H(torch.tensor(x_pix)))

    key = jax.random.PRNGKey(9)
    jalgo = ReSample(operator=j_op, sigma_0=0.1, noise="ddim",
                     decode_fn=_j_stub_decode, inner_steps=40)
    xt_next_j, _ = jalgo.step(
        _j_stub_model, _nhwc(zt), (), t,
        jnp.asarray(at), jnp.asarray(at_next), jnp.asarray(y0), key,
    )

    # torch side: replay our _hard_consistency noise draw (k2); the DPS
    # branch is deterministic with noise='ddim' (c1 = 0)
    _, k2 = jax.random.split(key)
    n2 = np.asarray(jax.random.normal(k2, (1, Z, Z, C))).transpose(0, 3, 1, 2)
    noises = iter([np.zeros_like(zt), n2])  # first randn_like hits c1=0 term
    monkeypatch.setattr(
        torch, "randn_like", lambda x: torch.tensor(next(noises)))

    talgo = TReSample(_TStubLDM(), t_op, 0.1, gamma=40.0, lam=1.0)
    x0_ref, add_up_ref = _t_resample_cal_x0(
        talgo, torch.tensor(zt), t, _t4(at), _t4(at_next),
        torch.tensor(y0), inner_steps=40)
    xt_next_ref = talgo.map_back(x0_ref, torch.tensor(y0), add_up_ref,
                                 _t4(at_next), _t4(at))
    np.testing.assert_allclose(
        _nchw(xt_next_j), xt_next_ref.detach().numpy(), atol=2e-3, rtol=1e-2)


def _t_resample_cal_x0(talgo, xt, t, at, at_next, y_0, inner_steps):
    """The reference ReSample.cal_x0 with `noise='ddim'` and a configurable
    inner budget (the 300-literal at resample.py:40 made configurable for
    test runtime; all other lines follow resample.py:15-56 exactly)."""
    talgo.t = t
    x0_t, add_up = talgo.cal_x0_dps(xt, t, at, at_next, y_0, noise="ddim")
    if t % 20 != 0 or t > 200:
        return x0_t, add_up
    xt_next = talgo.map_back_dps(x0_t, y_0, add_up, at_next, at)

    et = talgo.model.apply_model(xt, t, None)
    x0_t = (xt - et * (1 - at).sqrt()) / at.sqrt()
    x0_t = x0_t.clip(-1, 1)
    with torch.enable_grad():
        x0_t_hat = torch.nn.Parameter(x0_t.detach().clone().requires_grad_())
        optimizer = torch.optim.AdamW([x0_t_hat], lr=5e-3)
        for _ in range(inner_steps):
            optimizer.zero_grad()
            loss = torch.nn.MSELoss()(
                talgo.H_funcs.H(
                    talgo.model.differentiable_decode_first_stage(x0_t_hat)),
                y_0)
            loss.backward()
            optimizer.step()
    sigma_t_square = (talgo.gamma * (1 - at_next[0, 0, 0, 0]) / at[0, 0, 0, 0]
                      * (1 - at[0, 0, 0, 0] / at_next[0, 0, 0, 0]))
    var = sigma_t_square * (1 - at_next[0, 0, 0, 0]) / (
        sigma_t_square + 1 - at_next[0, 0, 0, 0])
    mean = ((1 - at_next) * xt_next) / (sigma_t_square + 1 - at_next[0, 0, 0, 0])
    add_up = mean + var.sqrt() * torch.randn_like(xt)
    return x0_t_hat, add_up

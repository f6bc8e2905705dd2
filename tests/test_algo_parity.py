"""Numerical parity of algorithm x0-updates against the reference torch
implementations (algos/*.py), using the same tiny ADM U-Net (ported
weights), the same operator (matched inpainting indices / SR), and the same
(xt, y0, t) inputs. Only the deterministic x0_t path is compared — the
add_up noise draws use different RNGs by construction (SURVEY.md section 7:
bitwise parity impossible, statistical parity is the target; here the
deterministic parts ARE bitwise-comparable)."""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nshmc_tpu.models.unet import UNetConfig, UNetModel
from nshmc_tpu.models.port import port_adm_state_dict
from nshmc_tpu.operators import Inpainting, SuperResolution
from nshmc_tpu.schedules import DiffusionSchedule

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

D, C = 16, 3
TINY = dict(
    image_size=D, num_channels=32, num_res_blocks=1, channel_mult="1,2",
    learn_sigma=True, class_cond=False, attention_resolutions="8",
    num_heads=2, num_head_channels=16, num_heads_upsample=-1,
    use_scale_shift_norm=True, dropout=0.0, resblock_updown=True,
    use_fp16=False, use_new_attention_order=False,
)


@pytest.fixture(scope="module")
def stack():
    from guided_diffusion.unet_ffhq import create_model

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

    from obs_functions.Hfuncs import Inpainting as TInpainting

    t_op = TInpainting(C, D, torch.tensor(missing, dtype=torch.long), "cpu")
    j_op = Inpainting.create(C, D, missing)

    sched = DiffusionSchedule.create(num_timesteps=1000)
    xt = rng.standard_normal((1, C, D, D)).astype(np.float32)
    x_orig = rng.uniform(-1, 1, (1, C, D, D)).astype(np.float32)
    y0 = np.asarray(t_op.H(torch.tensor(x_orig)))

    def jmodel_fn(x, t):
        return jmodel.apply(params, x, t)

    return dict(tmodel=tmodel, jmodel_fn=jmodel_fn, t_op=t_op, j_op=j_op,
                sched=sched, xt=xt, y0=y0)


def _ats(sched, t, t_next):
    at = float(sched.alpha_bar(jnp.asarray(t)))
    at_next = float(sched.alpha_bar(jnp.asarray(t_next)))
    return at, at_next


def _t4(v):  # scalar -> torch (1,1,1,1)
    return torch.full((1, 1, 1, 1), v)


def _to_jax_nhwc(x_nchw):
    return jnp.asarray(np.asarray(x_nchw).transpose(0, 2, 3, 1))


def _from_jax_nhwc(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def test_dps_x0_parity(stack):
    from algos.dps import DPS as TDPS
    from nshmc_tpu.algos.guided import DPS

    t, t_next = 500, 250
    at, at_next = _ats(stack["sched"], t, t_next)

    talgo = TDPS(stack["tmodel"], stack["t_op"], 0.1, lam=1.0)
    xt_t = torch.tensor(stack["xt"])
    x0_ref, _ = talgo.cal_x0(
        xt_t, torch.full((1,), float(t)), _t4(at), _t4(at_next),
        torch.tensor(stack["y0"]), noise="ddim",
    )

    jalgo = DPS(operator=stack["j_op"], sigma_0=0.1, lam=1.0, noise="ddim")
    x0_j, _, _ = jalgo.cal_x0(
        stack["jmodel_fn"], _to_jax_nhwc(stack["xt"]), (), t,
        jnp.asarray(at), jnp.asarray(at_next), jnp.asarray(stack["y0"]),
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        _from_jax_nhwc(x0_j), x0_ref.detach().numpy(), atol=5e-4, rtol=1e-2
    )


def test_ddnm_noiseless_x0_parity(stack):
    from algos.ddnm import DDNM as TDDNM
    from nshmc_tpu.algos.spectral import DDNM

    t, t_next = 750, 500
    at, at_next = _ats(stack["sched"], t, t_next)

    talgo = TDDNM(stack["tmodel"], stack["t_op"], 0.0)
    x0_ref, _ = talgo.cal_x0(
        torch.tensor(stack["xt"]), torch.full((1,), float(t)),
        _t4(at), _t4(at_next), torch.tensor(stack["y0"]),
    )

    jalgo = DDNM(operator=stack["j_op"], sigma_0=0.0)
    x0_j, _, _ = jalgo.cal_x0(
        stack["jmodel_fn"], _to_jax_nhwc(stack["xt"]), (), t,
        jnp.asarray(at), jnp.asarray(at_next), jnp.asarray(stack["y0"]),
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        _from_jax_nhwc(x0_j), x0_ref.detach().numpy(), atol=5e-4, rtol=1e-2
    )


def test_ddnm_noisy_x0_parity(stack):
    from algos.ddnm import DDNM as TDDNM
    from nshmc_tpu.algos.spectral import DDNM

    t, t_next = 500, 250
    at, at_next = _ats(stack["sched"], t, t_next)

    talgo = TDDNM(stack["tmodel"], stack["t_op"], 0.1)
    x0_ref, _ = talgo.cal_x0(
        torch.tensor(stack["xt"]), torch.full((1,), float(t)),
        _t4(at), _t4(at_next), torch.tensor(stack["y0"]),
    )
    jalgo = DDNM(operator=stack["j_op"], sigma_0=0.1)
    x0_j, _, _ = jalgo.cal_x0(
        stack["jmodel_fn"], _to_jax_nhwc(stack["xt"]), (), t,
        jnp.asarray(at), jnp.asarray(at_next), jnp.asarray(stack["y0"]),
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        _from_jax_nhwc(x0_j), x0_ref.detach().numpy(), atol=5e-4, rtol=1e-2
    )


def test_ddrm_x0_parity(stack):
    from algos.ddrm import DDRM as TDDRM
    from nshmc_tpu.algos.spectral import DDRM

    t, t_next = 500, 250
    at, at_next = _ats(stack["sched"], t, t_next)

    talgo = TDDRM(stack["tmodel"], stack["t_op"], 0.1)
    x0_ref, _ = talgo.cal_x0(
        torch.tensor(stack["xt"]), torch.full((1,), float(t)),
        _t4(at), _t4(at_next), torch.tensor(stack["y0"]),
    )
    jalgo = DDRM(operator=stack["j_op"], sigma_0=0.1)
    x0_j, _, _ = jalgo.cal_x0(
        stack["jmodel_fn"], _to_jax_nhwc(stack["xt"]), (), t,
        jnp.asarray(at), jnp.asarray(at_next), jnp.asarray(stack["y0"]),
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        _from_jax_nhwc(x0_j), x0_ref.detach().numpy(), atol=5e-4, rtol=1e-2
    )


def test_pigdm_x0_parity(stack):
    from algos.pigdm import PiGDM as TPiGDM
    from nshmc_tpu.algos.guided import PiGDM

    t, t_next = 500, 250
    at, at_next = _ats(stack["sched"], t, t_next)

    talgo = TPiGDM(stack["tmodel"], stack["t_op"], 0.1, lam=1.0)
    x0_ref, _ = talgo.cal_x0(
        torch.tensor(stack["xt"]), torch.full((1,), float(t)),
        _t4(at), _t4(at_next), torch.tensor(stack["y0"]),
    )
    jalgo = PiGDM(operator=stack["j_op"], sigma_0=0.1, lam=1.0)
    x0_j, _, _ = jalgo.cal_x0(
        stack["jmodel_fn"], _to_jax_nhwc(stack["xt"]), (), t,
        jnp.asarray(at), jnp.asarray(at_next), jnp.asarray(stack["y0"]),
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        _from_jax_nhwc(x0_j), x0_ref.detach().numpy(), atol=1e-3, rtol=2e-2
    )


def test_dmps_guidance_parity(stack):
    """The DMPS spectral guidance term (H_dmps_guidance) must match."""
    t_op, j_op = stack["t_op"], stack["j_op"]
    at = 0.7
    xt = torch.tensor(stack["xt"])
    ref = t_op.H_dmps_guidance(
        xt.reshape(1, -1), torch.tensor(stack["y0"]), torch.tensor(at), 0.1
    ).numpy()
    ours = np.asarray(j_op.H_dmps_guidance(
        jnp.asarray(stack["xt"].reshape(1, -1)), jnp.asarray(stack["y0"]),
        jnp.asarray(at), 0.1,
    ))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-2)

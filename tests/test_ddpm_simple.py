"""DDPM 'simple' model parity against the reference torch implementation
(models/diffusion.py) with ported random weights."""
import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from nshmc_tpu.models.ddpm_simple import (
    DDPMConfig, DDPMModel, ddpm_param_mapping, port_ddpm_state_dict,
    ddpm_timestep_embedding,
)

TINY = DDPMConfig(
    ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
    attn_resolutions=(8,), in_channels=3, resolution=16,
)


def _torch_model(cfg: DDPMConfig):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from models.diffusion import Model

    conf = types.SimpleNamespace(
        model=types.SimpleNamespace(
            ch=cfg.ch, out_ch=cfg.out_ch, ch_mult=list(cfg.ch_mult),
            num_res_blocks=cfg.num_res_blocks,
            attn_resolutions=list(cfg.attn_resolutions),
            dropout=cfg.dropout, in_channels=cfg.in_channels,
            resamp_with_conv=cfg.resamp_with_conv, type="simple",
        ),
        data=types.SimpleNamespace(image_size=cfg.resolution),
        diffusion=types.SimpleNamespace(num_diffusion_timesteps=100),
    )
    torch.manual_seed(0)
    return Model(conf).eval()


def test_timestep_embedding_matches_reference():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from models.diffusion import get_timestep_embedding

    t = np.asarray([0.0, 10.0, 500.0], np.float32)
    ref = get_timestep_embedding(torch.tensor(t), 32).numpy()
    ours = np.asarray(ddpm_timestep_embedding(jnp.asarray(t), 32))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_mapping_covers_all_keys():
    tmodel = _torch_model(TINY)
    sd = tmodel.state_dict()
    mapping = ddpm_param_mapping(TINY)
    torch_prefixes = {p for p, _ in mapping.values()}
    sd_prefixes = {k.rsplit(".", 1)[0] for k in sd}
    assert torch_prefixes == sd_prefixes


def test_forward_parity():
    torch = pytest.importorskip("torch")
    tmodel = _torch_model(TINY)
    params = port_ddpm_state_dict(tmodel.state_dict(), TINY)
    model = DDPMModel(TINY)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    t = np.asarray([10.0, 90.0], np.float32)
    with torch.no_grad():
        ref = tmodel(torch.tensor(x), torch.tensor(t)).numpy()
    out = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jnp.asarray(t))
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=3e-4, rtol=1e-3
    )

"""Latent stack tests: VQ autoencoder forward parity against the reference
torch modules with ported random weights; quantizer semantics; latent U-Net
construction; latent HMC end-to-end on a tiny LDM."""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nshmc_tpu.models.ldm import (
    AutoencoderConfig, VQModel, LatentDiffusion, latent_unet_config,
)
from nshmc_tpu.models.ldm.port import port_ae_state_dict, ae_param_mapping

TINY_AE = AutoencoderConfig(
    ch=32, ch_mult=(1, 2), num_res_blocks=1, in_channels=3, out_ch=3,
    z_channels=3, embed_dim=3, n_embed=64, resolution=16,
)


def _torch_ae(cfg: AutoencoderConfig):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from ldm.modules.diffusionmodules.model import Encoder, Decoder

    torch.manual_seed(0)
    dd = dict(
        ch=cfg.ch, out_ch=cfg.out_ch, ch_mult=cfg.ch_mult,
        num_res_blocks=cfg.num_res_blocks,
        attn_resolutions=list(cfg.attn_resolutions), dropout=0.0,
        in_channels=cfg.in_channels, resolution=cfg.resolution,
        z_channels=cfg.z_channels, double_z=cfg.double_z,
    )
    enc = Encoder(**dd).eval()
    dec = Decoder(**dd).eval()
    quant_conv = torch.nn.Conv2d(cfg.z_channels, cfg.embed_dim, 1)
    post_quant_conv = torch.nn.Conv2d(cfg.embed_dim, cfg.z_channels, 1)
    embedding = torch.nn.Embedding(cfg.n_embed, cfg.embed_dim)
    embedding.weight.data.uniform_(-1.0 / cfg.n_embed, 1.0 / cfg.n_embed)

    sd = {}
    for prefix, mod in [("encoder", enc), ("decoder", dec),
                        ("quant_conv", quant_conv),
                        ("post_quant_conv", post_quant_conv)]:
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}" if prefix not in ("quant_conv", "post_quant_conv")
               else f"{prefix}.{k}"] = v
    sd["quantize.embedding.weight"] = embedding.weight.data
    return enc, dec, quant_conv, post_quant_conv, embedding, sd


def test_ae_mapping_covers_torch_keys():
    _, _, _, _, _, sd = _torch_ae(TINY_AE)
    mapping = ae_param_mapping(TINY_AE)
    torch_prefixes = {p for p, _ in mapping.values()}
    sd_prefixes = {k.rsplit(".", 1)[0] for k in sd}
    assert torch_prefixes == sd_prefixes


def test_ae_forward_parity():
    torch = pytest.importorskip("torch")
    enc, dec, qc, pqc, emb, sd = _torch_ae(TINY_AE)
    params = port_ae_state_dict(sd, TINY_AE)
    model = VQModel(TINY_AE)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)

    with torch.no_grad():
        h_ref = qc(enc(torch.tensor(x))).numpy()
    h = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                    method=VQModel.encode)
    np.testing.assert_allclose(
        np.asarray(h).transpose(0, 3, 1, 2), h_ref, atol=2e-4, rtol=1e-3
    )

    # decode WITH quantization (reference VQModelInterface.decode default)
    with torch.no_grad():
        ht = torch.tensor(h_ref)
        flat = ht.permute(0, 2, 3, 1).reshape(-1, 3)
        d = (flat**2).sum(1, keepdim=True) - 2 * flat @ emb.weight.t() \
            + (emb.weight**2).sum(1)[None]
        idx = d.argmin(1)
        zq = emb.weight[idx].reshape(ht.shape[0], ht.shape[2], ht.shape[3], 3)
        zq = zq.permute(0, 3, 1, 2)
        dec_ref = dec(pqc(zq)).numpy()
    out = model.apply(params, h, False, method=VQModel.decode)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), dec_ref, atol=5e-4, rtol=1e-2
    )


def test_quantizer_straight_through_gradient():
    model = VQModel(TINY_AE)
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, 16, 16, 3)))

    def loss(h):
        return jnp.sum(model.apply(params, h, False, method=VQModel.decode) ** 2)

    h = jax.random.normal(key, (1, 4, 4, 3))
    g = jax.grad(loss)(h)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0  # straight-through passes gradient


def test_latent_unet_config():
    cfg = latent_unet_config()
    assert cfg.out_channels == 3  # no learn_sigma
    assert cfg.attention_ds == (8, 4, 2)
    assert not cfg.use_scale_shift_norm
    assert not cfg.resblock_updown


def test_latent_hmc_end_to_end():
    from nshmc_tpu.schedules import DDIMSequence
    from nshmc_tpu.sampling.ddim import make_decoder
    from nshmc_tpu.operators import SuperResolution
    from nshmc_tpu.hmc.latent import (
        LatentHMCConfig, init_latent_chains, run_latent_hmc,
        make_latent_loss_fn,
    )
    from nshmc_tpu.models.unet import UNetConfig

    # tiny LDM: 8x8 latents -> 16x16 pixels
    ae_cfg = AutoencoderConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                               z_channels=3, embed_dim=3, n_embed=32,
                               resolution=16)
    unet_cfg = UNetConfig(
        image_size=8, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_ds=(2,), channel_mult=(1, 2),
        num_heads=1, num_head_channels=16, use_scale_shift_norm=False,
        resblock_updown=False,
    )
    ldm = LatentDiffusion.create(jax.random.PRNGKey(0), unet_cfg, ae_cfg,
                                 num_timesteps=100)

    seq = DDIMSequence.create(100, 3)
    decode_z = make_decoder(ldm.model_fn(stop_gradient=True), ldm.schedule, seq)

    op = SuperResolution.create(3, 16, 2)
    rng = np.random.default_rng(0)
    x_orig = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)), jnp.float32)
    y0 = op.H_img(x_orig)[0]

    cfg = LatentHMCConfig(sigma_0=0.1, sigma_y0=1.0, tau=0.1, epsilon=0.05,
                          epochs=3, sampling=2, keep_samples=2)
    loss_fn = make_latent_loss_fn(
        decode_z, ldm.decode_first_stage, op, y0
    )
    states = init_latent_chains(jax.random.PRNGKey(1), cfg, 2, (8, 8, 3))
    out = jax.jit(lambda s: run_latent_hmc(loss_fn, cfg, s))(states)
    assert (np.asarray(out.attempt) == cfg.total_attempts).all()
    assert np.isfinite(np.asarray(out.z)).all()
    # eps-net stop-grad: gradient flows only through DDIM-linear + decoder
    g = jax.grad(lambda z: loss_fn(z)[0])(np.asarray(out.z)[0])
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_autoencoder_kl_and_distribution():
    from nshmc_tpu.models.ldm import AutoencoderKL, AutoencoderConfig
    from nshmc_tpu.models.ldm.distributions import DiagonalGaussian, ema_update

    cfg = AutoencoderConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                            z_channels=3, embed_dim=3, n_embed=16,
                            resolution=16, double_z=True)
    model = AutoencoderKL(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 16, 16, 3))
    params = model.init(key, x, key)
    post = model.apply(params, x, method=AutoencoderKL.encode)
    assert post.mean.shape == (1, 8, 8, 3)
    z = post.sample(key)
    out = model.apply(params, z, method=AutoencoderKL.decode)
    assert out.shape == x.shape
    # KL to standard normal is nonnegative; mode == mean
    assert float(post.kl()[0]) >= 0
    np.testing.assert_array_equal(np.asarray(post.mode()), np.asarray(post.mean))

    # EMA pulls toward params
    ema = jax.tree.map(jnp.zeros_like, params)
    ema2 = ema_update(ema, params, decay=0.5)
    leaf = jax.tree.leaves(ema2)[0]
    ref = 0.5 * jax.tree.leaves(params)[0]
    np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref), atol=1e-6)

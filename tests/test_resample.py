"""ReSample (ported + original) sampler tests on a tiny latent stack."""
import numpy as np
import jax
import jax.numpy as jnp

from nshmc_tpu.models.ldm import AutoencoderConfig, LatentDiffusion
from nshmc_tpu.models.unet import UNetConfig
from nshmc_tpu.operators import SuperResolution
from nshmc_tpu.schedules import DDIMSequence


def _tiny_ldm():
    ae_cfg = AutoencoderConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                               z_channels=3, embed_dim=3, n_embed=32,
                               resolution=16)
    unet_cfg = UNetConfig(
        image_size=8, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_ds=(2,), channel_mult=(1, 2),
        num_heads=1, num_head_channels=16, use_scale_shift_norm=False,
        resblock_updown=False,
    )
    return LatentDiffusion.create(jax.random.PRNGKey(0), unet_cfg, ae_cfg,
                                  num_timesteps=100)


LDM = _tiny_ldm()
OP = SuperResolution.create(3, 16, 2)
RNG = np.random.default_rng(0)
X_ORIG = jnp.asarray(RNG.uniform(-1, 1, (1, 16, 16, 3)), jnp.float32)
Y0 = OP.H_img(X_ORIG)


def test_resample_algo_runs():
    from nshmc_tpu.algos.resample import ReSample
    from nshmc_tpu.sampling.loop import iterative_sampling

    seq = DDIMSequence.create(100, 5)
    algo = ReSample(operator=OP, sigma_0=0.1,
                    decode_fn=LDM.decode_first_stage, inner_steps=5)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 3))
    out = jax.jit(
        lambda z: iterative_sampling(
            LDM.model_fn(stop_gradient=False), LDM.schedule, seq, algo,
            z, Y0, jax.random.PRNGKey(2))
    )(z)
    assert np.isfinite(np.asarray(out)).all()


def test_resample_original_runs_and_improves_consistency():
    from nshmc_tpu.sampling.resample_original import (
        ResampleOriginalConfig, resample_original_sample,
    )

    cfg = ResampleOriginalConfig(
        ddim_steps=10, pixel_opt_iters=5, latent_opt_iters=5,
    )
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 3))

    out = jax.jit(
        lambda z: resample_original_sample(
            LDM.model_fn(stop_gradient=True), LDM.schedule,
            LDM.decode_first_stage, LDM.encode_first_stage,
            OP, Y0, z, jax.random.PRNGKey(4), cfg,
        )
    )(z)
    assert out.shape == z.shape
    assert np.isfinite(np.asarray(out)).all()

    def data_loss(z):
        return float(jnp.mean((Y0 - OP.H_img(LDM.decode_first_stage(z))) ** 2))

    # the final latent optimization must leave the output more consistent
    # than the starting noise decode
    assert data_loss(out) < data_loss(z)

"""Chain-sharding tests on the 8-device virtual CPU mesh: shard_mapped HMC
must match the single-device vmapped run bit-for-bit (same per-chain keys)."""
import numpy as np
import jax
import jax.numpy as jnp

from nshmc_tpu.hmc.engine import HMCConfig, init_chains, run_hmc
from nshmc_tpu.parallel.chains import chain_mesh, make_sharded_hmc, acceptance_stats


def _loss_builder(params, operator, y0):
    # params: diag scaling (toy "decoder"); operator unused placeholder
    def loss_fn(x):
        r = y0 - params * x.reshape(-1)
        return jnp.sum(r**2), x

    return loss_fn


def test_sharded_matches_vmapped():
    dim = 16
    shape = (4, 4, 1)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0.5, 1.5, dim), jnp.float32)
    y0 = jnp.asarray(rng.standard_normal(dim), jnp.float32)

    cfg = HMCConfig(sigma_0=0.3, tau=0.5, epsilon=0.05, epochs=4, sampling=3,
                    max_attempts=200)
    n_chains = 8
    states = init_chains(jax.random.PRNGKey(0), cfg, n_chains, shape)

    loss_fn = _loss_builder(a, None, y0)
    ref = jax.jit(lambda s: run_hmc(loss_fn, cfg, s))(states)

    mesh = chain_mesh()
    assert mesh.devices.size == 8
    runner = make_sharded_hmc(cfg, mesh, _loss_builder)
    out = runner(a, jnp.zeros(()), y0, states)

    np.testing.assert_array_equal(np.asarray(out.samples), np.asarray(ref.samples))
    np.testing.assert_array_equal(np.asarray(out.epoch), np.asarray(ref.epoch))
    np.testing.assert_array_equal(np.asarray(out.attempts), np.asarray(ref.attempts))

    stats = acceptance_stats(out)
    assert 0.0 < stats["accept_rate"] <= 1.0


def test_sharded_multiple_chains_per_device():
    dim = 16
    shape = (4, 4, 1)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(0.5, 1.5, dim), jnp.float32)
    y0 = jnp.asarray(rng.standard_normal(dim), jnp.float32)
    cfg = HMCConfig(sigma_0=0.3, tau=0.3, epsilon=0.05, epochs=2, sampling=2,
                    max_attempts=100)
    states = init_chains(jax.random.PRNGKey(1), cfg, 16, shape)  # 2 per device
    mesh = chain_mesh()
    runner = make_sharded_hmc(cfg, mesh, _loss_builder)
    out = runner(a, jnp.zeros(()), y0, states)
    assert np.asarray(out.samples).shape[0] == 16
    assert np.isfinite(np.asarray(out.last_loss)).all()


def test_64_chain_phase_retrieval_on_virtual_mesh():
    """BASELINE.json config #4 ('phase retrieval with 64+ parallel
    chains'): 64 chains (8/device on the virtual 8-device mesh) through
    the full HMC pipeline with the PhaseRetrieval operator and a tiny
    U-Net decode — completion + shard-vs-vmap bit-equality (VERDICT r4
    next #2b)."""
    from nshmc_tpu.models.unet import UNetConfig, UNetModel
    from nshmc_tpu.sampling.ddim import make_decoder
    from nshmc_tpu.schedules import DiffusionSchedule, DDIMSequence
    from nshmc_tpu.operators import PhaseRetrieval
    from nshmc_tpu.hmc.engine import make_pixel_loss_fn

    d = 16
    mcfg = UNetConfig(
        image_size=d, model_channels=32, out_channels=6, num_res_blocks=1,
        attention_ds=(2,), channel_mult=(1, 2), num_heads=2,
        num_head_channels=16, use_scale_shift_norm=True, resblock_updown=True)
    model = UNetModel(mcfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, d, d, 3)),
                        jnp.zeros((1,)))
    sched = DiffusionSchedule.create(num_timesteps=100)
    seq = DDIMSequence.create(100, 3)
    op = PhaseRetrieval.create(3, d, oversample=2.0)
    rng = np.random.default_rng(0)
    x_orig = jnp.asarray(rng.uniform(-1, 1, (1, d, d, 3)), jnp.float32)
    y0 = op.H_img(x_orig)[0]

    cfg = HMCConfig(sigma_0=0.2, tau=0.1, epsilon=0.05, epochs=1, sampling=1,
                    max_attempts=8)

    def builder(p, op_, y_):
        decode = make_decoder(lambda x, t: model.apply(p, x, t), sched, seq)
        return make_pixel_loss_fn(decode, op_, y_)

    n_chains = 64
    states = init_chains(jax.random.PRNGKey(2), cfg, n_chains, (d, d, 3))
    loss_fn = builder(params, op, y0)
    ref = jax.jit(lambda s: run_hmc(loss_fn, cfg, s))(states)

    mesh = chain_mesh()
    runner = make_sharded_hmc(cfg, mesh, builder)
    out = runner(params, op, y0, states)

    att = np.asarray(out.attempts)
    ep = np.asarray(out.epoch)
    assert att.shape == (64,)
    assert ((ep >= cfg.total_epochs) | (att >= cfg.max_attempts)).all()
    np.testing.assert_array_equal(np.asarray(out.samples),
                                  np.asarray(ref.samples))
    np.testing.assert_array_equal(np.asarray(out.x), np.asarray(ref.x))

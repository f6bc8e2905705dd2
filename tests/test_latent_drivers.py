"""Latent HMC execution drivers: the host-observed per-attempt driver must
match the jitted fori_loop run bit-for-bit, resume from orbax snapshots, and
the shard_mapped multi-device runner must match the vmapped run (same
per-chain keys) on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp

from nshmc_tpu.hmc.latent import (
    LatentHMCConfig, init_latent_chains, run_latent_hmc,
    run_latent_hmc_observed,
)
from nshmc_tpu.parallel.chains import chain_mesh, make_sharded_latent_hmc


def _toy_loss(a, y0):
    # stand-in for ddim+decode: linear map so the posterior is tractable
    def loss_fn(z):
        zf = z.reshape(-1)
        r = y0 - a * zf
        return jnp.sum(r**2), z

    return loss_fn


CFG = LatentHMCConfig(sigma_0=0.3, sigma_y0=1.0, tau=0.4, epsilon=0.1,
                      epochs=4, sampling=2, keep_samples=2)
SHAPE = (4, 4, 1)


def test_observed_matches_jit():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0.5, 1.5, 16), jnp.float32)
    y0 = jnp.asarray(rng.standard_normal(16), jnp.float32)
    loss_fn = _toy_loss(a, y0)

    states = init_latent_chains(jax.random.PRNGKey(0), CFG, 2, SHAPE)
    ref = jax.jit(lambda s: run_latent_hmc(loss_fn, CFG, s))(states)

    rounds = []
    out = run_latent_hmc_observed(
        loss_fn, CFG, states, callback=lambda s, r: rounds.append(r))

    assert rounds == list(range(CFG.total_attempts))
    np.testing.assert_array_equal(np.asarray(out.z), np.asarray(ref.z))
    np.testing.assert_array_equal(np.asarray(out.samples),
                                  np.asarray(ref.samples))
    np.testing.assert_array_equal(np.asarray(out.accepted),
                                  np.asarray(ref.accepted))


def test_observed_checkpoint_resume(tmp_path):
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(0.5, 1.5, 16), jnp.float32)
    y0 = jnp.asarray(rng.standard_normal(16), jnp.float32)
    loss_fn = _toy_loss(a, y0)

    states = init_latent_chains(jax.random.PRNGKey(1), CFG, 2, SHAPE)
    full = run_latent_hmc_observed(loss_fn, CFG, states)

    # interrupted run: snapshot every round, stop after 3 attempts
    ckdir = str(tmp_path / "ck")

    class Stop(Exception):
        pass

    def bail(s, rnd):
        if rnd >= 2:
            raise Stop

    try:
        run_latent_hmc_observed(loss_fn, CFG, states, callback=bail,
                                checkpoint_dir=ckdir, checkpoint_every=1)
    except Stop:
        pass

    # resume must pick up from the snapshot and finish identically
    resumed = run_latent_hmc_observed(loss_fn, CFG, states,
                                      checkpoint_dir=ckdir,
                                      checkpoint_every=1)
    np.testing.assert_array_equal(np.asarray(resumed.z), np.asarray(full.z))
    np.testing.assert_array_equal(np.asarray(resumed.accepted),
                                  np.asarray(full.accepted))


def test_sharded_latent_matches_vmapped():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(0.5, 1.5, 16), jnp.float32)
    y0 = jnp.asarray(rng.standard_normal(16), jnp.float32)

    def builder(unet_params, ae_params, operator, y0_):
        return _toy_loss(unet_params, y0_)

    n_chains = 8
    states = init_latent_chains(jax.random.PRNGKey(2), CFG, n_chains, SHAPE)
    ref = jax.jit(
        lambda s: run_latent_hmc(_toy_loss(a, y0), CFG, s))(states)

    mesh = chain_mesh()
    assert mesh.devices.size == 8
    runner = make_sharded_latent_hmc(CFG, mesh, builder)
    out = runner(a, jnp.zeros(()), jnp.zeros(()), y0, states)

    np.testing.assert_array_equal(np.asarray(out.z), np.asarray(ref.z))
    np.testing.assert_array_equal(np.asarray(out.samples),
                                  np.asarray(ref.samples))
    np.testing.assert_array_equal(np.asarray(out.accepted),
                                  np.asarray(ref.accepted))


def test_extract_kept_samples():
    from nshmc_tpu.cli_latent import extract_kept_samples

    rings = np.zeros((2, 3, 2), np.float32)
    rings[0, 2] = 1.0          # chain 0 kept 1 (newest at end)
    rings[1, 1] = 2.0          # chain 1 kept 2
    rings[1, 2] = 3.0
    out = extract_kept_samples(rings, np.array([1, 2]))
    np.testing.assert_array_equal(out[:, 0], [1.0, 2.0, 3.0])

    # kept counts above ring capacity clamp to the ring
    out = extract_kept_samples(rings, np.array([5, 0]))
    assert out.shape[0] == 3

    # nothing kept -> empty, caller falls back to decoding the chain state
    out = extract_kept_samples(rings, np.array([0, 0]))
    assert out.shape[0] == 0

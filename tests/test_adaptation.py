"""Mass-matrix conditioned HMC + dual-averaging adaptation tests."""
import numpy as np
import jax
import jax.numpy as jnp

from nshmc_tpu.hmc.adaptation import (
    ConditionedHMCConfig,
    DualAveragingState,
    _rank_scores,
    dual_averaging_update,
    init_conditioned_chains,
    run_conditioned_hmc,
)

SHAPE = (4, 4, 1)
DIM = 16


def _loss(a, y):
    def loss_fn(x):
        r = y - a * x.reshape(-1)
        return jnp.sum(r**2), x

    return loss_fn


def test_rank_scores():
    v = jnp.asarray([3.0, 1.0, 2.0, 0.5])
    s = np.asarray(_rank_scores(v))
    # smallest variance -> -1, largest -> +1
    assert s[3] == -1.0 and s[0] == 1.0
    assert s[1] < s[2] < s[0]


def test_conditioned_hmc_runs_and_adapts():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0.2, 3.0, DIM), jnp.float32)
    y = jnp.asarray(rng.standard_normal(DIM), jnp.float32)
    cfg = ConditionedHMCConfig(sigma_0=0.3, tau=0.5, epsilon=0.05, burn=2,
                               epochs=6, sampling=2, max_attempts=300)
    states = init_conditioned_chains(jax.random.PRNGKey(0), cfg, 2, SHAPE)
    out = jax.jit(lambda s: run_conditioned_hmc(_loss(a, y), cfg, s))(states)
    assert (np.asarray(out.epoch) == cfg.total_epochs).all()
    mass = np.asarray(out.mass_diag)
    # mass must have adapted away from identity and be positive
    assert (mass > 0).all()
    assert np.abs(mass - 1.0).max() > 1e-3
    # mass follows exp(k*scores) -> bounded in [e^-1, e^1]
    assert mass.max() <= np.e + 1e-5 and mass.min() >= 1 / np.e - 1e-6


def test_dual_averaging_converges_toward_target():
    """If acceptance is persistently above target, eps must grow; below,
    shrink."""
    st = DualAveragingState.create(0.1)
    for _ in range(50):
        st = dual_averaging_update(st, jnp.asarray(1.0), target=0.65)
    assert float(jnp.exp(st.log_eps)) > 0.1

    st = DualAveragingState.create(0.1)
    for _ in range(50):
        st = dual_averaging_update(st, jnp.asarray(0.0), target=0.65)
    assert float(jnp.exp(st.log_eps)) < 0.1


def test_dual_averaging_lockstep_runner():
    from nshmc_tpu.hmc.engine import HMCConfig, init_chains
    from nshmc_tpu.hmc.adaptation import run_hmc_dual_averaging

    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(0.5, 1.5, DIM), jnp.float32)
    y = jnp.asarray(rng.standard_normal(DIM), jnp.float32)
    cfg = HMCConfig(sigma_0=0.3, tau=0.5, epsilon=0.05, epochs=4, sampling=2,
                    max_attempts=60)
    states = init_chains(jax.random.PRNGKey(0), cfg, 4, SHAPE)
    out, da = jax.jit(
        lambda s: run_hmc_dual_averaging(_loss(a, y), cfg, s)
    )(states)
    assert (np.asarray(out.epoch) <= cfg.total_epochs).all()
    assert (np.asarray(out.epoch) > 0).all()
    # the runner exits as soon as every chain finishes (and stops updating
    # epsilon then — post-completion rounds would read 0 acceptance)
    assert 0 < int(da.t) <= cfg.max_attempts
    assert np.isfinite(float(da.log_eps))


def test_dual_averaging_lockstep_sharded():
    """Shared-epsilon adaptation with pmean'd acceptance across the mesh."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    from nshmc_tpu.hmc.engine import HMCConfig, init_chains
    from nshmc_tpu.hmc.adaptation import run_hmc_dual_averaging

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(0.5, 1.5, DIM), jnp.float32)
    y = jnp.asarray(rng.standard_normal(DIM), jnp.float32)
    cfg = HMCConfig(sigma_0=0.3, tau=0.5, epsilon=0.05, epochs=2, sampling=1,
                    max_attempts=30)
    states = init_chains(jax.random.PRNGKey(1), cfg, 8, SHAPE)
    mesh = Mesh(np.asarray(jax.devices()), ("chain",))

    def body(a, y, states):
        return run_hmc_dual_averaging(_loss(a, y), cfg, states,
                                      axis_name="chain")

    out, da = jax.jit(shard_map(
        body, mesh=mesh, in_specs=(P(), P(), P("chain")),
        out_specs=(P("chain"), P()), check_vma=False,
    ))(a, y, states)
    assert np.asarray(out.epoch).shape[0] == 8
    assert np.isfinite(float(jnp.exp(da.log_eps)))

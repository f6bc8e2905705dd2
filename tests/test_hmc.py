"""HMC engine tests (SURVEY.md section 4, item 3): analytic linear-Gaussian
posterior moments, energy conservation as eps -> 0, accepted-count
semantics, determinism, and end-to-end with a tiny U-Net decoder."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from nshmc_tpu.hmc.engine import (
    HMCConfig,
    hmc_attempt,
    init_chain_state,
    init_chains,
    make_pixel_loss_fn,
    run_chain,
    run_hmc,
)

SHAPE = (4, 4, 1)
DIM = 16


def _linear_gaussian_loss(a_diag, y, sigma_meas):
    """decode = identity, H = diag(a): posterior is exactly Gaussian.
    loss = ||y - a*x||^2 (the 1/(2 sigma^2) factor is applied by the
    engine through sigma_y annealing terminating at sigma_0=sigma_meas)."""

    def loss_fn(x):
        r = y - a_diag * x.reshape(-1)
        return jnp.sum(r**2), x

    return loss_fn


def _posterior_moments(a_diag, y, sigma):
    # p(x|y) ~ N(0,I) * N(y; a x, sigma^2 I) -> var = 1/(1 + a^2/sigma^2)
    var = 1.0 / (1.0 + a_diag**2 / sigma**2)
    mean = var * a_diag * y / sigma**2
    return mean, var


def test_linear_gaussian_posterior_moments():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0.5, 1.5, DIM), jnp.float32)
    x_true = rng.standard_normal(DIM).astype(np.float32)
    sigma = 0.3
    y = jnp.asarray(a * x_true + sigma * rng.standard_normal(DIM), jnp.float32)

    # keep tau=1 trajectories through the sampling phase (post_tau == tau
    # disables the short-trajectory switch) for low autocorrelation
    cfg = HMCConfig(
        sigma_0=sigma, tau=1.0, epsilon=0.1, epochs=20, sampling=60,
        anneal_scale=1.0, post_tau=1.0, post_epsilon=0.1, max_attempts=4000,
    )
    loss_fn = _linear_gaussian_loss(a, y, sigma)

    n_chains = 16
    states = init_chains(jax.random.PRNGKey(0), cfg, n_chains, SHAPE)
    out = jax.jit(lambda s: run_hmc(loss_fn, cfg, s))(states)

    assert (np.asarray(out.epoch) == cfg.total_epochs).all()
    samples = np.asarray(out.samples).reshape(n_chains * cfg.sampling, DIM)
    mean_ref, var_ref = _posterior_moments(
        np.asarray(a), np.asarray(y), sigma
    )
    mean_err = np.abs(samples.mean(0) - mean_ref)
    assert (mean_err < 0.1).all(), (mean_err.max(), mean_err)
    var_est = samples.var(0)
    assert np.abs(var_est - var_ref).max() < 0.1, (var_est, var_ref)


def test_acceptance_near_one_for_tiny_steps():
    rng = np.random.default_rng(1)
    a = jnp.ones(DIM, jnp.float32)
    y = jnp.asarray(rng.standard_normal(DIM), jnp.float32)
    loss_fn = _linear_gaussian_loss(a, y, 0.5)
    cfg = HMCConfig(sigma_0=0.5, tau=0.01, epsilon=0.001, epochs=5,
                    sampling=5, max_attempts=100)
    state = init_chain_state(jax.random.PRNGKey(2), cfg, SHAPE)
    out = jax.jit(lambda s: run_chain(loss_fn, cfg, s))(state)
    rate = float(out.accepted) / float(out.attempts)
    assert rate > 0.95, rate


def test_accepted_count_semantics_and_backoff():
    """A loss that always diverges (NaN) must reject every attempt, decay
    tau/eps by 0.95 from the 2nd consecutive rejection on, and stop at
    max_attempts."""

    def bad_loss(x):
        return jnp.asarray(jnp.nan), x

    cfg = HMCConfig(sigma_0=0.1, tau=1.0, epsilon=0.5, epochs=2, sampling=1,
                    max_attempts=10)
    state = init_chain_state(jax.random.PRNGKey(3), cfg, SHAPE)
    out = jax.jit(lambda s: run_chain(bad_loss, cfg, s))(state)
    assert int(out.epoch) == 0
    assert int(out.attempts) == 10
    # 10 rejections -> 9 backoffs (from rejected>=2 onward)
    np.testing.assert_allclose(float(out.tau), 1.0 * 0.95**9, rtol=1e-5)
    np.testing.assert_allclose(float(out.epsilon), 0.5 * 0.95**9, rtol=1e-5)


def test_tau_epsilon_switch_at_epochs():
    rng = np.random.default_rng(4)
    a = jnp.ones(DIM, jnp.float32)
    y = jnp.asarray(rng.standard_normal(DIM), jnp.float32)
    loss_fn = _linear_gaussian_loss(a, y, 0.5)
    cfg = HMCConfig(sigma_0=0.5, tau=1.0, epsilon=0.05, epochs=3, sampling=2,
                    max_attempts=500)
    state = init_chain_state(jax.random.PRNGKey(5), cfg, SHAPE)
    out = jax.jit(lambda s: run_chain(loss_fn, cfg, s))(state)
    # after the run, tau must be <= post_tau (0.1), possibly backed off
    assert float(out.tau) <= 0.1 + 1e-6
    assert float(out.epsilon) <= 0.01 + 1e-6


def test_determinism():
    rng = np.random.default_rng(6)
    a = jnp.ones(DIM, jnp.float32)
    y = jnp.asarray(rng.standard_normal(DIM), jnp.float32)
    loss_fn = _linear_gaussian_loss(a, y, 0.4)
    cfg = HMCConfig(sigma_0=0.4, tau=0.5, epsilon=0.05, epochs=4, sampling=3,
                    max_attempts=200)
    s1 = init_chain_state(jax.random.PRNGKey(7), cfg, SHAPE)
    s2 = init_chain_state(jax.random.PRNGKey(7), cfg, SHAPE)
    o1 = jax.jit(lambda s: run_chain(loss_fn, cfg, s))(s1)
    o2 = jax.jit(lambda s: run_chain(loss_fn, cfg, s))(s2)
    np.testing.assert_array_equal(np.asarray(o1.samples), np.asarray(o2.samples))


def test_end_to_end_tiny_unet():
    """Full stack: tiny ADM U-Net decode + inpainting operator + HMC
    (mirrors the reference's random-init fallback pipeline,
    unet_ffhq.py:87-90)."""
    from nshmc_tpu.models.unet import UNetConfig, UNetModel
    from nshmc_tpu.sampling.ddim import make_decoder
    from nshmc_tpu.schedules import DiffusionSchedule, DDIMSequence
    from nshmc_tpu.operators import Inpainting

    d = 16
    cfg_model = UNetConfig(
        image_size=d, model_channels=32, out_channels=6, num_res_blocks=1,
        attention_ds=(2,), channel_mult=(1, 2), num_heads=2,
        num_head_channels=16, use_scale_shift_norm=True, resblock_updown=True,
    )
    model = UNetModel(cfg_model)
    key = jax.random.PRNGKey(8)
    params = model.init(key, jnp.zeros((1, d, d, 3)), jnp.zeros((1,)))

    sched = DiffusionSchedule.create(num_timesteps=100)
    seq = DDIMSequence.create(100, 3)
    decode = make_decoder(
        lambda x, t: model.apply(params, x, t), sched, seq
    )

    rng = np.random.default_rng(0)
    missing_perm = rng.permutation(d * d)[: int(d * d * 0.5)]
    mr = 3 * missing_perm
    op = Inpainting.create(3, d, np.sort(np.concatenate([mr, mr + 1, mr + 2])))

    x_orig = jnp.asarray(rng.uniform(-1, 1, (1, d, d, 3)), jnp.float32)
    y0 = op.H_img(x_orig)[0]

    cfg = HMCConfig(sigma_0=0.1, tau=0.1, epsilon=0.05, epochs=2, sampling=2,
                    max_attempts=30)
    loss_fn = make_pixel_loss_fn(decode, op, y0)
    states = init_chains(jax.random.PRNGKey(9), cfg, 2, (d, d, 3))
    out = jax.jit(lambda s: run_hmc(loss_fn, cfg, s))(states)
    assert np.isfinite(np.asarray(out.last_loss)).all()
    assert np.asarray(out.samples).shape == (2, 2, d, d, 3)
    assert (np.asarray(out.attempts) <= 30).all()


def test_multi_image_multi_chain():
    from nshmc_tpu.hmc.engine import run_hmc_multi

    dim = 16
    shape = (4, 4, 1)
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.uniform(0.5, 1.5, dim), jnp.float32)
    y0s = jnp.asarray(rng.standard_normal((3, dim)), jnp.float32)  # 3 images

    def builder(y0):
        def loss_fn(x):
            r = y0 - a * x.reshape(-1)
            return jnp.sum(r**2), x

        return loss_fn

    cfg = HMCConfig(sigma_0=0.3, tau=0.3, epsilon=0.05, epochs=2, sampling=2,
                    max_attempts=100)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    states = jax.vmap(lambda k: init_chains(k, cfg, 2, shape))(keys)
    out = jax.jit(lambda s: run_hmc_multi(builder, cfg, s, y0s))(states)
    assert np.asarray(out.samples).shape == (3, 2, 2, 4, 4, 1)
    assert (np.asarray(out.epoch) == cfg.total_epochs).all()


def test_sigma_y_annealing_formula():
    """sigma_y = sigma_0 + 1.6*(1 - e/E)^2 during anneal, then sigma_0
    (main_sampling.py:683-689)."""
    from nshmc_tpu.hmc.engine import _sigma_y

    cfg = HMCConfig(sigma_0=0.1, epochs=60, sampling=20)
    for e in [0, 10, 30, 59]:
        ref = 0.1 + 1.6 * (1 - e / 60) ** 2
        np.testing.assert_allclose(
            float(_sigma_y(cfg, jnp.asarray(e))), ref, rtol=1e-6)
    for e in [60, 61, 99]:
        np.testing.assert_allclose(
            float(_sigma_y(cfg, jnp.asarray(e))), 0.1, rtol=1e-6)


def test_leapfrog_energy_conservation_small_eps():
    """Hamiltonian drift -> 0 as eps -> 0 on a quadratic potential."""
    from nshmc_tpu.hmc.engine import leapfrog_propose

    a = jnp.ones(DIM, jnp.float32) * 0.8
    y = jnp.zeros(DIM, jnp.float32)

    def loss_fn(x):
        r = y - a * x.reshape(-1)
        return jnp.sum(r**2), x

    drifts = []
    for eps in [0.1, 0.01]:
        _, _, _, _, log_ratio = leapfrog_propose(
            loss_fn, jax.random.normal(jax.random.PRNGKey(0), SHAPE),
            sigma_y=0.5, eps=eps, n_leapfrog=10, m=1.0,
            key=jax.random.PRNGKey(1),
        )
        drifts.append(abs(float(log_ratio)))
    # second-order integrator: drift scales ~eps^2
    assert drifts[1] < drifts[0] * 0.05, drifts


def test_observed_resume_heterogeneous_chains(tmp_path):
    """Resume equivalence when chains finish at DIFFERENT attempt counts.

    run_hmc_observed restarts at max(attempts); finished chains are frozen
    with attempts below that, so per-chain attempt counts diverge. The
    resumed run must be bitwise identical to an uninterrupted one
    (VERDICT round-1 weak item 6)."""
    from nshmc_tpu.hmc.engine import run_hmc_observed

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(0.5, 1.5, DIM), jnp.float32)
    y = jnp.asarray(rng.standard_normal(DIM), jnp.float32)
    # large epsilon -> frequent rejections -> chains finish (epoch =
    # accepted count) at heterogeneous attempt counts
    cfg = HMCConfig(sigma_0=0.3, tau=1.0, epsilon=0.9, epochs=2, sampling=1,
                    max_attempts=60)
    loss_fn = _linear_gaussian_loss(a, y, 0.3)
    states0 = init_chains(jax.random.PRNGKey(7), cfg, 8, SHAPE)

    ref = run_hmc_observed(loss_fn, cfg, states0)
    assert int(jnp.max(ref.attempts)) > int(jnp.min(ref.attempts)), \
        "test needs heterogeneous per-chain attempt counts"

    class _Stop(Exception):
        pass

    stop_at = int(jnp.max(ref.attempts)) // 2

    def interrupter(states, rnd):
        if rnd >= stop_at:
            raise _Stop

    ckpt = str(tmp_path / "ck")
    try:
        run_hmc_observed(loss_fn, cfg, states0, callback=interrupter,
                         checkpoint_dir=ckpt, checkpoint_every=1)
    except _Stop:
        pass

    resumed = run_hmc_observed(loss_fn, cfg, states0, checkpoint_dir=ckpt)
    for name in ("x", "epoch", "attempts", "tau", "epsilon", "accepted"):
        r, f = getattr(ref, name, None), getattr(resumed, name, None)
        if r is None:
            continue
        np.testing.assert_array_equal(np.asarray(r), np.asarray(f),
                                      err_msg=name)


def test_observed_attempts_per_round_equivalence():
    """Fusing N attempts per device dispatch (attempts_per_round) must not
    change sampler statistics: same init states -> identical final chain
    states as the 1-attempt-per-round driver, including chains that freeze
    mid-fused-program at their epoch budget."""
    from nshmc_tpu.hmc.engine import run_hmc_observed

    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.uniform(0.5, 1.5, DIM), jnp.float32)
    y = jnp.asarray(rng.standard_normal(DIM), jnp.float32)
    cfg = HMCConfig(sigma_0=0.3, tau=1.0, epsilon=0.9, epochs=2, sampling=1,
                    max_attempts=60)
    loss_fn = _linear_gaussian_loss(a, y, 0.3)
    states0 = init_chains(jax.random.PRNGKey(9), cfg, 8, SHAPE)

    ref = run_hmc_observed(loss_fn, cfg, states0)
    assert int(jnp.max(ref.attempts)) > int(jnp.min(ref.attempts)), \
        "test needs heterogeneous per-chain attempt counts"
    fused = run_hmc_observed(loss_fn, cfg, states0, attempts_per_round=3)

    for name in ("epoch", "attempts", "accepted"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(fused, name)),
            err_msg=name)
    for name in ("x", "tau", "epsilon", "samples"):
        np.testing.assert_allclose(
            np.asarray(getattr(ref, name)), np.asarray(getattr(fused, name)),
            rtol=1e-5, atol=1e-6, err_msg=name)


def test_observed_apr_respects_max_attempts():
    """With attempts_per_round > 1, unconverged chains must still stop at
    cfg.max_attempts exactly (ADVICE r4 medium: the per-attempt freeze only
    checked the epoch budget, so a never-accepting chain could run up to
    apr-1 attempts past the bound inside a fused program)."""
    from nshmc_tpu.hmc.engine import run_hmc_observed

    def never_accept_loss(x):
        # infinite energy -> log_ratio is NaN -> every proposal rejects
        return jnp.inf * jnp.sum(x**2), x

    # max_attempts=5 NOT divisible by apr=3: old code ran 6 attempts
    cfg = HMCConfig(sigma_0=0.3, tau=0.2, epsilon=0.1, epochs=1, sampling=1,
                    max_attempts=5)
    states0 = init_chains(jax.random.PRNGKey(0), cfg, 2, SHAPE)
    out = run_hmc_observed(never_accept_loss, cfg, states0,
                           attempts_per_round=3)
    np.testing.assert_array_equal(np.asarray(out.attempts), 5)
    np.testing.assert_array_equal(np.asarray(out.accepted), 0)


def test_observed_checkpoint_cadence_exact(tmp_path, monkeypatch):
    """Checkpoint cadence is every `checkpoint_every` ATTEMPTS for all apr
    values (ADVICE r4 low: the old (rnd//apr) % (every//apr) form saved
    every 9 attempts for apr=3, every=10)."""
    import nshmc_tpu.hmc.engine as eng
    from nshmc_tpu.utils import checkpointing as ck

    saves = []
    monkeypatch.setattr(
        ck, "save_chain_state",
        lambda d, s, step=0: saves.append(int(jnp.max(s.attempts))))
    monkeypatch.setattr(ck, "load_chain_state",
                        lambda d, s, step=0: None)

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(0.5, 1.5, DIM), jnp.float32)
    y = jnp.asarray(rng.standard_normal(DIM), jnp.float32)
    cfg = HMCConfig(sigma_0=0.3, tau=1.0, epsilon=0.9, epochs=8, sampling=4,
                    max_attempts=60)
    loss_fn = _linear_gaussian_loss(a, y, 0.3)
    states0 = init_chains(jax.random.PRNGKey(2), cfg, 2, SHAPE)
    eng.run_hmc_observed(loss_fn, cfg, states0, checkpoint_dir=str(tmp_path),
                         checkpoint_every=10, attempts_per_round=3)
    # cadence saves land at attempts 12, 24, ... — the first multiple of
    # apr that accumulates 10 attempts since the last save (the old
    # formula's first save was at 9 for apr=3). The tail saves (chains
    # finish mid-stride, plus the final unconditional save) saturate at
    # the completion attempt count.
    assert len(saves) >= 2 and saves[0] == 12 and saves[1] == 24, saves


def test_observed_chain_chunk_equivalence():
    """Chunked-chain serving (sequential device waves per attempt) must be
    bitwise-identical to the plain vmapped driver — chains are independent,
    only device scheduling changes (BASELINE.json config #4: 64-chain
    serving on one chip)."""
    from nshmc_tpu.hmc.engine import run_hmc_observed

    rng = np.random.default_rng(11)
    a = jnp.asarray(rng.uniform(0.5, 1.5, DIM), jnp.float32)
    y = jnp.asarray(rng.standard_normal(DIM), jnp.float32)
    cfg = HMCConfig(sigma_0=0.3, tau=1.0, epsilon=0.9, epochs=2, sampling=1,
                    max_attempts=40)
    loss_fn = _linear_gaussian_loss(a, y, 0.3)
    states0 = init_chains(jax.random.PRNGKey(4), cfg, 16, SHAPE)

    ref = run_hmc_observed(loss_fn, cfg, states0)
    chunked = run_hmc_observed(loss_fn, cfg, states0, chain_chunk=4)
    chunked_apr = run_hmc_observed(loss_fn, cfg, states0, chain_chunk=4,
                                   attempts_per_round=3)
    for out, label in ((chunked, "chunk"), (chunked_apr, "chunk+apr")):
        for name in ("epoch", "attempts", "accepted"):
            np.testing.assert_array_equal(
                np.asarray(getattr(ref, name)),
                np.asarray(getattr(out, name)), err_msg=f"{label}:{name}")
        for name in ("x", "tau", "epsilon", "samples"):
            np.testing.assert_allclose(
                np.asarray(getattr(ref, name)),
                np.asarray(getattr(out, name)),
                rtol=1e-5, atol=1e-6, err_msg=f"{label}:{name}")

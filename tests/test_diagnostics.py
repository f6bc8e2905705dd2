"""Statistical sampler-correctness suite (SURVEY.md section 4 item 3 — the
gold tests the reference never wrote):

 1. ESS / split-R-hat diagnostics validated on processes with known answers
    (iid draws, AR(1) with analytic integrated autocorrelation time,
    disjoint chains).
 2. Analytic linear-Gaussian posterior coverage: with a LINEAR decode the
    posterior over x is exactly Gaussian — the HMC engine's kept samples
    must reproduce its mean/covariance within Monte-Carlo error, and the
    diagnostics must pass. Run for the plain engine AND the conditioned /
    dual-averaging variants.
 3. Multi-seed distribution-level parity: the jitted engine and an
    independent numpy mirror of the reference sampler (same semantics,
    DIFFERENT randomness) must produce kept-sample populations with
    matching moments across many seeds — complementing the single-
    trajectory shared-RNG parity in test_hmc_parity.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nshmc_tpu.utils.diagnostics import ess, split_rhat, summarize_chains
from nshmc_tpu.hmc.engine import (
    HMCConfig, init_chains, run_hmc, leapfrog_propose,
)


# ---------------------------------------------------------------------------
# 1. diagnostics on known processes
# ---------------------------------------------------------------------------

def test_rhat_ess_iid():
    rng = np.random.default_rng(0)
    draws = rng.standard_normal((4, 500))
    r = split_rhat(draws)
    e = ess(draws)
    assert abs(float(r) - 1.0) < 0.02
    # iid: ESS ~ total draw count (anti-/auto-correlation noise ~ +-20%)
    assert 0.7 * 2000 < float(e) < 1.4 * 2000


def test_ess_ar1_analytic():
    """AR(1) x_t = phi x_{t-1} + e_t has tau = (1+phi)/(1-phi);
    ESS = N / tau."""
    rng = np.random.default_rng(1)
    phi = 0.7
    m, n = 4, 4000
    x = np.zeros((m, n))
    innov = rng.standard_normal((m, n)) * np.sqrt(1 - phi**2)
    for t in range(1, n):
        x[:, t] = phi * x[:, t - 1] + innov[:, t]
    tau_true = (1 + phi) / (1 - phi)  # ~5.67
    e = float(ess(x))
    expected = m * n / tau_true
    assert 0.6 * expected < e < 1.6 * expected


def test_rhat_detects_disjoint_chains():
    rng = np.random.default_rng(2)
    a = rng.standard_normal((2, 200))
    b = rng.standard_normal((2, 200)) + 5.0
    draws = np.concatenate([a, b], axis=0)
    assert float(split_rhat(draws)) > 1.5


def test_summarize_chains_shapes():
    rng = np.random.default_rng(3)
    draws = rng.standard_normal((4, 64, 8, 8, 3))
    s = summarize_chains(draws)
    assert s["n_chains"] == 4 and s["n_draws"] == 64
    assert np.isfinite(s["rhat_max"]) and np.isfinite(s["ess_min"])
    assert s["rhat_max"] < 1.15  # iid draws converge


# ---------------------------------------------------------------------------
# 2. analytic linear-Gaussian posterior coverage
# ---------------------------------------------------------------------------

DIM = 4
SHAPE = (2, 2, 1)


def _analytic_posterior(a, y, sigma):
    """decode = identity, H = diag(a): U = |x|^2/2 + |y - a x|^2/(2 s^2)
    => posterior N(mu, Sigma) with Sigma = (I + a^2/s^2)^-1,
    mu = Sigma a y / s^2."""
    prec = 1.0 + a**2 / sigma**2
    var = 1.0 / prec
    mu = var * a * y / sigma**2
    return mu, var


def _linear_loss(a, y):
    def loss_fn(x):
        r = y - a * x.reshape(-1)
        return jnp.sum(r**2), x
    return loss_fn


def _run_engine(cfg, loss_fn, n_chains, seed):
    states = init_chains(jax.random.PRNGKey(seed), cfg, n_chains, SHAPE)
    out = jax.jit(lambda s: run_hmc(loss_fn, cfg, s))(states)
    # kept samples: (chains, sampling, *SHAPE)
    return np.asarray(out.samples).reshape(n_chains, cfg.sampling, DIM)


def test_engine_matches_analytic_gaussian_posterior():
    """Post-anneal, sigma_y == sigma_0 and the stationary distribution is
    the analytic Gaussian. Long sampling phase + moment comparison +
    diagnostics. This validates integrator + MH + annealing jointly."""
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.uniform(0.5, 2.0, DIM), jnp.float32)
    y = jnp.asarray(rng.standard_normal(DIM), jnp.float32)
    sigma = 0.8
    mu, var = _analytic_posterior(np.asarray(a), np.asarray(y), sigma)

    # post_tau == tau disables the reference's post-anneal (0.1, 0.01)
    # switch, which would shrink trajectories to eps*L = 0.04 and freeze
    # mixing during the sampling phase (fine for images with 2100-eval
    # budgets, fatal for a 150-draw moment test)
    cfg = HMCConfig(sigma_0=sigma, tau=1.0, epsilon=0.25, epochs=20,
                    sampling=150, max_attempts=3000,
                    post_tau=1.0, post_epsilon=0.25)
    draws = _run_engine(cfg, _linear_loss(a, y), n_chains=8, seed=0)

    est_mu = draws.reshape(-1, DIM).mean(axis=0)
    est_var = draws.reshape(-1, DIM).var(axis=0)
    # MC error of the mean ~ sqrt(var/ESS); allow 5 sigma with ESS >= ~200
    se = np.sqrt(var / 200)
    np.testing.assert_allclose(est_mu, mu, atol=float(5 * se.max()))
    np.testing.assert_allclose(est_var, var, rtol=0.35)

    diag = summarize_chains(draws)
    assert diag["rhat_max"] < 1.2, diag
    assert diag["ess_min"] > 50, diag


def test_conditioned_engine_matches_analytic_posterior():
    """Same coverage for the mass-conditioned variant
    (hmc_test_conditioning port)."""
    from nshmc_tpu.hmc.adaptation import (
        ConditionedHMCConfig, init_conditioned_chains, run_conditioned_hmc,
    )

    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.uniform(0.5, 2.0, DIM), jnp.float32)
    y = jnp.asarray(rng.standard_normal(DIM), jnp.float32)
    sigma = 0.8
    mu, var = _analytic_posterior(np.asarray(a), np.asarray(y), sigma)

    cfg = ConditionedHMCConfig(sigma_0=sigma, tau=1.0, epsilon=0.25,
                               burn=5, epochs=20, sampling=100,
                               max_attempts=3000,
                               post_tau=1.0, post_epsilon=0.25)
    states = init_conditioned_chains(jax.random.PRNGKey(1), cfg, 8, SHAPE)
    out = jax.jit(
        lambda s: run_conditioned_hmc(_linear_loss(a, y), cfg, s))(states)
    # conditioned ring keeps sampling*3 draws (the reference's 4-phase
    # split keeps the last 3 sampling windows)
    draws = np.asarray(out.samples).reshape(8, cfg.sampling * 3, DIM)

    est_mu = draws.reshape(-1, DIM).mean(axis=0)
    est_var = draws.reshape(-1, DIM).var(axis=0)
    se = np.sqrt(var / 150)
    np.testing.assert_allclose(est_mu, mu, atol=float(5 * se.max()))
    np.testing.assert_allclose(est_var, var, rtol=0.4)


def test_dual_averaging_matches_analytic_posterior():
    """Dual-averaged step size must converge toward the target acceptance
    AND keep the correct stationary distribution."""
    from nshmc_tpu.hmc.adaptation import run_hmc_dual_averaging

    rng = np.random.default_rng(6)
    a = jnp.asarray(rng.uniform(0.5, 2.0, DIM), jnp.float32)
    y = jnp.asarray(rng.standard_normal(DIM), jnp.float32)
    sigma = 0.8
    mu, var = _analytic_posterior(np.asarray(a), np.asarray(y), sigma)

    cfg = HMCConfig(sigma_0=sigma, tau=1.0, epsilon=0.3, epochs=10,
                    sampling=120, max_attempts=2500,
                    post_tau=1.0, post_epsilon=0.3)
    states = init_chains(jax.random.PRNGKey(2), cfg, 8, SHAPE)
    out, da = jax.jit(
        lambda s: run_hmc_dual_averaging(_linear_loss(a, y), cfg, s))(states)
    draws = np.asarray(out.samples).reshape(8, cfg.sampling, DIM)
    est_mu = draws.reshape(-1, DIM).mean(axis=0)
    se = np.sqrt(var / 150)
    np.testing.assert_allclose(est_mu, mu, atol=float(5 * se.max()))
    assert np.isfinite(float(da.log_eps_avg))
    assert float(jnp.exp(da.log_eps_avg)) > 0


# ---------------------------------------------------------------------------
# 3. multi-seed distribution-level parity vs an independent mirror
# ---------------------------------------------------------------------------

def _mirror_hmc(seed, a, y, cfg):
    """Independent numpy mirror of the reference `hmc` loop
    (main_sampling.py:660-774 semantics: accepted-count epochs, anneal,
    post-switch, x0.95 no-reset backoff) with numpy RNG — different
    randomness from the engine by construction."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(DIM).astype(np.float32)
    a = np.asarray(a)
    y = np.asarray(y)
    tau, eps = cfg.tau, cfg.epsilon
    L = cfg.n_leapfrog
    epoch = 0
    rejected = 0
    samples = []
    attempts = 0
    while epoch < cfg.total_epochs and attempts < cfg.max_attempts:
        attempts += 1
        e = epoch
        sigma_y = (cfg.sigma_0 + cfg.anneal_scale * (1 - e / cfg.epochs) ** 2
                   if e < cfg.epochs else cfg.sigma_0)
        if e >= cfg.epochs and tau > cfg.post_tau:
            tau, eps = cfg.post_tau, cfg.post_epsilon
        inv2s2 = 1 / (2 * sigma_y**2)

        def grad_u(x):
            return x + inv2s2 * (-2 * a * (y - a * x))

        def U(x):
            return 0.5 * np.sum(x**2) + inv2s2 * np.sum((y - a * x) ** 2)

        p0 = rng.standard_normal(DIM).astype(np.float32) * np.sqrt(cfg.m)
        h0 = U(x) + 0.5 * np.sum(p0**2) / cfg.m
        p = p0 - eps / 2 * grad_u(x)
        xp = x.copy()
        for _ in range(L):
            xp = xp + eps / cfg.m * p
            p = p - eps * grad_u(xp)
        p = p + eps / 2 * grad_u(xp)
        h1 = U(xp) + 0.5 * np.sum(p**2) / cfg.m
        if np.log(rng.uniform()) < min(-(h1 - h0), 0.0):
            x = xp
            if epoch >= cfg.epochs + cfg.sampling:
                samples.append(x.copy())
            epoch += 1
            rejected = 0
        else:
            rejected += 1
            if rejected >= 2:
                tau *= cfg.backoff
                eps *= cfg.backoff
    return np.asarray(samples)


def test_multi_seed_distribution_parity():
    """Kept-sample populations from the engine and the mirror across many
    seeds must have matching mean/variance per coordinate (two-sample
    moment comparison within MC error). Catches systematic bias that a
    single shared-RNG trajectory cannot."""
    rng = np.random.default_rng(7)
    a = jnp.asarray(rng.uniform(0.5, 2.0, DIM), jnp.float32)
    y = jnp.asarray(rng.standard_normal(DIM), jnp.float32)
    cfg = HMCConfig(sigma_0=0.8, tau=0.6, epsilon=0.2, epochs=6,
                    sampling=20, max_attempts=600)

    n_seeds = 12
    eng = _run_engine(cfg, _linear_loss(a, y), n_chains=n_seeds, seed=11)
    eng_draws = eng.reshape(-1, DIM)

    mir = np.concatenate([
        _mirror_hmc(1000 + s, a, y, cfg) for s in range(n_seeds)
    ])

    mu_e, mu_m = eng_draws.mean(axis=0), mir.mean(axis=0)
    sd_e, sd_m = eng_draws.std(axis=0), mir.std(axis=0)
    n_e, n_m = len(eng_draws), len(mir)
    # draws within a chain autocorrelate: deflate effective counts by ~4
    se = np.sqrt(sd_e**2 / max(n_e / 4, 1) + sd_m**2 / max(n_m / 4, 1))
    z = np.abs(mu_e - mu_m) / np.maximum(se, 1e-9)
    assert float(z.max()) < 5.0, (mu_e, mu_m, z)
    np.testing.assert_allclose(sd_e, sd_m, rtol=0.5)


def test_rhat_frozen_chains_report_inf():
    """Frozen (all-reject) chains stuck at DIFFERENT values must report
    R-hat = inf + an explicit degenerate flag, not a ~1e141 float (VERDICT
    r4 weak #4: the full-budget run log printed rhat_max=1e141)."""
    from nshmc_tpu.utils.diagnostics import (
        split_rhat, summarize_chains, format_summary,
    )

    # 4 chains x 8 identical draws each, frozen at distinct values
    draws = np.repeat(np.arange(4.0)[:, None], 8, axis=1)[..., None]
    r = split_rhat(draws)
    assert np.isinf(r).all(), r

    diag = summarize_chains(np.repeat(draws, 3, axis=-1))
    assert diag["degenerate"] is True
    assert diag["n_frozen_chains"] == 4
    assert diag["n_frozen_params"] > 0
    line = format_summary(diag)
    assert "frozen" in line and "e1" not in line, line


def test_rhat_constant_parameter_is_one():
    """A parameter identical across ALL chains and draws (e.g. a hard-pinned
    coordinate) carries no convergence evidence: R-hat = 1, not inf/NaN."""
    from nshmc_tpu.utils.diagnostics import split_rhat

    draws = np.full((4, 8, 1), 3.7)
    np.testing.assert_array_equal(split_rhat(draws), 1.0)


def test_rhat_healthy_chains_unaffected_by_guard():
    """The degeneracy guard must not perturb R-hat for healthy draws."""
    from nshmc_tpu.utils.diagnostics import split_rhat, summarize_chains

    rng = np.random.default_rng(0)
    draws = rng.standard_normal((4, 256, 3))
    r = split_rhat(draws)
    assert np.all(np.isfinite(r)) and np.all(np.abs(r - 1.0) < 0.1), r
    diag = summarize_chains(draws)
    assert diag["degenerate"] is False
    assert diag["n_frozen_chains"] == 0

"""Schedule math vs the reference formulas (main_sampling.py:38-73, 469-471)."""
import numpy as np
import jax.numpy as jnp
import pytest

from nshmc_tpu.schedules import make_betas, DiffusionSchedule, DDIMSequence


def _ref_betas(schedule, beta_start, beta_end, n):
    # re-derivation of main_sampling.py:38-68 in pure numpy
    if schedule == "quad":
        return np.linspace(beta_start**0.5, beta_end**0.5, n, dtype=np.float64) ** 2
    if schedule == "linear":
        return np.linspace(beta_start, beta_end, n, dtype=np.float64)
    if schedule == "const":
        return beta_end * np.ones(n, dtype=np.float64)
    if schedule == "jsd":
        return 1.0 / np.linspace(n, 1, n, dtype=np.float64)
    if schedule == "sigmoid":
        x = np.linspace(-6, 6, n)
        return 1 / (np.exp(-x) + 1) * (beta_end - beta_start) + beta_start
    raise ValueError


@pytest.mark.parametrize("schedule", ["linear", "quad", "const", "jsd", "sigmoid"])
def test_betas_match_reference(schedule):
    ours = make_betas(schedule, 1e-4, 2e-2, 1000)
    ref = _ref_betas(schedule, 1e-4, 2e-2, 1000)
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_alpha_bar_matches_compute_alpha():
    # compute_alpha(b, t) = cumprod(1 - cat([0, b]))[t + 1]  (main_sampling.py:70-73)
    sched = DiffusionSchedule.create("linear", 1e-4, 2e-2, 1000)
    betas = np.asarray(sched.betas, np.float64)
    padded_cumprod = np.cumprod(1.0 - np.concatenate([[0.0], betas]))
    for t in [-1, 0, 1, 249, 250, 500, 750, 999]:
        np.testing.assert_allclose(
            float(sched.alpha_bar(jnp.asarray(t))),
            padded_cumprod[t + 1],
            rtol=1e-5,
        )
    assert float(sched.alpha_bar(jnp.asarray(-1))) == 1.0


def test_ddim_sequence_flagship():
    # T=1000, timesteps=3 -> seq [250,500,750], seq_next [-1,250,500]
    # (main_sampling.py:469-471)
    s = DDIMSequence.create(1000, 3)
    assert s.seq == (250, 500, 750)
    assert s.seq_next == (-1, 250, 500)
    pairs = s.reversed_pairs()
    np.testing.assert_array_equal(pairs, [[750, 500], [500, 250], [250, -1]])


def test_ddim_sequence_generic():
    for steps in [1, 2, 3, 5, 10, 20, 100]:
        skip = 1000 // (steps + 1)
        seq = list(range(skip, 1000, skip))
        s = DDIMSequence.create(1000, steps)
        assert list(s.seq) == seq
        assert list(s.seq_next) == [-1] + seq[:-1]


def test_from_alphas_cumprod_roundtrip():
    sched = DiffusionSchedule.create("linear", 1e-4, 2e-2, 100)
    rebuilt = DiffusionSchedule.from_alphas_cumprod(np.asarray(sched.alphas_cumprod))
    np.testing.assert_allclose(
        np.asarray(rebuilt.alphas_cumprod), np.asarray(sched.alphas_cumprod), rtol=1e-5
    )
    # betas are reconstructed from float32 cumprod ratios: ~1e-3 relative noise
    np.testing.assert_allclose(
        np.asarray(rebuilt.betas), np.asarray(sched.betas), rtol=5e-3, atol=1e-6
    )

"""Differentiable DDIM decoder tests: step math vs reference formulas,
scan-vs-python-loop equivalence, determinism, vjp viability."""
import numpy as np
import jax
import jax.numpy as jnp

from nshmc_tpu.schedules import DiffusionSchedule, DDIMSequence
from nshmc_tpu.sampling.ddim import ddim_decode, ddim_step, make_decoder


def _toy_model(x, t):
    """A smooth fake eps-model with a 6-channel (learn_sigma-like) output."""
    base = jnp.tanh(x * 0.5) * (1.0 + 0.001 * t[:, None, None, None])
    return jnp.concatenate([base, jnp.zeros_like(base)], axis=-1)


SCHED = DiffusionSchedule.create(num_timesteps=1000)
SEQ = DDIMSequence.create(1000, 3)


def test_decode_equals_python_loop():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    out = jax.jit(lambda x: ddim_decode(_toy_model, SCHED, SEQ, x))(x)

    xt = x
    for t, t_next in zip(reversed(SEQ.seq), reversed(SEQ.seq_next)):
        at = float(SCHED.alpha_bar(jnp.asarray(t)))
        at_next = float(SCHED.alpha_bar(jnp.asarray(t_next)))
        et = _toy_model(xt, jnp.full((2,), float(t)))[..., :3]
        x0 = jnp.clip((xt - et * np.sqrt(1 - at)) / np.sqrt(at), -1, 1)
        xt = np.sqrt(at_next) * x0 + np.sqrt(1 - at_next) * et
    np.testing.assert_allclose(np.asarray(out), np.asarray(xt), atol=1e-5)
    # terminal alpha_bar(-1)=1 -> output is the clipped x0 prediction
    assert np.abs(np.asarray(out)).max() <= 1.0 + 1e-6


def test_single_step_formulas():
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 3))
    xt_next, x0 = ddim_step(_toy_model, SCHED, x, jnp.asarray(750), jnp.asarray(500))
    at = float(SCHED.alpha_bar(jnp.asarray(750)))
    at_next = float(SCHED.alpha_bar(jnp.asarray(500)))
    et = _toy_model(x, jnp.full((1,), 750.0))[..., :3]
    x0_ref = jnp.clip((x - et * np.sqrt(1 - at)) / np.sqrt(at), -1, 1)
    np.testing.assert_allclose(np.asarray(x0), np.asarray(x0_ref), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(xt_next),
        np.asarray(np.sqrt(at_next) * x0_ref + np.sqrt(1 - at_next) * et),
        atol=1e-6,
    )


def test_vjp_through_decoder():
    decode = make_decoder(_toy_model, SCHED, SEQ)

    def loss(x):
        return jnp.sum(decode(x) ** 2)

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 3)) * 0.1
    g = jax.jit(jax.grad(loss))(x)
    assert np.isfinite(np.asarray(g)).all()
    # finite-difference check on one coordinate
    e = np.zeros_like(np.asarray(x))
    e[0, 3, 3, 1] = 1e-3
    fd = (loss(x + jnp.asarray(e)) - loss(x - jnp.asarray(e))) / 2e-3
    np.testing.assert_allclose(float(fd), float(g[0, 3, 3, 1]), rtol=2e-2, atol=1e-4)


def test_ladder_forms_numerically_identical():
    """scan, chunk-unrolled scan (k=2,3), and full static unroll must agree
    bitwise-close in both value and input-gradient — the ladder form is a
    perf knob only (VERDICT r4 next #4)."""
    sched = DiffusionSchedule.create(num_timesteps=100)
    seq = DDIMSequence.create(100, 5)

    def model_fn(x, t):
        return 0.1 * x * (1.0 + t[:, None, None, None] / 100.0)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 4, 3)),
                    jnp.float32)

    def loss(x, unroll):
        return jnp.sum(ddim_decode(model_fn, sched, seq, x,
                                   unroll=unroll) ** 2)

    ref_v, ref_g = jax.value_and_grad(lambda x: loss(x, False))(x)
    for form in (2, 3, True):
        v, g = jax.value_and_grad(lambda x: loss(x, form))(x)
        np.testing.assert_allclose(float(v), float(ref_v), rtol=1e-6,
                                   err_msg=str(form))
        np.testing.assert_allclose(np.asarray(g), np.asarray(ref_g),
                                   rtol=1e-5, atol=1e-6, err_msg=str(form))


def test_ladder_unroll_autoselect(monkeypatch):
    """CLI auto-select: full unroll at t<=3; for deeper ladders, full
    unroll when this host's compile history proves it affordable, chunk-2
    otherwise; explicit overrides parse to bool/int."""
    from types import SimpleNamespace
    import nshmc_tpu.cli as cli
    from nshmc_tpu.cli import ladder_unroll

    assert ladder_unroll(SimpleNamespace(timesteps=3, unroll_ladder="auto")) is True
    monkeypatch.setattr(cli, "_unrolled_compile_history", lambda t: None)
    assert ladder_unroll(SimpleNamespace(timesteps=5, unroll_ladder="auto")) == 2
    monkeypatch.setattr(cli, "_unrolled_compile_history", lambda t: 163.6)
    assert ladder_unroll(SimpleNamespace(timesteps=5, unroll_ladder="auto")) is True
    monkeypatch.setattr(cli, "_unrolled_compile_history", lambda t: 1783.8)
    assert ladder_unroll(SimpleNamespace(timesteps=5, unroll_ladder="auto")) == 2
    assert ladder_unroll(SimpleNamespace(timesteps=5, unroll_ladder="0")) is False
    assert ladder_unroll(SimpleNamespace(timesteps=5, unroll_ladder="1")) is True
    assert ladder_unroll(SimpleNamespace(timesteps=5, unroll_ladder="3")) == 3


def test_unrolled_compile_history_reader():
    """The history reader parses the real fuse-cache format (the t=5
    unrolled row recorded on this host in round 5)."""
    from nshmc_tpu.cli import _unrolled_compile_history

    best = _unrolled_compile_history(5)
    if best is not None:  # file present in repo: must be a sane time
        assert 0 < best < 3600
    assert _unrolled_compile_history(99) is None

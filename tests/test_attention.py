"""Attention kernel tests: Pallas (interpret mode on CPU) vs XLA reference,
plus custom-vjp gradient parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nshmc_tpu.ops import attention as attn_mod
from nshmc_tpu.ops.attention import (
    attention_xla,
    attention_pallas,
    attention_fused,
)


def _qkv(b=2, t=256, h=2, ch=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (b, t, h, ch), jnp.float32) for k in ks)


def test_xla_attention_matches_reference_math():
    q, k, v = _qkv(t=8, ch=4)
    out = attention_xla(q, k, v)
    scale = 1.0 / np.sqrt(np.sqrt(4))
    logits = np.einsum("bthc,bshc->bhts", np.asarray(q) * scale, np.asarray(k) * scale)
    w = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    ref = np.einsum("bhts,bshc->bthc", np.asarray(w), np.asarray(v))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.skipif(not attn_mod._HAS_PALLAS, reason="no pallas")
def test_pallas_matches_xla_interpret():
    from jax.experimental.pallas import tpu as pltpu

    q, k, v = _qkv()
    ref = attention_xla(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        out = attention_pallas(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.skipif(not attn_mod._HAS_PALLAS, reason="no pallas")
def test_fused_vjp_matches_xla_grad():
    from jax.experimental.pallas import tpu as pltpu

    q, k, v = _qkv(b=1, t=128, h=1, ch=8, seed=1)

    def loss_x(args):
        q, k, v = args
        return jnp.sum(attention_xla(q, k, v) ** 2)

    def loss_p(args):
        q, k, v = args
        return jnp.sum(attention_fused(q, k, v) ** 2)

    g_ref = jax.grad(loss_x)((q, k, v))
    with pltpu.force_tpu_interpret_mode():
        g_out = jax.grad(loss_p)((q, k, v))
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)

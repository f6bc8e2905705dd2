"""Fused GroupNorm+SiLU kernel tests (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nshmc_tpu.ops import groupnorm as gn_mod
from nshmc_tpu.ops.groupnorm import groupnorm_silu, groupnorm_silu_xla


pytestmark = pytest.mark.skipif(not gn_mod._HAS_PALLAS, reason="no pallas")


def _inputs(b=2, h=8, w=8, c=64, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(k1, (b, h, w, c), jnp.float32)
    scale = jax.random.normal(k2, (c,)) * 0.1 + 1.0
    bias = jax.random.normal(k3, (c,)) * 0.1
    return x, scale, bias


def test_xla_reference_matches_flax():
    import flax.linen as nn

    x, scale, bias = _inputs()
    ref = nn.GroupNorm(num_groups=32, epsilon=1e-5).apply(
        {"params": {"scale": scale, "bias": bias}}, x
    )
    ref = ref * jax.nn.sigmoid(ref)
    ours = groupnorm_silu_xla(x, scale, bias)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_pallas_forward_matches_xla():
    x, scale, bias = _inputs()
    ref = groupnorm_silu_xla(x, scale, bias)
    out = groupnorm_silu(x, scale, bias, 32, 1e-5, True)  # interpret
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_forward_multi_rowblock():
    # 32x32 spatial with row_block 512 -> 2 row blocks: exercises the
    # cross-block stats accumulation
    x, scale, bias = _inputs(b=1, h=32, w=32, c=64, seed=1)
    ref = groupnorm_silu_xla(x, scale, bias)
    out = groupnorm_silu(x, scale, bias, 32, 1e-5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_custom_vjp_matches_xla_grad():
    x, scale, bias = _inputs(b=1, h=4, w=4, c=64, seed=2)

    def loss_p(args):
        x, s, b = args
        return jnp.sum(groupnorm_silu(x, s, b, 32, 1e-5, True) ** 2)

    def loss_x(args):
        x, s, b = args
        return jnp.sum(groupnorm_silu_xla(x, s, b) ** 2)

    g_p = jax.grad(loss_p)((x, scale, bias))
    g_x = jax.grad(loss_x)((x, scale, bias))
    for a, b_ in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_bf16_input():
    x, scale, bias = _inputs(c=64, seed=3)
    xb = x.astype(jnp.bfloat16)
    out = groupnorm_silu(xb, scale, bias, 32, 1e-5, True)
    assert out.dtype == jnp.bfloat16
    ref = groupnorm_silu_xla(xb, scale, bias)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.05
    )

"""Parity tests for the cross-attention SpatialTransformer stack.

Builds a torch mirror of the reference transformer
(ldm/modules/attention.py:36-261: GEGLU feedforward, CrossAttention,
BasicTransformerBlock, SpatialTransformer), random-initializes it, exports
a state_dict with the exact reference key layout, ports it with
`port_spatial_transformer`, and compares forward outputs (self-attention
and cross-attention with an external context) — the same
mirror-architecture strategy as tests/test_kernel_wizard.py.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from nshmc_tpu.models.ldm.transformer import (  # noqa: E402
    SpatialTransformer,
    port_spatial_transformer,
)


class TGEGLU(tnn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = tnn.Linear(dim_in, dim_out * 2)

    def forward(self, x):
        x, gate = self.proj(x).chunk(2, dim=-1)
        return x * tF.gelu(gate)


class TFeedForward(tnn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = tnn.Sequential(
            TGEGLU(dim, int(dim * mult)), tnn.Identity(),
            tnn.Linear(int(dim * mult), dim),
        )

    def forward(self, x):
        return self.net(x)


class TCrossAttention(tnn.Module):
    def __init__(self, query_dim, context_dim=None, heads=8, dim_head=64):
        super().__init__()
        inner = dim_head * heads
        context_dim = context_dim or query_dim
        self.scale = dim_head ** -0.5
        self.heads = heads
        self.to_q = tnn.Linear(query_dim, inner, bias=False)
        self.to_k = tnn.Linear(context_dim, inner, bias=False)
        self.to_v = tnn.Linear(context_dim, inner, bias=False)
        self.to_out = tnn.Sequential(tnn.Linear(inner, query_dim))

    def forward(self, x, context=None):
        h = self.heads
        q = self.to_q(x)
        context = x if context is None else context
        k, v = self.to_k(context), self.to_v(context)
        b, t, _ = q.shape
        s = k.shape[1]
        q = q.view(b, t, h, -1).permute(0, 2, 1, 3)
        k = k.view(b, s, h, -1).permute(0, 2, 1, 3)
        v = v.view(b, s, h, -1).permute(0, 2, 1, 3)
        sim = torch.einsum("bhid,bhjd->bhij", q, k) * self.scale
        attn = sim.softmax(dim=-1)
        out = torch.einsum("bhij,bhjd->bhid", attn, v)
        out = out.permute(0, 2, 1, 3).reshape(b, t, -1)
        return self.to_out(out)


class TBasicTransformerBlock(tnn.Module):
    def __init__(self, dim, n_heads, d_head, context_dim=None):
        super().__init__()
        self.attn1 = TCrossAttention(dim, heads=n_heads, dim_head=d_head)
        self.ff = TFeedForward(dim)
        self.attn2 = TCrossAttention(dim, context_dim=context_dim,
                                     heads=n_heads, dim_head=d_head)
        self.norm1 = tnn.LayerNorm(dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.norm3 = tnn.LayerNorm(dim)

    def forward(self, x, context=None):
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), context=context) + x
        x = self.ff(self.norm3(x)) + x
        return x


class TSpatialTransformer(tnn.Module):
    def __init__(self, in_channels, n_heads, d_head, depth=1,
                 context_dim=None):
        super().__init__()
        inner = n_heads * d_head
        self.norm = tnn.GroupNorm(32, in_channels, eps=1e-6, affine=True)
        self.proj_in = tnn.Conv2d(in_channels, inner, 1)
        self.transformer_blocks = tnn.ModuleList(
            [TBasicTransformerBlock(inner, n_heads, d_head,
                                    context_dim=context_dim)
             for _ in range(depth)])
        self.proj_out = tnn.Conv2d(inner, in_channels, 1)
        with torch.no_grad():
            self.proj_out.weight.zero_()
            self.proj_out.bias.zero_()

    def forward(self, x, context=None):
        b, c, h, w = x.shape
        x_in = x
        x = self.proj_in(self.norm(x))
        x = x.flatten(2).permute(0, 2, 1)
        for block in self.transformer_blocks:
            x = block(x, context=context)
        x = x.permute(0, 2, 1).view(b, -1, h, w)
        return self.proj_out(x) + x_in


def _fix_keys(sd):
    """TFeedForward uses Sequential(GEGLU, Identity, Linear) so indices
    already match the reference's net.0.proj / net.2 layout."""
    return {k: v for k, v in sd.items()}


@pytest.mark.parametrize("context_dim", [None, 24])
def test_spatial_transformer_parity(context_dim):
    torch.manual_seed(0)
    C, HEADS, DH, DEPTH = 32, 4, 8, 2
    tmodel = TSpatialTransformer(C, HEADS, DH, depth=DEPTH,
                                 context_dim=context_dim).eval()
    # non-zero proj_out so the transformer actually contributes
    with torch.no_grad():
        tmodel.proj_out.weight.normal_(0, 0.05)
        tmodel.proj_out.bias.normal_(0, 0.05)
    sd = _fix_keys(tmodel.state_dict())

    fmodel = SpatialTransformer(C, HEADS, DH, depth=DEPTH,
                                context_dim=context_dim)
    params = port_spatial_transformer(sd)

    x = np.random.default_rng(1).standard_normal((2, 8, 8, C)).astype(
        np.float32)
    ctx = None
    tctx = None
    if context_dim is not None:
        ctx = np.random.default_rng(2).standard_normal(
            (2, 5, context_dim)).astype(np.float32)
        tctx = torch.from_numpy(ctx)

    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2), context=tctx)
    t_out = t_out.permute(0, 2, 3, 1).numpy()

    f_out = np.asarray(fmodel.apply(params, jnp.asarray(x),
                                    context=None if ctx is None
                                    else jnp.asarray(ctx)))
    assert np.max(np.abs(f_out - t_out)) < 2e-5


def test_spatial_transformer_param_tree_matches_port():
    C, HEADS, DH = 32, 4, 8
    fmodel = SpatialTransformer(C, HEADS, DH, depth=1, context_dim=16)
    init = fmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, C)),
                       context=jnp.zeros((1, 3, 16)))
    tmodel = TSpatialTransformer(C, HEADS, DH, depth=1, context_dim=16)
    ported = port_spatial_transformer(tmodel.state_dict())
    assert jax.tree_util.tree_structure(init) == \
        jax.tree_util.tree_structure(jax.tree.map(jnp.asarray, ported))


def test_conditional_unet_context_flows():
    """UNetConfig(context_dim=...) swaps attention positions to
    SpatialTransformer (openaimodel.py use_spatial_transformer behavior)
    and the context reaches the output. Zero-init convs (proj_out,
    out_conv) are perturbed so contributions are visible."""
    import flax

    from nshmc_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig(
        image_size=16, model_channels=32, out_channels=6, num_res_blocks=1,
        attention_ds=(2,), channel_mult=(1, 2), num_heads=2,
        num_head_channels=16, use_scale_shift_norm=True,
        resblock_updown=True, context_dim=24,
    )
    m = UNetModel(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.full((2,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 24))
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
               jnp.zeros((1,)), context=jnp.zeros((1, 5, 24)))
    flat = flax.traverse_util.flatten_dict(p["params"])
    assert any("attn2" in k for k in flat), "cross-attention blocks missing"
    for k in list(flat):
        if ("proj_out" in k or "out_conv" in k) and flat[k].ndim == 4:
            flat[k] = flat[k] + 0.02
    p2 = {"params": flax.traverse_util.unflatten_dict(flat)}
    o1 = m.apply(p2, x, t, context=ctx)
    o2 = m.apply(p2, x, t, context=2.0 * ctx)
    assert float(jnp.abs(o1 - o2).max()) > 1e-4
    g = jax.grad(lambda c: jnp.sum(m.apply(p2, x, t, context=c) ** 2))(ctx)
    assert bool(jnp.isfinite(g).all()) and float(jnp.abs(g).max()) > 0

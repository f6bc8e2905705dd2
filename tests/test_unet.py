"""U-Net tests: forward parity against the reference PyTorch implementation
with ported weights (SURVEY.md section 4, item 2), remat-gradient viability,
and config derivation."""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nshmc_tpu.models.unet import UNetConfig, UNetModel
from nshmc_tpu.models.port import port_adm_state_dict, adm_param_mapping

TINY = dict(
    image_size=16,
    num_channels=32,
    num_res_blocks=1,
    channel_mult="1,2",
    learn_sigma=True,
    class_cond=False,
    attention_resolutions="8",
    num_heads=2,
    num_head_channels=16,
    num_heads_upsample=-1,
    use_scale_shift_norm=True,
    dropout=0.0,
    resblock_updown=True,
    use_fp16=False,
    use_new_attention_order=False,
)


def _torch_model(**kw):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    from guided_diffusion.unet_ffhq import create_model

    torch.manual_seed(0)
    model = create_model(model_path="/nonexistent", **kw)
    model.eval()
    return model


def test_config_from_yaml_ffhq():
    cfg = UNetConfig.from_model_yaml(
        image_size=256, num_channels=128, num_res_blocks=1, channel_mult="",
        learn_sigma=True, attention_resolutions=16, num_heads=4,
        num_head_channels=64, use_scale_shift_norm=True, resblock_updown=True,
    )
    assert cfg.channel_mult == (1, 1, 2, 2, 4, 4)
    assert cfg.attention_ds == (16,)
    assert cfg.out_channels == 6
    assert cfg.num_head_channels == 64


@pytest.mark.parametrize("scale_shift,updown", [(True, True), (False, False)])
def test_forward_parity_with_reference(scale_shift, updown):
    torch = pytest.importorskip("torch")
    kw = dict(TINY, use_scale_shift_norm=scale_shift, resblock_updown=updown)
    tmodel = _torch_model(**kw)
    sd = tmodel.state_dict()

    cfg = UNetConfig.from_model_yaml(**kw)
    cfg = cfg.__class__(**{**cfg.__dict__, "remat": False})
    params = port_adm_state_dict(sd, cfg)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    t = np.asarray([100.0, 500.0], np.float32)

    with torch.no_grad():
        ref = tmodel(torch.tensor(x), torch.tensor(t)).numpy()

    model = UNetModel(cfg)
    out = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    out_nchw = np.asarray(out).transpose(0, 3, 1, 2)

    assert out_nchw.shape == ref.shape == (2, 6, 16, 16)
    np.testing.assert_allclose(out_nchw, ref, atol=2e-4, rtol=1e-3)


def test_mapping_covers_all_torch_keys():
    tmodel = _torch_model(**TINY)
    sd = tmodel.state_dict()
    cfg = UNetConfig.from_model_yaml(**TINY)
    mapping = adm_param_mapping(cfg)
    torch_prefixes = {p for p, _ in mapping.values()}
    sd_prefixes = {k.rsplit(".", 1)[0] for k in sd}
    assert torch_prefixes == sd_prefixes


def test_remat_grad():
    cfg = UNetConfig.from_model_yaml(**TINY)
    assert cfg.remat
    model = UNetModel(cfg)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 16, 16, 3))
    t = jnp.asarray([10.0])
    params = model.init(key, x, t)

    def loss(x):
        return jnp.sum(model.apply(params, x, t)[..., :3] ** 2)

    g = jax.jit(jax.grad(loss))(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()


def test_bf16_forward_close_to_f32():
    cfg = UNetConfig.from_model_yaml(**TINY)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 16, 16, 3))
    t = jnp.asarray([250.0])
    model32 = UNetModel(cfg)
    params = model32.init(key, x, t)
    out32 = model32.apply(params, x, t)
    model16 = UNetModel(cfg, dtype=jnp.bfloat16)
    out16 = model16.apply(params, x, t)
    assert out16.dtype == jnp.float32  # output cast back
    np.testing.assert_allclose(
        np.asarray(out16), np.asarray(out32), atol=0.1, rtol=0.1
    )


def test_norm_fp32_toggle():
    """norm_fp32=False keeps outputs close to the fp32-island default (perf
    experiment path; parity default remains fp32)."""
    cfg32 = UNetConfig.from_model_yaml(**TINY)
    cfg16 = UNetConfig(**{**cfg32.__dict__, "norm_fp32": False})
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (1, 16, 16, 3))
    t = jnp.asarray([300.0])
    m32 = UNetModel(cfg32)
    params = m32.init(key, x, t)
    out32 = m32.apply(params, x, t)
    out16 = UNetModel(cfg16).apply(params, x, t)
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               atol=1e-4, rtol=1e-3)
    outbf = UNetModel(cfg16, dtype=jnp.bfloat16).apply(params, x, t)
    np.testing.assert_allclose(np.asarray(outbf), np.asarray(out32),
                               atol=0.12, rtol=0.1)


def test_gn_impl_and_big_remat_equivalence():
    """gn_impl='chan' (per-channel-stats GroupNorm) and remat='big'
    (resolution-thresholded checkpointing) are pure lowering knobs: same
    param tree, bitwise-identical forward and gradient on CPU."""
    import dataclasses

    cfg = UNetConfig(
        image_size=16, model_channels=32, out_channels=6, num_res_blocks=1,
        attention_ds=(2,), channel_mult=(1, 2), num_heads=2,
        num_head_channels=16, use_scale_shift_norm=True, resblock_updown=True,
    )
    base = UNetModel(cfg)
    params = base.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                       jnp.zeros((1,)))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    t = jnp.full((2,), 500.0)
    ref_out = base.apply(params, x, t)
    ref_g = jax.grad(lambda x: jnp.sum(base.apply(params, x, t) ** 2))(x)

    for variant in (
        dataclasses.replace(cfg, gn_impl="chan"),
        dataclasses.replace(cfg, remat="big", remat_min_res=8),
        dataclasses.replace(cfg, gn_impl="chan", remat="big", remat_min_res=8),
        # gn-stats-as-residuals: the remat policy saves the tagged (B, G)
        # moments so the backward recompute skips the stats reduces —
        # values must be bitwise identical (same floats, just cached)
        dataclasses.replace(cfg, gn_impl="chan", remat="big", remat_min_res=8,
                            remat_save_gn_stats=True),
        dataclasses.replace(cfg, gn_impl="chan", remat="full",
                            remat_save_gn_stats=True),
    ):
        m = UNetModel(variant)
        assert jax.tree_util.tree_structure(
            m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                   jnp.zeros((1,)))) == jax.tree_util.tree_structure(params)
        np.testing.assert_array_equal(np.asarray(m.apply(params, x, t)),
                                      np.asarray(ref_out))
        g = jax.grad(lambda x: jnp.sum(m.apply(params, x, t) ** 2))(x)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(ref_g))

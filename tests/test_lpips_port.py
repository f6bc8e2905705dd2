"""LPIPS port verification without network access (the lpips/torchvision
packages can't download weights here): synthesize a random VGG16 state_dict
with the exact torchvision `features.*` key layout plus lpips `lin*.model.1`
heads, run `port_lpips_weights`, and compare the Flax LPIPS forward against
an independent torch mirror of the lpips-VGG formula (lpips/lpips.py:
ScalingLayer shift/scale, unit-normalized feature stacks at
relu{1_2,2_2,3_3,4_3,5_3}, 1x1 linear heads, spatial average)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from nshmc_tpu.utils.lpips import (  # noqa: E402
    LPIPS, port_lpips_weights, _SHIFT, _SCALE, _VGG_STAGES,
)

TV_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def _synth_state_dicts(seed=0):
    """Random weights in the exact torchvision VGG16 / lpips layouts."""
    g = torch.Generator().manual_seed(seed)
    vgg_sd = {}
    in_ch = 3
    chans = []
    for ch, n in _VGG_STAGES:
        chans += [ch] * n
    for tv_idx, out_ch in zip(TV_CONV_IDX, chans):
        vgg_sd[f"features.{tv_idx}.weight"] = (
            torch.randn(out_ch, in_ch, 3, 3, generator=g) * 0.05)
        vgg_sd[f"features.{tv_idx}.bias"] = (
            torch.randn(out_ch, generator=g) * 0.05)
        in_ch = out_ch
    lin_sd = {}
    feat_chs = [ch for ch, _ in _VGG_STAGES]
    for i, ch in enumerate(feat_chs):
        lin_sd[f"lin{i}.model.1.weight"] = torch.rand(
            1, ch, 1, 1, generator=g)
    return vgg_sd, lin_sd


def _torch_lpips(vgg_sd, lin_sd, a_nchw, b_nchw):
    """Independent torch mirror of lpips-VGG (lpips/lpips.py forward)."""
    import torch.nn.functional as F

    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def vgg_feats(x):
        feats = []
        conv_i = 0
        for stage, (ch, n) in enumerate(_VGG_STAGES):
            for _ in range(n):
                w = vgg_sd[f"features.{TV_CONV_IDX[conv_i]}.weight"]
                b = vgg_sd[f"features.{TV_CONV_IDX[conv_i]}.bias"]
                x = F.relu(F.conv2d(x, w, b, padding=1))
                conv_i += 1
            feats.append(x)
            if stage != len(_VGG_STAGES) - 1:
                x = F.max_pool2d(x, 2, 2)
        return feats

    fa = vgg_feats((a_nchw - shift) / scale)
    fb = vgg_feats((b_nchw - shift) / scale)
    total = torch.zeros(a_nchw.shape[0])
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / torch.sqrt((xa**2).sum(1, keepdim=True) + 1e-10)
        nb = xb / torch.sqrt((xb**2).sum(1, keepdim=True) + 1e-10)
        diff = (na - nb) ** 2
        lin = F.conv2d(diff, lin_sd[f"lin{i}.model.1.weight"])
        total = total + lin.mean(dim=(1, 2, 3))
    return total


def test_lpips_port_matches_torch_mirror():
    vgg_sd, lin_sd = _synth_state_dicts()
    params = port_lpips_weights(vgg_sd, lin_sd)
    model = LPIPS()

    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)

    ref = _torch_lpips(vgg_sd, lin_sd, torch.tensor(a), torch.tensor(b))
    ours = model.apply(params, jnp.asarray(a.transpose(0, 2, 3, 1)),
                       jnp.asarray(b.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               atol=1e-4, rtol=1e-3)


def test_lpips_port_rejects_missing_keys():
    vgg_sd, lin_sd = _synth_state_dicts()
    del vgg_sd["features.28.weight"]
    with pytest.raises(KeyError):
        port_lpips_weights(vgg_sd, lin_sd)


def test_lpips_identity_is_zero():
    vgg_sd, lin_sd = _synth_state_dicts()
    params = port_lpips_weights(vgg_sd, lin_sd)
    model = LPIPS()
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    d = model.apply(params, a, a)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)

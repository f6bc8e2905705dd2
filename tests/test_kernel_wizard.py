"""Parity tests for the bkse KernelWizard port.

Builds a torch mirror of the public bkse architecture
(VinAIResearch/blur-kernel-space-exploring,
models/kernel_encoding/kernel_wizard.py — the network the reference loads
in obs_functions/Hfuncs.py:369-404), random-initializes it, exports a
state_dict with the exact bkse key layout, ports it with
`port_kernel_wizard`, and compares forward outputs. This validates both the
architecture reconstruction and the port function numerically without the
(unavailable) pretrained checkpoint.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from nshmc_tpu.models.kernel_wizard import (  # noqa: E402
    KernelWizard,
    KernelWizardConfig,
    port_kernel_wizard,
    pixel_shuffle_2x,
)

# kernel_dim must equal ngf*8 (the innermost upconv expects
# inner_nc*2 = downconv-out + kernel channels); images must be
# 256^2 so the bottleneck is 2x2 like the real config.
NF, FRONT_RBS, BACK_RBS, KDIM, NGF = 8, 2, 3, 64, 8


class TResidualBlockNoBN(tnn.Module):
    def __init__(self, nf):
        super().__init__()
        self.conv1 = tnn.Conv2d(nf, nf, 3, 1, 1, bias=True)
        self.conv2 = tnn.Conv2d(nf, nf, 3, 1, 1, bias=True)

    def forward(self, x):
        return x + self.conv2(torch.relu(self.conv1(x)))


class TUnetSkipBlock(tnn.Module):
    """bkse UnetSkipConnectionBlock with norm='none' (Identity norms,
    bias-less convs except the outermost upconv); the innermost block
    concatenates the kernel code at the bottleneck."""

    def __init__(self, outer_nc, inner_nc, input_nc=None, submodule=None,
                 outermost=False, innermost=False):
        super().__init__()
        self.outermost, self.innermost = outermost, innermost
        if input_nc is None:
            input_nc = outer_nc
        downconv = tnn.Conv2d(input_nc, inner_nc, 4, 2, 1, bias=False)
        if outermost:
            upconv = tnn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1)
            down = [downconv]
            up = [tnn.ReLU(True), upconv, tnn.Tanh()]
        elif innermost:
            upconv = tnn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1,
                                         bias=False)
            down = [tnn.LeakyReLU(0.2, True), downconv]
            up = [tnn.ReLU(True), upconv, tnn.Identity()]
        else:
            upconv = tnn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1,
                                         bias=False)
            down = [tnn.LeakyReLU(0.2, True), downconv, tnn.Identity()]
            up = [tnn.ReLU(True), upconv, tnn.Identity()]
        self.down = tnn.Sequential(*down)
        self.submodule = submodule
        self.up = tnn.Sequential(*up)

    def forward(self, x, k):
        h = self.down(x)
        if self.innermost:
            h = torch.cat([h, k], dim=1)
        elif self.submodule is not None:
            h = self.submodule(h, k)
        h = self.up(h)
        if self.outermost:
            return h
        return torch.cat([x, h], dim=1)


class TKernelAdapter(tnn.Module):
    def __init__(self, nf, ngf):
        super().__init__()
        blk = TUnetSkipBlock(ngf * 8, ngf * 8, innermost=True)
        blk = TUnetSkipBlock(ngf * 4, ngf * 8, submodule=blk)
        blk = TUnetSkipBlock(ngf * 2, ngf * 4, submodule=blk)
        blk = TUnetSkipBlock(ngf, ngf * 2, submodule=blk)
        self.model = TUnetSkipBlock(nf, ngf, input_nc=nf, submodule=blk,
                                    outermost=True)

    def forward(self, x, k):
        return self.model(x, k)


class TResnetBlockReflect(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv_block = tnn.Sequential(
            tnn.ReflectionPad2d(1), tnn.Conv2d(dim, dim, 3, bias=False),
            tnn.Identity(), tnn.ReLU(True),
            tnn.ReflectionPad2d(1), tnn.Conv2d(dim, dim, 3, bias=False),
            tnn.Identity())

    def forward(self, x):
        return x + self.conv_block(x)


class TKernelExtractor(tnn.Module):
    def __init__(self, nf, kernel_dim, n_blocks=4):
        super().__init__()
        out_nc = kernel_dim
        model = [tnn.ReflectionPad2d(3),
                 tnn.Conv2d(nf * 2, nf, 7, padding=0, bias=False),
                 tnn.Identity(), tnn.ReLU(True)]
        for i in range(5):
            inc = min(nf * 2 ** i, out_nc)
            ouc = min(nf * 2 ** (i + 1), out_nc)
            model += [tnn.Conv2d(inc, ouc, 3, stride=2, padding=1,
                                 bias=False), tnn.Identity(),
                      tnn.ReLU(True)]
        for _ in range(n_blocks):
            model += [TResnetBlockReflect(out_nc)]
        self.model = tnn.Sequential(*model)

    def forward(self, feats):
        return self.model(feats)


class TKernelWizard(tnn.Module):
    """Mirror of bkse KernelWizard (EDVR-style naming)."""

    def __init__(self, input_nc=3, nf=NF, front_RBs=FRONT_RBS,
                 back_RBs=BACK_RBS, kernel_dim=KDIM, ngf=NGF):
        super().__init__()
        lrelu = tnn.LeakyReLU(0.1)
        fe = [tnn.Conv2d(input_nc, nf, 3, 1, 1, bias=True), lrelu,
              tnn.Conv2d(nf, nf, 3, 2, 1, bias=True), lrelu,
              tnn.Conv2d(nf, nf, 3, 2, 1, bias=True), lrelu,
              tnn.Sequential(*[TResidualBlockNoBN(nf)
                               for _ in range(front_RBs)])]
        self.feature_extractor = tnn.Sequential(*fe)
        self.kernel_extractor = TKernelExtractor(nf, kernel_dim)
        self.adapter = TKernelAdapter(nf, ngf)
        self.recon_trunk = tnn.Sequential(
            *[TResidualBlockNoBN(nf) for _ in range(back_RBs)])
        self.upconv1 = tnn.Conv2d(nf, nf * 4, 3, 1, 1, bias=True)
        self.upconv2 = tnn.Conv2d(nf, 64 * 4, 3, 1, 1, bias=True)
        self.pixel_shuffle = tnn.PixelShuffle(2)
        self.HRconv = tnn.Conv2d(64, 64, 3, 1, 1, bias=True)
        self.conv_last = tnn.Conv2d(64, input_nc, 3, 1, 1, bias=True)
        self.lrelu = tnn.LeakyReLU(0.1)

    def adaptKernel(self, x_sharp, kernel):
        base = x_sharp
        h = self.feature_extractor(x_sharp)
        h = self.adapter(h, kernel)
        h = self.recon_trunk(h)
        h = self.lrelu(self.pixel_shuffle(self.upconv1(h)))
        h = self.lrelu(self.pixel_shuffle(self.upconv2(h)))
        h = self.conv_last(self.lrelu(self.HRconv(h)))
        return h + base


def _small_cfg():
    return KernelWizardConfig(input_nc=3, nf=NF, front_RBs=FRONT_RBS,
                              back_RBs=BACK_RBS, kernel_dim=KDIM,
                              adapter_ngf=NGF)


def test_pixel_shuffle_matches_torch():
    x = np.random.default_rng(0).normal(size=(2, 12, 4, 4)).astype(np.float32)
    t = tnn.PixelShuffle(2)(torch.from_numpy(x)).numpy()
    j = pixel_shuffle_2x(jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))
    np.testing.assert_allclose(np.transpose(np.asarray(j), (0, 3, 1, 2)), t,
                               atol=1e-6)


def test_adapt_kernel_parity_with_torch_mirror():
    torch.manual_seed(0)
    tmodel = TKernelWizard().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    cfg = _small_cfg()
    params = port_kernel_wizard(sd, cfg)
    model = KernelWizard(cfg)

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (2, 256, 256, 3)).astype(np.float32)
    kern = (rng.normal(size=(2, 2, 2, KDIM)) * 1.2).astype(np.float32)

    out_j = model.apply(params, jnp.asarray(x), jnp.asarray(kern),
                        method=KernelWizard.adapt_kernel)

    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        kt = torch.from_numpy(np.transpose(kern, (0, 3, 1, 2)))
        out_t = tmodel.adaptKernel(xt, kt).numpy()

    np.testing.assert_allclose(np.transpose(np.asarray(out_j), (0, 3, 1, 2)),
                               out_t, atol=2e-5)


def test_kernel_extractor_parity_with_torch_mirror():
    torch.manual_seed(2)
    tmodel = TKernelWizard().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    cfg = _small_cfg()
    params = port_kernel_wizard(sd, cfg)
    model = KernelWizard(cfg)

    rng = np.random.default_rng(3)
    xs = rng.uniform(0, 1, (1, 256, 256, 3)).astype(np.float32)
    xb = rng.uniform(0, 1, (1, 256, 256, 3)).astype(np.float32)

    mu_j, _ = model.apply(params, jnp.asarray(xs), jnp.asarray(xb))

    with torch.no_grad():
        fs = tmodel.feature_extractor(
            torch.from_numpy(np.transpose(xs, (0, 3, 1, 2))))
        fb = tmodel.feature_extractor(
            torch.from_numpy(np.transpose(xb, (0, 3, 1, 2))))
        mu_t = tmodel.kernel_extractor(torch.cat([fs, fb], dim=1)).numpy()

    np.testing.assert_allclose(np.transpose(np.asarray(mu_j), (0, 3, 1, 2)),
                               mu_t, atol=2e-5)


def test_port_is_layout_insensitive():
    """The port must infer Sequential indices from the checkpoint keys, not
    assume them: a mirror built WITHOUT the parameterless Identity norm
    layers (compacted indices — head conv at model.1, downs at 3,5,7,9,11,
    resblocks at 13+ with conv_block convs at 1,4) must port to the same
    forward output as the canonical layout. This guards against the
    self-validation risk of transcribing the same index assumption into
    both the mirror and the port."""
    torch.manual_seed(4)
    canonical = TKernelWizard().eval()
    sd = {k: v.detach().numpy() for k, v in canonical.state_dict().items()}

    # rewrite extractor keys into the compacted (no-Identity) layout
    import re

    remap = {}
    for i_old, i_new in [(1, 1)] + [(4 + 3 * i, 3 + 2 * i) for i in range(5)]:
        remap[f"kernel_extractor.model.{i_old}."] = \
            f"kernel_extractor.model.{i_new}."
    for i in range(4):
        remap[f"kernel_extractor.model.{19 + i}.conv_block."] = \
            f"kernel_extractor.model.{13 + i}.conv_block."
    shifted = {}
    for k, v in sd.items():
        for old, new in sorted(remap.items(), key=lambda kv: -len(kv[0])):
            if k.startswith(old):
                k = new + k[len(old):]
                break
        # compact conv_block conv indices 1,5 -> 1,4 (no Identity at 2)
        k = re.sub(r"(conv_block\.)5(\.)", r"\g<1>4\g<2>", k)
        shifted[k] = v
    assert set(shifted) != set(sd)

    cfg = _small_cfg()
    p_canon = port_kernel_wizard(sd, cfg)
    p_shift = port_kernel_wizard(shifted, cfg)
    for a, b in zip(jax.tree.leaves(p_canon), jax.tree.leaves(p_shift)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_port_rejects_unknown_keys():
    torch.manual_seed(0)
    sd = {k: v.detach().numpy()
          for k, v in TKernelWizard().state_dict().items()}
    sd["bogus.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(KeyError):
        port_kernel_wizard(sd, _small_cfg())


def test_nonlinear_blur_operator_bkse_path():
    """deblur_nonlinear e2e through the REAL KernelWizard architecture
    (random-init, small config): H maps/clips correctly and is
    differentiable (the HMC likelihood needs d/dx of H(decode(x)))."""
    from nshmc_tpu.operators.nonlinear_blur import NonlinearBlur

    cfg = _small_cfg()
    op = NonlinearBlur.create_bkse(channels=3, img_dim=256, wizard_cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3 * 256 * 256)) * 0.3
    y = op.H(x)
    assert y.shape == x.shape
    assert np.abs(np.asarray(y)).max() <= 1.0
    assert not op.is_linear()
    g = jax.grad(lambda v: jnp.sum(op.H(v) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_nonlinear_blur_bkse_matches_torch_pipeline():
    """Full operator parity: ported weights + the reference's [-1,1] ->
    [0,1] -> adaptKernel -> [-1,1] clip pipeline (Hfuncs.py:381-387)."""
    from nshmc_tpu.operators.nonlinear_blur import NonlinearBlur

    torch.manual_seed(5)
    tmodel = TKernelWizard().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    cfg = _small_cfg()
    op = NonlinearBlur.create_bkse(sd, channels=3, img_dim=256, seed=0,
                                   wizard_cfg=cfg)

    rng = np.random.default_rng(7)
    x_img = rng.uniform(-1, 1, (1, 3, 256, 256)).astype(np.float32)
    y_j = op.H(jnp.asarray(x_img.reshape(1, -1)))

    with torch.no_grad():
        kern_nchw = np.transpose(np.asarray(op.kernel_code), (0, 3, 1, 2))
        data01 = (torch.from_numpy(x_img) + 1.0) / 2.0
        blurred = tmodel.adaptKernel(data01, torch.from_numpy(kern_nchw))
        y_t = (blurred * 2.0 - 1.0).clamp(-1, 1).numpy()

    np.testing.assert_allclose(np.asarray(y_j).reshape(1, 3, 256, 256), y_t,
                               atol=2e-5)

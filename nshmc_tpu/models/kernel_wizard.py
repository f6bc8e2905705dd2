"""bkse KernelWizard blur network, TPU-native (Flax, NHWC).

The reference's nonlinear-blur operator wraps this pretrained
kernel-conditioned network (ref: obs_functions/Hfuncs.py:369-404, loading
`bkse/options/generate_blur/default.yml` and calling
`blur_model.adaptKernel(data, kernel)` with a fixed random kernel code of
shape (B, 512, 2, 2)). The bkse package itself is NOT vendored in the
reference repo — it is the public VinAIResearch/blur-kernel-space-exploring
project (models/kernel_encoding/kernel_wizard.py), whose architecture this
module re-implements natively:

  KernelWizard(opt) with opt = {input_nc: 3, nf: 64, front_RBs: 10,
  back_RBs: 20, kernel_dim: 512, Adapter: {norm: none}, KernelExtractor:
  {norm: none, use_sharp: true, n_blocks: 4, padding_type: reflect}}

  adaptKernel(x_sharp, kernel):
    base = x_sharp                                    # 256^2 x 3, in [0,1]
    f = feature_extractor(x_sharp)                    # conv3 + 2x strided
                                                      # conv + front_RBs
                                                      # ResidualBlock_noBN
                                                      # -> 64^2 x nf
    f = adapter(f, kernel)    # pix2pix-style 5-level U-Net; the kernel
                              # code (512ch, 2x2) is concatenated with the
                              # bottleneck features at 2x2 resolution
    f = recon_trunk(f)        # back_RBs ResidualBlock_noBN
    f = lrelu(pixel_shuffle(upconv1(f)))              # 64 -> 128
    f = lrelu(pixel_shuffle(upconv2(f)))              # 128 -> 256
    out = conv_last(lrelu(HRconv(f))) + base

TPU-first choices: NHWC end-to-end; ConvTranspose implemented as an
input-dilated conv (`lhs_dilation`) with torch ConvTranspose2d(4,2,1)
semantics so ported weights are bit-comparable; PixelShuffle as a
reshape/transpose that preserves torch's channel-major (c, r, r) order.

`port_kernel_wizard` maps a torch KernelWizard state_dict (exact bkse key
layout, e.g. `feature_extractor.6.3.conv1.weight`,
`adapter.model.submodule.down.1.weight`, `recon_trunk.11.conv2.bias`) to
this module's parameter tree. The architecture reconstruction is validated
numerically in tests/test_kernel_wizard.py against a torch mirror with the
same key layout.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

Dtype = Any


@dataclasses.dataclass(frozen=True)
class KernelWizardConfig:
    """Mirrors bkse options/generate_blur/default.yml `KernelWizard:`."""

    input_nc: int = 3
    nf: int = 64
    front_RBs: int = 10
    back_RBs: int = 20
    kernel_dim: int = 512
    use_vae: bool = False
    adapter_ngf: int = 64
    # pix2pix UnetSkipConnectionBlock keeps a Tanh on the outermost up path;
    # flag kept explicit in case the bkse checkpoint was trained without it.
    adapter_tanh: bool = True
    extractor_n_blocks: int = 4
    extractor_use_sharp: bool = True


def lrelu01(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def lrelu02(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def conv2d(features, kernel=3, stride=1, padding=1, bias=True, name=None,
           dtype=jnp.float32):
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(padding, padding)] * 2, use_bias=bias,
                   dtype=dtype, name=name)


class ConvTranspose4x4s2(nn.Module):
    """torch nn.ConvTranspose2d(cin, cout, 4, stride=2, padding=1)
    equivalent: input-dilated conv with padding (2,2). The kernel is stored
    spatially FLIPPED relative to torch layout (the port function flips),
    shape (4, 4, cin, cout) HWIO."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (4, 4, cin, self.features))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype), (1, 1),
            ((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(self.dtype)
        return y


def pixel_shuffle_2x(x):
    """torch nn.PixelShuffle(2) in NHWC with torch's channel-major order:
    out[b, 2h+i, 2w+j, c] = in[b, h, w, c*4 + i*2 + j]."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, c, 2, 2)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(b, 2 * h, 2 * w, c)


class ResidualBlockNoBN(nn.Module):
    """EDVR arch_util.ResidualBlock_noBN: x + conv2(relu(conv1(x)))."""

    nf: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = conv2d(self.nf, name="conv1", dtype=self.dtype)(x)
        h = nn.relu(h)
        h = conv2d(self.nf, name="conv2", dtype=self.dtype)(h)
        return x + h


class UnetSkipBlock(nn.Module):
    """bkse's kernel-threading variant of pix2pix UnetSkipConnectionBlock
    (norm='none' -> Identity norms, conv bias off except the outermost
    upconv). Recursive: depth 0 is the outermost block, depth 4 the
    innermost, which concatenates the kernel code with its 2x2 bottleneck
    features. Channel plan (ngf=64): 64 ->128 ->256 ->512 ->512."""

    nf: int
    ngf: int
    depth: int = 0
    use_tanh: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, k):
        d = self.depth
        outermost, innermost = d == 0, d == 4
        mult = (1, 2, 4, 8, 8)
        outer_nc = self.nf if outermost else self.ngf * mult[d - 1]
        inner_nc = self.ngf * mult[d]
        # --- down --- (outermost down = [downconv]; else [lrelu, downconv])
        h = x if outermost else lrelu02(x)
        h = conv2d(inner_nc, kernel=4, stride=2, padding=1, bias=False,
                   name="downconv", dtype=self.dtype)(h)
        # --- submodule / kernel injection ---
        if innermost:
            h = jnp.concatenate([h, k.astype(h.dtype)], axis=-1)
        else:
            h = UnetSkipBlock(self.nf, self.ngf, depth=d + 1,
                              dtype=self.dtype, name=f"b{d + 1}")(h, k)
        # --- up ---
        h = nn.relu(h)
        h = ConvTranspose4x4s2(outer_nc, use_bias=outermost,
                               name="upconv", dtype=self.dtype)(h)
        if outermost:
            return jnp.tanh(h) if self.use_tanh else h
        return jnp.concatenate([x, h], axis=-1)


class KernelAdapterNet(nn.Module):
    """The function F in the bkse paper: 5-level U-Net over 64^2 features,
    kernel code (2, 2, kernel_dim) injected at the 2x2 bottleneck."""

    nf: int = 64
    ngf: int = 64
    use_tanh: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, k):
        return UnetSkipBlock(self.nf, self.ngf, depth=0,
                             use_tanh=self.use_tanh, dtype=self.dtype,
                             name="b0")(x, k)


class ResnetBlockReflect(nn.Module):
    """pix2pix ResnetBlock with reflect padding and Identity norm."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def refl(v):
            return jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)), "reflect")

        h = conv2d(self.dim, padding=0, bias=False, name="conv1",
                   dtype=self.dtype)(refl(x))
        h = nn.relu(h)
        h = conv2d(self.dim, padding=0, bias=False, name="conv2",
                   dtype=self.dtype)(refl(h))
        return x + h


class KernelExtractorNet(nn.Module):
    """bkse KernelExtractor (blur-kernel encoder): reflect-pad 7x7 conv,
    5 strided convs capped at kernel_dim channels, n_blocks resnet blocks.
    Input is cat(sharp_features, blur_features) when use_sharp."""

    cfg: KernelWizardConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        cfg = self.cfg
        out_nc = cfg.kernel_dim * 2 if cfg.use_vae else cfg.kernel_dim
        h = jnp.pad(feats, ((0, 0), (3, 3), (3, 3), (0, 0)), "reflect")
        h = conv2d(cfg.nf, kernel=7, padding=0, bias=False, name="head",
                   dtype=self.dtype)(h)
        h = nn.relu(h)
        for i in range(5):
            ouc = min(cfg.nf * (2 ** (i + 1)), out_nc)
            h = conv2d(ouc, stride=2, bias=False, name=f"down{i}",
                       dtype=self.dtype)(h)
            h = nn.relu(h)
        for i in range(cfg.extractor_n_blocks):
            h = ResnetBlockReflect(out_nc, dtype=self.dtype,
                                   name=f"res{i}")(h)
        if cfg.use_vae:
            return h[..., :cfg.kernel_dim], h[..., cfg.kernel_dim:]
        return h, jnp.zeros_like(h)


class KernelWizard(nn.Module):
    """Full wizard. `adapt_kernel` is the path the reference operator uses
    (Hfuncs.py:391: blur_model.adaptKernel(data, kernel)); `__call__`
    estimates the kernel code of a (sharp, blur) pair."""

    cfg: KernelWizardConfig = KernelWizardConfig()
    dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        self.fe_conv0 = conv2d(cfg.nf, name="fe_conv0", dtype=self.dtype)
        self.fe_conv1 = conv2d(cfg.nf, stride=2, name="fe_conv1",
                               dtype=self.dtype)
        self.fe_conv2 = conv2d(cfg.nf, stride=2, name="fe_conv2",
                               dtype=self.dtype)
        self.fe_blocks = [
            ResidualBlockNoBN(cfg.nf, dtype=self.dtype, name=f"fe_rb{i}")
            for i in range(cfg.front_RBs)
        ]
        self.adapter = KernelAdapterNet(
            nf=cfg.nf, ngf=cfg.adapter_ngf, use_tanh=cfg.adapter_tanh,
            dtype=self.dtype, name="adapter")
        self.extractor = KernelExtractorNet(cfg, dtype=self.dtype,
                                            name="extractor")
        self.recon_blocks = [
            ResidualBlockNoBN(cfg.nf, dtype=self.dtype, name=f"rt_rb{i}")
            for i in range(cfg.back_RBs)
        ]
        self.upconv1 = conv2d(cfg.nf * 4, name="upconv1", dtype=self.dtype)
        self.upconv2 = conv2d(64 * 4, name="upconv2", dtype=self.dtype)
        self.hr_conv = conv2d(64, name="hr_conv", dtype=self.dtype)
        self.conv_last = conv2d(cfg.input_nc, name="conv_last",
                                dtype=self.dtype)

    def _features(self, x):
        h = lrelu01(self.fe_conv0(x))
        h = lrelu01(self.fe_conv1(h))
        h = lrelu01(self.fe_conv2(h))
        for blk in self.fe_blocks:
            h = blk(h)
        return h

    def adapt_kernel(self, x_sharp, kernel):
        """x_sharp: (B, H, W, C) in [0,1]; kernel: (B, 2, 2, kernel_dim).
        Returns the re-blurred image (B, H, W, C)."""
        base = x_sharp
        h = self._features(x_sharp)
        h = self.adapter(h, kernel)
        for blk in self.recon_blocks:
            h = blk(h)
        h = lrelu01(pixel_shuffle_2x(self.upconv1(h)))
        h = lrelu01(pixel_shuffle_2x(self.upconv2(h)))
        h = self.conv_last(lrelu01(self.hr_conv(h)))
        return h + base

    def __call__(self, x_sharp, x_blur):
        fs = self._features(x_sharp)
        fb = self._features(x_blur)
        feats = jnp.concatenate([fs, fb], axis=-1) \
            if self.cfg.extractor_use_sharp else fb
        return self.extractor(feats)


# ---------------------------------------------------------------------------
# torch -> Flax weight port
# ---------------------------------------------------------------------------

def _t(w):
    """torch conv weight (out, in, kh, kw) -> HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _tt(w):
    """torch ConvTranspose2d weight (in, out, kh, kw) -> spatially-flipped
    HWIO, matching ConvTranspose4x4s2's dilated-conv formulation."""
    w = np.asarray(w)[:, :, ::-1, ::-1]
    return np.transpose(w, (2, 3, 0, 1)).copy()


def port_kernel_wizard(state_dict, cfg: KernelWizardConfig = KernelWizardConfig()):
    """Map a torch bkse KernelWizard state_dict to this module's params.

    Expected torch key layout (bkse models/kernel_encoding/kernel_wizard.py;
    feature_extractor is an nn.Sequential [conv, lrelu, conv, lrelu, conv,
    lrelu, make_layer(ResidualBlock_noBN, front_RBs)], the adapter U-Net
    blocks expose down/submodule/up, recon_trunk is
    make_layer(ResidualBlock_noBN, back_RBs)):

      feature_extractor.{i}.weight               -> fe_conv0/1/2 (3 convs,
                                                    Sequential order)
      feature_extractor.{j}.{i}.conv{1,2}.weight -> fe_rb{i}.conv{1,2}
      adapter.model[.submodule^d].down.{i}.weight -> adapter.b{d}.downconv
      adapter.model[.submodule^d].up.{i}.weight   -> adapter.b{d}.upconv
      kernel_extractor.model.{i}.weight          -> extractor head (7x7) +
                                                    down0..4 (Sequential order)
      kernel_extractor.model.{i}.conv_block.{j}.weight
                                                 -> extractor.res{i}.conv{1,2}
      recon_trunk.{i}.conv{1,2}.weight           -> rt_rb{i}.conv{1,2}
      upconv1 / upconv2 / HRconv / conv_last     -> upconv1/upconv2/hr_conv/
                                                    conv_last

    Sequential indices ({i}/{j} above) are INFERRED from the checkpoint's
    own keys (sorted numeric positions of parameter-carrying layers) and
    cross-checked against the config's channel plan and kernel shapes —
    never hard-coded — so the port is insensitive to how many
    parameterless layers (Identity norms, ReLU, ReflectionPad) the real
    bkse construction interleaves. Unknown keys raise KeyError so a
    layout mismatch is loud, not silent.
    """
    import re

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    used = set()

    def take(k):
        used.add(k)
        return sd[k]

    p = {}

    def put_conv(name, tkey, bias=True):
        p[name] = {"kernel": _t(take(tkey + ".weight"))}
        if bias:
            p[name]["bias"] = take(tkey + ".bias")

    def seq_indices(pattern):
        """Sorted Sequential indices of keys matching `pattern` (one \\d+
        group). Index positions are DERIVED from the checkpoint, never
        hard-coded, so Identity-norm placement differences in the real
        bkse construction cannot silently mis-map (parameterless layers
        like Identity/ReLU/ReflectionPad occupy indices but emit no keys)."""
        out = set()
        for k in sd:
            m = re.fullmatch(pattern, k)
            if m:
                out.add(int(m.group(1)))
        return sorted(out)

    # feature_extractor: Sequential [conv, lrelu]x3 + make_layer(RB_noBN);
    # the three plain convs and the resblock container index are inferred
    fe_convs = seq_indices(r"feature_extractor\.(\d+)\.weight")
    fe_rb = seq_indices(r"feature_extractor\.(\d+)\.\d+\.conv1\.weight")
    assert len(fe_convs) == 3 and len(fe_rb) == 1, (fe_convs, fe_rb)
    for j, ix in enumerate(fe_convs):
        put_conv(f"fe_conv{j}", f"feature_extractor.{ix}")
    for i in range(cfg.front_RBs):
        base = f"feature_extractor.{fe_rb[0]}.{i}"
        p[f"fe_rb{i}"] = {
            "conv1": {"kernel": _t(take(f"{base}.conv1.weight")),
                      "bias": take(f"{base}.conv1.bias")},
            "conv2": {"kernel": _t(take(f"{base}.conv2.weight")),
                      "bias": take(f"{base}.conv2.bias")},
        }

    # adapter: torch submodule nesting depth d -> nested Flax b0/b1/.../bd;
    # per-level down/up conv indices inferred (outermost down=[conv] ->
    # down.0, inner down=[lrelu, conv] -> down.1; up=[relu, upconv, ...])
    adapter_root = {}
    node = adapter_root
    for depth in range(5):
        prefix = "adapter.model." + "submodule." * depth
        pre = re.escape(prefix)
        (down_ix,) = seq_indices(pre + r"down\.(\d+)\.weight")
        (up_ix,) = seq_indices(pre + r"up\.(\d+)\.weight")
        blk = {"downconv":
               {"kernel": _t(take(f"{prefix}down.{down_ix}.weight"))}}
        up = {"kernel": _tt(take(f"{prefix}up.{up_ix}.weight"))}
        if f"{prefix}up.{up_ix}.bias" in sd:  # outermost upconv keeps bias
            assert depth == 0, f"unexpected upconv bias at depth {depth}"
            up["bias"] = take(f"{prefix}up.{up_ix}.bias")
        blk["upconv"] = up
        node[f"b{depth}"] = blk
        node = blk
    assert "bias" in adapter_root["b0"]["upconv"], \
        "outermost adapter upconv must carry a bias (pix2pix layout)"
    p["adapter"] = adapter_root

    # kernel extractor: plain convs = head + 5 downs in Sequential order
    # (identified by count and shape progression), resnet blocks by their
    # .conv_block. subtree; all indices inferred
    ext_convs = seq_indices(r"kernel_extractor\.model\.(\d+)\.weight")
    assert len(ext_convs) == 6, ext_convs
    head_ix, down_ixs = ext_convs[0], ext_convs[1:]
    head_w = take(f"kernel_extractor.model.{head_ix}.weight")
    assert head_w.shape[2:] == (7, 7), ("head conv must be the 7x7 "
                                        "reflect-pad conv", head_w.shape)
    ext = {"head": {"kernel": _t(head_w)}}
    out_nc = cfg.kernel_dim * 2 if cfg.use_vae else cfg.kernel_dim
    for i, ix in enumerate(down_ixs):
        w = take(f"kernel_extractor.model.{ix}.weight")
        assert w.shape[0] == min(cfg.nf * 2 ** (i + 1), out_nc), \
            ("down conv channel plan mismatch", i, w.shape)
        ext[f"down{i}"] = {"kernel": _t(w)}
    res_ixs = seq_indices(r"kernel_extractor\.model\.(\d+)\.conv_block\.\d+\.weight")
    assert len(res_ixs) == cfg.extractor_n_blocks, res_ixs
    for i, ix in enumerate(res_ixs):
        base = f"kernel_extractor.model.{ix}.conv_block"
        cb = seq_indices(re.escape(base) + r"\.(\d+)\.weight")
        assert len(cb) == 2, (base, cb)
        ext[f"res{i}"] = {
            "conv1": {"kernel": _t(take(f"{base}.{cb[0]}.weight"))},
            "conv2": {"kernel": _t(take(f"{base}.{cb[1]}.weight"))},
        }
    p["extractor"] = ext

    for i in range(cfg.back_RBs):
        p[f"rt_rb{i}"] = {
            "conv1": {"kernel": _t(take(f"recon_trunk.{i}.conv1.weight")),
                      "bias": take(f"recon_trunk.{i}.conv1.bias")},
            "conv2": {"kernel": _t(take(f"recon_trunk.{i}.conv2.weight")),
                      "bias": take(f"recon_trunk.{i}.conv2.bias")},
        }
    put_conv("upconv1", "upconv1")
    put_conv("upconv2", "upconv2")
    put_conv("hr_conv", "HRconv")
    put_conv("conv_last", "conv_last")

    leftover = set(sd) - used
    if leftover:
        raise KeyError(f"unmapped torch keys: {sorted(leftover)[:8]} "
                       f"(+{max(0, len(leftover) - 8)} more)")
    return {"params": jax.tree.map(jnp.asarray, p)}

"""Useful-FLOP accounting for the LATENT energy+grad program (VERDICT r4
next #1: the latent program had one hardware number and no FLOP count).

The hmc_latent energy+grad (ref main_sampling_latent.py:651,670 +
ldm/models/diffusion/ddpm.py:766-823) evaluates, per chain-eval:
  fwd:  3x latent eps-net (64^2, ch224) + VQ-f4 decoder (64^2 z -> 256^2)
        + inpainting residual
  bwd (w.r.t. z, eps-net STOP-GRADDED for reference parity ddpm.py:892):
        gradient flows only through the linear DDIM recombination and the
        decoder — so the ideal backward is the decoder dgrad alone, and
        the eps-net fwd FLOPs are pure forward work.

Counting method identical to useful_flops.py (shared parser): lower (not
compile) on CPU, parse MXU FLOPs from the StableHLO text. The ladder is
fully unrolled for counting so the text contains every executed op exactly
once (a lax.scan body appears once in text but runs T times).

Writes scripts/useful_flops_latent.json.
Env: BENCH_CHAINS (8) chain batch.
"""
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from useful_flops import _mxu_flops_from_text


def _flops(fn, *args):
    txt = jax.jit(fn).lower(*args).as_text()
    flops, n_conv, n_dot = _mxu_flops_from_text(txt)
    print(f"  ({n_conv} convs, {n_dot} dots)", file=sys.stderr)
    return flops


def main():
    batch = int(os.environ.get("BENCH_CHAINS", "8"))
    from nshmc_tpu.models.ldm.ldm import LatentDiffusion, latent_unet_config
    from nshmc_tpu.models.ldm.autoencoder import AutoencoderConfig, VQModel
    from nshmc_tpu.models.unet import UNetModel
    from nshmc_tpu.schedules import DiffusionSchedule, DDIMSequence
    from nshmc_tpu.sampling.ddim import make_decoder
    from nshmc_tpu.operators import Inpainting

    zdim, d = 64, 256
    seq = DDIMSequence.create(1000, 3)

    # abstract params (eval_shape of the inits): FLOP counting never
    # executes, so skip the real CelebA-HQ-scale initialization
    unet_cfg = latent_unet_config()
    ae_cfg = AutoencoderConfig()
    unet = UNetModel(unet_cfg, dtype=jnp.bfloat16)
    first_stage = VQModel(ae_cfg, dtype=jnp.bfloat16)
    up_s = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((1, zdim, zdim, 3)),
                            jnp.zeros((1,))), jax.random.PRNGKey(0))
    ap_s = jax.eval_shape(
        lambda k: first_stage.init(k, jnp.zeros((1, d, d, 3))),
        jax.random.PRNGKey(0))
    unet_params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), up_s)
    ae_params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), ap_s)
    l = LatentDiffusion(unet, unet_params, first_stage, ae_params,
                        DiffusionSchedule.create("quad", 0.0015, 0.0195, 1000))

    rng = np.random.default_rng(0)
    perm = rng.permutation(d * d)[: int(d * d * 0.92)]
    mr = 3 * perm
    op = Inpainting.create(3, d, np.sort(np.concatenate([mr, mr + 1, mr + 2])))
    y0 = op.H_img(jnp.zeros((1, d, d, 3)))[0]

    import dataclasses as _dc

    def make_loss(stop_grad):
        def loss(up, ap, z):
            li = _dc.replace(l, unet_params=up, first_stage_params=ap)
            decode_z = make_decoder(li.model_fn(stop_gradient=stop_grad),
                                    li.schedule, seq, unroll=True)
            z0 = decode_z(z)
            x0 = li.decode_first_stage(z0)
            r = y0[None] - op.H_img(x0)
            return jnp.sum(r ** 2)

        return lambda z: loss(unet_params, ae_params, z)

    z = jnp.zeros((batch, zdim, zdim, 3), jnp.float32)

    # component split: eps-ladder fwd alone vs decoder fwd alone
    def eps_ladder_only(z):
        decode_z = make_decoder(l.model_fn(stop_gradient=True), l.schedule,
                                seq, unroll=True)
        return jnp.sum(decode_z(z) ** 2)

    def decoder_only(z0):
        return jnp.sum(op.H_img(l.decode_first_stage(z0)) ** 2)

    eps_fwd = _flops(eps_ladder_only, z)
    dec_fwd = _flops(decoder_only, z)
    fwd = _flops(make_loss(True), z)
    # useful fwd+bwd of the PARITY (stop-grad) program: no remat anywhere
    # in the latent stack, so the grad lowering contains zero recompute
    useful_sg = _flops(jax.value_and_grad(make_loss(True)), z)
    # full-gradient variant (--latent_full_grad): eps-net dgrad included
    useful_fg = _flops(jax.value_and_grad(make_loss(False)), z)

    out = {
        "batch": batch,
        "eps_ladder_fwd_tflops_per_eval": round(eps_fwd / 1e12, 3),
        "decoder_fwd_tflops_per_eval": round(dec_fwd / 1e12, 3),
        "fwd_tflops_per_eval": round(fwd / 1e12, 3),
        "useful_fwdbwd_stopgrad_tflops_per_eval": round(useful_sg / 1e12, 3),
        "useful_fwdbwd_fullgrad_tflops_per_eval": round(useful_fg / 1e12, 3),
        "bwd_over_fwd_stopgrad": round((useful_sg - fwd) / fwd, 3),
        "note": ("stop-grad eps-net (parity default): backward is decoder "
                 "dgrad + DDIM-linear only; no remat in the latent stack so "
                 "useful == lowered"),
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(__file__),
                           "useful_flops_latent.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

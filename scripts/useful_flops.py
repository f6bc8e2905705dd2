"""Useful-FLOP accounting for the flagship energy+grad program.

VERDICT r2 (What's weak #1a): the "64% of bf16 peak" MFU claim used XLA's
FLOP count of the remat=big program, which counts recomputed backward
convs as useful work. This script pins the USEFUL FLOP count: the
forward-only 3-step decode+loss program (unrolled, no remat recompute is
possible in a pure forward), plus the ideal data-gradient backward.

Because HMC differentiates w.r.t. the INPUT x_T only (params are frozen,
ref main_sampling.py:695 `autograd.grad(loss, x)`), the ideal backward
computes only dgrad convs (one transposed conv per forward conv), no
wgrads — so ideal backward ~= 1x forward FLOPs, and

    useful_flops_per_eval ~= 2 x forward_flops  (+ exact bwd measured
                             separately via a remat=none lowering)

Counting runs entirely on CPU (FLOP counts are platform-independent): the
program is LOWERED (not compiled) and MXU FLOPs are parsed from the
StableHLO text — stablehlo.convolution (2*prod(out)*prod(rhs)/C_out) and
stablehlo.dot_general (2*prod(out)*prod(contracting)). jax.checkpoint
recompute is inlined at lowering, so the remat=big text genuinely contains
the recomputed ops and the remat=none text does not.
Writes scripts/useful_flops.json.
"""
import json
import math
import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

_TENSOR = re.compile(r"tensor<([0-9x]+)x[a-z0-9]+>")


def _shapes(segment):
    return [[int(d) for d in m.split("x")] for m in _TENSOR.findall(segment)]


def _mxu_flops_from_text(txt):
    total = 0.0
    n_conv = n_dot = 0
    for line in txt.splitlines():
        if "stablehlo.convolution" in line:
            # types appear as: ... : (tensor<LHS>, tensor<RHS>) -> tensor<OUT>
            sig = line.rsplit(":", 1)[-1]
            shp = _shapes(sig)
            if len(shp) != 3:
                continue
            lhs, rhs, out = shp
            # rhs layout [0,1,i,o] (JAX default): prod(rhs)/C_out = kh*kw*ci
            m = re.search(r"x\[([^\]]*)\]", line)
            o_pos = m.group(1).replace(" ", "").split(",").index("o")
            contr = math.prod(rhs) / rhs[o_pos]
            total += 2.0 * math.prod(out) * contr
            n_conv += 1
        elif "stablehlo.dot_general" in line:
            sig = line.rsplit(":", 1)[-1]
            shp = _shapes(sig)
            if len(shp) != 3:
                continue
            lhs, rhs, out = shp
            m = re.search(r"contracting_dims = \[([0-9, ]*)\]", line)
            cdims = [int(d) for d in m.group(1).split(",")] if m and m.group(1).strip() else []
            contr = math.prod(lhs[d] for d in cdims) if cdims else 1
            total += 2.0 * math.prod(out) * contr
            n_dot += 1
    return total, n_conv, n_dot


def _flops(fn, *args):
    txt = jax.jit(fn).lower(*args).as_text()
    flops, n_conv, n_dot = _mxu_flops_from_text(txt)
    print(f"  ({n_conv} convs, {n_dot} dots)", file=sys.stderr)
    return flops


def main():
    batch = int(os.environ.get("BENCH_CHAINS", "8"))
    from nshmc_tpu.models.unet import UNetConfig, UNetModel
    from nshmc_tpu.schedules import DiffusionSchedule, DDIMSequence
    from nshmc_tpu.sampling.ddim import make_decoder
    from nshmc_tpu.operators import Inpainting
    import dataclasses

    cfg = UNetConfig.from_model_yaml(
        image_size=256, num_channels=128, num_res_blocks=1, channel_mult="",
        learn_sigma=True, attention_resolutions=16, num_heads=4,
        num_head_channels=64, use_scale_shift_norm=True, resblock_updown=True)
    d = cfg.image_size
    model = UNetModel(cfg, dtype=jnp.bfloat16)
    params = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, d, d, 3)), jnp.zeros((1,))),
        jax.random.PRNGKey(0))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)

    sched = DiffusionSchedule.create(num_timesteps=1000)
    seq = DDIMSequence.create(1000, 3)

    rng = np.random.default_rng(0)
    perm = rng.permutation(d * d)[: int(d * d * 0.92)]
    mr = 3 * perm
    op = Inpainting.create(3, d, np.sort(np.concatenate([mr, mr + 1, mr + 2])))
    y0 = op.H_img(jnp.zeros((1, d, d, 3)))[0]

    def make_loss(remat):
        c = dataclasses.replace(cfg, remat=remat)
        m = UNetModel(c, dtype=jnp.bfloat16)
        decode = make_decoder(lambda x, t: m.apply(params, x, t), sched, seq,
                              unroll=True)

        def loss(x):
            r = y0[None] - op.H_img(decode(x))
            return jnp.sum(r**2)
        return loss

    x = jnp.zeros((batch, d, d, 3), jnp.float32)

    fwd = _flops(make_loss("none"), x)
    # exact useful fwd+bwd: value_and_grad of the NO-remat program — its
    # HLO contains zero recomputation, so its FLOP count IS the useful work
    useful = _flops(jax.value_and_grad(make_loss("none")), x)
    # the program actually benched (remat=big) for the recompute overhead
    big = _flops(jax.value_and_grad(make_loss("big")), x)

    out = {
        "batch": batch,
        "fwd_tflops_per_eval": round(fwd / 1e12, 3),
        "useful_fwdbwd_tflops_per_eval": round(useful / 1e12, 3),
        "rematbig_fwdbwd_tflops_per_eval": round(big / 1e12, 3),
        "recompute_overhead_x": round(big / useful, 4),
        "bwd_over_fwd": round((useful - fwd) / fwd, 3),
        "note": "dgrad-only backward (grad wrt input x, frozen params)",
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(__file__),
                           "useful_flops.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

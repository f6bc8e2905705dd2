"""Chain-scaling benchmark: throughput vs device count.

Measures vmapped-chain HMC energy+grad throughput as chains shard over 1,
2, 4, ..., N devices of a ('chain',) mesh, reporting scaling efficiency
(the north-star >= 0.9 target on a v4-16; on this single-chip dev setup it
runs over the virtual CPU mesh for plumbing validation — pass
BENCH_SCALING_TINY=1 there).

Usage: python scripts/bench_scaling.py
Writes one JSON line per device count to stdout.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    tiny = os.environ.get("BENCH_SCALING_TINY", "") == "1"
    chains_per_dev = int(os.environ.get("BENCH_SCALING_CPD", "4"))
    if tiny:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

    import jax

    if tiny:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    from nshmc_tpu.models.unet import UNetConfig, UNetModel
    from nshmc_tpu.schedules import DiffusionSchedule, DDIMSequence
    from nshmc_tpu.sampling.ddim import make_decoder
    from nshmc_tpu.operators import Inpainting

    if tiny:
        cfg = UNetConfig(
            image_size=16, model_channels=32, out_channels=6,
            num_res_blocks=1, attention_ds=(2,), channel_mult=(1, 2),
            num_heads=2, num_head_channels=16, use_scale_shift_norm=True,
            resblock_updown=True,
        )
    else:
        cfg = UNetConfig.from_model_yaml(
            image_size=256, num_channels=128, num_res_blocks=1,
            channel_mult="", learn_sigma=True, attention_resolutions=16,
            num_heads=4, num_head_channels=64, use_scale_shift_norm=True,
            resblock_updown=True,
        )
    d = cfg.image_size
    model = UNetModel(cfg, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, d, d, 3)),
                        jnp.zeros((1,)))
    sched = DiffusionSchedule.create(num_timesteps=1000)
    seq = DDIMSequence.create(1000, 3)

    rng = np.random.default_rng(0)
    perm = rng.permutation(d * d)[: d * d // 2]
    mr = 3 * perm
    op = Inpainting.create(3, d, np.sort(np.concatenate([mr, mr + 1, mr + 2])))
    y0 = op.H_img(jnp.zeros((1, d, d, 3)))[0]

    def chain_loss(params, x_chains):
        decode = make_decoder(lambda x, t: model.apply(params, x, t),
                              sched, seq)

        def one(x):
            r = y0 - op.H_img(decode(x[None]))[0]
            return jnp.sum(r**2)

        losses = jax.vmap(one)(x_chains)
        return jnp.sum(losses)

    devs = jax.devices()
    results = []
    base = None
    n = 1
    while n <= len(devs):
        mesh = Mesh(np.asarray(devs[:n]), ("chain",))
        fn = jax.jit(shard_map(
            lambda p, x: jax.grad(chain_loss, argnums=1)(p, x),
            mesh=mesh, in_specs=(P(), P("chain")), out_specs=P("chain"),
            check_vma=False,
        ))
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (n * chains_per_dev, d, d, 3))
        g = fn(params, x)
        jax.block_until_ready(g)
        iters = 4
        t0 = time.time()
        for i in range(iters):
            g = fn(params, x + 1e-6 * i)
        jax.block_until_ready(g)
        dt = (time.time() - t0) / iters
        rate = n * chains_per_dev / dt
        if base is None:
            base = rate
        eff = rate / (base * n)
        rec = {"devices": n, "chains": n * chains_per_dev,
               "chain_evals_per_s": round(rate, 3),
               "scaling_efficiency": round(eff, 3)}
        results.append(rec)
        print(json.dumps(rec))
        n *= 2
    return results


if __name__ == "__main__":
    main()

"""Port reference PyTorch checkpoints to native Flax msgpack files.

Usage:
  python scripts/port_weights.py adm models/ffhq_10m.pt out/ffhq_10m.msgpack
  python scripts/port_weights.py ldm models/ldm/model.ckpt out/ldm/
  python scripts/port_weights.py ddpm models/celeba_hq.ckpt out/celeba_hq.msgpack

The ported files load with flax.serialization.msgpack_restore and plug
straight into the corresponding nshmc_tpu models.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    kind, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    import torch
    import jax
    from flax import serialization

    sd = torch.load(src, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]

    if kind == "adm":
        from nshmc_tpu.models.unet import UNetConfig
        from nshmc_tpu.models.port import port_adm_state_dict

        cfg = UNetConfig.from_model_yaml(
            image_size=256, num_channels=128, num_res_blocks=1,
            channel_mult="", learn_sigma=True, attention_resolutions=16,
            num_heads=4, num_head_channels=64, use_scale_shift_norm=True,
            resblock_updown=True,
        )
        params = port_adm_state_dict(sd, cfg)
        _write(dst, params)
    elif kind == "ddpm":
        from nshmc_tpu.models.ddpm_simple import DDPMConfig, port_ddpm_state_dict

        params = port_ddpm_state_dict(sd, DDPMConfig())
        _write(dst, params)
    elif kind == "ldm":
        from nshmc_tpu.models.ldm.port import port_ldm_checkpoint

        unet_params, ae_params, ac = port_ldm_checkpoint(sd)
        os.makedirs(dst, exist_ok=True)
        _write(os.path.join(dst, "unet.msgpack"), unet_params)
        _write(os.path.join(dst, "first_stage.msgpack"), ae_params)
        if ac is not None:
            import numpy as np

            np.save(os.path.join(dst, "alphas_cumprod.npy"), ac)
    else:
        raise SystemExit(f"unknown kind {kind!r} (adm | ddpm | ldm)")
    print(f"ported {src} -> {dst}")


def _write(path, params):
    from flax import serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(params))


if __name__ == "__main__":
    main()

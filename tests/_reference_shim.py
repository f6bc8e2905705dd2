"""Import shim for the REAL reference entry modules (main_sampling.py /
main_sampling_latent.py) on this image.

The reference mains are CUDA-hard-coded scripts with module-level imports of
packages absent here (torchvision, lpips, skimage, omegaconf) that the HMC
functions themselves never touch on the paths we exercise (image saving and
metric printing only). This shim stubs exactly those, plus the reference's
`datasets` package (whose import tree needs torchvision.transforms) with the
two pure-math transforms the samplers call (`inverse_data_transform` is the
[-1,1]->[0,1] unclip used only for PSNR prints, datasets/__init__.py:216-224).

Sampler statistics — integrator, Hamiltonian, accept rule, annealing,
backoff — all run the REAL reference code (main_sampling.py:660-774,
main_sampling_latent.py:623-762).
"""
import sys
import types

import numpy as np
import torch

REFERENCE = "/root/reference"


def _stub(name):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)
    return sys.modules[name]


def _install_stubs():
    tv = _stub("torchvision")
    tvu = _stub("torchvision.utils")
    if not hasattr(tvu, "save_image"):
        tvu.save_image = lambda *a, **k: None
    tv.utils = tvu

    _stub("lpips")

    sk = _stub("skimage")
    skm = _stub("skimage.metrics")
    if not hasattr(skm, "structural_similarity"):
        skm.structural_similarity = lambda *a, **k: 0.0
    sk.metrics = skm

    oc = _stub("omegaconf")
    if not hasattr(oc, "OmegaConf"):
        class OmegaConf:  # noqa: N801 - mirrors the package's class name
            pass
        oc.OmegaConf = OmegaConf

    # the reference's own datasets package (torch Dataset wrappers needing
    # torchvision.transforms); the samplers only use its two pure transforms
    ds = _stub("datasets")
    if not hasattr(ds, "inverse_data_transform"):
        def data_transform(config, X):
            return 2.0 * X - 1.0 if config.data.rescaled else X

        def inverse_data_transform(config, X):
            if config.data.rescaled:
                X = (X + 1.0) / 2.0
            return torch.clamp(X, 0.0, 1.0)

        ds.get_dataset = lambda *a, **k: (_ for _ in ()).throw(
            NotImplementedError("stubbed"))
        ds.data_transform = data_transform
        ds.inverse_data_transform = inverse_data_transform


class _NS(types.SimpleNamespace):
    pass


def make_config():
    """Minimal config namespace for inverse_data_transform + prints."""
    return _NS(data=_NS(rescaled=True, logit_transform=False))


def import_main_sampling():
    _install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import main_sampling as ms  # noqa: E402

    ms.device = torch.device("cpu")
    ms.config = make_config()
    return ms


def import_main_sampling_latent():
    _install_stubs()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import main_sampling_latent as msl  # noqa: E402

    msl.device = torch.device("cpu")
    msl.config = make_config()
    return msl

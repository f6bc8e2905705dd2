"""Bit-level operator parity against the reference torch H_functions
implementations with identical construction inputs."""
import sys

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

D, C = 16, 3
RNG = np.random.default_rng(0)


def _x(b=2):
    return RNG.standard_normal((b, C * D * D)).astype(np.float32)


def _check(ours_fn, ref_fn, x, atol=2e-4):
    ours = np.asarray(ours_fn(jnp.asarray(x)))
    ref = ref_fn(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, ref.reshape(ours.shape), atol=atol,
                               rtol=1e-3)


def test_inpainting_full_parity():
    from obs_functions.Hfuncs import Inpainting as TOp
    from nshmc_tpu.operators import Inpainting

    perm = RNG.permutation(D * D)[: int(D * D * 0.5)]
    mr = 3 * perm
    missing = np.sort(np.concatenate([mr, mr + 1, mr + 2]))
    t = TOp(C, D, torch.tensor(missing, dtype=torch.long), "cpu")
    j = Inpainting.create(C, D, missing)
    x = _x()
    for name in ["H", "Ht", "H_pinv", "V", "Vt"]:
        _check(getattr(j, name), getattr(t, name),
               x if name in ("H", "V", "Vt") else
               np.asarray(t.H(torch.tensor(x))) if name in ("Ht", "H_pinv")
               else x)
    np.testing.assert_allclose(np.asarray(j.singulars()),
                               t.singulars().numpy())


def test_superresolution_full_parity():
    from obs_functions.Hfuncs import SuperResolution as TOp
    from nshmc_tpu.operators import SuperResolution

    t = TOp(C, D, 2, "cpu")
    j = SuperResolution.create(C, D, 2)
    x = _x()
    _check(j.H, t.H, x)
    y = np.asarray(t.H(torch.tensor(x)))
    _check(j.H_pinv, t.H_pinv, y)
    _check(j.Ht, t.Ht, y)


def test_walsh_hadamard_full_parity():
    from obs_functions.Hfuncs import WalshHadamardCS as TOp
    from nshmc_tpu.operators import WalshHadamardCS

    perm = RNG.permutation(D * D)
    t = TOp(C, D, 2, torch.tensor(perm, dtype=torch.long), "cpu")
    j = WalshHadamardCS.create(C, D, 2, perm)
    x = _x()
    _check(j.H, t.H, x)
    y = np.asarray(t.H(torch.tensor(x)))
    _check(j.H_pinv, t.H_pinv, y)


def test_colorization_full_parity():
    from obs_functions.Hfuncs import Colorization as TOp
    from nshmc_tpu.operators import Colorization

    t = TOp(D, "cpu")
    j = Colorization.create(D)
    x = _x()
    _check(j.H, t.H, x)
    y = np.asarray(t.H(torch.tensor(x)))
    _check(j.H_pinv, t.H_pinv, y)


def test_phase_retrieval_full_parity():
    from obs_functions.Hfuncs import PhaseRetrievalOperator as TOp
    from nshmc_tpu.operators import PhaseRetrieval

    # torch operator hard-codes pad from 256; use oversample giving pad for
    # d=16: pad = oversample/8*256 -> choose oversample=0.25 -> pad=8
    t = TOp(oversample=0.25, device="cpu")
    j = PhaseRetrieval.create(C, D, oversample=0.25)
    assert j.pad == t.pad == 8
    x = _x(1).reshape(1, C, D, D)
    ref = t.H(torch.tensor(x)).numpy()
    ours = np.asarray(j.H(jnp.asarray(x.reshape(1, -1))))
    np.testing.assert_allclose(ours, ref.reshape(1, -1), atol=5e-4, rtol=1e-3)


def test_hdr_full_parity():
    from obs_functions.Hfuncs import HDR as TOp
    from nshmc_tpu.operators import HDR

    t = TOp()
    j = HDR.create(C, D)
    x = _x()
    _check(j.H, t.H, x)


def test_deblurring_reference_layout_parity():
    """The reference-layout variant must match torch Deblurring
    (H, Ht, H_pinv, singulars) despite its channel-mixing layout. The
    inconsistent layout makes the operator depend on the exact SVD basis,
    so the factors are built with torch.svd like the reference
    (Hfuncs.py:252-261)."""
    from obs_functions.Hfuncs import Deblurring as TOp
    from nshmc_tpu.operators.deblur import (
        DeblurringReferenceLayout, _conv1d_matrix,
    )

    kernel = np.exp(-0.5 * (np.arange(-2, 3) / 10.0) ** 2)
    kernel = kernel / kernel.sum()
    t = TOp(torch.tensor(kernel, dtype=torch.float32), C, D, "cpu")

    hs = torch.tensor(_conv1d_matrix(kernel, D), dtype=torch.float32)
    u, s, v = torch.svd(hs, some=False)
    s_thr = s.clone()
    s_thr[s_thr < 3e-2] = 0
    sing = torch.matmul(s_thr.reshape(D, 1), s_thr.reshape(1, D)).reshape(-1)
    _, order = sing.sort(descending=True)
    j = DeblurringReferenceLayout.create_with_factors(
        u.numpy(), s.numpy(), v.numpy(), u.numpy(), s.numpy(), v.numpy(),
        C, D, order=order.numpy(),
    )
    x = _x()
    _check(j.H, t.H, x, atol=5e-4)
    y = np.asarray(t.H(torch.tensor(x)))
    _check(j.Ht, t.Ht, y, atol=5e-4)
    _check(j.H_pinv, t.H_pinv, y, atol=2e-3)
    np.testing.assert_allclose(np.asarray(j.singulars()),
                               t.singulars().numpy(), atol=1e-5)
    _check(j.Vt, t.Vt, x, atol=5e-4)


def test_deblurring2d_reference_layout_parity():
    from obs_functions.Hfuncs import Deblurring2D as TOp
    from nshmc_tpu.operators.deblur import (
        Deblurring2DReferenceLayout, _conv1d_matrix,
    )

    k1 = np.exp(-0.5 * (np.arange(-4, 5) / 1.0) ** 2)
    k2 = np.exp(-0.5 * (np.arange(-4, 5) / 20.0) ** 2)
    k1n, k2n = k1 / k1.sum(), k2 / k2.sum()
    t = TOp(torch.tensor(k1n, dtype=torch.float32),
            torch.tensor(k2n, dtype=torch.float32), C, D, "cpu")
    h1 = torch.tensor(_conv1d_matrix(k1n, D), dtype=torch.float32)
    h2 = torch.tensor(_conv1d_matrix(k2n, D), dtype=torch.float32)
    u1, s1, v1 = torch.svd(h1, some=False)
    u2, s2, v2 = torch.svd(h2, some=False)
    s1t, s2t = s1.clone(), s2.clone()
    s1t[s1t < 3e-2] = 0
    s2t[s2t < 3e-2] = 0
    sing = torch.matmul(s1t.reshape(D, 1), s2t.reshape(1, D)).reshape(-1)
    _, order = sing.sort(descending=True)
    j = Deblurring2DReferenceLayout.create_with_factors(
        u1.numpy(), s1.numpy(), v1.numpy(),
        u2.numpy(), s2.numpy(), v2.numpy(), C, D, order=order.numpy(),
    )
    x = _x()
    _check(j.H, t.H, x, atol=5e-4)

"""SVD-identity and ground-truth tests for the forward-operator library
(SURVEY.md section 4, item 1: the contracts Hfuncs.py:22-116 encodes only
implicitly)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nshmc_tpu.operators import (
    Inpainting,
    Denoising,
    SuperResolution,
    Colorization,
    Deblurring,
    Deblurring2D,
    SRConv,
    WalshHadamardCS,
    PhaseRetrieval,
    HDR,
    GeneralH,
    fwht,
    flatten_image,
    unflatten_image,
)

D, C = 16, 3
RNG = np.random.default_rng(0)


def _make_operators():
    missing_perm = RNG.permutation(D * D)[: int(D * D * 0.5)]
    missing_r = 3 * missing_perm
    missing = np.sort(np.concatenate([missing_r, missing_r + 1, missing_r + 2]))
    kernel = np.exp(-0.5 * (np.arange(-2, 3) / 10.0) ** 2)
    k1 = np.exp(-0.5 * (np.arange(-4, 5) / 1.0) ** 2)
    k2 = np.exp(-0.5 * (np.arange(-4, 5) / 20.0) ** 2)
    return {
        "inpainting": Inpainting.create(C, D, missing),
        "denoising": Denoising.create(C, D),
        "sr2": SuperResolution.create(C, D, 2),
        "sr4": SuperResolution.create(C, D, 4),
        "color": Colorization.create(D),
        "deblur": Deblurring.create(kernel, C, D, zero_thresh=0.0),
        "deblur2d": Deblurring2D.create(k1, k2, C, D, zero_thresh=0.0),
        "srconv2": SRConv.create(kernel / kernel.sum(), C, D, stride=2, zero_thresh=0.0),
        "cs2": WalshHadamardCS.create(C, D, 2, RNG.permutation(D * D)),
    }


OPS = _make_operators()


@pytest.fixture(params=list(OPS.keys()))
def op(request):
    return OPS[request.param]


def _x(b=2, seed=1):
    return jnp.asarray(RNG.standard_normal((b, C * D * D)), jnp.float32)


def test_v_orthogonal(op):
    x = _x()
    np.testing.assert_allclose(op.Vt(op.V(x)), x, atol=1e-4)
    np.testing.assert_allclose(op.V(op.Vt(x)), x, atol=1e-4)


def test_u_orthogonal(op):
    y = op.H(_x())
    np.testing.assert_allclose(op.Ut(op.U(y)), y, atol=1e-4)


def test_adjoint(op):
    """<Hx, y> == <x, Ht y>."""
    x = _x()
    y = jnp.asarray(RNG.standard_normal(op.H(x).shape), jnp.float32)
    lhs = jnp.sum(op.H(x) * y)
    rhs = jnp.sum(x * op.Ht(y))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-3)


def test_pinv_projector(op):
    """H H_pinv H == H (Moore-Penrose identity)."""
    x = _x()
    hx = op.H(x)
    np.testing.assert_allclose(op.H(op.H_pinv(hx)), hx, atol=1e-3)


def test_singulars_nonneg_and_sized(op):
    s = np.asarray(op.singulars())
    assert (s >= 0).all()
    y = op.H(_x())
    assert s.shape[0] >= y.shape[1] or s.shape[0] == y.shape[1]


# --- ground-truth semantics ------------------------------------------------

def test_inpainting_is_masking():
    op = OPS["inpainting"]
    x = _x()
    hx = op.H(x)
    # H should return exactly the kept coordinates in pixel-major order
    xp = x.reshape(2, C, -1).transpose(0, 2, 1).reshape(2, -1)
    np.testing.assert_allclose(hx, xp[:, np.asarray(op.kept_indices)], atol=1e-5)


def test_sr_is_block_mean():
    for name, r in [("sr2", 2), ("sr4", 4)]:
        op = OPS[name]
        img = jnp.asarray(RNG.standard_normal((2, D, D, C)), jnp.float32)
        hx = op.H(flatten_image(img))
        direct = img.reshape(2, D // r, r, D // r, r, C).mean(axis=(2, 4))
        direct = jnp.transpose(direct, (0, 3, 1, 2)).reshape(2, -1)
        np.testing.assert_allclose(hx, direct, atol=1e-4)


def test_deblur_is_separable_conv():
    """Our Deblurring applies the exact separable convolution (the reference's
    singulars tiling channel-mixes; see deblur.py docstring)."""
    kernel = np.exp(-0.5 * (np.arange(-2, 3) / 10.0) ** 2)
    kernel = kernel / kernel.sum()
    op = OPS["deblur"]
    from nshmc_tpu.operators.deblur import _conv1d_matrix

    hs = _conv1d_matrix(kernel, D)
    x = RNG.standard_normal((2, C, D, D)).astype(np.float32)
    direct = np.einsum("ij,bcjk,lk->bcil", hs, x, hs)
    hx = op.H(jnp.asarray(x.reshape(2, -1)))
    np.testing.assert_allclose(hx.reshape(2, C, D, D), direct, atol=1e-4)


def test_deblur2d_is_separable_conv():
    k1 = np.exp(-0.5 * (np.arange(-4, 5) / 1.0) ** 2)
    k2 = np.exp(-0.5 * (np.arange(-4, 5) / 20.0) ** 2)
    k1, k2 = k1 / k1.sum(), k2 / k2.sum()
    from nshmc_tpu.operators.deblur import _conv1d_matrix

    h1, h2 = _conv1d_matrix(k1, D), _conv1d_matrix(k2, D)
    op = OPS["deblur2d"]
    x = RNG.standard_normal((2, C, D, D)).astype(np.float32)
    direct = np.einsum("ij,bcjk,lk->bcil", h1, x, h2)
    hx = op.H(jnp.asarray(x.reshape(2, -1)))
    np.testing.assert_allclose(hx.reshape(2, C, D, D), direct, atol=1e-4)


def test_srconv_matches_explicit_matrix():
    """SRConv vs an explicit dense H built from the same 1D matrix."""
    from nshmc_tpu.operators.deblur import _srconv_matrix

    kernel = np.exp(-0.5 * (np.arange(-2, 3) / 10.0) ** 2)
    kernel = kernel / kernel.sum()
    hs = _srconv_matrix(kernel, D, 2)  # (D/2, D)
    # full operator: per channel, Hs kron Hs
    big = np.kron(hs, hs)  # (small^2, D^2) acting on row-major flattened image
    op = OPS["srconv2"]
    x = RNG.standard_normal((1, C, D, D)).astype(np.float32)
    direct = np.einsum("sk,ck->cs", big, x.reshape(C, -1))
    hx = np.asarray(op.H(jnp.asarray(x.reshape(1, -1)))).reshape(C, -1)
    np.testing.assert_allclose(hx, direct, atol=1e-3)


def test_colorization_is_channel_mean():
    op = OPS["color"]
    x = RNG.standard_normal((2, C, D, D)).astype(np.float32)
    w = np.asarray([0.3333, 0.3334, 0.3333])
    direct = np.einsum("c,bchw->bhw", w, x).reshape(2, -1)
    hx = op.H(jnp.asarray(x.reshape(2, -1)))
    np.testing.assert_allclose(hx, direct, atol=1e-4)


def test_fwht_self_inverse():
    x = jnp.asarray(RNG.standard_normal((2, 3, D * D)), jnp.float32)
    y = fwht(fwht(x, 1.0 / D), 1.0 / D)
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_cs_keeps_subset_of_hadamard_coeffs():
    op = OPS["cs2"]
    x = _x()
    hx = op.H(x)
    assert hx.shape[1] == C * D * D // 2
    full = fwht(x.reshape(2, C, -1), 1.0 / D)
    picked = full[:, :, np.asarray(op.perm)[: D * D // 2]]
    np.testing.assert_allclose(
        hx, picked.transpose(0, 2, 1).reshape(2, -1), atol=1e-4
    )


def test_phase_retrieval_shapes_and_parseval():
    op = PhaseRetrieval.create(C, D, oversample=2.0)
    pad = op.pad
    x = _x()
    hx = op.H(x)
    big = D + 2 * pad
    assert hx.shape == (2, C * big * big)
    # orthonormal FFT preserves energy; padding adds zeros
    np.testing.assert_allclose(
        np.sum(np.asarray(hx) ** 2, axis=1),
        np.sum(np.asarray(x) ** 2, axis=1),
        rtol=1e-3,
    )
    assert not op.is_linear()


def test_hdr_semantics():
    op = HDR.create(C, D)
    x = jnp.asarray([[-1.0, -0.4, 0.0, 0.3, 1.0]], jnp.float32)
    np.testing.assert_allclose(op.H(x), [[-1.0, -0.8, 0.0, 0.6, 1.0]], atol=1e-6)
    assert not op.is_linear()


def test_generalh_matches_dense():
    h = RNG.standard_normal((10, 24)).astype(np.float32)
    op = GeneralH.create(h)
    x = jnp.asarray(RNG.standard_normal((2, 24)), jnp.float32)
    np.testing.assert_allclose(op.H(x), x @ h.T, atol=1e-3)
    np.testing.assert_allclose(op.Ht(op.H(x)), x @ h.T @ h, atol=1e-3)
    pinv = np.linalg.pinv(h)
    np.testing.assert_allclose(op.H_pinv(op.H(x)), x @ h.T @ pinv.T, atol=1e-3)


def test_flatten_roundtrip():
    img = jnp.asarray(RNG.standard_normal((2, D, D, C)), jnp.float32)
    np.testing.assert_allclose(
        unflatten_image(flatten_image(img), C, D), img, atol=0
    )


def test_operators_jit_and_vmap():
    """Operators must pass through jit as pytree args."""
    op = OPS["deblur"]

    @jax.jit
    def f(op, x):
        return op.H_pinv(op.H(x))

    x = _x()
    out = f(op, x)
    assert out.shape == x.shape


def test_matmul_dft_matches_fft():
    """The MXU matmul DFT lowering must agree with jnp.fft — it exists for
    TPU runtimes whose FFT custom-call is unimplemented (axon tunnel)."""
    from nshmc_tpu.operators import nonlinear as nl

    rng = np.random.default_rng(7)
    # non-square spatial dims exercise the two separate DFT matrices
    xr = jnp.asarray(rng.normal(size=(2, 3, 17, 24)), jnp.float32)
    xc = xr + 1j * jnp.asarray(rng.normal(size=xr.shape), jnp.float32)
    try:
        nl.set_fft_impl("fft")
        ref_f = nl.fft2c(xc)
        ref_i = nl.ifft2c(xc)
        ref_real = nl.fft2c(xr)
        nl.set_fft_impl("matmul")
        got_f = nl.fft2c(xc)
        got_i = nl.ifft2c(xc)
        got_real = nl.fft2c(xr)
        # roundtrip under the matmul lowering alone
        rt = nl.ifft2c(nl.fft2c(xc))
    finally:
        nl.set_fft_impl("auto")
    np.testing.assert_allclose(got_f, ref_f, atol=2e-4)
    np.testing.assert_allclose(got_i, ref_i, atol=2e-4)
    np.testing.assert_allclose(got_real, ref_real, atol=2e-4)
    np.testing.assert_allclose(rt, xc, atol=5e-4)


def test_phase_retrieval_matmul_dft_grad():
    """Phase retrieval must stay differentiable (HMC energy path) and
    produce the same measurement under the matmul DFT lowering."""
    from nshmc_tpu.operators import PhaseRetrieval
    from nshmc_tpu.operators import nonlinear as nl

    op = PhaseRetrieval.create(channels=1, img_dim=8, oversample=2.0)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 1 * 8 * 8)), jnp.float32)

    def loss(v):
        return jnp.sum(op.H(v) ** 2)

    try:
        nl.set_fft_impl("fft")
        y_ref, g_ref = op.H(x), jax.grad(loss)(x)
        nl.set_fft_impl("matmul")
        y_mm, g_mm = op.H(x), jax.grad(loss)(x)
    finally:
        nl.set_fft_impl("auto")
    np.testing.assert_allclose(y_mm, y_ref, atol=2e-4)
    np.testing.assert_allclose(g_mm, g_ref, atol=2e-3)


def test_fft_pair_lowering_complex_free():
    """The real-pair DFT (the form actually lowered on complex-free TPU
    runtimes) matches the complex implementation, and the full phase
    operator surface (H, H_pinv, proj) agrees between lowerings while the
    pair path's jaxpr contains no complex dtypes."""
    from nshmc_tpu.operators import PhaseRetrieval
    from nshmc_tpu.operators import nonlinear as nl

    rng = np.random.default_rng(11)
    xr = jnp.asarray(rng.normal(size=(2, 3, 12, 20)), jnp.float32)
    xi = jnp.asarray(rng.normal(size=xr.shape), jnp.float32)
    ref = nl.fft2c(xr + 1j * xi)
    yr, yi = nl.fft2c_pair(xr, xi)
    np.testing.assert_allclose(yr, ref.real, atol=2e-4)
    np.testing.assert_allclose(yi, ref.imag, atol=2e-4)
    ref_i = nl.ifft2c(xr + 1j * xi)
    zr, zi = nl.ifft2c_pair(xr, xi)
    np.testing.assert_allclose(zr, ref_i.real, atol=2e-4)
    np.testing.assert_allclose(zi, ref_i.imag, atol=2e-4)
    # real input shortcut
    rr, ri = nl.fft2c_pair(xr)
    ref_r = nl.fft2c(xr.astype(jnp.complex64))
    np.testing.assert_allclose(rr, ref_r.real, atol=2e-4)
    np.testing.assert_allclose(ri, ref_r.imag, atol=2e-4)

    op = PhaseRetrieval.create(channels=1, img_dim=8, oversample=2.0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64)), jnp.float32)
    try:
        nl.set_fft_impl("fft")
        y_ref = op.H(x)
        pinv_ref = op.H_pinv(y_ref)
        proj_ref = op.proj(x, y_ref)
        nl.set_fft_impl("matmul")
        y_mm = op.H(x)
        pinv_mm = op.H_pinv(y_mm)
        proj_mm = op.proj(x, y_mm)
        jaxpr = str(jax.make_jaxpr(
            lambda v: (op.proj(v, op.H(v)), op.H_pinv(op.H(v))))(x))
        assert "complex" not in jaxpr, "pair path must lower complex-free"
    finally:
        nl.set_fft_impl("auto")
    np.testing.assert_allclose(y_mm, y_ref, atol=2e-4)
    np.testing.assert_allclose(pinv_mm, pinv_ref, atol=2e-4)
    np.testing.assert_allclose(proj_mm, proj_ref, atol=2e-3)

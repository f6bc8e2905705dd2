"""Spectral-space posterior samplers: DDNM and DDRM.

Re-designs of the reference plugins (cites into /root/reference/algos/):
  DDNM (ddnm.py:4-102)  — null-space projection with lambda_t-blended
                          range-space correction for noisy measurements
  DDRM (ddrm.py:4-131)  — variational spectral update with three regimes
                          split on singulars * sigma_next vs sigma_0

All operations are elementwise in the operator's V-spectral basis: masks are
jnp.where selects over full-dimension vectors (rank coefficients first, then
null space), computed safely for zero singular values.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from .base import Algo, predict_eps, predict_x0


def _padded_sigma(op, d):
    """(Sigma, Inv_Sigma) padded to the full V-space dimension `d`
    (ref: algos/ddnm.py:17-24)."""
    s = op.singulars()
    sigma = jnp.zeros(d).at[: s.shape[0]].set(s)
    inv = jnp.where(sigma != 0, 1.0 / jnp.where(sigma != 0, sigma, 1.0), 0.0)
    return sigma, inv


def _pad_rank(vec_rank, d):
    """Zero-pad a (B, rank) spectral vector to (B, d)."""
    b = vec_rank.shape[0]
    out = jnp.zeros((b, d), vec_rank.dtype)
    return out.at[:, : vec_rank.shape[1]].set(vec_rank)


class DDNM(Algo):
    """Denoising diffusion null-space model (ref: algos/ddnm.py)."""

    eta: float = struct.field(pytree_node=False, default=0.85)

    def cal_x0(self, model_fn, xt, state, t, at, at_next, y0, key):
        op = self.operator
        et = predict_eps(model_fn, xt, t)
        x0 = predict_x0(xt, et, at)
        d = xt.shape[1] * xt.shape[2] * xt.shape[3]

        if self.sigma_0 == 0:
            # noiseless: plain pseudo-inverse data consistency (ddnm.py:39-54)
            x0 = x0 + self._img(op.H_pinv(y0 - op.H_img(x0)), x0)
            noise = jax.random.normal(key, x0.shape)
            add_up = (
                self.eta * jnp.sqrt(1 - at_next) * noise
                + jnp.sqrt(1 - self.eta**2) * jnp.sqrt(1 - at_next) * et
            )
            return x0, add_up, state

        sigma, inv_sigma = _padded_sigma(op, d)
        v_t_et = op.Vt(self._flat(et))
        sigma_t = jnp.sqrt(1 - at_next)
        thresh = jnp.sqrt(at_next) * self.sigma_0 * inv_sigma

        lambda_t = jnp.where(
            sigma_t < thresh,
            sigma * sigma_t * jnp.sqrt(1 - self.eta**2)
            / jnp.sqrt(at_next) / self.sigma_0,
            1.0,
        )
        correction = op.Vt(op.H_pinv(op.H_img(x0) - y0))
        x0 = x0 - self._img(op.V(lambda_t[None] * correction), x0)

        noise = jax.random.normal(key, (xt.shape[0], d))
        eps_tmp = jnp.where(
            sigma_t >= thresh,
            (sigma_t**2 - at_next * self.sigma_0**2 * inv_sigma**2) * noise,
            self.eta * sigma_t * noise,
        )
        eps_tmp = jnp.where(
            sigma == 0,
            sigma_t * jnp.sqrt(1 - self.eta**2) * v_t_et
            + sigma_t * self.eta * noise,
            eps_tmp,
        )
        add_up = self._img(op.V(eps_tmp), x0)
        return x0, add_up, state

    def get_pred_x(self, gt, y0, at_next, key):
        """Range-space refinement of a given x0 (ref: ddnm.py:10-33)."""
        if self.sigma_0 == 0:
            return gt
        op = self.operator
        d = gt.shape[1] * gt.shape[2] * gt.shape[3]
        sigma, inv_sigma = _padded_sigma(op, d)
        sigma_t = jnp.sqrt(1 - at_next)
        thresh = jnp.sqrt(at_next) * self.sigma_0 * inv_sigma
        lambda_t = jnp.where(
            sigma_t < thresh,
            sigma * sigma_t * jnp.sqrt(1 - self.eta**2)
            / jnp.sqrt(at_next) / self.sigma_0,
            1.0,
        )
        correction = op.Vt(op.H_pinv(op.H_img(gt) - y0))
        return gt - self._img(op.V(lambda_t[None] * correction), gt)


def ddrm_init_x(key, op, y0, sigma_0, alpha_bar_T, shape):
    """DDRM-correct x_T initialization p(x_T | y).

    Capability re-homed from the reference's dead original DDRM loop
    (functions/denoising.py:20-38, never imported by the mains — the live
    algos/ddrm.py drops it and starts from pure noise): spectral directions
    observed above the noise floor initialize from Sig^-1 U^T y, the rest
    from scaled Gaussian noise.

    shape: (B, H, W, C); returns an NHWC x_T batch.
    """
    from ..operators.base import unflatten_image

    b = shape[0]
    d = shape[1] * shape[2] * shape[3]
    s = op.singulars()
    sigma_pad, _ = _padded_sigma(op, d)
    largest_sigma = jnp.sqrt(1 - alpha_bar_T) / jnp.sqrt(alpha_bar_T)

    u_t_y = op.Ut(y0)  # (B, rank)
    large = sigma_pad * largest_sigma > sigma_0
    s_safe = jnp.where(sigma_pad != 0, sigma_pad, 1.0)
    inv_sing_zero = jnp.where(large, sigma_0 / s_safe, 0.0)

    init_y = jnp.zeros((b, d))
    init_y = init_y.at[:, : u_t_y.shape[1]].set(
        jnp.where(large[None, : u_t_y.shape[1]], u_t_y / s_safe[None, : u_t_y.shape[1]], 0.0)
    )
    remaining = jnp.sqrt(
        jnp.maximum(largest_sigma**2 - inv_sing_zero**2, 0.0)
    )
    noise = jax.random.normal(key, (b, d))
    init_y = (init_y + remaining[None] * noise) / largest_sigma
    return unflatten_image(op.V(init_y), shape[3], shape[1])


class DDRM(Algo):
    """Denoising diffusion restoration model (ref: algos/ddrm.py)."""

    etaB: float = struct.field(pytree_node=False, default=1.0)
    etaA: float = struct.field(pytree_node=False, default=0.85)
    etaC: float = struct.field(pytree_node=False, default=0.85)

    def _spectral_update(self, x0, et, y0, at, at_next, key, with_noise=True):
        op = self.operator
        b = x0.shape[0]
        d = x0.shape[1] * x0.shape[2] * x0.shape[3]
        s = op.singulars()
        rank = s.shape[0]
        s_safe = jnp.where(s != 0, s, 1.0)

        u_t_y = op.Ut(y0)  # (B, rank)
        sig_inv_u_t_y = u_t_y / s_safe[None, : u_t_y.shape[1]]

        sigma_next = jnp.sqrt(1 - at_next) / jnp.sqrt(at_next)
        v_t_x0 = op.Vt(self._flat(x0))  # (B, d)
        s_v_t_x0 = v_t_x0[:, :rank] * s[None]

        cond_before = _pad_rank(
            (s * sigma_next > self.sigma_0)[None].astype(jnp.float32), d
        )[0] > 0
        cond_after = _pad_rank(
            (s * sigma_next < self.sigma_0)[None].astype(jnp.float32), d
        )[0] > 0

        std_nextC = sigma_next * self.etaC
        sigma_tilde_nextC = jnp.sqrt(
            jnp.maximum(sigma_next**2 - std_nextC**2, 0.0)
        )
        std_nextA = sigma_next * self.etaA
        sigma_tilde_nextA = jnp.sqrt(
            jnp.maximum(sigma_next**2 - std_nextA**2, 0.0)
        )
        diff_sigma_b = jnp.sqrt(
            jnp.maximum(
                sigma_next**2 - self.sigma_0**2 / s_safe**2 * self.etaB**2,
                0.0,
            )
        )  # (rank,) valid under cond_before

        # base case: missing (null-space) coefficients keep V^T x0
        vt_mod = v_t_x0
        # after: less noisy than y
        after_corr = _pad_rank((u_t_y - s_v_t_x0) / self.sigma_0, d)
        vt_mod = jnp.where(cond_after[None], v_t_x0 + sigma_tilde_nextA * after_corr,
                           vt_mod)
        # before: noisier than y
        before_val = _pad_rank(
            sig_inv_u_t_y * self.etaB, d
        ) + (1 - self.etaB) * v_t_x0
        vt_mod = jnp.where(cond_before[None], before_val, vt_mod)
        x0_new = self._img(op.V(vt_mod), x0)

        if not with_noise:
            return x0_new, None

        k1, k2, k3 = jax.random.split(key, 3)
        n_full = jax.random.normal(k1, (b, d))
        vt_add = sigma_tilde_nextC * op.Vt(self._flat(et)) + std_nextC * n_full
        vt_add = jnp.where(
            cond_after[None], std_nextA * jax.random.normal(k2, (b, d)), vt_add
        )
        before_noise = _pad_rank(
            diff_sigma_b[None] * jax.random.normal(k3, (b, rank)), d
        )
        vt_add = jnp.where(cond_before[None], before_noise, vt_add)
        add_up = self._img(op.V(vt_add), x0) * jnp.sqrt(at_next)
        return x0_new, add_up

    def cal_x0(self, model_fn, xt, state, t, at, at_next, y0, key):
        et = predict_eps(model_fn, xt, t)
        x0 = predict_x0(xt, et, at)
        x0_new, add_up = self._spectral_update(x0, et, y0, at, at_next, key)
        return x0_new, add_up, state

    def get_pred_x(self, gt, y0, at_next):
        """Noise-free variational refinement (ref: ddrm.py:12-57)."""
        if self.sigma_0 == 0:
            return gt
        x0_new, _ = self._spectral_update(
            gt, jnp.zeros_like(gt), y0, at_next, at_next,
            jax.random.PRNGKey(0), with_noise=False,
        )
        return x0_new

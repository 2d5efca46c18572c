"""Barron's general & adaptive robust loss, natively in JAX.

The reference pip-installs ``robust_loss_pytorch`` (AdaptiveLossFunction,
used at /root/reference/T_NeRF_Full_2/Net_Tool_2.py:69-82 and
Eval_Tools_2.py:424-444).  This is a from-scratch implementation of the same
math ("A General and Adaptive Robust Loss Function", Barron 2019):

  rho(x, alpha, c) = (b/d) * ((  (x/c)^2 / b + 1 )^(d/2) - 1)
      with b = |alpha - 2| + eps,  d = alpha + eps (alpha >= 0 here),
  continuous in alpha with the familiar special cases
      alpha=2 -> L2/2, alpha=1 -> pseudo-Huber, alpha=0 -> Cauchy.

The *adaptive* variant treats alpha and scale as learnable per-channel
parameters trained by minimizing the negative log-likelihood of the induced
distribution:

  nll(x, alpha, c) = rho(x, alpha, c) + log c + log Z(alpha),
  Z(alpha) = integral exp(-rho(x, alpha, 1)) dx.

Z has no closed form; we tabulate log Z(alpha) once on host by numerical
quadrature with a log substitution (handles the extremely heavy tails at small
alpha) and interpolate with jnp.interp; gradients w.r.t. alpha flow through
the piecewise-linear interpolant.  alpha and scale use the same latent
parameterizations as the reference package (sigmoid-affine for alpha in
(alpha_lo, alpha_hi) with latent 0 == alpha_init; softplus-affine for scale
in (scale_lo, inf) with latent 0 == scale_init) so training dynamics match,
including the 1000x learning-rate group.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# General robust loss
# ---------------------------------------------------------------------------

def general_loss(x, alpha, scale, eps=1e-6):
    """rho(x, alpha, scale) for alpha >= 0; continuous in alpha.

    The eps-guarded single formula reproduces all special cases to O(eps):
    at alpha=2 it reduces to (x/c)^2/2, at alpha->0 to log1p((x/c)^2/2).
    """
    sq = (x / scale) ** 2
    b = jnp.abs(alpha - 2.0) + eps
    d = alpha + eps
    # expm1/log1p form of (b/d) * ((sq/b + 1)^(d/2) - 1): float32-stable for
    # small alpha (tiny exponents) where the naive power catastrophically
    # cancels, and exact in the alpha->0 Cauchy limit (b/2)*log1p(sq/b).
    return (b / d) * jnp.expm1(0.5 * d * jnp.log1p(sq / b))


# ---------------------------------------------------------------------------
# log-partition table
# ---------------------------------------------------------------------------

_TABLE_ALPHAS = None
_TABLE_LOGZ = None


def _build_partition_table(n_alpha_low=96, n_alpha_hi=416, n_u=30_000,
                           alpha_min=0.01, alpha_max=3.0, u_max=185.0):
    """Tabulate log Z(alpha) by trapezoid quadrature with x = expm1(u).

    Z(alpha) = 2 * int_0^inf exp(-rho(x, alpha, 1)) dx; with x = e^u - 1 the
    integrand exp(-rho) * e^u is well-behaved out to the x ~ e^185 tails
    needed for alpha as small as 0.01 (rho grows like |x|^alpha).
    """
    alphas = np.concatenate([
        np.linspace(alpha_min, 0.2, n_alpha_low, endpoint=False),
        np.linspace(0.2, alpha_max, n_alpha_hi),
    ])
    u = np.linspace(0.0, u_max, n_u)
    x = np.expm1(u)
    logz = np.empty_like(alphas)
    eps = 1e-6
    for i, a in enumerate(alphas):
        b = abs(a - 2.0) + eps
        d = a + eps
        with np.errstate(over="ignore"):
            rho = (b / d) * (np.power(x * x / b + 1.0, 0.5 * d) - 1.0)
        f = np.exp(np.minimum(-rho + u, 700.0))  # integrand in u-space
        z = 2.0 * np.trapezoid(f, u)
        logz[i] = np.log(z)
    return alphas, logz


def _table():
    global _TABLE_ALPHAS, _TABLE_LOGZ
    if _TABLE_ALPHAS is None:
        cache = os.path.join(os.path.dirname(__file__), "_partition_table.npz")
        if os.path.exists(cache):
            dat = np.load(cache)
            _TABLE_ALPHAS, _TABLE_LOGZ = dat["alphas"], dat["logz"]
        else:
            _TABLE_ALPHAS, _TABLE_LOGZ = _build_partition_table()
            try:
                np.savez(cache, alphas=_TABLE_ALPHAS, logz=_TABLE_LOGZ)
            except OSError:
                pass
    return _TABLE_ALPHAS, _TABLE_LOGZ


def log_partition(alpha):
    """log Z(alpha) by linear interpolation of the quadrature table."""
    alphas, logz = _table()
    a = jnp.clip(alpha, alphas[0], alphas[-1])
    return jnp.interp(a, jnp.asarray(alphas), jnp.asarray(logz))


def nll(x, alpha, scale):
    """Negative log-likelihood of the general-distribution (the adaptive
    training objective): rho + log(scale) + log Z(alpha)."""
    return general_loss(x, alpha, scale) + jnp.log(scale) + log_partition(alpha)


# ---------------------------------------------------------------------------
# Adaptive (learnable alpha/scale) parameterization
# ---------------------------------------------------------------------------

class AdaptiveCfg(NamedTuple):
    """Static bounds/inits for one adaptive loss (mirrors the constructor
    arguments used at Net_Tool_2.py:69-82)."""
    n_channels: int
    alpha_lo: float = 0.001
    alpha_hi: float = 2.99
    alpha_init: float = 2.0
    scale_lo: float = 0.01
    scale_init: float = 0.03


def init_adaptive(cfg: AdaptiveCfg):
    """Latent parameters (zeros => alpha_init / scale_init)."""
    return {
        "latent_alpha": jnp.zeros((1, cfg.n_channels), jnp.float32),
        "latent_scale": jnp.zeros((1, cfg.n_channels), jnp.float32),
    }


def alpha_of(params, cfg: AdaptiveCfg):
    """sigmoid-affine: latent 0 -> alpha_init, range (alpha_lo, alpha_hi)."""
    lo, hi, ref = cfg.alpha_lo, cfg.alpha_hi, cfg.alpha_init
    offset = jnp.log((ref - lo) / (hi - ref))  # logit of (ref-lo)/(hi-lo)
    return lo + (hi - lo) * jax.nn.sigmoid(params["latent_alpha"] + offset)


def scale_of(params, cfg: AdaptiveCfg):
    """softplus-affine: latent 0 -> scale_init, range (scale_lo, inf)."""
    lo, ref = cfg.scale_lo, cfg.scale_init
    shift = float(np.log(np.e - 1.0))  # inv_softplus(1)
    return lo + (ref - lo) * jax.nn.softplus(params["latent_scale"] + shift) / jax.nn.softplus(shift)


def adaptive_nll(params, cfg: AdaptiveCfg, x):
    """Per-element NLL under the current (alpha, scale).  x: [N, C]."""
    return nll(x, alpha_of(params, cfg), scale_of(params, cfg))


def carry_over(params, cfg: AdaptiveCfg, new_cfg: AdaptiveCfg):
    """Re-initialize latents so the *values* of alpha/scale carry into a new
    phase's loss (Net_Tool_2.py:71-78 reads mean alpha/scale of the old loss
    and passes them as the inits of the new one)."""
    a = float(jnp.mean(alpha_of(params, cfg)))
    s = float(jnp.mean(scale_of(params, cfg)))
    a = min(max(a, new_cfg.alpha_lo + 1e-4), new_cfg.alpha_hi - 1e-4)
    s = max(s, new_cfg.scale_lo + 1e-6)
    carried = new_cfg._replace(alpha_init=a, scale_init=s)
    return init_adaptive(carried), carried

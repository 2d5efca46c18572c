"""Cheap transcendental approximations for the VPU-bound SIREN trunk.

The flagship train step is sin-dominated (docs/DESIGN.md roofline: each
point evaluates ~4.8k sins; bf16 matmuls and a fused Pallas trunk both tie
XLA because the MXU and HBM are not the bottleneck).  XLA lowers ``sin`` to
a conservative full-range implementation; SIREN pre-activations are
batch-normalized to a few standard deviations, so a single round of
range reduction plus one odd minimax polynomial is exact to f32 resolution
over everything the network ever sees:

  fast_sin: x - 2*pi*rint(x/(2*pi)) -> x * P5(x^2)   (degree-11 odd poly)

Max abs error vs sin on [-pi, pi]: 1.9e-7 (below f32 ulp at 1.0); the
reduction adds |k| * ~2.8e-7 rad for |x| ~ k*2*pi, negligible for the
|x| <~ 40 range BatchNorm'd SIREN pre-activations occupy.  ~10 VPU ops
per value vs the ~25-30 of a full-range sin.

Derivative is exact-to-approximation: d/dx fast_sin = fast_cos, itself the
same polynomial shifted a quarter period, so the pair is arbitrarily
differentiable (custom_jvp composes).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_TWO_PI = 6.283185307179586
_INV_TWO_PI = 0.15915494309189535
_HALF_PI = 1.5707963267948966

# sin(x) = x * P(x^2) on [-pi, pi]; Chebyshev-interpolated polynomials of
# odd degree 11 / 9 / 7 (max abs err 1.9e-7 / 1.2e-5 / 5.0e-4).  Degree 11
# is the default: exact to f32 resolution.  Under bfloat16 trunk matmuls
# (the production compute dtype, eps ~= 7.8e-3) the lower degrees are also
# numerically invisible; FAST_SIN_DEGREE selects them for measurement.
# Measured on one v5e chip (2026-08-17, bf16 + fast_sine operating point):
# train step 32.1k / 32.4k / 32.8k rays/s and serving 163k / 176k / 171k
# rays/s at degree 11 / 9 / 7 — within ~2% (train) and run-to-run noise
# (serving, non-monotonic), i.e. once the transcendentals are polynomial
# the step is no longer sin-bound and shaving terms buys nothing worth
# giving up f32-exactness for.  Degree 11 stays the only default.
_POLYS = {
    11: (
        -2.069411010213876e-08,
        2.7087317655524043e-06,
        -0.00019817545051422297,
        0.008332788468806916,
        -0.1666662073313615,
        0.9999999370777358,
    ),
    9: (
        2.1981251565810912e-06,
        -0.00019376590195087698,
        0.008317245437921708,
        -0.16664703189391347,
        0.9999961520005721,
    ),
    7: (
        -0.00015037665051068376,
        0.008049598721057115,
        -0.16611871845097342,
        0.999833206854273,
    ),
}
_DEGREE = os.environ.get("FAST_SIN_DEGREE", "11")
if _DEGREE not in {str(d) for d in _POLYS}:
    raise ValueError(
        f"FAST_SIN_DEGREE={_DEGREE!r}: valid degrees are {sorted(_POLYS)}")
_P = _POLYS[int(_DEGREE)]


def _reduced(x):
    return x - _TWO_PI * jnp.round(x * _INV_TWO_PI)


def _poly_sin(y):
    t = y * y
    p = jnp.full_like(t, _P[0])
    for c in _P[1:]:
        p = p * t + c
    return y * p


@jax.custom_jvp
def fast_sin(x):
    """sin(x) to f32 accuracy for |x| up to ~1e3 (one-round reduction)."""
    return _poly_sin(_reduced(x))


@jax.custom_jvp
def fast_cos(x):
    return _poly_sin(_reduced(x + _HALF_PI))


@fast_sin.defjvp
def _fast_sin_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    return fast_sin(x), fast_cos(x) * dx


@fast_cos.defjvp
def _fast_cos_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    return fast_cos(x), -fast_sin(x) * dx

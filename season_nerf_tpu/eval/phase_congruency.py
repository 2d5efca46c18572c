"""2-D phase congruency (Kovesi's log-Gabor formulation), batched in JAX.

Equivalent capability to the reference's vectorized Kovesi port
(Space_Carving/mg_phase_cong.py, 1247 LoC) whose only consumer is FSIM
(mg_Img_metric.py:482-526).  This is a from-scratch implementation of the
published algorithm: a log-Gabor filter bank over the FFT, per-orientation
energy with phase-deviation weighting, noise-threshold compensation from the
smallest-scale amplitude, and a frequency-spread sigmoid weight.

The filter bank is precomputed host-side per image shape (cached); the per-
image work is batched FFTs + elementwise math — ideal XLA territory.
"""

from __future__ import annotations

import functools
import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def _filter_bank(rows: int, cols: int, nscale: int, norient: int,
                 min_wavelength: float, mult: float, sigma_onf: float):
    """[norient, nscale, rows, cols] log-Gabor transfer functions + lowpass."""
    y, x = np.meshgrid(
        (np.arange(rows) - rows // 2) / rows,
        (np.arange(cols) - cols // 2) / cols, indexing="ij")
    radius = np.sqrt(x ** 2 + y ** 2)
    radius = np.fft.ifftshift(radius)
    radius[0, 0] = 1.0
    theta = np.arctan2(-y, x)
    theta = np.fft.ifftshift(theta)
    sin_t, cos_t = np.sin(theta), np.cos(theta)

    # lowpass to kill FFT cross artifacts
    lp = np.fft.ifftshift(
        1.0 / (1.0 + (np.sqrt(x ** 2 + y ** 2) / 0.45) ** (2 * 15)))

    log_gabors = []
    for s in range(nscale):
        wavelength = min_wavelength * mult ** s
        fo = 1.0 / wavelength
        lg = np.exp(-(np.log(radius / fo) ** 2)
                    / (2 * np.log(sigma_onf) ** 2))
        lg *= lp
        lg[0, 0] = 0.0
        log_gabors.append(lg)

    spreads = []
    for o in range(norient):
        angl = o * np.pi / norient
        ds = sin_t * np.cos(angl) - cos_t * np.sin(angl)
        dc = cos_t * np.cos(angl) + sin_t * np.sin(angl)
        dtheta = np.abs(np.arctan2(ds, dc))
        dtheta = np.minimum(dtheta * norient / 2, np.pi)
        spreads.append((np.cos(dtheta) + 1) / 2)

    # return numpy: the cache must stay trace-free (a jnp constant created
    # inside one jit trace must not leak into another)
    return np.stack([[lg * sp for lg in log_gabors]
                     for sp in spreads]).astype(np.complex64)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def phase_congruency(imgs, nscale=4, norient=4, min_wavelength=6,
                     mult=2.0, sigma_onf=0.5978, k=2.0):
    """Batched phase congruency.

    imgs: [..., H, W] grayscale.  Returns PC summed over orientations,
    same leading shape.  Defaults match the reference's FSIM call
    (mg_Img_metric.py:504).
    """
    H, W = imgs.shape[-2], imgs.shape[-1]
    lead = imgs.shape[:-2]
    x = imgs.reshape((-1, H, W)).astype(jnp.float32)
    F = jnp.fft.fft2(x)
    bank = jnp.asarray(_filter_bank(H, W, nscale, int(norient),
                                    float(min_wavelength), float(mult),
                                    float(sigma_onf)))

    eps = 1e-4
    pc_sum = jnp.zeros_like(x)
    for o in range(int(norient)):
        resp = jnp.fft.ifft2(F[:, None] * bank[o][None])   # [B, S, H, W]
        e = jnp.real(resp)
        od = jnp.imag(resp)
        an = jnp.sqrt(e ** 2 + od ** 2)
        sum_e = jnp.sum(e, 1)
        sum_o = jnp.sum(od, 1)
        sum_an = jnp.sum(an, 1)
        x_energy = jnp.sqrt(sum_e ** 2 + sum_o ** 2) + eps
        mean_e = sum_e / x_energy
        mean_o = sum_o / x_energy
        # energy with phase-deviation weighting
        energy = jnp.sum(e * mean_e[:, None] + od * mean_o[:, None]
                         - jnp.abs(e * mean_o[:, None] - od * mean_e[:, None]),
                         axis=1)
        # noise threshold from the smallest-scale amplitude (Rayleigh model)
        a1 = an[:, 0]
        mean_a1 = jnp.mean(a1, axis=(-2, -1), keepdims=True)
        # total noise energy estimate across scales (geometric series)
        tot = mean_a1 * (1 - (1 / mult) ** nscale) / (1 - 1 / mult)
        noise_sigma = tot * jnp.sqrt(jnp.pi / 2) / jnp.sqrt(2.0)
        T = noise_sigma * (1 + k * jnp.sqrt((4 - jnp.pi) / jnp.pi))
        energy = jnp.maximum(energy - T, 0.0)
        # frequency-spread weighting
        max_an = jnp.max(an, 1)
        width = (sum_an / (max_an + eps) - 1) / (nscale - 1)
        weight = 1.0 / (1.0 + jnp.exp(10.0 * (0.4 - width)))
        pc_sum = pc_sum + weight * energy / (sum_an + eps)
    return pc_sum.reshape(lead + (H, W))

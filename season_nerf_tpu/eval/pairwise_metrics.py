"""Batched all-pairs image similarity metrics, jit-able.

Equivalent capability to the reference's ``Space_Carving/mg_Img_metric.py``
metric zoo (MSE/RMSE/PSNR/global-SSIM/SSIM/SAM/UQI/MS-SSIM/SRE/RASE/ERGAS/
FSIM): every function maps an image stack ``[N_sets, M, H, W, C]`` to the
pairwise score tensor ``[N_sets, M, M]`` (or ``[..., C]`` before the channel
mean).  Each carries a small-oracle test against a naive per-pair numpy
implementation (the reference does the same with sewar "_cheat" slots,
mg_Img_metric.py:144-157).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from season_nerf_tpu.eval.phase_congruency import phase_congruency


def _pairwise_diff(imgs):
    return imgs[:, :, None] - imgs[:, None, :]


def mse(imgs):
    """[N, M, H, W, C] -> [N, M, M]: mean squared error per pair."""
    return jnp.mean(_pairwise_diff(imgs) ** 2, axis=(3, 4, 5))


def rmse(imgs):
    return jnp.sqrt(mse(imgs))


def psnr(imgs, max_val=1.0, eps=1e-10):
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse(imgs), eps))


def ssim_global(imgs, max_val=1.0, k1=0.01, k2=0.03, unbiased=True):
    """Global-window SSIM per channel, channel-averaged -> [N, M, M]
    (mg_ssim/mg_ssim_v0, mg_Img_metric.py:212-303)."""
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    n_pix = imgs.shape[2] * imgs.shape[3]
    mu = jnp.mean(imgs, axis=(2, 3))                     # [N, M, C]
    ddof = 1 if unbiased else 0
    var = jnp.var(imgs, axis=(2, 3), ddof=ddof)
    cen = imgs - mu[:, :, None, None, :]
    cov = jnp.einsum("nmhwc,nkhwc->nmkc", cen, cen) / (n_pix - ddof)
    mu_i, mu_j = mu[:, :, None], mu[:, None, :]
    var_i, var_j = var[:, :, None], var[:, None, :]
    s = ((2 * mu_i * mu_j + c1) * (2 * cov + c2)
         / ((mu_i ** 2 + mu_j ** 2 + c1) * (var_i + var_j + c2)))
    return jnp.mean(s, -1)


def uqi(imgs):
    """Universal quality index == global SSIM with the same constants in the
    reference (mg_uqi, mg_Img_metric.py:337-340)."""
    return ssim_global(imgs)


def sam(imgs, eps=1e-12):
    """Spectral angle mapper: mean per-pixel arccos of the channel-vector
    cosine (mg_sam, mg_Img_metric.py:305-335)."""
    flat = imgs.reshape(imgs.shape[0], imgs.shape[1], -1, imgs.shape[-1])
    num = jnp.einsum("nmpc,nkpc->nmkp", flat, flat)
    nrm = jnp.sqrt(jnp.sum(flat ** 2, -1) + eps)
    den = nrm[:, :, None] * nrm[:, None, :]
    return jnp.mean(jnp.arccos(jnp.clip(num / den, 0.0, 1.0)), -1)


def sre(imgs, eps=1e-10):
    """Signal-to-reconstruction error in dB (mg_sre, :420-444)."""
    n_pix = imgs.shape[2] * imgs.shape[3]
    mu2 = jnp.mean(imgs, axis=(2, 3)) ** 2                # [N, M, C]
    d = _pairwise_diff(imgs)
    fro = jnp.sqrt(jnp.sum(d ** 2, axis=(3, 4))) / n_pix  # [N, M, M, C]
    fro = jnp.maximum(fro, eps)
    return 10.0 * jnp.mean(jnp.log10(mu2[:, :, None] / fro), -1)


def rase(imgs, eps=1e-10):
    """Relative average spectral error (mg_rase, :446-462)."""
    r = jnp.sqrt(jnp.mean(_pairwise_diff(imgs) ** 2, axis=(3, 4, 5)))
    m = jnp.mean(imgs, axis=(2, 3, 4))
    return r / (m[:, :, None] + eps)


def ergas(imgs, r=1.0, eps=1e-10):
    """ERGAS (mg_ERGAS, :464-480)."""
    mse_c = jnp.mean(_pairwise_diff(imgs) ** 2, axis=(3, 4))   # [N,M,M,C]
    m = jnp.mean(imgs, axis=(2, 3))                            # [N,M,C]
    return jnp.sqrt(jnp.mean(mse_c / (m[:, :, None] ** 2 + eps), -1)) * r


def ms_ssim(imgs, max_val=1.0, k1=0.01, k2=0.03,
            weights=(0.0448, 0.2856, 0.3001, 0.2363, 0.1333)):
    """Multi-scale SSIM with global-window components per scale and 2x2 box
    downsampling between scales (mg_ms_ssim, :342-403)."""
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    c3 = c2 / 2

    def components(x):
        n_pix = x.shape[2] * x.shape[3]
        mu = jnp.mean(x, axis=(2, 3))
        var = jnp.var(x, axis=(2, 3), ddof=1)
        cen = x - mu[:, :, None, None, :]
        cov = jnp.einsum("nmhwc,nkhwc->nmkc", cen, cen) / (n_pix - 1)
        mu_i, mu_j = mu[:, :, None], mu[:, None, :]
        var_i, var_j = var[:, :, None], var[:, None, :]
        lum = (2 * mu_i * mu_j + c1) / (mu_i ** 2 + mu_j ** 2 + c1)
        con = ((2 * jnp.sqrt(jnp.maximum(var_i * var_j, 0.0)) + c2)
               / (var_i + var_j + c2))
        struc = (cov + c3) / (jnp.sqrt(jnp.maximum(var_i * var_j, 0.0)) + c3)
        return lum, con, struc

    x = imgs
    val = jnp.ones((imgs.shape[0], imgs.shape[1], imgs.shape[1],
                    imgs.shape[-1]))
    lum = None
    for i, w in enumerate(weights):
        lum, con, struc = components(x)
        cs = con * struc
        val = val * jnp.sign(cs) * jnp.abs(cs) ** w
        if i != len(weights) - 1:
            H2, W2 = (x.shape[2] // 2) * 2, (x.shape[3] // 2) * 2
            x = x[:, :, :H2, :W2]
            x = (x[:, :, 0::2, 0::2] + x[:, :, 1::2, 0::2]
                 + x[:, :, 0::2, 1::2] + x[:, :, 1::2, 1::2]) / 4
    val = val * jnp.sign(lum) * jnp.abs(lum) ** weights[-1]
    return jnp.mean(val, -1)


def fsim(imgs, nscale=4, min_wavelength=6, mult=2.0, sigma_onf=0.5978):
    """Feature similarity index (mg_fsim, :482-526): phase-congruency and
    Scharr-gradient similarity maps, PC-max weighted."""
    # per-channel PC and gradients, like the reference (operates on the
    # image stack channel-wise then averages the score over channels)
    N, M, H, W, C = imgs.shape
    x = jnp.moveaxis(imgs, -1, 2).reshape(N * M * C, H, W)
    pc = phase_congruency(x, nscale=nscale, min_wavelength=min_wavelength,
                          mult=mult, sigma_onf=sigma_onf)
    pc = pc.reshape(N, M, C, H, W)

    gx = jnp.asarray([[-3, 0, 3], [-10, 0, 10], [-3, 0, 3]], jnp.float32)
    gy = gx.T

    def conv2(z, k):
        z4 = z.reshape(-1, 1, H, W)
        out = jax.lax.conv_general_dilated(
            z4, k[None, None], (1, 1), "SAME")
        return out.reshape(z.shape)

    grad = jnp.sqrt(conv2(x, gx) ** 2 + conv2(x, gy) ** 2)
    grad = grad.reshape(N, M, C, H, W)

    def sim(a, b, c):
        return (2 * a * b + c) / (a ** 2 + b ** 2 + c)

    pc_i, pc_j = pc[:, :, None], pc[:, None, :]
    g_i, g_j = grad[:, :, None], grad[:, None, :]
    s_l = sim(pc_i, pc_j, 0.85) * sim(g_i, g_j, 160.0)
    pc_max = jnp.maximum(pc_i, pc_j)
    num = jnp.sum(s_l * pc_max, axis=(-2, -1))
    den = jnp.sum(pc_max, axis=(-2, -1)) + 1e-10
    return jnp.mean(num / den, -1)


METRICS = {
    "mse": mse, "rmse": rmse, "psnr": psnr, "ssim": ssim_global,
    "uqi": uqi, "sam": sam, "sre": sre, "rase": rase, "ergas": ergas,
    "ms_ssim": ms_ssim, "fsim": fsim,
}

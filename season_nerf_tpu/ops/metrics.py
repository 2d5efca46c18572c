"""Image quality metrics, jit-able: PSNR, SSIM (global + Gaussian window).

Parity targets (see BASELINE.md): masked PSNR (Eval_funcs.py:32-34), masked
Gaussian-window SSIM 13x13 (Eval_funcs.py:48-82), and the global-window SSIM
variant used by space carving (mg_Img_metric.py:212-261).  The EM color
distance lives in :mod:`season_nerf_tpu.ops.emd`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(img, ref, mask=None, max_val=1.0):
    """Masked PSNR.  img/ref: [..., C]; mask: broadcastable boolean."""
    err = (img - ref) ** 2
    if mask is not None:
        m = mask.astype(img.dtype)
        while m.ndim < err.ndim:
            m = m[..., None]
        mse = jnp.sum(err * m) / jnp.maximum(jnp.sum(m * jnp.ones_like(err)), 1.0)
    else:
        mse = jnp.mean(err)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def ssim_global(img, ref, max_val=1.0, k1=0.01, k2=0.03):
    """Global-window SSIM over the whole image (mg_Img_metric.py:212-261's
    mg_ssim_v0): one mean/variance/covariance per image, no sliding window.
    Reduces over ALL axes — pass one image ([H, W] or [H, W, C]) at a time;
    for stacks use :func:`pairwise_ssim_global` or vmap this.
    """
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    axes = tuple(range(img.ndim))
    mu_x = jnp.mean(img, axis=axes)
    mu_y = jnp.mean(ref, axis=axes)
    var_x = jnp.var(img, axis=axes)
    var_y = jnp.var(ref, axis=axes)
    cov = jnp.mean((img - mu_x) * (ref - mu_y), axis=axes)
    return ((2 * mu_x * mu_y + c1) * (2 * cov + c2)
            / ((mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2)))


def _gaussian_kernel(size=13, sigma=1.5):
    # sigma 1.5 regardless of window size: the reference builds its window
    # via get_gaussian_kernel2d((win, win), (1.5, 1.5)) (Eval_funcs.py:49)
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    k = np.outer(g, g)
    return jnp.asarray(k, dtype=jnp.float32)


def _filter2d(img, kernel):
    """Depthwise 2-D convolution with edge-replicated ('nearest') padding —
    the reference's scipy ``convolve(..., mode="nearest")`` semantics
    (Eval_funcs.py:36-46): output is full [H, W], border windows computed on
    replicated edge pixels.  img: [H, W] or [H, W, C]."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    pad = kernel.shape[0] // 2
    img = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    x = jnp.transpose(img, (2, 0, 1))[:, None]          # [C, 1, H, W]
    k = kernel[None, None]                               # [1, 1, kh, kw]
    # HIGHEST precision: the TPU's default bf16 conv makes the SSIM
    # variance E[x^2]-E[x]^2 cancel catastrophically (den + c2 can go
    # negative -> per-window SSIM of +-14 observed in round-4 TPU evals);
    # f32-accurate convs keep TPU == CPU to float noise
    y = jax.lax.conv_general_dilated(x, k, (1, 1), "VALID",
                                     precision=jax.lax.Precision.HIGHEST)
    y = jnp.transpose(y[:, 0], (1, 2, 0))
    return y[..., 0] if squeeze else y


def ssim(img, ref, mask=None, max_val=1.0, win_size=13, sigma=1.5,
         k1=0.01, k2=0.03):
    """Masked Gaussian-window SSIM — the reference protocol exactly
    (mask_ssim, Eval_funcs.py:48-82): full-size SSIM map over
    edge-replicated windows, averaged over windows that touch NO invalid
    pixel (``mask_filter(1-mask) == 0``), NOT merely center-valid windows.
    A center-valid average would count windows whose statistics include
    filled-in invalid pixels — on renders with NaN borders those windows
    compare fill against fill and inflate the score (caught by the round-4
    reference cross-eval, tools/cross_eval_reference.py).

    img/ref: [H, W] or [H, W, C] in [0, max_val]; invalid pixels must be
    zero-filled by the caller (their values never reach the average).
    Returns the mean SSIM (scalar).
    """
    img = img.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    kern = _gaussian_kernel(win_size, sigma)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    mu_x = _filter2d(img, kern)
    mu_y = _filter2d(ref, kern)
    mu_xx = _filter2d(img * img, kern)
    mu_yy = _filter2d(ref * ref, kern)
    mu_xy = _filter2d(img * ref, kern)
    var_x = mu_xx - mu_x ** 2
    var_y = mu_yy - mu_y ** 2
    cov = mu_xy - mu_x * mu_y
    ssim_map = ((2 * mu_x * mu_y + c1) * (2 * cov + c2)
                / ((mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2)))
    if mask is None:
        return jnp.mean(ssim_map)
    # strict window validity: a window with ANY invalid pixel contributes
    # a strictly positive value to conv(1-mask), an all-valid window an
    # exact float zero (sum of zeros — no cancellation)
    invalid = 1.0 - mask.astype(jnp.float32)
    m = (_filter2d(invalid, kern) == 0.0).astype(jnp.float32)
    while m.ndim < ssim_map.ndim:
        m = m[..., None]
    return jnp.sum(ssim_map * m) / jnp.maximum(
        jnp.sum(m * jnp.ones_like(ssim_map)), 1.0)


def pairwise_ssim_global(patches, max_val=1.0, k1=0.01, k2=0.03):
    """All-pairs global-window SSIM across a stack of patches [N, H, W(, C)].

    Vectorized core of the space-carving photo-consistency score
    (mg_SC_multi.py:155-200 + mg_Img_metric.py:241): returns the [N, N]
    SSIM matrix in one shot (einsum-style moments, MXU-friendly).
    """
    n = patches.shape[0]
    flat = patches.reshape(n, -1).astype(jnp.float32)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    mu = jnp.mean(flat, axis=1)
    var = jnp.var(flat, axis=1)
    centered = flat - mu[:, None]
    # f32-accurate dot: the TPU's default bf16 precision adds ~1% noise to
    # the photo-consistency scores for no speed win off the hot path
    cov = jnp.matmul(centered, centered.T,
                     precision=jax.lax.Precision.HIGHEST) / flat.shape[1]
    mu_i, mu_j = mu[:, None], mu[None, :]
    var_i, var_j = var[:, None], var[None, :]
    return ((2 * mu_i * mu_j + c1) * (2 * cov + c2)
            / ((mu_i ** 2 + mu_j ** 2 + c1) * (var_i + var_j + c2)))

"""Pairwise metric oracles: each batched metric vs a naive per-pair numpy
implementation (the reference's `_cheat` strategy, mg_Img_metric.py:144-157)."""

import numpy as np
import jax.numpy as jnp
import pytest

from season_nerf_tpu.eval import pairwise_metrics as pm
from season_nerf_tpu.eval.phase_congruency import phase_congruency


@pytest.fixture(scope="module")
def stack():
    """Structured base (edges + gradient — phase congruency needs features,
    not pure noise) with increasing noise levels."""
    rng = np.random.default_rng(0)
    y, x = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 32),
                       indexing="ij")
    base = np.stack([0.2 + 0.6 * (x > 0.5), 0.3 + 0.5 * y,
                     0.4 + 0.3 * np.sin(6 * x) * np.cos(4 * y)], -1)
    base = np.clip(base, 0.05, 0.95)
    imgs = np.stack([np.clip(base + rng.normal(0, s, base.shape), 0, 1)
                     for s in (0.0, 0.05, 0.2, 0.5)])
    return jnp.asarray(imgs[None].astype(np.float32))   # [1, 4, 32, 32, 3]


def test_mse_psnr_oracle(stack):
    x = np.asarray(stack)[0]
    got_mse = np.asarray(pm.mse(stack))[0]
    got_psnr = np.asarray(pm.psnr(stack))[0]
    for i in range(4):
        for j in range(4):
            want = np.mean((x[i] - x[j]) ** 2)
            np.testing.assert_allclose(got_mse[i, j], want, rtol=1e-5)
            if want > 1e-10:
                np.testing.assert_allclose(
                    got_psnr[i, j], 10 * np.log10(1.0 / want), rtol=1e-4)


def test_ssim_global_oracle(stack):
    x = np.asarray(stack)[0].astype(np.float64)
    got = np.asarray(pm.ssim_global(stack))[0]
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    n = x.shape[1] * x.shape[2]
    for i in range(4):
        for j in range(4):
            vals = []
            for c in range(3):
                a, b = x[i, :, :, c], x[j, :, :, c]
                mu_a, mu_b = a.mean(), b.mean()
                va, vb = a.var(ddof=1), b.var(ddof=1)
                cov = ((a - mu_a) * (b - mu_b)).sum() / (n - 1)
                vals.append((2 * mu_a * mu_b + c1) * (2 * cov + c2)
                            / ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)))
            np.testing.assert_allclose(got[i, j], np.mean(vals), rtol=1e-4)


def test_sam_oracle(stack):
    x = np.asarray(stack)[0].astype(np.float64)
    got = np.asarray(pm.sam(stack))[0]
    a = x[1].reshape(-1, 3)
    b = x[2].reshape(-1, 3)
    eps = 1e-12
    na = np.sqrt((a ** 2).sum(1) + eps)
    nb = np.sqrt((b ** 2).sum(1) + eps)
    cosv = np.clip((a * b).sum(1) / (na * nb), 0, 1)
    np.testing.assert_allclose(got[1, 2], np.arccos(cosv).mean(), rtol=1e-4)


def test_rase_ergas_sre_oracle(stack):
    x = np.asarray(stack)[0].astype(np.float64)
    i, j = 0, 2
    got_rase = np.asarray(pm.rase(stack))[0, i, j]
    want_rase = np.sqrt(np.mean((x[i] - x[j]) ** 2)) / x[i].mean()
    np.testing.assert_allclose(got_rase, want_rase, rtol=1e-4)

    got_ergas = np.asarray(pm.ergas(stack))[0, i, j]
    mse_c = np.mean((x[i] - x[j]) ** 2, (0, 1))
    m_c = np.mean(x[i], (0, 1))
    want_ergas = np.sqrt(np.mean(mse_c / m_c ** 2))
    np.testing.assert_allclose(got_ergas, want_ergas, rtol=1e-4)

    got_sre = np.asarray(pm.sre(stack))[0, i, j]
    n = x.shape[1] * x.shape[2]
    vals = []
    for c in range(3):
        num = np.mean(x[i, :, :, c]) ** 2
        den = np.linalg.norm(x[i, :, :, c] - x[j, :, :, c]) / n
        vals.append(np.log10(num / max(den, 1e-10)))
    np.testing.assert_allclose(got_sre, 10 * np.mean(vals), rtol=1e-4)


def test_metric_orderings(stack):
    """Similarity metrics must rank the less-noisy pair higher, error
    metrics lower."""
    for name in ["ssim", "ms_ssim", "fsim", "psnr", "sre"]:
        m = np.asarray(pm.METRICS[name](stack))[0]
        assert m[0, 1] > m[0, 3], name
    for name in ["mse", "rmse", "sam", "rase", "ergas"]:
        m = np.asarray(pm.METRICS[name](stack))[0]
        assert m[0, 1] < m[0, 3], name


def test_diagonal_identity(stack):
    np.testing.assert_allclose(np.diagonal(np.asarray(pm.mse(stack))[0]), 0,
                               atol=1e-10)
    d = np.diagonal(np.asarray(pm.ssim_global(stack))[0])
    np.testing.assert_allclose(d, 1.0, atol=1e-5)
    d = np.diagonal(np.asarray(pm.fsim(stack))[0])
    np.testing.assert_allclose(d, 1.0, atol=1e-5)


def test_phase_congruency_edges():
    """A step edge produces high PC along the edge, low in flat regions."""
    img = np.zeros((64, 64), np.float32)
    img[:, 32:] = 1.0
    pc = np.asarray(phase_congruency(jnp.asarray(img[None])))[0]
    edge = pc[:, 28:36].mean()
    flat = pc[:, 4:20].mean()
    assert edge > 5 * max(flat, 1e-6)

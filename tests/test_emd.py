"""EMD tests: exact LP vs cv.EMD oracle (the C++ implementation the
reference calls), Sinkhorn convergence, signature invariants."""

import numpy as np
import pytest

from season_nerf_tpu.eval import emd


def _rand_img(seed, shift=0.0):
    rng = np.random.default_rng(seed)
    img = rng.random((24, 24, 3)) * 0.6 + shift
    return np.clip(img, 0, 1)


def test_signature_mass_and_shape():
    sig = emd.color_signature(_rand_img(0), bins_per_edge=6, space="rgb")
    assert sig.shape[1] == 4
    np.testing.assert_allclose(sig[:, 3].sum(), 1.0, atol=1e-9)
    assert (sig[:, :3] >= 0).all() and (sig[:, :3] <= 1).all()


def test_emd_identity_zero():
    sig = emd.color_signature(_rand_img(1), bins_per_edge=5, space="rgb")
    assert emd.emd_exact(sig, sig) < 1e-9


def test_emd_exact_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    s1 = emd.color_signature(_rand_img(2), bins_per_edge=5, space="rgb")
    s2 = emd.color_signature(_rand_img(3, shift=0.3), bins_per_edge=5, space="rgb")
    ours = emd.emd_exact(s1, s2, metric="l1")
    o1 = np.concatenate([s1[:, 3:], s1[:, :3]], 1).astype(np.float32)
    o2 = np.concatenate([s2[:, 3:], s2[:, :3]], 1).astype(np.float32)
    ref, _, _ = cv2.EMD(o1, o2, cv2.DIST_L1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_emd_shift_scales_with_distance():
    base = _rand_img(4)
    d_small = emd.compare_em_imgs(base, np.clip(base + 0.1, 0, 1),
                                  bins_per_edge=5, space="rgb")
    d_large = emd.compare_em_imgs(base, np.clip(base + 0.35, 0, 1),
                                  bins_per_edge=5, space="rgb")
    assert 0 < d_small < d_large


def test_sinkhorn_approximates_exact():
    s1 = emd.color_signature(_rand_img(5), bins_per_edge=4, space="rgb")
    s2 = emd.color_signature(_rand_img(6, shift=0.2), bins_per_edge=4, space="rgb")
    exact = emd.emd_exact(s1, s2)
    approx = emd.emd_sinkhorn(s1[:, 3], s1[:, :3], s2[:, 3], s2[:, :3],
                              reg=0.002, n_iters=2000)
    np.testing.assert_allclose(approx, exact, rtol=0.05)


def test_sinkhorn_batch_matches_pairs_and_ignores_padding():
    """One vmap dispatch over P padded pairs == per-pair results; zero-weight
    padding rows must not move the distance."""
    sigs = [emd.color_signature(_rand_img(seed, shift=0.05 * seed),
                                bins_per_edge=4) for seed in range(4)]
    W, X = emd.pad_signatures(sigs)
    assert W.shape[0] == 4 and X.shape[2] == 3
    ia, ib = np.triu_indices(4, k=1)
    batch = emd.emd_sinkhorn_batch(W[ia], X[ia], W[ib], X[ib],
                                   reg=0.002, n_iters=2000)
    assert batch.shape == (len(ia),)
    for p, (a, b) in enumerate(zip(ia, ib)):
        exact = emd.emd_exact(sigs[a], sigs[b])
        np.testing.assert_allclose(batch[p], exact, rtol=0.05, atol=5e-3)
    # padding invariance: extra zero-weight rows leave the value unchanged
    W2 = np.concatenate([W, np.zeros((4, 7))], 1)
    X2 = np.concatenate([X, np.zeros((4, 7, 3))], 1)
    batch2 = emd.emd_sinkhorn_batch(W2[ia], X2[ia], W2[ib], X2[ib],
                                    reg=0.002, n_iters=2000)
    np.testing.assert_allclose(batch2, batch, rtol=1e-4, atol=1e-6)

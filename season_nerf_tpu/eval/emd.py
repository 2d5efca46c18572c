"""Color-distribution Earth-Mover's distance.

Equivalent capability to the reference's ``all_NeRF/mg_EM_Imgs.py``:
histogram signatures (bin centroids + mass, nearby bins merged, tiny bins
pruned keeping >=95% of the mass, get_Sig_advanced:34-101) compared by exact
EMD under an L1 ground distance (EM_sig_Compare:158-163 uses cv.EMD with
DIST_L1).

Differences by design: the signature builder uses bincount accumulation and
union-find connected-component merging (vectorized) instead of the
reference's binned_statistic_dd + greedy set merging; the transport problem
is solved exactly by scipy's HiGHS LP instead of OpenCV's C++ EMD (validated
against cv.EMD in tests), with a JAX Sinkhorn solver for the batched
season-stability matrices where hundreds of pairs are compared at once.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Signatures
# ---------------------------------------------------------------------------

# OpenCV COLOR_RGB2LAB float semantics (no sRGB companding on the float
# path; D65 white).  The reference builds its signatures in this space
# (mg_EM_Imgs.py:220-230) so EM values are L1 distances in LAB units.
_RGB2XYZ_D65 = np.array([[0.412453, 0.357580, 0.180423],
                         [0.212671, 0.715160, 0.072169],
                         [0.019334, 0.119193, 0.950227]])
_D65_WHITE = np.array([0.950456, 1.0, 1.088754])
# per-axis LAB ranges the reference bins over (mg_EM_Imgs.py:226-227)
LAB_RANGES = ((0.0, 100.0), (-127.0, 127.0), (-127.0, 127.0))
LAB_BIN_SIZE = 12.5


def rgb_to_lab(rgb: np.ndarray) -> np.ndarray:
    """[..., 3] RGB in [0, 1] -> CIE LAB, matching cv2.cvtColor's float
    RGB2Lab (L in [0, 100], a/b in about [-127, 127]); oracle-tested
    against cv2 when available."""
    x = np.asarray(rgb, np.float64)
    # sRGB inverse companding (cv2's float path linearizes before XYZ)
    x = np.where(x > 0.04045, ((x + 0.055) / 1.055) ** 2.4, x / 12.92)
    xyz = x @ _RGB2XYZ_D65.T / _D65_WHITE
    thr = 0.008856

    def f(t):
        return np.where(t > thr, np.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = f(xyz[..., 0]), f(xyz[..., 1]), f(xyz[..., 2])
    L = np.where(xyz[..., 1] > thr, 116.0 * fy - 16.0, 903.3 * xyz[..., 1])
    return np.stack([L, 500.0 * (fx - fy), 200.0 * (fy - fz)], -1)


def color_signature(img: np.ndarray, bins_per_edge: int = 8,
                    dist_thresh: Optional[float] = None,
                    prune_thresh: float = 0.001,
                    value_range: Tuple[float, float] = (0.0, 1.0),
                    space: str = "lab"):
    """[..., 3] image -> signature [K, 4] rows (cx, cy, cz, weight).

    Uniform 3-D histogram, per-bin mean color as centroid, bins whose
    centroids are within ``dist_thresh`` merged (union-find over the KD-tree
    neighbor graph), bins below ``prune_thresh`` mass dropped, weights
    renormalized to sum 1.

    ``space="lab"`` (default) is the reference protocol (get_Sig,
    mg_EM_Imgs.py:236-316): RGB converted to LAB, per-axis bin edges
    ``linspace(lo, hi, int((hi-lo)/12.5)+1)``, merge radius = mean of the
    half bin widths — EM values come out in LAB-unit L1 distance,
    comparable to the reference's cv.EMD numbers.  ``space="rgb"`` bins the
    raw values over ``value_range`` (the pre-round-4 behavior; EM is then
    in color-cube units, ~80x smaller).
    """
    x = np.asarray(img, np.float64).reshape(-1, 3)
    x = x[np.isfinite(x).all(axis=1)]
    if space == "lab":
        x = rgb_to_lab(x)
        edges_n = [int((hi - lo) / LAB_BIN_SIZE) + 1 for lo, hi in LAB_RANGES]
        n_per_axis = [max(n - 1, 1) for n in edges_n]
        widths = [(hi - lo) / n
                  for (lo, hi), n in zip(LAB_RANGES, n_per_axis)]
        q = np.stack([
            np.clip(((x[:, c] - lo) / w_).astype(int), 0, n - 1)
            for c, ((lo, _hi), w_, n) in enumerate(
                zip(LAB_RANGES, widths, n_per_axis))], 1)
        flat = (q[:, 0] * n_per_axis[1] + q[:, 1]) * n_per_axis[2] + q[:, 2]
        n_bins = int(np.prod(n_per_axis))
        if dist_thresh is None:
            dist_thresh = float(np.mean([w_ / 2 for w_ in widths]))
    else:
        lo, hi = value_range
        q = np.clip(((x - lo) / (hi - lo) * bins_per_edge).astype(int),
                    0, bins_per_edge - 1)
        flat = (q[:, 0] * bins_per_edge + q[:, 1]) * bins_per_edge + q[:, 2]
        n_bins = bins_per_edge ** 3
        if dist_thresh is None:
            dist_thresh = (hi - lo) / bins_per_edge
    counts = np.bincount(flat, minlength=n_bins).astype(np.float64)
    sums = np.stack([np.bincount(flat, weights=x[:, c], minlength=n_bins)
                     for c in range(3)], 1)
    good = counts > 0
    cent = sums[good] / counts[good][:, None]
    w = counts[good]
    if cent.shape[0] > 1 and dist_thresh > 0:
        from scipy.spatial import cKDTree
        tree = cKDTree(cent)
        pairs = tree.query_pairs(dist_thresh, output_type="ndarray")
        parent = np.arange(cent.shape[0])

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        roots = np.array([find(i) for i in range(cent.shape[0])])
        uniq, inv = np.unique(roots, return_inverse=True)
        w_m = np.bincount(inv, weights=w)
        cent_m = np.stack([np.bincount(inv, weights=cent[:, c] * w)
                           for c in range(3)], 1) / w_m[:, None]
        cent, w = cent_m, w_m

    w = w / w.sum()
    keep = w >= prune_thresh
    if w[keep].sum() < 0.95:
        # keep enough mass: relax pruning to the largest bins covering 95%
        order = np.argsort(-w)
        cum = np.cumsum(w[order])
        k = np.searchsorted(cum, 0.95) + 1
        keep = np.zeros_like(keep)
        keep[order[:k]] = True
    cent, w = cent[keep], w[keep]
    w = w / w.sum()
    return np.concatenate([cent, w[:, None]], 1)


# ---------------------------------------------------------------------------
# Exact EMD (LP) and Sinkhorn
# ---------------------------------------------------------------------------

def _ground_distance(x1, x2, metric="l1"):
    d = x1[:, None, :] - x2[None, :, :]
    if metric == "l1":
        return np.abs(d).sum(-1)
    if metric == "l2":
        return np.sqrt((d ** 2).sum(-1))
    raise ValueError(metric)


def emd_exact(sig1: np.ndarray, sig2: np.ndarray, metric: str = "l1") -> float:
    """Exact EMD between two signatures [K, 4] (centroid xyz + weight):
    the optimal-transport LP solved with HiGHS.  Matches cv.EMD(DIST_L1)."""
    from scipy.optimize import linprog
    w1 = sig1[:, 3] / sig1[:, 3].sum()
    w2 = sig2[:, 3] / sig2[:, 3].sum()
    C = _ground_distance(sig1[:, :3], sig2[:, :3], metric)
    m, n = C.shape
    # flow f >= 0, row sums = w1, col sums = w2
    A_eq = np.zeros((m + n, m * n))
    for i in range(m):
        A_eq[i, i * n:(i + 1) * n] = 1
    for j in range(n):
        A_eq[m + j, j::n] = 1
    b_eq = np.concatenate([w1, w2])
    res = linprog(C.reshape(-1), A_eq=A_eq[:-1], b_eq=b_eq[:-1],
                  bounds=(0, None), method="highs")
    assert res.success, res.message
    return float(res.fun)


import functools


@functools.lru_cache(maxsize=8)
def _batched_sinkhorn_fn(metric: str, reg: float, n_iters: int):
    """jit(vmap(log-domain Sinkhorn)) — one compile per padded signature
    size; cached so repeat calls reuse the executable."""
    import jax
    import jax.numpy as jnp

    def one(w1, x1, w2, x2):
        # zero-weight rows are padding: their log-mass is ~-69, so their
        # potentials push no plan mass (P row/col ~ 1e-30) and the padded
        # centroid values are irrelevant to the cost
        w1 = w1 / jnp.sum(w1)
        w2 = w2 / jnp.sum(w2)
        d = x1[:, None, :] - x2[None, :, :]
        C = (jnp.abs(d).sum(-1) if metric == "l1"
             else jnp.sqrt((d ** 2).sum(-1) + 1e-12))
        # reg is relative to the pair's cost scale, so convergence behavior
        # is invariant to the signature units (RGB-cube ~1 vs LAB ~300)
        scale = jnp.maximum(jnp.max(C), 1e-12)
        logK = -(C / scale) / reg
        log_w1 = jnp.log(w1 + 1e-30)
        log_w2 = jnp.log(w2 + 1e-30)

        def body(carry, _):
            f, g = carry
            f = log_w1 - jax.scipy.special.logsumexp(
                logK + g[None, :], axis=1)
            g = log_w2 - jax.scipy.special.logsumexp(
                logK + f[:, None], axis=0)
            return (f, g), None

        (f, g), _ = jax.lax.scan(body, (jnp.zeros_like(log_w1),
                                        jnp.zeros_like(log_w2)), None,
                                 length=n_iters)
        P = jnp.exp(f[:, None] + logK + g[None, :])
        return jnp.sum(P * C)

    return jax.jit(jax.vmap(one))


def pad_signatures(sigs):
    """List of [K_i, 4] signatures -> (weights [N, K_max], centroids
    [N, K_max, 3]) zero-padded for the batched Sinkhorn solver."""
    k_max = max(s.shape[0] for s in sigs)
    W = np.zeros((len(sigs), k_max))
    X = np.zeros((len(sigs), k_max, 3))
    for i, s in enumerate(sigs):
        W[i, :s.shape[0]] = s[:, 3]
        X[i, :s.shape[0]] = s[:, :3]
    return W, X


def emd_sinkhorn_batch(w1, x1, w2, x2, metric="l1", reg=0.005,
                       n_iters=500) -> np.ndarray:
    """[P] EM distances for P signature pairs in ONE device dispatch.

    w1/w2: [P, K] weights (zero rows = padding, see :func:`pad_signatures`);
    x1/x2: [P, K, 3] centroids.  This is the batching the pairwise
    season-stability matrices need — per-pair eager dispatch with a host
    sync each is orders of magnitude slower."""
    import jax.numpy as jnp
    fn = _batched_sinkhorn_fn(metric, float(reg), int(n_iters))
    return np.asarray(fn(jnp.asarray(w1), jnp.asarray(x1),
                         jnp.asarray(w2), jnp.asarray(x2)))


def emd_sinkhorn(w1, x1, w2, x2, metric="l1", reg=0.005, n_iters=500):
    """Entropy-regularized OT (log-domain Sinkhorn) for one signature pair.
    Converges to the exact EMD as reg -> 0.  Pairs of different sizes
    trigger a recompile — batch via :func:`emd_sinkhorn_batch` instead."""
    return float(emd_sinkhorn_batch(
        np.asarray(w1)[None], np.asarray(x1)[None],
        np.asarray(w2)[None], np.asarray(x2)[None],
        metric=metric, reg=reg, n_iters=n_iters)[0])


def compare_em_imgs(img1, img2, bins_per_edge=8, metric="l1",
                    exact=True, **sig_kw) -> float:
    """EM distance between the color distributions of two images
    (EM_img_Compare / compare_EM_imgs equivalents)."""
    s1 = color_signature(img1, bins_per_edge, **sig_kw)
    s2 = color_signature(img2, bins_per_edge, **sig_kw)
    if exact:
        return emd_exact(s1, s2, metric)
    return emd_sinkhorn(s1[:, 3], s1[:, :3], s2[:, 3], s2[:, :3], metric)

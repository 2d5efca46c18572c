"""Space-carving DSM prior: plane-sweep photo-consistency, TPU-vectorized.

What the reference does (Space_Carving/mg_SC_multi.py + mg_wrapper.py): for
every (x, y) voxel column and every height z, warp a small patch of each
training image onto the cell footprint (via per-cell homographies), score
all-pairs global-window SSIM across images, take the mean pairwise score as
the cell's photo-consistency; then extract a height map from the score
volume by an alpha-expansion graph cut with truncated-linear smoothness
(mg_3d_to_dist.py), normalized to [-1, 1].

TPU redesign: the per-cell Python loop and per-cell homography fits
disappear.  A projective camera maps *points* linearly, so instead of
fitting 3x3 homographies per (cell, image) (find_Homography_multi,
mg_SC_multi.py:88-107) we directly project every patch sample point of every
cell through every camera in one batched matmul and gather bilinearly from a
padded image stack.  Pairwise SSIM becomes a batched moment computation +
one [M, M] matmul per cell block (MXU-friendly).  The sweep runs z-slice by
z-slice under jit with fixed shapes.

The graph cut runs on host via the native alpha-expansion solver
(native/graph_cut.cc) — one call per site, off the training path.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from season_nerf_tpu.priors import graph_cut as gc


DEFAULT_VOXEL = (2.0, 2.0, 0.25)   # meters (mg_wrapper.py:10)


def model_grid_from_bounds(bounds_lla: np.ndarray,
                           voxel=DEFAULT_VOXEL) -> Tuple[int, int, int]:
    """(nx, ny, nz) grid covering the site at the given metric voxel size
    (get_model_size, mg_SC_multi.py:10-17): haversine extents / voxel."""
    from season_nerf_tpu.geometry.units import lat_lon_to_meters
    lat0, lat1 = bounds_lla[0]
    lon0, lon1 = bounds_lla[1]
    h0, h1 = bounds_lla[2]
    mid_lat, mid_lon = (lat0 + lat1) / 2, (lon0 + lon1) / 2
    dy = lat_lon_to_meters(lat0, mid_lon, lat1, mid_lon)
    dx = lat_lon_to_meters(mid_lat, lon0, mid_lat, lon1)
    return (max(int(dy / voxel[0]), 2), max(int(dx / voxel[1]), 2),
            max(int((h1 - h0) / voxel[2]), 2))


def _pad_images(images: List[np.ndarray]):
    hmax = max(im.shape[0] for im in images)
    wmax = max(im.shape[1] for im in images)
    stack = np.zeros((len(images), hmax, wmax, 3), np.float32)
    for i, im in enumerate(images):
        stack[i, :im.shape[0], :im.shape[1]] = im[..., :3]
    return stack


@functools.partial(jax.jit, static_argnums=(3, 4))
def _score_slice(img_stack, Ps, cell_pts, patch, n_cells):
    """Photo-consistency scores for one z-slice of cells.

    img_stack: [M, H, W, 3] padded images.
    Ps: [M, 3, 4] projective cameras (row, col, w).
    cell_pts: [n_cells, patch*patch, 3] world sample points.
    Returns [n_cells] mean pairwise global-SSIM across the M views.
    """
    M = img_stack.shape[0]
    H, W = img_stack.shape[1], img_stack.shape[2]
    pts_h = jnp.concatenate(
        [cell_pts, jnp.ones(cell_pts.shape[:-1] + (1,))], -1)   # [C,P2,4]
    # project: [M, C, P2, 3]
    proj = jnp.einsum("mij,cpj->mcpi", Ps, pts_h)
    rr = proj[..., 0] / proj[..., 2]
    cc = proj[..., 1] / proj[..., 2]
    rr = jnp.clip(rr, 0.0, H - 1.001)
    cc = jnp.clip(cc, 0.0, W - 1.001)
    r0 = jnp.floor(rr).astype(jnp.int32)
    c0 = jnp.floor(cc).astype(jnp.int32)
    fr = (rr - r0)[..., None]
    fc = (cc - c0)[..., None]
    m_idx = jnp.arange(M)[:, None, None]

    def at(dr, dc):
        return img_stack[m_idx, r0 + dr, c0 + dc]    # [M,C,P2,3]

    patch_vals = ((1 - fr) * (1 - fc) * at(0, 0) + (1 - fr) * fc * at(0, 1)
                  + fr * (1 - fc) * at(1, 0) + fr * fc * at(1, 1))
    # global-window SSIM over the patch (flatten pixels x channels), all
    # pairs of views (pairwise_ssim_global math, mg_Img_metric.py:212-261)
    flat = patch_vals.reshape(M, n_cells, -1)                   # [M,C,K]
    K = flat.shape[-1]
    mu = jnp.mean(flat, axis=-1)                                # [M,C]
    var = jnp.var(flat, axis=-1)
    cen = flat - mu[..., None]
    # pairwise covariance per cell: [C, M, M]
    cov = jnp.einsum("mck,nck->cmn", cen, cen) / K
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu_i = mu.T[:, :, None]
    mu_j = mu.T[:, None, :]
    var_i = var.T[:, :, None]
    var_j = var.T[:, None, :]
    ssim = ((2 * mu_i * mu_j + c1) * (2 * cov + c2)
            / ((mu_i ** 2 + mu_j ** 2 + c1) * (var_i + var_j + c2)))
    # mean over off-diagonal pairs: (sum - M * ideal[=1]) / (M (M-1))
    total = jnp.sum(ssim, axis=(1, 2))
    return (total - jnp.trace(ssim, axis1=1, axis2=2)) / (M * (M - 1))


def plane_sweep_scores(cameras, images, grid_size, patch: int = 5,
                       cell_chunk: int = 4096, z_range=(-1.0, 1.0)):
    """Score volume [nx, ny, nz] of photo-consistency over the cube.

    cameras: scaled Camera objects (cube coords); images: matching arrays.
    """
    nx, ny, nz = grid_size
    img_stack = jnp.asarray(_pad_images(images))
    Ps = jnp.asarray(np.stack([c.P for c in cameras]).astype(np.float32))

    xs = np.linspace(-1, 1, nx + 1)
    ys = np.linspace(-1, 1, ny + 1)
    zs = np.linspace(z_range[0], z_range[1], nz)
    # patch offsets inside a cell, in cell-fraction units
    fr = (np.arange(patch) + 0.5) / patch
    off = np.stack(np.meshgrid(fr, fr, indexing="ij"), -1).reshape(-1, 2)

    # cell corner origin + extent
    cx0 = np.repeat(xs[:-1], ny)
    cy0 = np.tile(ys[:-1], nx)
    dx = xs[1] - xs[0]
    dy = ys[1] - ys[0]
    base_xy = np.stack([cx0[:, None] + off[None, :, 0] * dx,
                        cy0[:, None] + off[None, :, 1] * dy], -1)  # [C,P2,2]
    n_cells_total = base_xy.shape[0]

    scores = np.zeros((nx * ny, nz), np.float32)
    for zi, z in enumerate(zs):
        for s in range(0, n_cells_total, cell_chunk):
            blk = base_xy[s:s + cell_chunk]
            pad = cell_chunk - blk.shape[0]
            if pad:
                blk = np.concatenate([blk, np.repeat(blk[-1:], pad, 0)], 0)
            pts = np.concatenate(
                [blk, np.full(blk.shape[:-1] + (1,), z, np.float32)], -1)
            out = np.asarray(_score_slice(
                img_stack, Ps, jnp.asarray(pts, jnp.float32), patch,
                cell_chunk))
            scores[s:s + cell_chunk - pad, zi] = out[:cell_chunk - pad]
    return scores.reshape(nx, ny, nz)


def scores_to_heightmap(scores: np.ndarray, smooth_height: float = 1.0 / 3.0,
                        max_cycles: int = 3) -> np.ndarray:
    """Score volume -> height map in [-1, 1] via graph cut
    (energy_min_H_map, mg_3d_to_dist.py:33-40): data cost = -score shifted
    nonnegative, truncated-linear label smoothness, labels normalized."""
    data = -scores
    data -= data.min()
    sm = gc.truncated_linear_costs(scores.shape[2], height=smooth_height)
    labels, _ = gc.aexpansion_grid(data.astype(np.float32), sm,
                                   max_cycles=max_cycles)
    # /nz (not /(nz-1)) is the reference's own normalization
    # (mg_wrapper.py:37: energy_min_H_map(...)*2-1 with labels/H_map.shape[2],
    # mg_3d_to_dist.py:40) — kept for parity even though the sweep's z grid
    # is linspace(-1,1,nz): the top slice maps to 1-2/nz, a deliberate
    # one-voxel conservative bias the trust-annealed prior absorbs
    return (labels.astype(np.float32) / scores.shape[2]) * 2.0 - 1.0


def space_carve_dsm(cameras, images, grid_size=None, bounds_lla=None,
                    voxel=DEFAULT_VOXEL, patch: int = 5,
                    cache_path: Optional[str] = None) -> np.ndarray:
    """Full space-carving pipeline -> training DSM prior in [-1, 1]
    (get_DSM_SC, mg_wrapper.py:13-40), cached like the reference's
    SC_<site>_hm.npy."""
    if cache_path and os.path.exists(cache_path):
        return np.load(cache_path)
    if grid_size is None:
        if bounds_lla is not None:
            grid_size = model_grid_from_bounds(bounds_lla, voxel)
        else:
            grid_size = (64, 64, 32)
    scores = plane_sweep_scores(cameras, images, grid_size, patch=patch)
    hm = scores_to_heightmap(scores)
    if cache_path:
        np.save(cache_path, hm)
    return hm


def get_dsm(mode: str, cameras, images, gt_dsm=None, **kw):
    """DSM-prior dispatch (mg_get_DSM.py:7-30): Space_Carve / LiDAR / None."""
    if mode == "Space_Carve":
        return space_carve_dsm(cameras, images, **kw)
    if mode == "LiDAR":
        assert gt_dsm is not None, "LiDAR mode needs the ground-truth DSM"
        return np.asarray(gt_dsm)
    if mode in ("None", None):
        return None
    raise ValueError(f"unknown DSM mode {mode!r} (Stereo is unimplemented "
                     "in the reference too, mg_get_DSM.py:17)")

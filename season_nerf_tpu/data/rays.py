"""Ray-table precompute: cameras -> one flat [N, 22] array.

TPU-first replacement for the reference's per-pixel Python loops + pickle
caches (mg_Pt_holder.py:109-207 building per-image ``basic_NeRF_info``
pickles, then NN_loaders/mg_Color_Loader.py:41-89 flattening them into a
22-dim row tensor).  Here the whole table is built vectorized in one pass
and cached as a single ``.npz``.

Row layout (kept identical to mg_run_NeRF.py:122-133 data_to_dict):
  [0:2]   img_pt (row, col)
  [2:5]   ray top (cube coords, z=+1)
  [5:8]   ray bot (cube coords, z=-1)
  [8:11]  view direction (unit, top->bot)
  [11:14] sun direction (unit)
  [14:18] time encoding (cos/sin year frac, cos/sin day frac)
  [18:19] sample weight
  [19:22] GT color (RGB in [0,1])
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

RAY_DIM = 22


@dataclass
class RayTable:
    """Flat per-ray training table + per-image bookkeeping."""
    rows: np.ndarray            # [N, 22] float32
    img_ids: np.ndarray         # [N] int32, index into img_names
    img_names: list             # list[str]
    img_sizes: np.ndarray       # [M, 2] int32 (downscaled sizes)
    sun_vecs: np.ndarray        # [M, 3] per-image sun dirs (solar-ray pool)
    time_encs: np.ndarray       # [M, 4]

    def __len__(self):
        return self.rows.shape[0]

    def split(self, ids):
        m = np.isin(self.img_ids, ids)
        remap = {old: new for new, old in enumerate(ids)}
        return RayTable(self.rows[m],
                        np.array([remap[i] for i in self.img_ids[m]], np.int32),
                        [self.img_names[i] for i in ids],
                        self.img_sizes[ids], self.sun_vecs[ids], self.time_encs[ids])

    def save(self, path):
        np.savez_compressed(path, rows=self.rows, img_ids=self.img_ids,
                            img_names=np.array(self.img_names),
                            img_sizes=self.img_sizes, sun_vecs=self.sun_vecs,
                            time_encs=self.time_encs)

    @classmethod
    def load(cls, path):
        d = np.load(path, allow_pickle=False)
        return cls(d["rows"], d["img_ids"], [str(s) for s in d["img_names"]],
                   d["img_sizes"], d["sun_vecs"], d["time_encs"])


def rays_from_image(cam, image, downscale=1, weight=1.0,
                    bounds=((-1, 1), (-1, 1), (-1, 1))):
    """Rays for one (scaled) camera + its image.  Returns [n, 22] rows."""
    img_pts, tops, bots, valid = cam.pixel_rays(downscale=downscale, bounds=bounds)
    img_pts, tops, bots = img_pts[valid], tops[valid], bots[valid]
    colors = image[img_pts[:, 0] * downscale, img_pts[:, 1] * downscale]
    view = bots - tops
    view = view / np.sqrt(np.sum(view ** 2, 1, keepdims=True))
    n = tops.shape[0]
    rows = np.empty((n, RAY_DIM), np.float32)
    rows[:, 0:2] = img_pts
    rows[:, 2:5] = tops
    rows[:, 5:8] = bots
    rows[:, 8:11] = view
    rows[:, 11:14] = cam.sun_vec
    rows[:, 14:18] = cam.time_enc
    rows[:, 18] = weight
    rows[:, 19:22] = colors[:, :3]
    return rows


def build_ray_table(cams, images, downscales=None, weights=None,
                    cache_path=None, use_hsluv=False) -> RayTable:
    """Vectorized ray precompute over a list of scaled cameras + images.
    ``use_hsluv`` stores HSLuv-normalized GT colors (the use_HSLuv flag,
    NN_loaders/mg_Color_Loader.py:27-29)."""
    if cache_path and os.path.exists(cache_path):
        return RayTable.load(cache_path)
    downscales = downscales or [1] * len(cams)
    weights = weights if weights is not None else np.ones(len(cams))
    if use_hsluv:
        from season_nerf_tpu.utils.hsluv import rgb_to_hsluv_normalized
        images = [rgb_to_hsluv_normalized(img[..., :3]).astype(np.float32)
                  for img in images]
    all_rows, all_ids = [], []
    for i, (cam, img) in enumerate(zip(cams, images)):
        rows = rays_from_image(cam, img, downscale=downscales[i], weight=weights[i])
        all_rows.append(rows)
        all_ids.append(np.full(rows.shape[0], i, np.int32))
    table = RayTable(
        rows=np.concatenate(all_rows, 0),
        img_ids=np.concatenate(all_ids, 0),
        img_names=[c.name for c in cams],
        img_sizes=np.array([[c.img_shape[0] // d, c.img_shape[1] // d]
                            for c, d in zip(cams, downscales)], np.int32),
        sun_vecs=np.stack([c.sun_vec for c in cams]),
        time_encs=np.stack([c.time_enc for c in cams]),
    )
    if cache_path:
        table.save(cache_path)
    return table


def inverse_density_weights(X, starts, ends, circular, sigma=None):
    """Per-item weights inversely proportional to a Gaussian kernel density
    over the feature rows (weight_Xs_v2, mg_Pt_holder.py:81-105), fully
    vectorized.  Circular features wrap across [start, end]."""
    X = np.asarray(X, np.float64)
    n, d = X.shape
    pd = np.zeros((n, n, d))
    for j in range(d):
        diff = np.abs(X[:, j][:, None] - X[:, j][None, :])
        if circular[j]:
            d0 = (np.abs(X[:, j] - starts[j])[:, None]
                  + np.abs(X[:, j] - ends[j])[None, :])
            d2 = (np.abs(X[:, j] - ends[j])[:, None]
                  + np.abs(X[:, j] - starts[j])[None, :])
            diff = np.minimum(diff, np.minimum(d0, d2))
        s = np.std(diff) if sigma is None else sigma[j]
        pd[:, :, j] = diff / max(s, 1e-12)
    dists = np.sum(pd ** 2, -1)
    w = 1.0 / np.sum(np.exp(-dists), 1)
    w = w / np.max(w)
    return w / np.sum(w) * n


def camera_weights(cams):
    """Inverse-density image weights over (off-nadir, view azimuth,
    year-fraction) — the weight_training_samples path
    (mg_Pt_holder.py:120-129)."""
    X = np.array([[90.0 - c.view_el_az[0], c.view_el_az[1], c.time_frac]
                  for c in cams])
    starts = np.array([0.0, 0, 0])
    ends = np.array([min(np.max(X[:, 0]) + 5, 180.0), 360.0, 1.0])
    circular = np.array([False, True, True])
    return inverse_density_weights(X, starts, ends, circular)


def decode_batch(batch):
    """[B, 22] -> dict, the data_to_dict contract (mg_run_NeRF.py:122-133).
    Works on numpy or jnp arrays."""
    return {
        "img_pt": batch[:, 0:2],
        "top": batch[:, 2:5],
        "bot": batch[:, 5:8],
        "view": batch[:, 8:11],
        "sun": batch[:, 11:14],
        "t4": batch[:, 14:18],
        "weight": batch[:, 18:19],
        "gt_rgb": batch[:, 19:22],
    }


def train_test_split(n_images, testing_size=3, testing_names=None, names=None):
    """Deterministic split: either by explicit name list (Testing_Imgs.txt
    semantics, mg_Pt_holder.py:135-162) or linspace over image index."""
    if testing_names is not None:
        assert names is not None
        val_idx = np.array([names.index(t) for t in testing_names])
    else:
        val_idx = np.unique(np.linspace(0, n_images - 1, testing_size, dtype=int))
    train_idx = np.array([i for i in range(n_images) if i not in set(val_idx.tolist())])
    return train_idx, val_idx

"""Seasonal-claim verification: appearance stability across views and suns.

Redesign of ``T_NeRF_Eval_Utils/mg_Season_Eval.py``: render the walk grid of
view x sun x time combinations, and at each fixed time compute the pairwise
color-EM distance between all (view, sun) renders; a seasonally-stable model
changes appearance with *time*, not with viewpoint, so these distances
should sit below the baseline EM among the real seasonal prototype images
(_Season_Stability_Tests, :113-199).

The O(K^2) signature comparisons use the batched Sinkhorn solver; the
prototype baseline uses the exact LP (few pairs).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from season_nerf_tpu.render.renderer import Renderer, images_from_components
from season_nerf_tpu.eval.emd import (color_signature, emd_exact,
                                      emd_sinkhorn_batch, pad_signatures)
from season_nerf_tpu.eval.walks import get_walking_points


def full_eval_seasons(renderer: Renderer, cams: Sequence, out_size,
                      n_sun: int = 3, n_view: int = 3, n_time: int = 4,
                      min_day_sep: float = 20.0, angles_to_vec=None,
                      classic_shadows: bool = False) -> Dict:
    """Render the seasonal walk grid (Full_Eval_Seasons, :74-98).
    Returns {"Input_Vals", "Imgs"[V][S][T] -> shadow-adjusted render}."""
    walk_view, walk_sun, walk_times = get_walking_points(
        cams, n_view, n_sun, n_time, min_day_sep)
    V, S, T = len(walk_view), len(walk_sun), len(walk_times)
    imgs = np.empty((V, S, T), object)
    classes = np.empty((V, S, T), object)
    for i in range(V):
        for j in range(S):
            for k in range(T):
                comp = renderer.component_render_by_dir(
                    tuple(walk_view[i]), tuple(walk_sun[j]),
                    float(walk_times[k]), out_size,
                    angles_to_vec=angles_to_vec)
                d = images_from_components(comp, out_size, classic_shadows)
                imgs[i, j, k] = d["Season_Adj_Img"] * d["Shadow_Adjust"]
                classes[i, j, k] = d["Time_Class"]
    return {"Input_Vals": {"Idx_1_sat_angle": walk_view,
                           "Idx_2_sun_angle": walk_sun,
                           "Idx_3_Time_Frac": walk_times},
            "Imgs": imgs, "Time_Class": classes}


def prototype_baseline_em(proto_images: Sequence[np.ndarray]) -> np.ndarray:
    """Pairwise EM among real seasonal prototype images — the reference
    distance scale a stable model must beat (:115-135)."""
    n = len(proto_images)
    sigs = [color_signature(img) for img in proto_images]
    out = np.full((n, n), np.nan)
    for i in range(n):
        for j in range(i + 1, n):
            out[i, j] = out[j, i] = emd_exact(sigs[i], sigs[j])
    return out


def season_stability(walk: Dict, use_sinkhorn: bool = True) -> Dict:
    """Per-time pairwise EM across (view, sun) renders + summary stats
    (:137-199 + Orgainize_Output_Seasons summary)."""
    imgs = walk["Imgs"]
    V, S, T = imgs.shape
    K = V * S
    ia, ib = np.triu_indices(K, k=1)
    all_sigs = [color_signature(np.nan_to_num(imgs[i, j, k]))
                for k in range(T) for i in range(V) for j in range(S)]
    per_time = np.full((T, K, K), np.nan)
    if use_sinkhorn:
        # every pair of every time slice in ONE padded vmap dispatch — the
        # batching the module docstring promises (emd.emd_sinkhorn_batch)
        W, X = pad_signatures(all_sigs)
        W = W.reshape(T, K, -1)
        X = X.reshape(T, K, -1, 3)
        pa = np.concatenate([k * K + ia for k in range(T)])
        pb = np.concatenate([k * K + ib for k in range(T)])
        Wf, Xf = W.reshape(T * K, -1), X.reshape(T * K, -1, 3)
        vals = emd_sinkhorn_batch(Wf[pa], Xf[pa], Wf[pb], Xf[pb])
        vals = vals.reshape(T, -1)
        for k in range(T):
            per_time[k][ia, ib] = per_time[k][ib, ia] = vals[k]
    else:
        for k in range(T):
            sigs = all_sigs[k * K:(k + 1) * K]
            for a, b in zip(ia, ib):
                per_time[k, a, b] = per_time[k, b, a] = emd_exact(
                    sigs[a], sigs[b])
    vals = per_time[np.isfinite(per_time)]
    stats = {"mean": float(np.mean(vals)), "median": float(np.median(vals)),
             "p95": float(np.percentile(vals, 95)),
             "max": float(np.max(vals))}
    return {"EM_matrices": per_time, "Stats": stats}

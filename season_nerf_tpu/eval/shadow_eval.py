"""Shadow-claim verification: learned solar visibility vs exact transmittance.

Redesign of ``T_NeRF_Eval_Utils/mg_Shadow_Eval.py``: for each sun angle in
the walk sets, cast sun-direction rays through a ground grid, compare the
solar head's visibility against the exact density transmittance along the
ray, and report accuracy / sun & shadow precision + recall / mean offset
(shadow_anaylysis, :134-163).

The per-angle, per-chunk torch loops become one jitted kernel per sun angle
over the full ground grid.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from season_nerf_tpu.ops.sampling import sample_coarse, out_of_cube
from season_nerf_tpu.eval.walks import shadow_walk_points
from season_nerf_tpu.geometry.units import elevation_azimuth_to_vec


def eval_shadow_angles(model, variables, sun_angles: np.ndarray,
                       ground_points: np.ndarray, n_samples: int = 96,
                       angles_to_vec=None):
    """For each (el, az) sun angle: exact PV and learned vis along sun rays
    through each ground point (eval_shadow_data, mg_Shadow_Eval.py:72-104).

    Returns (exact [A, G, S], est [A, G, S], sky [A, 3]).
    """
    to_vec = angles_to_vec or (lambda el, az: elevation_azimuth_to_vec(el, az))
    G = ground_points.shape[0]
    S = n_samples

    @jax.jit
    def kernel(variables, tops, bots, sun_vec):
        pts, deltas = sample_coarse(None, tops, bots, S, train=False)
        deltas = jnp.where(out_of_cube(pts)[..., None], 0.0, deltas)
        sun_flat = jnp.broadcast_to(sun_vec[None, :], (G * S, 3))
        out = model.apply(variables, pts.reshape(-1, 3), sun_flat,
                          train=False, method="forward_solar")
        rho = out["rho"].reshape(G, S, 1)
        vis = out["vis"].reshape(G, S)
        tau = jnp.cumsum(rho * deltas, axis=1)
        pv = jnp.exp(-jnp.concatenate(
            [jnp.zeros((G, 1, 1)), tau[:, :-1]], 1))[:, :, 0]
        sky = jax.nn.sigmoid(out["sky_raw"][0])
        return pv, vis, sky

    exact = np.zeros((len(sun_angles), G, S), np.float32)
    est = np.zeros((len(sun_angles), G, S), np.float32)
    skies = np.zeros((len(sun_angles), 3), np.float32)
    g3 = np.concatenate([ground_points,
                         np.zeros((G, 1))], 1)
    dev = []    # pipeline per-angle dispatches, fetch once
    for el, az in np.asarray(sun_angles):
        v = np.asarray(to_vec(el, az), np.float64)
        v_n = v / v[2]
        tops = jnp.asarray((g3 + v_n[None]).astype(np.float32))
        bots = jnp.asarray((g3 - v_n[None]).astype(np.float32))
        dev.append(kernel(variables, tops, bots,
                          jnp.asarray(v, jnp.float32)))
    for i, (pv, vis, sky) in enumerate(jax.device_get(dev)):
        exact[i], est[i], skies[i] = pv, vis, sky
    return exact, est, skies


def shadow_analysis(exact: np.ndarray, est: np.ndarray) -> Dict[str, float]:
    """Confusion + offset statistics (shadow_anaylysis,
    mg_Shadow_Eval.py:134-163)."""
    loss = float(np.mean((exact - est) ** 2))
    avg_err = float(np.mean(np.abs(exact - est)))
    gt = exact > 0.5
    pr = est > 0.5
    tp = float(np.sum(gt & pr))
    tn = float(np.sum(~gt & ~pr))
    fp = float(np.sum(~gt & pr))
    fn = float(np.sum(gt & ~pr))

    def safe(a, b):
        return a / b if b > 0 else float("nan")

    surf_dist = gt.sum(-1) - pr.sum(-1)
    return {"Acc": safe(tp + tn, tp + tn + fp + fn),
            "Prec_Sun": safe(tp, tp + fp), "Recall_Sun": safe(tp, tp + fn),
            "Prec_Shadow": safe(tn, tn + fn),
            "Recall_Shadow": safe(tn, tn + fp),
            "Loss": loss, "Avg_Error": avg_err,
            "Avg_Offset": float(np.mean(np.abs(surf_dist)))}


def advanced_solar_sweep(renderer, view_angles: np.ndarray,
                         sun_angles: np.ndarray, out_size=(32, 32),
                         angles_to_vec=None, csv_path: str = None):
    """Standalone shadow TP/TN/FP/FN sweep over a satellite x solar angle
    grid with optional CSV output (mg_Advanced_Solar.advanced_solar +
    _get_stats, :1-188): render each combination with both learned and
    exact shadow masks and tabulate the confusion."""
    from season_nerf_tpu.render.renderer import images_from_components
    from season_nerf_tpu.eval.img_eval import shadow_confusion
    rows = []
    for ve, va in np.asarray(view_angles):
        for se, sa in np.asarray(sun_angles):
            comp = renderer.component_render_by_dir(
                (ve, va), (se, sa), 0.5, out_size,
                angles_to_vec=angles_to_vec, exact_solar=True)
            imgs = images_from_components(comp, out_size)
            stats = shadow_confusion(imgs["Shadow_Mask"],
                                     imgs["Shadow_Mask_Exact"])
            rows.append({"view_el": ve, "view_az": va, "sun_el": se,
                         "sun_az": sa, **stats})
    if csv_path:
        import csv as _csv
        import os
        os.makedirs(os.path.dirname(os.path.abspath(csv_path)), exist_ok=True)
        with open(csv_path, "w", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
    return rows


def test_shadow_points(model, variables, train_cams: Sequence,
                       test_cams: Sequence, n_samples: int = 96,
                       points_in_space: int = 16,
                       points_across_angles: int = 6, angles_to_vec=None):
    """The Test_Shadow_Points driver (mg_Shadow_Eval.py:107-131): run the
    exact-vs-learned comparison over the four angle sets and summarize."""
    walks = shadow_walk_points(train_cams, test_cams,
                               points_in_space, points_across_angles)
    ground = walks.pop("Ground_Points")
    summary = {"Ground_Points": ground, "Sun_El_Az": walks, "Results": {},
               "Stats": {}}
    for name, angles in walks.items():
        if len(angles) == 0:
            continue
        exact, est, sky = eval_shadow_angles(
            model, variables, angles, ground, n_samples, angles_to_vec)
        summary["Results"][name] = {"Exact_Vis": exact, "Est_Vis": est,
                                    "Sky_Col": sky}
        summary["Stats"][name] = shadow_analysis(exact, est)
    return summary

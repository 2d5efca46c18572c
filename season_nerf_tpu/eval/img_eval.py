"""Per-image evaluation: rendering quality gauntlet + seasonal alignment.

Redesign of the reference's ``T_NeRF_Eval_Utils/mg_Img_Eval.py`` evaluation
half and ``Eval_funcs.full_eval_P_img``:

- seasonal alignment (``_grad_descent_v3``, mg_Img_Eval.py:354-414): brute
  force 366 candidate times; per candidate, mix the per-class albedo adjusts
  by the time head's class vector and fit the sky color per channel in
  closed form (least squares on non-sunlit pixels); keep the min-MSE time.
  Here the whole 367-candidate sweep is one batched jit (the reference
  loops per candidate on GPU).
- image gauntlet (``image_quality_metric_gauntlet``, :518-542): masked PSNR,
  masked Gaussian-window SSIM, mean L2, color EM distance.
- ``eval_rendering`` / ``eval_img_dict`` / ``full_eval_images``
  (:479-601): render each test camera, composite base/seasonal/aligned
  variants, score the 2x2 (shadow x seasonal-alignment) table.
- shadow-mask confusion (``get_Shadow_score``, :603-622).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from season_nerf_tpu.ops.metrics import psnr as masked_psnr, ssim as masked_ssim
from season_nerf_tpu.eval.emd import compare_em_imgs
from season_nerf_tpu.render.renderer import (
    Renderer, images_from_components, _sig)


# ---------------------------------------------------------------------------
# seasonal alignment
# ---------------------------------------------------------------------------

# module-level so the compiled program is shared across every image of the
# same size (one compile per eval size, not per evaluated image).  The
# component tensors are *arguments*, not closed-over values: a closure would
# bake them into the program as constants ([N, S, C, 3] adjusts at
# 256^2 x 96 is ~300 MB of HLO constants — enough to overflow a
# remote-compile request, and a recompile per image even locally).
@jax.jit
def _score_align_candidates(cvs, ps_j, base_j, adj_j, gate_j, gt_j, good_j):
    def one(cv):
        mix = jnp.einsum("c,rscd->rsd", cv, adj_j)
        A = jnp.sum(ps_j * jax.nn.sigmoid(base_j + mix), 1)    # [N,3]
        # closed-form sky: argmin over sky of |GT - A*(g + (1-g)sky)|^2
        # on non-sunlit pixels (mg_Img_Eval.py:390-396)
        Y = jnp.where(good_j[:, None], gt_j - A * gate_j, 0.0)
        X = jnp.where(good_j[:, None], (1 - gate_j) * A, 0.0)
        sky = jnp.clip(jnp.sum(X * Y, 0) / (jnp.sum(X * X, 0) + 1e-12),
                       0.0, 1.0)
        rendered = A * (gate_j + (1 - gate_j) * sky[None])
        return jnp.mean((rendered - gt_j) ** 2), sky
    return jax.lax.map(one, cvs)


def seasonal_align(renderer: Renderer, components: Dict, gt_cols: np.ndarray,
                   base_time: float, n_times: int = 366):
    """Best (class_vector, sky_color, time) explaining the GT colors.

    components: a component_render result; gt_cols [N, 3] ground-truth
    colors at the rendered ray pixels.  Returns (class_vec [C], sky [3],
    t_best).
    """
    model, variables = renderer.model, renderer.variables
    ts = np.concatenate([[base_time], np.linspace(0, 1, n_times)])
    t4 = np.stack([np.cos(ts * 2 * np.pi), np.sin(ts * 2 * np.pi),
                   np.cos(ts * 2 * np.pi), np.sin(ts * 2 * np.pi)], 1)
    class_vecs = np.asarray(model.apply(
        variables, jnp.asarray(t4, jnp.float32), train=False,
        method="class_only"))                                   # [T, C]

    rho, deltas = components["rho"], components["deltas"]
    tau = np.cumsum(rho * deltas, 1)
    pv = np.exp(-np.concatenate([np.zeros_like(tau[:, :1]), tau[:, :-1]], 1))
    ps = pv * (1 - np.exp(-rho * deltas))

    gate = _sig((np.sum(ps * components["vis"], 1) - 0.2) * 30.0)   # [N,1]
    good = (gate < 0.99)[:, 0]

    errors, skies = jax.device_get(_score_align_candidates(
        jnp.asarray(class_vecs),
        jnp.asarray(ps, jnp.float32),
        jnp.asarray(components["col_raw"], jnp.float32),
        jnp.asarray(components["adjust_per_class"], jnp.float32),
        jnp.asarray(gate, jnp.float32),
        jnp.asarray(gt_cols, jnp.float32),
        jnp.asarray(good)))
    best = int(np.argmin(errors))
    return class_vecs[best], np.asarray(skies[best]), float(ts[best])


# ---------------------------------------------------------------------------
# gauntlet
# ---------------------------------------------------------------------------

def image_quality_gauntlet(img_gt: np.ndarray, img_est: np.ndarray,
                           ssim_win: int = 13, em_scale: float = 1.0):
    """(mean_L2, PSNR, SSIM, EM) over the joint-valid mask
    (image_quality_metric_gauntlet, mg_Img_Eval.py:518-542)."""
    if not np.isfinite(img_est).any():
        return 1.0, 1.0, -1.0, 1.0
    mask = np.isfinite(img_gt).all(-1) & np.isfinite(img_est).all(-1)
    gt = np.where(mask[..., None], img_gt, 0.0)
    est = np.where(mask[..., None], img_est, 0.0)
    p = float(masked_psnr(jnp.asarray(est), jnp.asarray(gt),
                          mask=jnp.asarray(mask)))
    win = min(ssim_win, min(gt.shape[0], gt.shape[1]) - 1)
    s = float(masked_ssim(jnp.asarray(est), jnp.asarray(gt),
                          mask=jnp.asarray(mask), win_size=win))
    d = np.sqrt(np.sum((img_gt - img_est) ** 2, -1))
    mean_l2 = float(np.nanmean(np.where(mask, d, np.nan)))
    em = compare_em_imgs(np.where(mask[..., None], img_gt, np.nan),
                         np.where(mask[..., None], img_est, np.nan))
    return mean_l2, p, s, em * em_scale


def shadow_confusion(est_mask: np.ndarray, exact_mask: np.ndarray,
                     thresh: float = 0.5) -> Dict[str, float]:
    """Accuracy + sun/shadow precision/recall of the learned shadow mask vs
    the exact-transmittance mask (get_Shadow_score, mg_Img_Eval.py:603-622)."""
    ok = np.isfinite(est_mask) & np.isfinite(exact_mask)
    e = est_mask[ok] >= thresh     # True = sunlit
    x = exact_mask[ok] >= thresh
    tp = float(np.sum(e & x))
    tn = float(np.sum(~e & ~x))
    fp = float(np.sum(e & ~x))
    fn = float(np.sum(~e & x))
    def safe(a, b):
        return a / b if b > 0 else float("nan")
    return {"Accuracy": safe(tp + tn, tp + tn + fp + fn),
            "Sun_Precision": safe(tp, tp + fp),
            "Sun_Recall": safe(tp, tp + fn),
            "Shadow_Precision": safe(tn, tn + fn),
            "Shadow_Recall": safe(tn, tn + fp)}


# ---------------------------------------------------------------------------
# per-camera evaluation
# ---------------------------------------------------------------------------

def _resize(img, hw):
    import cv2
    return cv2.resize(img.astype(np.float32), (hw[1], hw[0]))


def eval_rendering(renderer: Renderer, cam, out_size: Tuple[int, int],
                   exact_solar: bool = False, classic_shadows: bool = False,
                   n_align_times: int = 366):
    """Render one test camera and build base + seasonally-aligned image
    dicts (eval_Rendering, mg_Img_Eval.py:479-515)."""
    comp = renderer.component_render_by_camera(cam, out_size,
                                               exact_solar=exact_solar)
    imgs = images_from_components(comp, out_size, classic_shadows)

    gt_full = np.asarray(cam.image)
    gt_cols = gt_full[comp["gt_img_pts"][:, 0], comp["gt_img_pts"][:, 1], :3]
    cvec, sky, t_best = seasonal_align(renderer, comp, gt_cols,
                                       cam.time_frac, n_align_times)
    aligned = dict(comp)
    aligned["class_probs"] = np.broadcast_to(
        cvec[None, None], comp["class_probs"].shape).copy()
    aligned["sky"] = np.broadcast_to(
        np.asarray(sky, np.float32)[None, None],
        comp["sky"].shape).copy()
    imgs_aligned = images_from_components(aligned, out_size, classic_shadows)

    gt_resized = _resize(gt_full[..., :3], out_size)
    return {"Images": imgs, "Seasonal_Aligned_Imgs": imgs_aligned,
            "Aligned_Vals": (cvec, sky, t_best), "Ground_Truth": gt_resized,
            "Components": comp}


def eval_img_dict(result: Dict, ssim_win: int = 13, em_scale: float = 1.0,
                  score_extremes: bool = False) -> Dict[str, Tuple]:
    """Score table over the rendered variants (eval_img_dict,
    mg_Img_Eval.py:544-572): {Base, Season_Adj, Aligned} x {flat, shadowed},
    plus per-class one-hot "extreme" renders when ``score_extremes`` (the
    full_eval_P_img per-class scores, Eval_funcs.py:103-265)."""
    gt = result["Ground_Truth"]
    scores = {}
    for name, imgs in [("Base", result["Images"]),
                       ("Aligned", result["Seasonal_Aligned_Imgs"])]:
        season = imgs["Season_Adj_Img"]
        shadow_adj = imgs["Shadow_Adjust"]
        variants = {
            f"{name}_Img": season,
            f"{name}_Shadow_Img": season * shadow_adj,
        }
        if "Shadow_Adjust_Exact" in imgs:
            variants[f"{name}_Exact_Shadow_Img"] = (
                season * imgs["Shadow_Adjust_Exact"])
        for k, img in variants.items():
            scores[k] = image_quality_gauntlet(gt, img, ssim_win, em_scale)
    if score_extremes:
        for c, img in enumerate(result["Images"].get("Extreme_Imgs", [])):
            scores[f"Class_{c}_Img"] = image_quality_gauntlet(
                gt, img, ssim_win, em_scale)
    return scores


def full_eval_images(renderer: Renderer, test_cams: List, out_size,
                     exact_solar: bool = False, **kw):
    """Evaluate every testing camera (Full_Eval_Imgs, mg_Img_Eval.py:574-601).
    Returns {cam_name: {"Scores": ..., "Result": ...}}."""
    out = {}
    for cam in test_cams:
        res = eval_rendering(renderer, cam, out_size,
                             exact_solar=exact_solar, **kw)
        scores = eval_img_dict(res)
        entry = {"Scores": scores, "Aligned_Vals": res["Aligned_Vals"]}
        if exact_solar:
            imgs = res["Images"]
            entry["Shadow_Scores"] = shadow_confusion(
                imgs["Shadow_Mask"], imgs["Shadow_Mask_Exact"])
        entry["Result"] = res
        out[cam.name] = entry
    return out


def summarize_image_scores(per_image: Dict) -> Dict[str, Dict[str, float]]:
    """avg / best / worst per metric per variant (mg_merge_imgs.py:11-112)."""
    table = {}
    for name, entry in per_image.items():
        for variant, (l2, p, s, em) in entry["Scores"].items():
            table.setdefault(variant, {"L2": [], "PSNR": [], "SSIM": [],
                                       "EM": []})
            table[variant]["L2"].append(l2)
            table[variant]["PSNR"].append(p)
            table[variant]["SSIM"].append(s)
            table[variant]["EM"].append(em)
    out = {}
    for variant, cols in table.items():
        out[variant] = {}
        for m, vals in cols.items():
            v = np.asarray(vals, float)
            out[variant][m] = {"avg": float(np.nanmean(v)),
                               "best": float(np.nanmax(v) if m != "L2"
                                             and m != "EM" else np.nanmin(v)),
                               "worst": float(np.nanmin(v) if m != "L2"
                                              and m != "EM" else np.nanmax(v))}
    return out

"""The Season-NeRF training loss, as one pure jit-able function.

Functional redesign of the reference's ``All_in_One_Eval.get_loss``
(/root/reference/T_NeRF_Full_2/Eval_Tools_2.py:340-459) with every branch
preserved.  The loss is a dict of ``name -> (value, weight)`` whose weighted
sum is the training objective and whose components are logged individually
(mg_run_NeRF.py:288-326).  Semantics kept exactly:

- color loss: Barron adaptive NLL over the *unmerged* rendered color
  (Eval_Tools_2.py:425-427), or MSE over the merged color when
  ``use_mse_loss`` (``:416-420``); the plain-MSE color is always computed
  detached for logging (``:448-453``).
- DSM-prior phase adds the alpha-adjust term: adaptive NLL + live MSE between
  per-sample hit probability PE and the supervised PE (``:421-435``).
- solar correction: sum over samples of (vis - stopgrad(PV_exact))^2, mean
  over rays (``:361``); absorption term 1 - sum(PE*PV*vis) trained only under
  ``classic_solar`` (= Solar_Type_2), otherwise logged detached (``:366-370``).
- sky magnitude + albedo floor regularizers only in the gated composite mode
  (``:373-390``); the sky term is detached during the prior phase.
- the solar weights are divided by stopgrad(mean(color scale))^2 when the
  adaptive loss is active (``:432-444``).

Data-dependent boolean indexing from the reference (e.g. the albedo floor
over only-violating channels) is rewritten as static-shape masked reductions —
identical values, XLA-compilable.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from season_nerf_tpu.ops import rendering
from season_nerf_tpu.ops import robust_loss
from season_nerf_tpu.ops.robust_loss import AdaptiveCfg


class LossStatics(NamedTuple):
    """Static (compile-time) switches of the loss — one jit per combination
    (the reference rebuilds its eval tool per phase, Net_Tool_2.py:63-131)."""
    n_samples: int
    n_importance: int
    use_prior: bool
    use_solar: bool
    classic_solar: bool        # Solar_Type_2
    use_mse_loss: bool
    sc_lambda: float
    phase_len: int             # Model_Trust denominator (phase end step)
    color_cfg: Optional[AdaptiveCfg] = None
    alpha_cfg: Optional[AdaptiveCfg] = None
    prior_keepalive: float = 0.0  # beyond-reference, opt-in: when the prior
    #                               is OFF (phase 4), add a decaying
    #                               Alpha_Adjust MSE against the prior PE —
    #                               weight keepalive*(1 - phase progress),
    #                               0 at the final step (config.py
    #                               phase4_prior_keepalive)
    phase_start: int = 0       # keepalive decay origin (phase start step)
    remat: str = ""            # rematerialize network blocks in backward:
    #                            "" off, "full", or "dots" (rendering._remat_policy)
    pallas_spec: Optional[object] = None  # ops/pallas_train.TrunkSpec: run
    #                            the training trunk through the VMEM-resident
    #                            fused Pallas kernel (ghost BatchNorm); None
    #                            = XLA path.  Training-only — eval calls
    #                            (train=False) always take the XLA path.


def make_solar_rays(rng, n, sun_frame=None):
    """Random synthetic solar rays spanning the cube.

    Matches create_solor_rays_uniform.__call__ (Eval_Tools_2.py:74-108):
    random az in [-180,180), el in [1,90) converted to a local sun vector,
    random (x,y) start at z=+1, end = start - 2*(v/v_z) (z=-1 exactly), and
    random periodic time encodings.  ``sun_frame`` is an optional [3,3]
    linear map from the ENU unit vector into cube coordinates (the exact
    equivalent of the reference's world_angle_2_local_vec through the W2L
    similarity; identity for synthetic scenes).
    """
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    az = jax.random.uniform(k1, (n,), minval=-jnp.pi, maxval=jnp.pi)
    el = jax.random.uniform(k2, (n,), minval=jnp.deg2rad(1.0),
                            maxval=jnp.deg2rad(90.0))
    v = jnp.stack([jnp.cos(el) * jnp.sin(az), jnp.cos(el) * jnp.cos(az),
                   jnp.sin(el)], axis=1)                      # ENU, unit
    if sun_frame is not None:
        v = v @ sun_frame.T
        v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
    starts = jnp.concatenate(
        [jax.random.uniform(k3, (n, 2), minval=-1.0, maxval=1.0),
         jnp.ones((n, 1))], axis=1)
    ends = starts - 2.0 * v / v[:, 2:3]
    t_ang = jax.random.uniform(k4, (n, 2), minval=0.0, maxval=2 * jnp.pi)
    t4 = jnp.concatenate([jnp.cos(t_ang[:, :1]), jnp.sin(t_ang[:, :1]),
                          jnp.cos(t_ang[:, 1:]), jnp.sin(t_ang[:, 1:])], axis=1)
    return starts, ends, v, t4


def _masked_mean_sq_over(x, thresh):
    """sum(relu(x)^2)/numel for elements above 0 — static-shape rewrite of
    the reference's boolean-indexed sky loss (Eval_Tools_2.py:381-387)."""
    pos = jnp.maximum(x, 0.0)
    return jnp.sum(pos ** 2) / x.size


def season_nerf_loss(model, variables, ada_params, statics: LossStatics,
                     batch, rng, step, *, train=True, prior_hm=None,
                     sun_frame=None, mutable=False):
    """Full loss.  Returns (total, (loss_dict, updates)).

    variables: flax variable dict {params, batch_stats?}.
    ada_params: {"color": latents, "alpha": latents} or {} under MSE loss.
    batch: decoded ray dict (rays.decode_batch).
    step: traced scalar — current global step (Model_Trust numerator).
    """
    s = statics
    k_render, k_solar_rays, k_solar_samp = jax.random.split(rng, 3)
    model_trust = jnp.minimum(step / s.phase_len, 1.0) if s.use_prior else 1.0

    out, updates = rendering.eval_rays(
        model, variables, k_render, batch["top"], batch["bot"], batch["sun"],
        batch["t4"], n_samples=s.n_samples, n_importance=s.n_importance,
        train=train,
        classic_solar=s.classic_solar,
        prior_hm=prior_hm if s.use_prior else None,
        model_trust=model_trust, mutable=mutable, remat=s.remat,
        pallas_spec=s.pallas_spec if train else None)

    losses: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
    sg = jax.lax.stop_gradient
    gt = batch["gt_rgb"]

    # ---- solar machinery --------------------------------------------------
    sc_w = jnp.asarray(s.sc_lambda)
    if s.use_solar:
        n_rays = batch["top"].shape[0]
        tops_s, bots_s, sun_s, _t4s = make_solar_rays(
            k_solar_rays, n_rays, sun_frame)
        # the reference's two train-mode forwards update BatchNorm running
        # stats sequentially (camera pass, then solar pass, both in-place);
        # compose the same way: the solar pass starts from the camera pass's
        # updated stats, and the final update carries both
        vars_solar = variables
        if updates is not None and "batch_stats" in updates:
            vars_solar = {**variables, "batch_stats": updates["batch_stats"]}
        sol, updates2 = rendering.eval_rho_only(
            model, vars_solar, k_solar_samp, tops_s, bots_s, sun_s, None,
            n_samples=s.n_samples, train=train,
            prior_hm=prior_hm if s.use_prior else None,
            model_trust=model_trust, mutable=mutable, remat=s.remat,
            pallas_spec=s.pallas_spec if train else None)
        if updates2 is not None:
            updates = updates2
        vis_s = sol["vis"][..., 0]
        pv_exact = sg(sol["pv_exact"][..., 0])
        solar_err = jnp.mean(jnp.sum((vis_s - pv_exact) ** 2, axis=1))
        absorb = jnp.mean(1.0 - jnp.sum(
            sg(sol["pe"][..., 0]) * pv_exact * vis_s, axis=1))
        losses["Solar_Correction"] = (solar_err, sc_w)
        losses["Solar_Correction_2"] = (
            absorb if s.classic_solar else sg(absorb), sc_w)

        if not s.classic_solar:
            # albedo floor: per-channel min over the batch; quadratic
            # penalty for channels below 0.2 (Eval_Tools_2.py:374-380).
            # The /= batch-size normalization (not /3) is the reference's own
            # (`... / Network_Output["Albedo_Color"].shape[0]`, :378) and is
            # kept deliberately, batch-size dependence and all.
            alb_min = jnp.min(out["albedo"], axis=0)                  # [3]
            viol = jnp.maximum(1.0 - alb_min / 0.2, 0.0)
            alb_floor = jnp.sum(viol ** 2) / out["albedo"].shape[0]
            # sky magnitude: penalize sky color above 0.5 (:381-387)
            sk = (out["sky"] - 0.5) / 0.5
            sk_loss = _masked_mean_sq_over(sk, 0.0)
            if s.use_prior:
                sk_loss = sg(sk_loss)
            losses["Sky_Color_Var"] = (sk_loss, sc_w)
            losses["Albedo_Color"] = (alb_floor, sc_w)

    # ---- color / alpha ----------------------------------------------------
    rendered_for_mse = (out["rendered_merged"]
                        if (s.use_prior and train) else out["rendered"])
    mse_color = jnp.mean((rendered_for_mse - gt) ** 2)

    if s.use_mse_loss:
        losses["Color"] = (mse_color, jnp.asarray(1.0))
        if s.use_prior:
            pe_sup = sg(out["pe_sup"])
            losses["Alpha_Adjust"] = (
                jnp.mean((out["pe"] - pe_sup) ** 2), jnp.asarray(1.0))
    else:
        col_diff = out["rendered"] - gt
        c_cfg = s.color_cfg
        color_ada = jnp.mean(robust_loss.adaptive_nll(
            ada_params["color"], c_cfg, col_diff))
        scale_mean = sg(jnp.mean(robust_loss.scale_of(ada_params["color"], c_cfg)))
        alpha_mean = sg(jnp.mean(robust_loss.alpha_of(ada_params["color"], c_cfg)))
        losses["Color_ada"] = (color_ada, jnp.asarray(1.0))
        # diagnostic entries carry stop_gradient values with weight 1: they
        # appear in the summed total exactly like the reference's detached
        # terms (value-identical, gradient-free)
        losses["Color_alpha"] = (alpha_mean, jnp.asarray(1.0))
        losses["Color_width"] = (scale_mean, jnp.asarray(1.0))
        losses["Color"] = (sg(mse_color), jnp.asarray(1.0))
        inv_scale_sq = 1.0 / (scale_mean ** 2)
        if "Solar_Correction" in losses:
            losses["Solar_Correction"] = (
                losses["Solar_Correction"][0], sc_w * inv_scale_sq)
            losses["Solar_Correction_2"] = (
                losses["Solar_Correction_2"][0], sc_w * inv_scale_sq)
        if s.use_prior:
            a_cfg = s.alpha_cfg
            pe_sup = sg(out["pe_sup"])
            alpha_diff = (out["pe"] - pe_sup).reshape(-1, 1)
            losses["Alpha_Adjust_ada"] = (
                jnp.mean(robust_loss.adaptive_nll(
                    ada_params["alpha"], a_cfg, alpha_diff)),
                jnp.asarray(1.0))
            losses["Alpha_Adjust"] = (
                jnp.mean((out["pe"] - pe_sup) ** 2), jnp.asarray(1.0))
            losses["Alpha_alpha"] = (
                sg(jnp.mean(robust_loss.alpha_of(ada_params["alpha"], a_cfg))),
                jnp.asarray(1.0))
            losses["Alpha_width"] = (
                sg(jnp.mean(robust_loss.scale_of(ada_params["alpha"], a_cfg))),
                jnp.asarray(1.0))

    # ---- phase-4 prior keepalive (beyond-reference, opt-in) ----------------
    # The reference cuts the DSM prior dead at the phase 1->4 boundary
    # (Net_Tool_2.py:23-45) and our full-budget runs show the geometry the
    # prior bought decaying for the rest of training (docs/QUALITY_r3.md).
    # With ``prior_keepalive`` > 0 an Alpha_Adjust term stays alive in the
    # prior-off phase, its weight decaying linearly to exactly 0 at the
    # final step — anchoring geometry early in phase 4 while still releasing
    # the density field for the appearance fine-tuning the phase exists for.
    # Two variants (round-5 A/B, docs/QUALITY_r5.md):
    #   MSE (round 4): rejected — cannot down-weight the prior's own noise,
    #     so it trades seed-1 PSNR for seed-0 geometry;
    #   Barron-adaptive (s.alpha_cfg set in the prior-off phase): the
    #     learned alpha/scale can discount prior outliers exactly the way
    #     the phase-1 alpha loss does (Net_Tool_2.py:85).
    if (not s.use_prior) and s.prior_keepalive > 0 and prior_hm is not None:
        from season_nerf_tpu.models.tnerf import supervised_sigma
        deltas = out["deltas"]
        rho_sup = supervised_sigma(
            prior_hm, out["pts"].reshape(-1, 3),
            deltas.reshape(-1, 1)).reshape(deltas.shape)
        _, pe_sup, _ = rendering.pv_pe_ps(rho_sup, deltas)
        span = max(s.phase_len - s.phase_start, 1)
        decay = jnp.clip((s.phase_len - step) / span, 0.0, 1.0)
        w = jnp.asarray(s.prior_keepalive) * decay
        if s.alpha_cfg is not None and not s.use_mse_loss:
            a_cfg = s.alpha_cfg
            alpha_diff = (out["pe"] - sg(pe_sup)).reshape(-1, 1)
            losses["Alpha_Adjust_ada"] = (
                jnp.mean(robust_loss.adaptive_nll(
                    ada_params["alpha"], a_cfg, alpha_diff)), w)
            losses["Alpha_Adjust"] = (
                sg(jnp.mean((out["pe"] - sg(pe_sup)) ** 2)),
                jnp.asarray(1.0))
        else:
            losses["Alpha_Adjust"] = (
                jnp.mean((out["pe"] - sg(pe_sup)) ** 2), w)

    total = jnp.asarray(0.0)
    for v, w in losses.values():
        total = total + v * w
    return total, (losses, updates)

"""Volume rendering: transmittance, compositing, and the full ray evaluator.

TPU-first redesign of ``T_NeRF_Full_2/Eval_Tools_2.py`` (get_PV:13-16,
All_in_One_Eval.eval:165-252, eval_Rho_Only:297-337): pure functions over
``[rays, samples]`` arrays, one network invocation over the flattened point
batch (matmul-dominated -> MXU), cumulative transmittance via an exclusive
cumsum that XLA fuses with the surrounding elementwise ops.

Two illumination composites exist, selected by ``classic_solar``
(= the reference's ``Solar_Type_2`` flag):
  classic: C = sum_s PS * col * (vis + (1 - vis) * sky)          [.., :212]
  gated:   g = sigmoid((sum_s stopgrad(vis) * PS - 0.2) * 30)
           C = (sum_s PS * col) * (g + (1 - g) * mean_s sky)     [.., :214-215]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from season_nerf_tpu.ops.sampling import sample_coarse
from season_nerf_tpu.models.tnerf import supervised_sigma


def transmittance(rho, deltas):
    """P_visible before each sample: exp(-cumsum_exclusive(rho * delta)).

    rho/deltas: [R, S, 1].  Matches get_PV (Eval_Tools_2.py:13-16).
    """
    tau = rho * deltas
    acc = jnp.cumsum(tau, axis=1)
    acc = jnp.concatenate([jnp.zeros_like(acc[:, :1]), acc[:, :-1]], axis=1)
    return jnp.exp(-acc)


def pv_pe_ps(rho, deltas):
    """-> (PV, PE, PS): visibility, per-sample hit prob, surface prob."""
    pv = transmittance(rho, deltas)
    pe = 1.0 - jnp.exp(-rho * deltas)
    return pv, pe, pv * pe


def composite_classic(ps, col, vis, sky):
    """S-NeRF irradiance composite (Eval_Tools_2.py:212)."""
    return jnp.sum(ps * col * (vis + (1.0 - vis) * sky), axis=1)


def gated_visibility(ps, vis):
    """Scalar per-ray sun gate from detached per-sample visibility
    (Eval_Tools_2.py:214)."""
    g = jnp.sum(jax.lax.stop_gradient(vis) * ps, axis=1)
    return jax.nn.sigmoid((g - 0.2) * 30.0)


def composite_gated(ps, col, vis, sky):
    """Season-NeRF gated composite (Eval_Tools_2.py:214-215)."""
    albedo = jnp.sum(ps * col, axis=1)
    g = gated_visibility(ps, vis)
    return albedo * (g + (1.0 - g) * jnp.mean(sky, axis=1))


def expected_surface(ps, pts, deltas):
    """Expected surface point and distance along the ray
    (mg_run_NeRF.py:188-189)."""
    denom = jnp.sum(ps, axis=1) + 1e-8
    loc = jnp.sum(ps * pts, axis=1) / denom
    dist = jnp.sum(ps * jnp.cumsum(deltas, axis=1), axis=1) / denom
    return loc, dist


def _remat_policy(remat):
    """remat=True / "full": save nothing (max memory savings, ~30% recompute
    cost); remat="dots": save matmul outputs and recompute only the cheap
    elementwise epilogues (sin, norm) — near-zero recompute, still breaks
    the fused-backward register pressure."""
    if remat == "dots":
        return jax.checkpoint_policies.dots_saveable
    return None


def eval_rays(model, variables, rng, tops, bots, sun, t4, *,
              n_samples, n_importance=0, train=False, classic_solar=False,
              prior_hm=None, model_trust=1.0, mutable=False, remat=False,
              mask_out_of_cube=False, pallas_spec=None):
    """Render a batch of rays: the All_in_One_Eval.eval equivalent.

    model/variables: TNeRF flax module + its variables.
    tops/bots: [R, 3]; sun: [R, 3]; t4: [R, 4] periodic time encodings.
    prior_hm: optional [H, W] DSM-prior height map; when given, the outputs
    include the supervised / trust-merged branches used in phase 1
    (Eval_Tools_2.py:218-248).

    ``mask_out_of_cube`` zeroes the deltas of samples outside the unit
    cube (zero_invalid_pts, misc.py:249-261) — required on the whole-image
    render surfaces whose edge rays exit the volume (dir_grid_rays /
    perspective_rays); training/solar rays have both endpoints inside the
    cube so the mask would be an identity there and is skipped.

    Returns (results dict, updated_variable_dict_or_None).
    """
    R = tops.shape[0]
    S = n_samples
    k_coarse, k_fine = (jax.random.split(rng) if rng is not None
                        else (None, None))
    pts, deltas = sample_coarse(k_coarse, tops, bots, S, train=train)
    if n_importance > 0:
        # hierarchical resampling (misc.py:297-328 equivalent): a cheap
        # sigma-only coarse pass drives inverse-CDF fine sampling; the full
        # network then runs once on the merged point set
        from season_nerf_tpu.ops.sampling import sample_fine
        rho_c = model.apply(variables, pts.reshape(-1, 3), train=False,
                            method="sigma_only").reshape(R, S, 1)
        rho_c = jax.lax.stop_gradient(rho_c)
        _, _, ps_c = pv_pe_ps(rho_c, deltas)
        pts, deltas = sample_fine(k_fine, tops, bots, pts, ps_c[..., 0],
                                  n_importance)
        S = S + n_importance
    if mask_out_of_cube:
        from season_nerf_tpu.ops.sampling import out_of_cube
        deltas = jnp.where(out_of_cube(pts)[..., None], 0.0, deltas)
    flat = pts.reshape(-1, 3)

    # The seasonal-class branch, the sun encoding, and the sky MLP are pure
    # functions of per-ray inputs (none has BatchNorm), so evaluate them
    # once per ray and broadcast to the samples — bit-identical to the
    # per-point evaluation at 1/S the rows (S=96 in the flagship config).
    probs_r, sun_pe_r, sky_raw_r = model.apply(
        variables, sun, t4, train=train, method="ray_consts")
    bcast = lambda a: jnp.broadcast_to(
        a[:, None, :], (R, S, a.shape[-1])).reshape(-1, a.shape[-1])
    probs_f, sun_pe_f, sky_raw_f = bcast(probs_r), bcast(sun_pe_r), bcast(sky_raw_r)

    if pallas_spec is not None and train:
        # VMEM-resident fused trunk (fwd+bwd in two pallas_calls, ghost
        # BatchNorm) — the byte-reduction lever docs/ROOFLINE_r4.md names;
        # the engine qualifies it (quality A/B) before making it a default
        from season_nerf_tpu.ops import pallas_train as _pt
        out, updates = _pt.fused_forward(
            model, variables, pallas_spec, flat, probs_f, sun_pe_f,
            sky_raw_f, train=True, mutable=mutable)
    else:
        def net(v, f, p_, spe_, skr_):
            kw = dict(probs=p_, sun_pe=spe_, sky_raw=skr_, train=train)
            if mutable:
                return model.apply(v, f, None, None,
                                   mutable=["batch_stats"], **kw)
            return model.apply(v, f, None, None, **kw), None

        if remat:
            # rematerialize the network block in the backward pass: its
            # activations (N x width x depth) stop coexisting with the solar
            # pass's, halving peak HBM and shrinking the fused backward
            # kernel past the register-allocator ceiling at large batches
            net = jax.checkpoint(net, policy=_remat_policy(remat))
        out, updates = net(variables, flat, probs_f, sun_pe_f, sky_raw_f)

    rho = out["rho"].reshape(R, S, 1)
    col = out["col"].reshape(R, S, -1)
    vis = out["vis"].reshape(R, S, 1)
    sky = out["sky"].reshape(R, S, -1)
    probs = out["class_probs"].reshape(R, S, -1)
    adjust = out["adjust"].reshape(R, S, -1)

    pv, pe, ps = pv_pe_ps(rho, deltas)
    albedo = jnp.sum(ps * col, axis=1)
    if classic_solar:
        rendered = composite_classic(ps, col, vis, sky)
        gate = None
    else:
        gate = gated_visibility(ps, vis)
        rendered = albedo * (gate + (1.0 - gate) * jnp.mean(sky, axis=1))

    results = {
        "rendered": rendered, "albedo": albedo,
        "pv": pv, "pe": pe, "ps": ps,
        "rho": rho, "col": col, "vis": vis, "sky": sky,
        "class_probs": probs, "adjust": adjust,
        "pts": pts, "deltas": deltas,
    }

    if prior_hm is not None:
        rho_sup = supervised_sigma(prior_hm, flat, deltas.reshape(-1, 1))
        rho_sup = rho_sup.reshape(R, S, 1)
        pv_s, pe_s, ps_s = pv_pe_ps(rho_sup, deltas)
        rho_m = rho * model_trust + rho_sup * (1.0 - model_trust)
        pv_m, pe_m, ps_m = pv_pe_ps(rho_m, deltas)
        albedo_m = jnp.sum(ps_m * col, axis=1)
        if classic_solar:
            rendered_sup = composite_classic(ps_s, col, vis, sky)
            rendered_m = composite_classic(ps_m, col, vis, sky)
        else:
            rendered_sup = jnp.sum(ps_s * col, axis=1) * (
                gate + (1.0 - gate) * jnp.mean(sky, axis=1))
            rendered_m = albedo_m * (gate + (1.0 - gate) * jnp.mean(sky, axis=1))
        results.update({
            "rho_sup": rho_sup, "pv_sup": pv_s, "pe_sup": pe_s, "ps_sup": ps_s,
            "rendered_sup": rendered_sup,
            "rho_merged": rho_m, "pv_merged": pv_m, "pe_merged": pe_m,
            "ps_merged": ps_m, "rendered_merged": rendered_m,
            # with a prior the albedo used downstream is the merged one
            "albedo": albedo_m,
        })
    return results, updates


def eval_rho_only(model, variables, rng, tops, bots, sun, t4, *,
                  n_samples, train=False, prior_hm=None, model_trust=1.0,
                  mutable=False, remat=False, pallas_spec=None):
    """Density+solar-visibility along rays (the solar-correction pass,
    Eval_Tools_2.py:297-337).  Gradients are blocked from the trunk by the
    module's forward_solar.  Returns (results, updates)."""
    R, S = tops.shape[0], n_samples
    pts, deltas = sample_coarse(rng, tops, bots, S, train=train, include_end=True)
    flat = pts.reshape(-1, 3)

    # per-ray solar constants, broadcast to the samples (see eval_rays)
    _, sun_pe_r, sky_raw_r = model.apply(
        variables, sun, None, train=train, method="ray_consts")
    bcast = lambda a: jnp.broadcast_to(
        a[:, None, :], (R, S, a.shape[-1])).reshape(-1, a.shape[-1])
    sun_pe_f, sky_raw_f = bcast(sun_pe_r), bcast(sky_raw_r)

    if pallas_spec is not None and train:
        from season_nerf_tpu.ops import pallas_train as _pt
        out, updates = _pt.fused_forward_solar(
            model, variables, pallas_spec, flat, sun_pe_f, sky_raw_f,
            train=True, mutable=mutable)
    else:
        def net(v, f, spe_, skr_):
            kw = dict(sun_pe=spe_, sky_raw=skr_, train=train,
                      method="forward_solar")
            if mutable:
                return model.apply(v, f, None, mutable=["batch_stats"], **kw)
            return model.apply(v, f, None, **kw), None

        if remat:
            net = jax.checkpoint(net, policy=_remat_policy(remat))
        out, updates = net(variables, flat, sun_pe_f, sky_raw_f)

    rho = out["rho"].reshape(R, S, 1)
    vis = out["vis"].reshape(R, S, 1)

    if prior_hm is not None:
        # clamp supervision to in-cube samples (Eval_Tools_2.py:319-326)
        good = jnp.all((flat <= 1.0) & (flat >= -1.0), axis=1)
        rho_sup = supervised_sigma(prior_hm, flat, deltas.reshape(-1, 1))
        rho_sup = jnp.where(good[:, None], rho_sup,
                            jax.lax.stop_gradient(out["rho"]))
        rho_sup = rho_sup.reshape(R, S, 1)
        rho_eff = rho * model_trust + rho_sup * (1.0 - model_trust)
    else:
        rho_eff = rho
    pv, pe, _ = pv_pe_ps(rho_eff, deltas)
    return {"pe": pe, "pv_exact": pv, "vis": vis,
            "sky_raw": out["sky_raw"].reshape(R, S, -1),
            "pts": pts, "deltas": deltas}, updates

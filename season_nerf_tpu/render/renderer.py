"""Novel-view rendering: the inference stack.

TPU-first redesign of the reference's three render paths:
- ``Quick_Run.render_img`` / ``get_DSM`` (Quick_Run.py:173-226): whole-image
  render at arbitrary view/sun angle + time, nadir expected-height DSM;
- ``mg_Img_Eval._internal_render`` + ``component_render_by_P/dir``
  (mg_Img_Eval.py:17-115): per-sample raw component capture (rho, base
  color, per-class adjusts, solar vis, optional exact secondary-ray solar
  transmittance);
- ``get_imgs_from_Img_Dict`` (mg_Img_Eval.py:123-190): compositing the raw
  components into Base / Season-Adjusted / per-class Extreme images, shadow
  masks and shadow-adjust maps.

Everything renders through fixed-shape jitted chunk kernels (padded final
chunk), so each chunk is one XLA program: sampling, MLP, transmittance
cumsum, and composite fuse into a single device launch.
"""

from __future__ import annotations

import functools
import threading
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from season_nerf_tpu.models.tnerf import TNeRF
from season_nerf_tpu.ops import rendering
from season_nerf_tpu.ops.sampling import sample_coarse, out_of_cube
from season_nerf_tpu.utils import heartbeat


def encode_time(year_frac, day_frac=0.0):
    """4-dim periodic time encoding (Quick_Run.py:9-12)."""
    return np.array([np.cos(year_frac * 2 * np.pi), np.sin(year_frac * 2 * np.pi),
                     np.cos(day_frac * 2 * np.pi), np.sin(day_frac * 2 * np.pi)],
                    dtype=np.float32)


def dir_grid_rays(view_vec, out_size):
    """Rays for an orthographic view along ``view_vec`` over the cube
    footprint: grid on the z=0 plane, extended to z=+-1
    (component_render_by_dir, mg_Img_Eval.py:99-104)."""
    h, w = out_size[0], out_size[1]
    xs = np.linspace(1, -1, h)
    ys = np.linspace(-1, 1, w)
    XY = np.stack(np.meshgrid(xs, ys, indexing="ij"), -1).reshape(-1, 2)
    XYZ = np.concatenate([XY, np.zeros((XY.shape[0], 1))], 1)
    v = np.asarray(view_vec, np.float64)
    tops = XYZ + (v / v[2])[None, :]
    bots = XYZ - (v / v[2])[None, :]
    img_pts = np.stack(np.meshgrid(np.arange(h), np.arange(w),
                                   indexing="ij"), -1).reshape(-1, 2)
    return (tops.astype(np.float32), bots.astype(np.float32), img_pts)


def perspective_rays(position, pitch_deg, yaw_deg, fov_deg, out_size,
                     z_clip=(1.0, -1.0)):
    """Free perspective camera rays (mg_movie_maker.sample_rays_projective,
    :52-70): camera at ``position`` (cube coords), oriented by pitch (down
    from horizontal) and yaw (about z), square FOV.  Rays are clipped to the
    cube's z range.  Returns (tops, bots, img_pts)."""
    h, w = out_size[0], out_size[1]
    fy = np.tan(np.deg2rad(fov_deg) / 2)
    vv = np.linspace(fy, -fy, h)
    uu = np.linspace(-fy, fy, w)
    V, U = np.meshgrid(vv, uu, indexing="ij")
    d = np.stack([np.ones_like(U), U, V], -1).reshape(-1, 3)  # cam frame: +x fwd
    cp, sp = np.cos(np.deg2rad(pitch_deg)), np.sin(np.deg2rad(pitch_deg))
    cy, sy = np.cos(np.deg2rad(yaw_deg)), np.sin(np.deg2rad(yaw_deg))
    R_pitch = np.array([[cp, 0, -sp], [0, 1, 0], [sp, 0, cp]])
    R_yaw = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    d = d @ (R_yaw @ R_pitch).T
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    p = np.asarray(position, np.float64)
    dz = np.where(np.abs(d[:, 2]) < 1e-6, -1e-6, d[:, 2])
    t_top = (z_clip[0] - p[2]) / dz
    t_bot = (z_clip[1] - p[2]) / dz
    t0 = np.minimum(t_top, t_bot)
    t1 = np.maximum(t_top, t_bot)
    t0 = np.maximum(t0, 0.0)
    tops = p[None] + t0[:, None] * d
    bots = p[None] + t1[:, None] * d
    img_pts = np.stack(np.meshgrid(np.arange(h), np.arange(w),
                                   indexing="ij"), -1).reshape(-1, 2)
    good = t1 > t0
    return (tops[good].astype(np.float32), bots[good].astype(np.float32),
            img_pts[good])


def camera_grid_rays(cam, out_size):
    """Rays through a fitted camera on an out_size grid of its image plane
    (component_render_by_P, mg_Img_Eval.py:76-90)."""
    h_img, w_img = cam.img_shape[0], cam.img_shape[1]
    rr = np.round(np.linspace(0, h_img - 1, out_size[0])).astype(int)
    cc = np.round(np.linspace(0, w_img - 1, out_size[1])).astype(int)
    RC = np.stack(np.meshgrid(rr, cc, indexing="ij"), -1).reshape(-1, 2)
    x1, y1, _ = cam.backproject(RC[:, 0], RC[:, 1], 1.0)
    x0, y0, _ = cam.backproject(RC[:, 0], RC[:, 1], -1.0)
    tops = np.stack([x1, y1, np.ones_like(x1)], -1).astype(np.float32)
    bots = np.stack([x0, y0, -np.ones_like(x0)], -1).astype(np.float32)
    good = np.all((tops[:, :2] >= -1) & (tops[:, :2] <= 1)
                  & (bots[:, :2] >= -1) & (bots[:, :2] <= 1), axis=1)
    img_pts = np.stack(np.meshgrid(np.arange(out_size[0]),
                                   np.arange(out_size[1]),
                                   indexing="ij"), -1).reshape(-1, 2)
    return tops[good], bots[good], img_pts[good], RC[good]


def render_chunk_outputs(model, variables, tops, bots, sun, t4, *,
                         n_samples: int, classic_solar: bool,
                         with_samples: bool = False):
    """The full-composite per-chunk render contract: per-ray rendered
    color, raw shadow visibility, expected surface height, accumulated
    opacity.  The single source of truth shared by ``Renderer._full_chunk``
    and ``tools/export_render.py`` — the exported StableHLO artifact
    matches the live renderer by construction, not by a parallel copy.

    ``with_samples`` additionally returns the per-sample hit weights and
    sample points so an exact-shadow pass can cast secondary rays from the
    SAME samples the composite used (eval_exact_solar, Eval_Tools_2.py:274)
    without a second primary network pass."""
    out, _ = rendering.eval_rays(
        model, variables, None, tops, bots, sun, t4,
        n_samples=n_samples, train=False, classic_solar=classic_solar,
        mask_out_of_cube=True)
    shadow = jnp.sum(out["ps"] * out["vis"], axis=1)[:, 0]
    surf, _ = rendering.expected_surface(out["ps"], out["pts"],
                                         out["deltas"])
    res = {"rendered": out["rendered"], "shadow_raw": shadow,
           "height": surf[:, 2], "ps_sum": jnp.sum(out["ps"], (1, 2))}
    if with_samples:
        res["ps"] = out["ps"][:, :, 0]
        res["pts"] = out["pts"]
    return res


def surface_window(model, variables, tops, bots, n_coarse: int,
                   support_frac: float = 0.05, margin_bins: float = 1.5):
    """Per-ray surface support window from a sigma-only coarse pass.

    Satellite scenes have thin, well-localized surfaces (the DSM prior
    drives training toward them), so almost all of a ray's hit probability
    lives in a short interval.  Runs the sigma head only on ``n_coarse``
    uniform samples and finds each ray's surface support: the smallest
    t-window covering every sample whose hit probability exceeds
    ``support_frac`` of the ray's max (bimodal rays get a window spanning
    both modes), padded by ``margin_bins`` coarse bins.  Rays with no
    surface evidence fall back to the full [0, 1] window.  Everything is
    static-shape: the window is per-ray arithmetic, never a gather or a
    dynamic slice.

    Returns (t_lo, t_hi): fractions along top->bot, each [R]."""
    R = tops.shape[0]
    pts_c, deltas_c = sample_coarse(None, tops, bots, n_coarse, train=False,
                                    include_end=True)
    rho_c = model.apply(variables, pts_c.reshape(-1, 3), train=False,
                        method="sigma_only").reshape(R, n_coarse, 1)
    _, _, ps_c = rendering.pv_pe_ps(rho_c, deltas_c)
    ps_c = ps_c[..., 0]                                   # [R, Sc]
    ts_c = jnp.linspace(0.0, 1.0, n_coarse)
    max_ps = jnp.max(ps_c, axis=1, keepdims=True)
    support = ps_c > support_frac * max_ps                # [R, Sc]
    pad = margin_bins / n_coarse
    t_lo = jnp.min(jnp.where(support, ts_c[None], 1.0), axis=1) - pad
    t_hi = jnp.max(jnp.where(support, ts_c[None], 0.0), axis=1) + pad
    # no surface evidence -> full ray (empty rays composite to ~0 either
    # way, but the window must stay well-formed)
    empty = max_ps[:, 0] < 1e-6
    t_lo = jnp.where(empty, 0.0, t_lo)
    t_hi = jnp.where(empty, 1.0, t_hi)
    min_w = 2.0 / n_coarse
    t_lo = jnp.clip(t_lo, 0.0, 1.0 - min_w)
    t_hi = jnp.clip(jnp.maximum(t_hi, t_lo + min_w), 0.0, 1.0)
    return t_lo, t_hi


def window_points(tops, bots, t_lo, t_hi, n_fine: int):
    """``n_fine`` bin-center samples of each ray's [t_lo, t_hi] window.
    Returns (pts [R, n_fine, 3], deltas [R, n_fine, 1])."""
    R = tops.shape[0]
    ts_f = (jnp.arange(n_fine, dtype=jnp.float32) + 0.5) / n_fine
    tt = t_lo[:, None] + (t_hi - t_lo)[:, None] * ts_f[None, :]  # [R, Sf]
    pts = (tops[:, None, :] * (1.0 - tt[:, :, None])
           + bots[:, None, :] * tt[:, :, None])
    raylen = jnp.sqrt(jnp.sum((tops - bots) ** 2, axis=1))
    deltas = ((t_hi - t_lo) * raylen / n_fine)[:, None, None]
    return pts, jnp.broadcast_to(deltas, (R, n_fine, 1))


def render_chunk_outputs_fast(model, variables, tops, bots, sun, t4, *,
                              n_coarse: int, n_fine: int,
                              classic_solar: bool,
                              with_samples: bool = False,
                              support_frac: float = 0.05,
                              margin_bins: float = 1.5):
    """Depth-guided fast render: same output contract as
    ``render_chunk_outputs`` at a fraction of the network cost.

    Pass 1 finds each ray's surface support (``surface_window``); pass 2
    runs the full network on ``n_fine`` samples inside that window and
    composites exactly like the uniform path (Eval_Tools_2.py:205-215
    semantics).  This path is inference-only and opt-in — training and
    (by default) the eval component renders keep the uniform sampler.
    """
    R = tops.shape[0]
    t_lo, t_hi = surface_window(model, variables, tops, bots, n_coarse,
                                support_frac, margin_bins)
    pts, deltas = window_points(tops, bots, t_lo, t_hi, n_fine)
    deltas = jnp.where(out_of_cube(pts)[..., None], 0.0, deltas)

    probs_r, sun_pe_r, sky_raw_r = model.apply(
        variables, sun, t4, train=False, method="ray_consts")
    bcast = lambda a: jnp.broadcast_to(
        a[:, None, :], (R, n_fine, a.shape[-1])).reshape(-1, a.shape[-1])
    out = model.apply(variables, pts.reshape(-1, 3), None, None,
                      probs=bcast(probs_r), sun_pe=bcast(sun_pe_r),
                      sky_raw=bcast(sky_raw_r), train=False)
    rho = out["rho"].reshape(R, n_fine, 1)
    col = out["col"].reshape(R, n_fine, -1)
    vis = out["vis"].reshape(R, n_fine, 1)
    sky = out["sky"].reshape(R, n_fine, -1)

    _, _, ps = rendering.pv_pe_ps(rho, deltas)
    if classic_solar:
        rendered = rendering.composite_classic(ps, col, vis, sky)
    else:
        albedo = jnp.sum(ps * col, axis=1)
        gate = rendering.gated_visibility(ps, vis)
        rendered = albedo * (gate + (1.0 - gate) * jnp.mean(sky, axis=1))
    shadow = jnp.sum(ps * vis, axis=1)[:, 0]
    surf, _ = rendering.expected_surface(ps, pts, deltas)
    res = {"rendered": rendered, "shadow_raw": shadow,
           "height": surf[:, 2], "ps_sum": jnp.sum(ps, (1, 2))}
    if with_samples:
        res["ps"] = ps[:, :, 0]
        res["pts"] = pts
    return res


class Renderer:
    """Whole-image renderer over a trained T-NeRF."""

    def __init__(self, model: TNeRF, variables, n_samples=96, chunk=5_120,
                 classic_solar=False, sun_frame: Optional[np.ndarray] = None,
                 use_hsluv: bool = False, mesh=None,
                 fast_render: Optional[tuple] = None):
        self.model = model
        self.variables = variables
        self.n_samples = n_samples
        # depth-guided fast rendering: (n_coarse, n_fine) or None (exact).
        # Opt-in.  Applies to both the full-composite path and the
        # component render path (_component_chunk); the eval pipeline
        # never passes fast_render, so scored quality tables always use
        # the exact uniform sampler.
        self.fast_render = tuple(fast_render) if fast_render else None
        # chunk is rays per dispatch (the reference's max_input_size /
        # --chunk semantics, opt2.py:110; output is chunk-invariant).
        # 5120 x 96 samples ~ 0.5M points per XLA launch measured fastest
        # on v5e (Config.chunk note); any value can be forced via --chunk
        self.chunk = max(chunk, 16)
        # guards the compile-failure chunk-shrink fallback: render_movie's
        # pipelined worker threads share this Renderer, and without the
        # lock both threads can catch the same compile failure and each
        # halve self.chunk (net quartering) — ADVICE r4
        self._chunk_lock = threading.Lock()
        self.classic_solar = classic_solar
        self.sun_frame = sun_frame
        # data-parallel inference: rays of every chunk sharded over the
        # mesh's data axis, params replicated — the serving-side twin of the
        # training mesh (parallel/mesh.py); rendering needs no collectives
        # at all (each ray is independent)
        self.mesh = mesh if (mesh is not None
                             and np.prod(mesh.devices.shape) > 1) else None
        self._ray_sharding = None
        if self.mesh is not None:
            from season_nerf_tpu.parallel.mesh import (batch_sharding,
                                                       replicated_sharding)
            n_dev = int(np.prod(self.mesh.devices.shape))
            self.chunk = -(-self.chunk // n_dev) * n_dev
            self._ray_sharding = batch_sharding(self.mesh)
            self.variables = jax.device_put(
                variables, replicated_sharding(self.mesh))
        else:
            # Pin the weights on-device ONCE.  A loaded model dir hands the
            # renderer host numpy arrays, and jit does not cache host->device
            # transfers: every chunk dispatch would re-upload the full
            # parameter set (~13 MB for the flagship net) — measured 14x
            # whole-frame slowdown over the tunneled device (2.11 s vs
            # 0.15 s per 128px frame), the dominant term in the round-4
            # serving-vs-bench throughput gap (docs/SERVING_r5.md).
            self.variables = jax.device_put(variables)
        # when the model was trained on HSLuv targets (use_HSLuv flag), its
        # color head lives in normalized-HSLuv space; convert every rendered
        # color back to sRGB so images and metrics compare against RGB ground
        # truth (the reference trains in HSLuv but evals renders against raw
        # RGB — matching that silently-wrong behavior is NOT wanted; see
        # ADVICE r1 and mg_Color_Loader.py:27-29)
        self.use_hsluv = use_hsluv

    # -- jitted chunk kernels ---------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0, 6))
    def _full_chunk(self, variables, tops, bots, sun, t4, with_samples=False):
        # rng=None: inference sampling is deterministic (no jitter when
        # train=False); passing no key makes that explicit instead of
        # threading a fixed PRNGKey that would silently reuse if anyone
        # flipped train semantics
        if self.fast_render is not None:
            nc, nf = self.fast_render
            return render_chunk_outputs_fast(
                self.model, variables, tops, bots, sun, t4, n_coarse=nc,
                n_fine=nf, classic_solar=self.classic_solar,
                with_samples=with_samples)
        return render_chunk_outputs(self.model, variables, tops, bots, sun,
                                    t4, n_samples=self.n_samples,
                                    classic_solar=self.classic_solar,
                                    with_samples=with_samples)

    def _full_chunk_samples(self, variables, tops, bots, sun, t4):
        return self._full_chunk(variables, tops, bots, sun, t4, True)

    @property
    def _out_samples(self):
        """Samples per ray in full-composite outputs (ps/pts): n_fine under
        fast rendering, n_samples on the exact path."""
        return self.fast_render[1] if self.fast_render else self.n_samples

    @functools.partial(jax.jit, static_argnums=0)
    def _component_chunk(self, variables, tops, bots, sun, t4):
        """forward_seperate capture: per-sample raw components with deltas
        zeroed outside the cube (mg_Img_Eval.py:38-55).  Under fast
        rendering the samples concentrate in each ray's surface window
        (surface_window) — same per-sample contract at n_fine rows."""
        if self.fast_render is not None:
            nc, S = self.fast_render
            t_lo, t_hi = surface_window(self.model, variables, tops, bots,
                                        nc)
            pts, deltas = window_points(tops, bots, t_lo, t_hi, S)
        else:
            S = self.n_samples
            pts, deltas = sample_coarse(None, tops, bots, S, train=False,
                                        include_end=True)
        deltas = jnp.where(out_of_cube(pts)[..., None], 0.0, deltas)
        R = tops.shape[0]
        flat = pts.reshape(-1, 3)
        # the time/sun/sky branches are constant per ray — evaluate once per
        # ray and broadcast (bit-identical, 1/S the rows; TNeRF.ray_consts)
        probs_r, sun_pe_r, sky_raw_r = self.model.apply(
            variables, sun, t4, train=False, method="ray_consts")
        bcast = lambda a: jnp.broadcast_to(
            a[:, None, :], (R, S, a.shape[-1])).reshape(-1, a.shape[-1])
        out = self.model.apply(variables, flat, None, None,
                               probs=bcast(probs_r), sun_pe=bcast(sun_pe_r),
                               sky_raw=bcast(sky_raw_r),
                               train=False, method="forward_separate")
        C = self.model.n_classes
        return {
            "pts": pts, "deltas": deltas,
            "rho": out["rho"].reshape(R, S, 1),
            "col_raw": out["col_raw"].reshape(R, S, 3),
            "vis": out["vis"].reshape(R, S, 1),
            "sky": out["sky"].reshape(R, S, 3),
            "class_probs": out["class_probs"].reshape(R, S, C),
            "adjust_per_class": out["adjust_per_class"].reshape(R, S, C, 3),
        }

    @functools.partial(jax.jit, static_argnums=0)
    def _exact_solar_chunk(self, variables, pts, sun_vec):
        """Exact secondary-ray solar transmittance at every sample point
        (mg_Img_Eval.py:57-70): cast a sun ray from each point to z=+1,
        integrate sigma along it.  pts: [N, 3] flat sample points.

        The O(N*S) secondary points are never materialized: a lax.scan over
        the S-1 secondary steps evaluates sigma for all N rays at one depth
        at a time and accumulates the optical depth — O(N) memory for the
        n_samples^2 render (the blowup SURVEY.md §5 flags)."""
        S = self.n_samples
        k = (1.0 - pts[:, 2]) / sun_vec[2]
        tops = pts + k[:, None] * sun_vec[None, :]
        delta = jnp.sqrt(jnp.sum((tops - pts) ** 2, axis=1))[:, None] / S

        def step(tau, j):
            s = j.astype(jnp.float32) / (S - 1)
            spts = tops * (1.0 - s) + pts * s
            d = jnp.where(out_of_cube(spts)[:, None], 0.0, delta)
            rho = self.model.apply(variables, spts, train=False,
                                   method="sigma_only")
            return tau + rho * d, None

        # transmittance to the endpoint excludes the final segment: steps
        # j = 0 .. S-2 over the inclusive [0, 1] sample positions
        tau, _ = jax.lax.scan(step, jnp.zeros((pts.shape[0], 1)),
                              jnp.arange(S - 1))
        return jnp.exp(-tau)[:, 0]

    def _exact_solar_points(self, pts_flat, sun_vec):
        """Exact solar transmittance at [N, 3] flat sample points, chunked.
        Each dispatch casts S secondary samples for c points -> c*S network
        evals per launch (one core's worth)."""
        sv = jnp.asarray(sun_vec, jnp.float32)
        dev, pads = [], []
        c = max(self.chunk, 16)
        for s in range(0, pts_flat.shape[0], c):
            part = pts_flat[s:s + c]
            pad = c - part.shape[0]
            if pad:
                part = np.concatenate(
                    [part, np.repeat(part[-1:], pad, 0)], 0)
            dev.append(self._exact_solar_chunk(
                self.variables, self._put(part), sv))
            pads.append(pad)
            heartbeat.beat()
        chunks = [v[:v.shape[0] - pad] if pad else v
                  for v, pad in zip(jax.device_get(dev), pads)]
        return np.concatenate(chunks, 0)

    # -- chunked drivers ---------------------------------------------------
    def _put(self, arr):
        """Chunk array -> device: sharded over the mesh's data axis when a
        mesh is set, plain transfer otherwise."""
        if self._ray_sharding is not None:
            return jax.device_put(arr, self._ray_sharding)
        return jnp.asarray(arr)

    # substrings identifying a *compiler* failure (vs a real runtime error):
    # the TPU register allocator RET_CHECKs on very large fused render
    # kernels, and tunneled remote-compile services surface that as an
    # INTERNAL/HTTP-500 — both are cured by a smaller chunk
    _COMPILE_FAIL_MARKS = ("RET_CHECK", "regalloc", "remote_compile",
                           "tpu_compile_helper")
    # ... but the remote-compile 500s are also how *transient* service
    # flakes surface, indistinguishable from size-induced failures from
    # here, so those get one same-size retry before the chunk shrinks
    _MAYBE_TRANSIENT_MARKS = ("remote_compile", "tpu_compile_helper")

    def _run_chunks(self, kernel, tops, bots, sun, t4, extra_keys):
        """Chunked dispatch with compile-failure fallback: if XLA's backend
        cannot compile the kernel at the current chunk size (register
        allocator RET_CHECK — docs/DESIGN.md "Compiler limits"), halve the
        chunk (keeping mesh divisibility) and retry instead of losing the
        whole render.  Remote-compile failures get one retry at the same
        size first — a single service flake must not permanently halve the
        chunk for the Renderer's lifetime."""
        n_dev = (int(np.prod(self.mesh.devices.shape))
                 if self.mesh is not None else 1)
        floor = 256 * n_dev
        retried_same_size = None
        while True:
            attempt_chunk = self.chunk
            try:
                return self._run_chunks_once(kernel, tops, bots, sun, t4,
                                             extra_keys, attempt_chunk)
            except jax.errors.JaxRuntimeError as e:
                msg = str(e)
                retryable = any(m in msg for m in self._COMPILE_FAIL_MARKS)
                if not retryable or attempt_chunk <= floor:
                    raise
                import warnings
                deterministic = any(m in msg for m in ("RET_CHECK",
                                                       "regalloc"))
                if (not deterministic
                        and any(m in msg for m in self._MAYBE_TRANSIENT_MARKS)
                        and retried_same_size != attempt_chunk):
                    retried_same_size = attempt_chunk
                    warnings.warn(
                        f"remote compile failed at chunk={attempt_chunk} "
                        f"({msg.splitlines()[0][:120]}); retrying once at "
                        "the same size (may be a transient service flake)",
                        stacklevel=2)
                    continue
                # render_movie's worker threads share this Renderer: only
                # one thread may shrink per failing size, or the same
                # failure shrinks twice (ADVICE r4)
                with self._chunk_lock:
                    if self.chunk >= attempt_chunk:
                        new_chunk = max(
                            (attempt_chunk // 2 // n_dev) * n_dev, floor)
                        warnings.warn(
                            "render kernel failed to compile at "
                            f"chunk={attempt_chunk} "
                            f"({msg.splitlines()[0][:120]}); retrying at "
                            f"chunk={new_chunk}", stacklevel=2)
                        self.chunk = new_chunk

    def _run_chunks_once(self, kernel, tops, bots, sun, t4, extra_keys,
                         chunk=None):
        n = tops.shape[0]
        c = self.chunk if chunk is None else chunk
        device_outs = []      # keep results on device; one fetch at the end
        pads = []             # so chunk dispatches pipeline instead of
        for s in range(0, n, c):   # paying a host round-trip per chunk
            tt, bb = tops[s:s + c], bots[s:s + c]
            ss, t44 = sun[s:s + c], t4[s:s + c]
            pad = c - tt.shape[0]
            if pad:
                tt = np.concatenate([tt, np.repeat(tt[-1:], pad, 0)], 0)
                bb = np.concatenate([bb, np.repeat(bb[-1:], pad, 0)], 0)
                ss = np.concatenate([ss, np.repeat(ss[-1:], pad, 0)], 0)
                t44 = np.concatenate([t44, np.repeat(t44[-1:], pad, 0)], 0)
            device_outs.append(kernel(self.variables, self._put(tt),
                                      self._put(bb), self._put(ss),
                                      self._put(t44)))
            pads.append(pad)
            heartbeat.beat()   # liveness for tools/watchdog_train.py
        outs = {k: [] for k in extra_keys}
        for res, pad in zip(jax.device_get(device_outs), pads):
            for k in extra_keys:
                v = res[k]
                outs[k].append(v[:v.shape[0] - pad] if pad else v)
        return {k: np.concatenate(v, 0) for k, v in outs.items()}

    def render_rays(self, tops, bots, sun_vec, t4_row, with_samples=False):
        """Full composite render of arbitrary rays -> dict of flat arrays.
        ``with_samples`` also returns per-sample ps/pts (for exact shadows)."""
        n = tops.shape[0]
        sun = np.broadcast_to(np.asarray(sun_vec, np.float32), (n, 3))
        t4 = np.broadcast_to(np.asarray(t4_row, np.float32), (n, 4))
        keys = ["rendered", "shadow_raw", "height", "ps_sum"]
        kernel = self._full_chunk
        if with_samples:
            keys += ["ps", "pts"]
            kernel = self._full_chunk_samples
        res = self._run_chunks(kernel, tops.astype(np.float32),
                               bots.astype(np.float32), sun, t4, keys)
        if self.use_hsluv:
            from season_nerf_tpu.utils.hsluv import hsluv_normalized_to_rgb
            res["rendered"] = hsluv_normalized_to_rgb(
                np.clip(res["rendered"], 0, 1)).astype(np.float32)
        return res

    # -- public API --------------------------------------------------------
    def render_img(self, view_el_az, sun_el_az, time_frac, out_size,
                   angles_to_vec=None, exact_shadow=False):
        """Quick_Run.render_img equivalent.  Returns dict with Col_Img,
        Shadow_Mask (gated), Height, and mask.  ``exact_shadow`` adds an
        Exact_Shadow_Mask from secondary-ray transmittance (Quick_Run's
        use_full_solar / eval_exact_solar path, Quick_Run.py:181-185)."""
        to_vec = angles_to_vec or _default_angles_to_vec(self.sun_frame)
        view_vec = to_vec(*view_el_az)
        sun_vec = to_vec(*sun_el_az)
        tops, bots, img_pts = dir_grid_rays(view_vec, (out_size, out_size))
        res = self.render_rays(tops, bots, sun_vec,
                               encode_time(time_frac),
                               with_samples=exact_shadow)
        col = np.zeros((out_size, out_size, 3), np.float32)
        shadow = np.zeros((out_size, out_size), np.float32)
        height = np.full((out_size, out_size), np.nan, np.float32)
        ps_sum = np.zeros((out_size, out_size), np.float32)
        mask = np.zeros((out_size, out_size), bool)
        col[img_pts[:, 0], img_pts[:, 1]] = res["rendered"]
        shadow[img_pts[:, 0], img_pts[:, 1]] = res["shadow_raw"]
        height[img_pts[:, 0], img_pts[:, 1]] = res["height"]
        ps_sum[img_pts[:, 0], img_pts[:, 1]] = res["ps_sum"]
        mask[img_pts[:, 0], img_pts[:, 1]] = True
        out = {"Col_Img": col, "Shadow_Mask": shadow, "Height": height,
               "PS_Sum": ps_sum, "Mask": mask}
        if exact_shadow:
            # secondary sun rays from the SAME sample points the composite
            # used — one primary pass, like the reference's eval_exact_solar
            # (Eval_Tools_2.py:273-295 reuses Results["sample_pts"])
            exact = self._exact_solar_points(
                res["pts"].reshape(-1, 3), sun_vec).reshape(
                    -1, self._out_samples)
            eff = np.sum(res["ps"] * exact, 1)
            ex = np.zeros((out_size, out_size), np.float32)
            ex[img_pts[:, 0], img_pts[:, 1]] = eff
            out["Exact_Shadow_Mask"] = ex
        return out

    def render_perspective(self, position, pitch_deg, yaw_deg, fov_deg,
                           out_size, sun_el_az, time_frac,
                           angles_to_vec=None):
        """Free-camera perspective render (the movie maker's 6-DoF path,
        mg_movie_maker.get_Img:72-187)."""
        to_vec = angles_to_vec or _default_angles_to_vec(self.sun_frame)
        sun_vec = to_vec(*sun_el_az)
        tops, bots, img_pts = perspective_rays(position, pitch_deg, yaw_deg,
                                               fov_deg, (out_size, out_size))
        res = self.render_rays(tops, bots, sun_vec, encode_time(time_frac))
        col = np.zeros((out_size, out_size, 3), np.float32)
        mask = np.zeros((out_size, out_size), bool)
        col[img_pts[:, 0], img_pts[:, 1]] = res["rendered"]
        mask[img_pts[:, 0], img_pts[:, 1]] = True
        return {"Col_Img": col, "Mask": mask}

    def get_dsm(self, out_size, min_ps_sum=1e-2):
        """Nadir expected-height map in [-1, 1] (Quick_Run.get_DSM:207-226).
        NaN where no rays were evaluated or nothing was hit: rays whose
        accumulated hit probability stays under ``min_ps_sum`` carry no
        surface evidence, and the serving /dsm contract ("NaN = no data")
        relies on them being masked rather than reported as confident
        mid-cube heights."""
        out = self.render_img((90.0, 0.0), (90.0, 0.0), 0.0, out_size)
        h = out["Height"].copy()
        h[out["PS_Sum"] < min_ps_sum] = np.nan
        return h

    def component_render(self, tops, bots, sun_vec, year_frac,
                         exact_solar=False):
        """_internal_render equivalent: per-sample raw components."""
        n = tops.shape[0]
        sun = np.broadcast_to(np.asarray(sun_vec, np.float32), (n, 3)).copy()
        t4 = np.broadcast_to(encode_time(year_frac), (n, 4)).copy()
        keys = ["pts", "deltas", "rho", "col_raw", "vis", "sky",
                "class_probs", "adjust_per_class"]
        res = self._run_chunks(self._component_chunk,
                               tops.astype(np.float32),
                               bots.astype(np.float32),
                               sun.astype(np.float32), t4.astype(np.float32),
                               keys)
        if exact_solar:
            res["exact_solar"] = self._exact_solar_points(
                res["pts"].reshape(-1, 3), sun_vec).reshape(
                    n, self._out_samples, 1)
        # mark the color space so images_from_components converts composited
        # colors back to sRGB without every call site having to plumb a flag
        res["hsluv"] = self.use_hsluv
        return res

    def component_render_by_dir(self, view_el_az, sun_el_az, time_frac,
                                out_size, angles_to_vec=None,
                                exact_solar=False):
        to_vec = angles_to_vec or _default_angles_to_vec(self.sun_frame)
        view_vec = to_vec(*view_el_az)
        sun_vec = to_vec(*sun_el_az)
        tops, bots, img_pts = dir_grid_rays(view_vec, out_size)
        res = self.component_render(tops, bots, sun_vec, time_frac,
                                    exact_solar)
        res["img_pts"] = img_pts
        res["sun_vec"] = np.asarray(sun_vec)
        return res

    def component_render_by_camera(self, cam, out_size, exact_solar=False):
        tops, bots, img_pts, gt_pts = camera_grid_rays(cam, out_size)
        res = self.component_render(tops, bots, cam.sun_vec,
                                    cam.time_frac, exact_solar)
        res["img_pts"] = img_pts
        res["gt_img_pts"] = gt_pts
        res["sun_vec"] = np.asarray(cam.sun_vec)
        return res


def _default_angles_to_vec(sun_frame):
    from season_nerf_tpu.geometry.units import elevation_azimuth_to_vec

    def to_vec(el, az):
        v = elevation_azimuth_to_vec(el, az)
        if sun_frame is not None:
            v = sun_frame @ v
            v = v / np.linalg.norm(v)
        return v
    return to_vec


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


def images_from_components(res: Dict[str, np.ndarray], out_size,
                           classic_shadows: bool = False):
    """get_imgs_from_Img_Dict equivalent (mg_Img_Eval.py:123-190): composite
    raw per-sample components into display images.

    Returns Base_Img, Season_Adj_Img, Extreme_Imgs (per class), Shadow_Mask
    (+ exact variants when exact solar was rendered), Shadow_Adjust maps,
    Sky_Col, Time_Class.  Unrendered pixels are NaN.
    """
    rho, deltas = res["rho"], res["deltas"]
    ij = res["img_pts"]
    H, W = out_size[0], out_size[1]
    tau = np.cumsum(rho * deltas, axis=1)
    pv = np.exp(-np.concatenate([np.zeros_like(tau[:, :1]), tau[:, :-1]], 1))
    ps = pv * (1 - np.exp(-rho * deltas))

    # compositing happens in the model's color space; when that space is
    # normalized HSLuv (use_HSLuv training), convert the *composited* colors
    # to sRGB for display/metrics (the reference skips this and scores HSLuv
    # renders against RGB truth — deliberately not matched)
    if res.get("hsluv"):
        from season_nerf_tpu.utils.hsluv import hsluv_normalized_to_rgb

        def to_rgb(v):
            return hsluv_normalized_to_rgb(np.clip(v, 0, 1)).astype(np.float32)
    else:
        def to_rgb(v):
            return v

    sky = res["sky"][0, 0]      # forward_separate emits activated sky color
    sky_disp = to_rgb(sky)
    probs = res["class_probs"]
    mix = np.einsum("rsc,rscd->rsd", probs, res["adjust_per_class"])

    def scatter(vals, ch=3):
        img = np.full((H, W, ch) if ch > 1 else (H, W), np.nan, np.float32)
        img[ij[:, 0], ij[:, 1]] = vals
        return img

    base_cols = np.sum(ps * _sig(res["col_raw"]), 1)
    season_cols = np.sum(ps * _sig(res["col_raw"] + mix), 1)
    extreme = []
    for c in range(res["adjust_per_class"].shape[2]):
        cols = np.sum(ps * _sig(res["col_raw"]
                                + res["adjust_per_class"][:, :, c]), 1)
        extreme.append(scatter(to_rgb(cols)))

    def shadow_maps(vis_key):
        eff = np.sum(ps * res[vis_key], 1)[:, 0]
        raw = scatter(eff, ch=1)
        gated = _sig((raw - 0.2) * 30.0)
        adjust = (gated[..., None]
                  + (1 - gated[..., None]) * sky_disp[None, None])
        if classic_shadows:
            # ratio of shadow-attenuated to plain composite — computed in
            # the model's own color space (it is a multiplicative map)
            term = res[vis_key] + (1 - res[vis_key]) * res["sky"]
            col_adj = _sig(res["col_raw"] + mix) * term
            quasi = np.sum(ps * col_adj, 1) / (season_cols + 1e-8)
            adjust = scatter(quasi)
        return raw, gated, adjust

    raw_sm, sm, adj = shadow_maps("vis")
    out = {
        "Base_Img": scatter(to_rgb(base_cols)),
        "Season_Adj_Img": scatter(to_rgb(season_cols)),
        "Extreme_Imgs": extreme,
        "Shadow_Mask": sm, "Raw_Shadow_Mask": raw_sm, "Shadow_Adjust": adj,
        "Sky_Col": sky_disp,
        "Time_Class": probs[0, 0],
    }
    if "exact_solar" in res:
        raw_e, sm_e, adj_e = shadow_maps("exact_solar")
        out.update({"Shadow_Mask_Exact": sm_e,
                    "Raw_Shadow_Mask_Exact": raw_e,
                    "Shadow_Adjust_Exact": adj_e})
    return out

"""The Season-NeRF network (T-NeRF), as a flax module.

Functional redesign of the reference's ``T_NeRF_Full_2/T_NeRF_net_v2.py``
(T_NeRF) + ``T_NeRF_Full_2/G_NeRF.py`` (G_NeRF_Net_Classic): one module, one
parameter pytree, and the reference's seven ad-hoc forward modes expressed as
method composition over shared submodules.  Architecture (all SIREN):

  trunk:   PE(x; 10 freqs, extended -> 63) -> fc1..fc4 (512)
           -> fc5([fc4, PE]) .. fc8 (512) -> fc9 (256) = x_enc
  heads:   sigma = softplus(fc10_sigma(x_enc))     [G_NeRF.py:74-98]
           col_raw = fc10_col(x_enc)
  solar:   PE(sun; 4 freqs -> 27) ++ x_enc -> fc_solar_1..3 (256)
           -> vis_raw (1)                          [G_NeRF.py:100-122]
  sky:     PE(sun) -> fc_sky_1 (128) -> sky_raw (3)
  time:    PE(t2; 2 freqs -> 10) -> time_1,2 (512) -> class logits (n_cls)
  adjust:  x_enc -> adjust_1..3 (512) -> per-class albedo offsets (n_cls x 3)
           final color = sigmoid(col_raw + sum_c p_c * adjust_c)
                                                   [T_NeRF_net_v2.py:75-105]

The unused reference heads (adjust_rho / adjust_solar_vis / adjust_sky_col,
T_NeRF_net_v2.py:49-51) are kept so reference ``Final_Model.nn`` state dicts
can be converted one-to-one.

Points are processed as flat ``[N, 3]`` batches; the MLP is matmul-dominated
(512-wide layers -> MXU-friendly), and everything composes under jit/vmap/
shard_map.  ``train=True`` switches the trunk BatchNorms to batch statistics
and requires ``mutable=['batch_stats']``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from season_nerf_tpu.models.encodings import positional_encode, encoded_size
from season_nerf_tpu.models.siren import SineLayer, torch_dense


class GNeRF(nn.Module):
    """Position trunk + sigma/color/solar-visibility/sky heads."""
    layer_width: int = 512
    n_layers: int = 8          # trunk depth (the reference's fc_layers flag,
    #                            opt2.py:79-82 — defined there, dead there;
    #                            honored here).  Skip concat at depth//2 + 1.
    pe_pose: int = 10
    pe_solar: int = 4
    n_channels: int = 3
    extended: bool = True
    use_norm: bool = True
    dtype: Any = None
    fast_sine: bool = False

    def setup(self):
        lw = self.layer_width
        lw2 = max(lw // 2, 1)
        lw4 = max(lw // 4, 1)
        fs = self.fast_sine
        # fc1..fcN names match the reference state dict at the default depth
        self.trunk = [
            SineLayer(lw, is_first=(i == 1),
                      use_norm=(self.use_norm and i > 1),
                      dtype=self.dtype, fast_sine=fs, name=f"fc{i}")
            for i in range(1, self.n_layers + 1)]
        self.fc9 = SineLayer(lw2, use_norm=self.use_norm, dtype=self.dtype,
                             fast_sine=fs, name="fc9")
        in_pose = encoded_size(3, self.pe_pose, self.extended)
        in_solar = encoded_size(3, self.pe_solar, self.extended)
        self.fc10_col = torch_dense(self.n_channels, lw2, name="fc10_col", dtype=self.dtype)
        self.fc10_sigma = torch_dense(1, lw2, name="fc10_sigma", dtype=self.dtype)
        self.fc_solar_1 = SineLayer(lw2, is_first=True, dtype=self.dtype,
                                    fast_sine=fs, name="fc_solar_1")
        self.fc_solar_2 = SineLayer(lw2, dtype=self.dtype, fast_sine=fs, name="fc_solar_2")
        self.fc_solar_3 = SineLayer(lw2, dtype=self.dtype, fast_sine=fs, name="fc_solar_3")
        self.fc_solar_4 = torch_dense(1, lw2, name="fc_solar_4", dtype=self.dtype)
        self.fc_sky_1 = SineLayer(lw4, is_first=True, dtype=self.dtype,
                                  fast_sine=fs, name="fc_sky_1")
        self.fc_sky_2 = torch_dense(3, lw4, name="fc_sky_2", dtype=self.dtype)

    def encode_x(self, x, train=False):
        pe = positional_encode(x, self.pe_pose, self.extended)
        skip = self.n_layers // 2 + 1    # fc5 at the default depth of 8
        h = pe
        for i, layer in enumerate(self.trunk, start=1):
            if i == skip and i > 1:
                # skip concat without materializing [N, 575]: the layer's
                # SplitDense computes h @ k[:w] + pe @ k[w:] (models/siren.py)
                h = layer(h, train, extra=pe)
            else:
                h = layer(h, train)
        return self.fc9(h, train)

    def position(self, x, train=False):
        """-> (x_enc, rho_raw, col_raw)"""
        x_enc = self.encode_x(x, train)
        f32 = lambda a: a.astype(jnp.float32)
        return x_enc, f32(self.fc10_sigma(x_enc)), f32(self.fc10_col(x_enc))

    def solar(self, x_enc, sun_dir, train=False, sun_pe=None, sky_raw=None):
        """-> (vis_raw, sky_raw).

        ``sun_pe`` / ``sky_raw``: optional precomputed per-point values.  The
        sun direction is constant across a ray's samples and the sky branch
        has no BatchNorm, so ray-aware callers encode the sun and evaluate
        the sky MLP once per RAY and broadcast (bit-identical at 1/S the
        rows); the default per-point path stays for API parity."""
        if sun_pe is None:
            sun_pe = positional_encode(sun_dir, self.pe_solar, self.extended)
        # [x_enc ++ sun_pe] without materializing the concat (SplitDense)
        a = self.fc_solar_1(x_enc, train, extra=sun_pe)
        a = self.fc_solar_2(a, train)
        a = self.fc_solar_3(a, train)
        vis_raw = self.fc_solar_4(a).astype(jnp.float32)
        if sky_raw is None:
            sky_raw = self.fc_sky_2(
                self.fc_sky_1(sun_pe, train)).astype(jnp.float32)
        return vis_raw, sky_raw

    def solar_ray_consts(self, sun_dir, train=False):
        """Per-ray solar constants -> (sun_pe [R, pe], sky_raw [R, 3])."""
        sun_pe = positional_encode(sun_dir, self.pe_solar, self.extended)
        sky_raw = self.fc_sky_2(self.fc_sky_1(sun_pe, train)).astype(jnp.float32)
        return sun_pe, sky_raw


class TNeRF(nn.Module):
    """Season-NeRF: GNeRF + seasonal class head + per-class albedo adjust."""
    layer_width: int = 512
    n_layers: int = 8
    n_classes: int = 4
    pe_pose: int = 10
    pe_solar: int = 4
    pe_time: int = 2
    n_channels: int = 3
    extended: bool = True
    use_norm: bool = True
    dtype: Any = None
    fast_sine: bool = False

    def setup(self):
        lw = self.layer_width
        lw2 = max(lw // 2, 1)
        fs = self.fast_sine
        self.gnerf = GNeRF(layer_width=lw, n_layers=self.n_layers,
                           pe_pose=self.pe_pose,
                           pe_solar=self.pe_solar, n_channels=self.n_channels,
                           extended=self.extended, use_norm=self.use_norm,
                           dtype=self.dtype, fast_sine=fs, name="gnerf")
        self.time_1 = SineLayer(lw, is_first=True, dtype=self.dtype,
                                fast_sine=fs, name="time_1")
        self.time_2 = SineLayer(lw, dtype=self.dtype, fast_sine=fs, name="time_2")
        self.class_head = torch_dense(self.n_classes, lw, name="class_head", dtype=self.dtype)
        self.adjust_1 = SineLayer(lw, dtype=self.dtype, fast_sine=fs, name="adjust_1")
        self.adjust_2 = SineLayer(lw, dtype=self.dtype, fast_sine=fs, name="adjust_2")
        self.adjust_3 = SineLayer(lw, dtype=self.dtype, fast_sine=fs, name="adjust_3")
        self.adjust_col = torch_dense(self.n_classes * 3, lw, name="adjust_col", dtype=self.dtype)
        # unused-by-forward heads kept for reference-checkpoint parity
        self.adjust_rho = torch_dense(self.n_classes, lw, name="adjust_rho")
        self.adjust_solar_vis = torch_dense(self.n_classes, lw, name="adjust_solar_vis")
        self.adjust_sky_col = torch_dense(self.n_classes * 3, lw, name="adjust_sky_col")

    # -- branch helpers -----------------------------------------------------
    def class_probs(self, t4, train=False):
        """Seasonal class softmax from the 4-dim periodic time encoding
        (only the year-fraction pair is used, T_NeRF_net_v2.py:72-78)."""
        t2 = t4[..., 0:2]
        te = positional_encode(t2, self.pe_time, self.extended)
        h = self.time_2(self.time_1(te, train), train)
        return jax.nn.softmax(self.class_head(h).astype(jnp.float32), axis=-1)

    def adjust_from_enc(self, x_enc, train=False):
        """Per-class albedo adjust [N, n_classes, 3]."""
        y = self.adjust_3(self.adjust_2(self.adjust_1(x_enc, train), train), train)
        return self.adjust_col(y).astype(jnp.float32).reshape(
            x_enc.shape[0], self.n_classes, 3)

    # -- forward modes ------------------------------------------------------
    def ray_consts(self, sun_dir, t4, train=False):
        """All ray-constant branch outputs from per-ray inputs:
        -> (class_probs [R, C], sun_pe [R, pe], sky_raw [R, 3]).
        Ray-aware callers (ops/rendering.eval_rays) evaluate these once per
        ray and broadcast to the samples — bit-identical to the per-point
        forward at 1/S the rows (none of these branches has BatchNorm)."""
        probs = self.class_probs(t4, train) if t4 is not None else None
        sun_pe, sky_raw = self.gnerf.solar_ray_consts(sun_dir, train)
        return probs, sun_pe, sky_raw

    def __call__(self, x, sun_dir, t4, train=False, probs=None,
                 sun_pe=None, sky_raw=None):
        """Full forward (T_NeRF_net_v2.py:75-105).

        Returns dict with activated outputs:
          rho [N,1], col [N,3] (season-adjusted, sigmoided), vis [N,1],
          sky [N,3], class_probs [N,C], adjust [N,3] (class-mixed, raw).

        ``probs``: optional precomputed class probabilities [N, C].  The time
        branch is a pure function of t4, which is constant across a ray's
        samples — callers that know the ray structure (ops/rendering.eval_rays)
        evaluate ``class_probs`` once per RAY and broadcast, instead of paying
        the two 512-wide time layers once per POINT (96x the rows for
        bit-identical outputs; the branch has no BatchNorm, so there is no
        batch-statistics coupling).
        """
        x_enc, rho_raw, col_raw = self.gnerf.position(x, train)
        vis_raw, sky_raw = self.gnerf.solar(x_enc, sun_dir, train,
                                            sun_pe=sun_pe, sky_raw=sky_raw)
        probs = self.class_probs(t4, train) if probs is None else probs
        adj = self.adjust_from_enc(x_enc, train)
        adjust_mixed = jnp.sum(adj * probs[:, :, None], axis=1)
        return {
            "rho": jax.nn.softplus(rho_raw),
            "col": jax.nn.sigmoid(col_raw + adjust_mixed),
            "vis": jax.nn.sigmoid(vis_raw),
            "sky": jax.nn.sigmoid(sky_raw),
            "class_probs": probs,
            "adjust": adjust_mixed,
        }

    def forward_separate(self, x, sun_dir, t4, train=False, probs=None,
                         sun_pe=None, sky_raw=None):
        """Forward without class mixing: raw color + per-class adjusts
        (T_NeRF_net_v2.py:131-151) — used by the per-class eval renders.
        ``probs``/``sun_pe``/``sky_raw``: optional precomputed ray-constant
        values (see __call__ / ray_consts)."""
        x_enc, rho_raw, col_raw = self.gnerf.position(x, train)
        vis_raw, sky_raw = self.gnerf.solar(x_enc, sun_dir, train,
                                            sun_pe=sun_pe, sky_raw=sky_raw)
        probs = self.class_probs(t4, train) if probs is None else probs
        adj = self.adjust_from_enc(x_enc, train)
        return {
            "rho": jax.nn.softplus(rho_raw),
            "col_raw": col_raw,
            "vis": jax.nn.sigmoid(vis_raw),
            "sky": jax.nn.sigmoid(sky_raw),
            "class_probs": probs,
            "adjust_per_class": adj,
        }

    def forward_solar(self, x, sun_dir, train=False, sun_pe=None,
                      sky_raw=None):
        """Solar-branch training mode: gradients are blocked from flowing
        into the position trunk (the reference wraps the trunk in t.no_grad,
        G_NeRF.py:135-145)."""
        x_enc, rho_raw, _ = self.gnerf.position(x, train)
        x_enc = jax.lax.stop_gradient(x_enc)
        rho_raw = jax.lax.stop_gradient(rho_raw)
        vis_raw, sky_raw = self.gnerf.solar(x_enc, sun_dir, train,
                                            sun_pe=sun_pe, sky_raw=sky_raw)
        return {
            "rho": jax.nn.softplus(rho_raw),
            "vis": jax.nn.sigmoid(vis_raw),
            "sky_raw": sky_raw,
        }

    def sigma_only(self, x, train=False):
        """Density only (T_NeRF_net_v2.py:169-170) — exact-shadow secondary rays."""
        x_enc = self.gnerf.encode_x(x, train)
        return jax.nn.softplus(self.gnerf.fc10_sigma(x_enc))

    def class_only(self, t4, train=False):
        return self.class_probs(t4, train)


def model_from_config(cfg) -> TNeRF:
    """The one place a Config becomes a network — every CLI / eval / tool
    reconstruction must agree with the Trainer's construction (fc_units,
    fc_layers, class count, compute dtype, fast-sine activation) or a saved
    model dir would silently load into a different architecture."""
    dtype = (jnp.bfloat16 if getattr(cfg, "compute_dtype", "float32")
             == "bfloat16" else None)
    return TNeRF(layer_width=cfg.fc_units, n_layers=cfg.fc_layers,
                 n_classes=cfg.number_low_frequency_cases,
                 dtype=dtype, fast_sine=getattr(cfg, "fast_sine", False))


def supervised_sigma(hm, world_pts, delta, eps=0.99):
    """DSM-prior density: occupancy below the prior height map, converted to
    the sigma that reproduces hit probability ``P`` over a step ``delta``
    (T_NeRF_net_v2.py:175-181).

    hm: [H, W] height map in [-1, 1] (NaN = no data -> treated as empty).
    world_pts: [N, 3] cube coordinates; delta: [N, 1] step sizes.
    """
    shape = jnp.array(hm.shape) - 1
    xy = ((world_pts[:, 0:2] + 1.0) / 2.0 * shape[None, :]).astype(jnp.int32)
    xy = jnp.clip(xy, 0, shape[None, :])
    # The textbook hm[xy[:,0], xy[:,1]] lowers to a random-access gather the
    # TPU serializes (~2 GB/s; profiled at 7 ms/step — the largest single op
    # in the train step).  Select through two one-hot contractions instead:
    # the row pick rides the MXU and the column pick is a bandwidth-bound
    # reduce, together ~0.5 ms at 393k points.  Multiplying by exact 0/1 in
    # f32 keeps the selection bit-exact.  NaN cells (= no data, treated as
    # empty space) would poison the matmul, so they are replaced by a
    # sentinel below every z the cube can contain, which makes
    # ``hm_vals >= z`` False — the same p_exist = 0 the NaN branch produced.
    h, w = hm.shape
    hm_f32 = hm.astype(jnp.float32)
    hm_clean = jnp.where(jnp.isnan(hm_f32), -4.0, hm_f32)
    oh_r = jax.nn.one_hot(xy[:, 0], h, dtype=jnp.float32)
    oh_c = jax.nn.one_hot(xy[:, 1], w, dtype=jnp.float32)
    rows = jax.lax.dot_general(oh_r, hm_clean, (((1,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST)
    hm_vals = jnp.sum(rows * oh_c, axis=1)
    p_exist = (hm_vals >= world_pts[:, 2]).astype(jnp.float32)
    p_exist = jnp.minimum(p_exist, eps)
    return -jnp.log(1.0 - p_exist[:, None]) / delta

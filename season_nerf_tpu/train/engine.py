"""Training engine: the reference's Net_tool / T_NeRF_Net_Tool redesigned
as a jit-compiled phase machine.

Reference behavior reproduced (mg_run_NeRF.py:36-360, Net_Tool_2.py:12-145):
phase schedule with per-phase fresh Adam+OneCycle (network lr and 1000x
adaptive-loss lr groups), Barron alpha/scale carried across phases, DSM-prior
trust annealing, per-step training scalars, periodic validation losses +
rendered validation images, log-spaced checkpoint saves, ``Final_Model.nn``
artifact.

TPU redesign (not a port):
- the whole ray table lives in device memory; batches are PRNG gathers
  inside jit — no host dataloader in the hot loop (vs 4 worker processes,
  mg_run_NeRF.py:74-82);
- one compiled ``train_step`` per phase (statics differ), with the batch
  sharded over a 1-D device mesh and params replicated — XLA inserts the
  gradient all-reduce;
- loss + both optimizer updates fused into the same jit; only scalars leave
  the device, asynchronously.
"""

from __future__ import annotations

import functools
import os
import time
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from season_nerf_tpu.config import Config
from season_nerf_tpu.data.dataset import DeviceRayDataset
from season_nerf_tpu.data.rays import RayTable, decode_batch
from season_nerf_tpu.models.tnerf import TNeRF
from season_nerf_tpu.ops import rendering, robust_loss
from season_nerf_tpu.ops.metrics import psnr as psnr_metric
from season_nerf_tpu.ops.robust_loss import AdaptiveCfg
from season_nerf_tpu.train import phases as phase_lib
from season_nerf_tpu.train import state as state_lib
from season_nerf_tpu.train.losses import LossStatics, season_nerf_loss
from season_nerf_tpu.utils.logging import MetricWriter


def _auto_mesh(cfg: Config, strict: bool = True):
    """Build the data-parallel mesh from the config (the production wiring
    the reference never had — it is single-GPU, SURVEY.md §2).

    ``mesh_shape=None`` uses every visible device; ``mesh_shape=1`` forces
    single-device; the batch must divide evenly over the mesh.  Degrading to
    single-device is never silent: an explicit ``mesh_shape`` that cannot be
    honored raises (warns when ``strict=False`` — the render-a-saved-model
    path, where opts.json may record a larger training slice), and the auto
    path warns — on an 8-chip slice a config typo must not quietly discard
    7 chips."""
    n_dev = len(jax.devices())
    explicit = cfg.mesh_shape is not None
    want = cfg.mesh_shape if explicit else n_dev
    want = max(1, int(want))
    if explicit and want > n_dev:
        msg = (f"mesh_shape={cfg.mesh_shape} but only {n_dev} device(s) are "
               f"visible; lower mesh_shape or run on a larger slice")
        if strict:
            raise ValueError(msg)
        warnings.warn(msg + f" — clamping to {n_dev}", stacklevel=2)
        explicit = False
    want = min(want, n_dev)
    if want > 1 and cfg.batch_size % want != 0:
        msg = (f"batch_size={cfg.batch_size} is not divisible by the "
               f"{want}-device mesh; pick a batch that is a multiple of "
               f"{want}")
        if explicit:
            raise ValueError(msg)
        warnings.warn(msg + " — FALLING BACK TO SINGLE-DEVICE TRAINING",
                      stacklevel=2)
        return None
    if want <= 1:
        return None
    from season_nerf_tpu.parallel.mesh import make_mesh
    return make_mesh(n_devices=want)


def _color_cfg(init_alpha=2.0, init_scale=0.03):
    return AdaptiveCfg(n_channels=3, alpha_lo=0.001, alpha_hi=2.99,
                       alpha_init=init_alpha, scale_lo=0.01,
                       scale_init=init_scale)


def _alpha_cfg():
    # the prior-phase PE loss (Net_Tool_2.py:85)
    return AdaptiveCfg(n_channels=1, alpha_lo=0.001, alpha_hi=2.99,
                       alpha_init=2.0, scale_lo=0.05, scale_init=0.5)


class Trainer:
    def __init__(self, cfg: Config, train_table: RayTable,
                 val_table: Optional[RayTable] = None,
                 prior_hm: Optional[np.ndarray] = None,
                 gt_dsm: Optional[np.ndarray] = None,
                 sun_frame: Optional[np.ndarray] = None,
                 mesh=None, writer: Optional[MetricWriter] = None):
        self.cfg = cfg
        if mesh is None:
            mesh = _auto_mesh(cfg)
        self.mesh = mesh
        self.writer = writer or MetricWriter(cfg.logs_dir)
        if cfg.logs_dir:
            from season_nerf_tpu.utils import heartbeat
            heartbeat.set_path(os.path.join(cfg.logs_dir, "heartbeat"))
        from season_nerf_tpu.models.tnerf import model_from_config
        self.model = model_from_config(cfg)
        self.rng = jax.random.PRNGKey(cfg.seed)
        self.rng, init_key = jax.random.split(self.rng)
        self.variables_template = self.model.init(
            init_key, jnp.zeros((2, 3)), jnp.zeros((2, 3)),
            jnp.zeros((2, 4)), train=False)

        # ray table replicated over the mesh so the per-step batch gather is
        # device-local (prefetch_device=False defers placement to first use)
        row_sharding = None
        if self.mesh is not None:
            from season_nerf_tpu.parallel.mesh import replicated_sharding
            row_sharding = replicated_sharding(self.mesh)
        self.train_ds = DeviceRayDataset(train_table, sharding=row_sharding,
                                         eager=cfg.prefetch_device)
        self.val_table = val_table
        self.prior_hm = (jnp.asarray(prior_hm)
                         if prior_hm is not None else None)
        # host copy for the save-point geometry score (no device fetch)
        self._prior_np = (np.asarray(prior_hm)
                          if prior_hm is not None else None)
        self.gt_dsm = gt_dsm
        # (step, height MAE vs the *prior* DSM) per save point — drives the
        # opt-in best_geometry final-model selection (config.py); the prior
        # is training-time data, so selecting on it leaks no ground truth
        self._save_geometry = []
        self.sun_frame = (jnp.asarray(sun_frame)
                          if sun_frame is not None else None)

        jump = cfg.jump_start and prior_hm is not None
        self.phases = phase_lib.build_phases(cfg.max_train_steps, jump)
        self.save_steps = set(phase_lib.save_points(
            self.phases, cfg.n_saves, cfg.max_train_steps))
        self.step = 0
        self._phase = None
        self._step_fn = None
        self._eval_fn = None
        self._carry_alpha = 2.0
        self._carry_scale = 0.03
        self.state: Optional[state_lib.TrainState] = None
        self.step_times = []

    # ------------------------------------------------------------------
    # phase setup
    # ------------------------------------------------------------------
    def _statics_for(self, phase) -> LossStatics:
        cfg = self.cfg
        use_prior = phase.use_prior and self.prior_hm is not None
        keepalive = (cfg.phase4_prior_keepalive
                     if (not use_prior and self.prior_hm is not None
                         and cfg.jump_start) else 0.0)
        color_cfg = alpha_cfg = None
        if not cfg.Use_MSE_loss:
            if phase.index == 1:
                color_cfg = _color_cfg()
            else:
                color_cfg = _color_cfg(self._carry_alpha, self._carry_scale)
            if use_prior:
                alpha_cfg = _alpha_cfg()
            elif keepalive > 0 and cfg.phase4_keepalive_barron:
                # Barron-adaptive keepalive: fresh alpha latents for the
                # prior-off phase (same init as the phase-1 alpha loss)
                alpha_cfg = _alpha_cfg()
        pallas_spec = None
        if cfg.pallas_trunk:
            if cfg.n_importance > 0:
                warnings.warn("pallas_trunk does not support hierarchical "
                              "sampling (n_importance > 0) — falling back "
                              "to the XLA trunk", stacklevel=2)
            elif self.mesh is not None:
                # the step is GSPMD-auto-sharded; a pallas_call inside it
                # cannot be partitioned over the data axis without a
                # shard_map rewrite of the step — single-chip only for now
                warnings.warn("pallas_trunk is single-device only (the "
                              "multi-chip step uses GSPMD auto-sharding, "
                              "which cannot partition a pallas_call) — "
                              "falling back to the XLA trunk", stacklevel=2)
            else:
                from season_nerf_tpu.ops import pallas_train
                pallas_spec, why = pallas_train.spec_for_model(
                    self.model, cfg.batch_size * cfg.n_samples)
                if pallas_spec is None:
                    warnings.warn(f"pallas_trunk requested but unsupported "
                                  f"({why}) — falling back to the XLA "
                                  f"trunk", stacklevel=2)
        return LossStatics(
            n_samples=cfg.n_samples, n_importance=cfg.n_importance,
            use_prior=use_prior,
            use_solar=cfg.Use_Solar, classic_solar=cfg.Solar_Type_2,
            use_mse_loss=cfg.Use_MSE_loss, sc_lambda=cfg.sc_lambda,
            phase_len=phase.end, color_cfg=color_cfg, alpha_cfg=alpha_cfg,
            prior_keepalive=keepalive,
            phase_start=phase.start,
            remat=cfg.remat_trunk,
            pallas_spec=pallas_spec)

    def _enter_phase(self, phase):
        """reset_eval equivalent (Net_Tool_2.py:63-131): fresh optimizers +
        schedules; carry Barron alpha/scale; rebuild the jitted step."""
        cfg = self.cfg
        if self.state is not None and not cfg.Use_MSE_loss and \
                self._phase is not None and self._phase_statics.color_cfg is not None:
            ada = self.state.ada_params
            if "color" in ada:
                self._carry_alpha = float(np.mean(np.asarray(
                    robust_loss.alpha_of(ada["color"], self._phase_statics.color_cfg))))
                self._carry_scale = float(np.mean(np.asarray(
                    robust_loss.scale_of(ada["color"], self._phase_statics.color_cfg))))

        statics = self._statics_for(phase)
        self._phase = phase
        self._phase_statics = statics

        ada_params = {}
        if statics.color_cfg is not None:
            ada_params["color"] = robust_loss.init_adaptive(statics.color_cfg)
        if statics.alpha_cfg is not None:
            ada_params["alpha"] = robust_loss.init_adaptive(statics.alpha_cfg)

        net_opt, ada_opt = state_lib.make_optimizers(
            cfg.lr, cfg.lr_alpha_scale, phase.length)
        self._net_opt, self._ada_opt = net_opt, ada_opt

        params = (self.state.params if self.state is not None
                  else self.variables_template["params"])
        batch_stats = (self.state.batch_stats if self.state is not None
                       else self.variables_template.get("batch_stats", {}))
        self.state = state_lib.TrainState(
            step=jnp.asarray(self.step, jnp.int32),
            params=params, batch_stats=batch_stats,
            opt_state=net_opt.init(params),
            ada_params=ada_params,
            ada_opt_state=ada_opt.init(ada_params))

        self._step_fn, self._multi_step_fn = self._build_step_fn(statics,
                                                                 phase)
        self._eval_fn = self._build_eval_fn(statics)

    def _build_step_fn(self, statics: LossStatics, phase):
        model = self.model
        net_opt, ada_opt = self._net_opt, self._ada_opt
        prior_hm = self.prior_hm
        sun_frame = self.sun_frame
        rows = self.train_ds.rows
        n_rows = self.train_ds.n
        batch_size = self.cfg.batch_size
        has_stats = bool(jax.tree_util.tree_leaves(
            self.variables_template.get("batch_stats", {})))

        mesh = self.mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            batch_sh = NamedSharding(mesh, P("data"))
        else:
            batch_sh = None

        # weighted ray sampling: the reference stores per-ray weights but
        # never consumes them (Sample_Weight, mg_run_NeRF.py:130, dead);
        # here weight_training_samples actually biases the batch gather via
        # inverse-CDF sampling over the row weights
        weight_cdf = None
        if self.cfg.weight_training_samples:
            w = np.asarray(self.train_ds.table.rows[:, 18], np.float64)
            if np.ptp(w) > 1e-9:
                cdf = np.cumsum(np.maximum(w, 0.0))
                weight_cdf = jnp.asarray(cdf / cdf[-1], jnp.float32)

        def loss_fn(params, ada_params, batch_stats, batch, rng, step):
            variables = {"params": params}
            if has_stats:
                variables["batch_stats"] = batch_stats
            total, (losses, updates) = season_nerf_loss(
                model, variables, ada_params, statics, batch, rng, step,
                train=True, prior_hm=prior_hm, sun_frame=sun_frame,
                mutable=has_stats)
            return total, (losses, updates)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_fn(state: state_lib.TrainState, rng):
            k_batch, k_loss = jax.random.split(rng)
            if weight_cdf is not None:
                u = jax.random.uniform(k_batch, (batch_size,))
                idx = jnp.clip(jnp.searchsorted(weight_cdf, u), 0, n_rows - 1)
            else:
                idx = jax.random.randint(k_batch, (batch_size,), 0, n_rows)
            batch = decode_batch(jnp.take(rows, idx, axis=0))
            if batch_sh is not None:
                # shard the ray batch over the mesh's data axis; params stay
                # replicated, XLA inserts the gradient all-reduce (GSPMD)
                batch = jax.tree_util.tree_map(
                    lambda x: jax.lax.with_sharding_constraint(x, batch_sh),
                    batch)
            (total, (losses, updates)), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, state.ada_params, state.batch_stats,
                batch, k_loss, state.step)
            g_params, g_ada = grads
            upd, new_opt = net_opt.update(g_params, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, upd)
            if jax.tree_util.tree_leaves(state.ada_params):
                upd2, new_ada_opt = ada_opt.update(
                    g_ada, state.ada_opt_state, state.ada_params)
                new_ada = optax.apply_updates(state.ada_params, upd2)
            else:
                new_ada, new_ada_opt = state.ada_params, state.ada_opt_state
            new_stats = (updates["batch_stats"]
                         if (updates is not None and has_stats)
                         else state.batch_stats)
            new_state = state_lib.TrainState(
                step=state.step + 1, params=new_params, batch_stats=new_stats,
                opt_state=new_opt, ada_params=new_ada,
                ada_opt_state=new_ada_opt)
            scalars = {k: v for k, (v, w) in losses.items()}
            scalars["Total"] = total
            return new_state, scalars

        @functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
        def multi_step_fn(state: state_lib.TrainState, rng, n: int):
            """n optimizer steps in one device dispatch (lax.scan):
            amortizes the per-call host/tunnel latency that a 1-step loop
            pays 50k times.  Returns (state, last step's loss scalars)."""
            def body(st, k):
                st2, scalars = step_fn.__wrapped__(st, k)
                return st2, scalars

            keys = jax.random.split(rng, n)
            state, scalars = jax.lax.scan(body, state, keys)
            last = jax.tree_util.tree_map(lambda x: x[-1], scalars)
            return state, last

        return step_fn, multi_step_fn

    def _build_eval_fn(self, statics: LossStatics):
        model = self.model
        prior_hm = self.prior_hm
        sun_frame = self.sun_frame
        has_stats = bool(jax.tree_util.tree_leaves(
            self.variables_template.get("batch_stats", {})))

        @jax.jit
        def eval_fn(state: state_lib.TrainState, batch_rows, rng):
            batch = decode_batch(batch_rows)
            variables = {"params": state.params}
            if has_stats:
                variables["batch_stats"] = state.batch_stats
            total, (losses, _) = season_nerf_loss(
                model, variables, state.ada_params, statics, batch, rng,
                state.step, train=False, prior_hm=prior_hm,
                sun_frame=sun_frame, mutable=False)
            scalars = {k: v for k, (v, w) in losses.items()}
            scalars["Total"] = total
            return scalars

        return eval_fn

    # ------------------------------------------------------------------
    # resume (capability the reference lacks: checkpoints are save-only,
    # SURVEY.md §5 — a crash at step 49,999 loses the run there)
    # ------------------------------------------------------------------
    def resume(self, ckpt_path: str):
        """Restore the FULL train state (params, BN stats, both optimizer
        states, adaptive-loss latents, phase/step) and continue."""
        from flax import serialization
        with open(ckpt_path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        extra = payload.get("extra", {})
        self.step = int(extra.get("step", 0))
        self._carry_alpha = float(extra.get("carry_alpha", 2.0))
        self._carry_scale = float(extra.get("carry_scale", 0.03))
        self._save_geometry = [(int(s), float(m))
                               for s, m in extra.get("save_geometry", [])]
        if "rng" in extra:
            self.rng = jnp.asarray(np.asarray(extra["rng"], dtype=np.uint32))
        else:
            # pre-rng checkpoint: derive a step-distinct key so the resumed
            # run continues with fresh draws instead of replaying the stream
            # from the start of training
            self.rng = jax.random.fold_in(
                jax.random.PRNGKey(self.cfg.seed), self.step)
        phase = phase_lib.phase_at(self.phases, max(self.step - 1, 0))
        self._enter_phase(phase)     # builds matching state templates
        self.state, _ = state_lib.load_checkpoint(ckpt_path, self.state)
        return self

    def profile_steps(self, trace_dir: str, n_steps: int = 5):
        """Emit a jax.profiler trace of n training steps (the tracing
        capability the reference lacks, SURVEY.md §5)."""
        phase = phase_lib.phase_at(self.phases, self.step)
        if self._phase is None or phase.index != self._phase.index:
            self._enter_phase(phase)
        with jax.profiler.trace(trace_dir):
            for _ in range(n_steps):
                self.rng, k = jax.random.split(self.rng)
                self.state, _ = self._step_fn(self.state, k)
                self.step += 1
            jax.block_until_ready(self.state.params)
        return trace_dir

    # ------------------------------------------------------------------
    # the loop
    # ------------------------------------------------------------------
    def run(self, n_steps: Optional[int] = None, log_every: int = 50,
            scan_chunk: int = 20):
        """Train to ``max_train_steps`` (or +n_steps).  Steps between
        log/save/phase events run as fused multi-step scans of size
        ``scan_chunk`` — one device dispatch per chunk."""
        cfg = self.cfg
        end = self.step + n_steps if n_steps is not None else cfg.max_train_steps
        end = min(end, cfg.max_train_steps)
        pending = None
        while self.step < end:
            self._beat()
            phase = phase_lib.phase_at(self.phases, self.step)
            if self._phase is None or phase.index != self._phase.index:
                self._log_pending(pending)
                pending = None
                self._enter_phase(phase)
            # next step at which something host-side must happen
            next_save = min((s for s in self.save_steps if s > self.step),
                            default=end)
            next_log = (self.step // log_every + 1) * log_every
            stop = min(end, phase.end, next_save, next_log)
            gap = stop - self.step
            t0 = time.perf_counter()
            if scan_chunk > 1 and gap >= scan_chunk:
                self.rng, k = jax.random.split(self.rng)
                self.state, scalars = self._multi_step_fn(self.state, k,
                                                          scan_chunk)
                self.step += scan_chunk
                if (self.step // log_every) != ((self.step - scan_chunk)
                                                // log_every):
                    self._log_pending(pending)
                    pending = (self.step - 1, scalars)
            else:
                self.rng, k = jax.random.split(self.rng)
                self.state, scalars = self._step_fn(self.state, k)
                if self.step % log_every == 0 or (self.step + 1) in self.save_steps:
                    self._log_pending(pending)
                    pending = (self.step, scalars)   # fetched lazily next log
                self.step += 1
            if self.step in self.save_steps:
                self._on_save_point()
            self.step_times.append(time.perf_counter() - t0)
        self._log_pending(pending)
        return self.state

    def _beat(self):
        """Liveness heartbeat (utils/heartbeat): the host blocks on a device
        fetch within ~log_every steps of a device/tunnel hang, so a stale
        heartbeat is a reliable stall signal for tools/watchdog_train.py."""
        from season_nerf_tpu.utils import heartbeat
        heartbeat.beat()

    def _log_pending(self, pending):
        if pending is None:
            return
        step, scalars = pending
        vals = {k: float(v) for k, v in jax.device_get(scalars).items()}
        self.writer.scalars("Training", vals, step)

    def _on_save_point(self):
        """eval_step + checkpoint at the reference's save schedule
        (mg_run_NeRF.py:148-227)."""
        cfg = self.cfg
        if self.val_table is not None and len(self.val_table) > 0:
            self.rng, k1, k2 = jax.random.split(self.rng, 3)
            n = min(cfg.batch_size, len(self.val_table))
            sel = np.asarray(jax.random.randint(
                k1, (n,), 0, len(self.val_table)))
            batch_rows = jnp.asarray(self.val_table.rows[sel])
            scalars = jax.device_get(self._eval_fn(self.state, batch_rows, k2))
            self.writer.scalars("Testing",
                                {k: float(v) for k, v in scalars.items()},
                                self.step)
        if cfg.save_point_val_renders:
            # rendered validation images + height maps at every save point,
            # the reference's eval_img cadence (mg_run_NeRF.py:148-227);
            # size-capped so saves stay cheap relative to training
            rep = self.validation_report(
                max_images=max(cfg.save_point_val_renders, 0) or None)
            if "Prior_Height_Error" in rep:
                self._save_geometry.append(
                    (self.step, rep["Prior_Height_Error"]))
        if cfg.logs_dir:
            state_lib.save_checkpoint(
                os.path.join(cfg.logs_dir, f"Model_{self.step}.nn"),
                self.state, extra=self._ckpt_extra())
        self.writer.flush()

    def _ckpt_extra(self):
        return {"step": self.step,
                "phase": self._phase.index if self._phase else 0,
                "carry_alpha": self._carry_alpha,
                "carry_scale": self._carry_scale,
                # resume must continue the PRNG stream, not replay it:
                # batches and solar rays after a watchdog restart would
                # otherwise repeat the draws from the start of training
                "rng": [int(x) for x in np.asarray(self.rng).ravel()],
                # best_geometry selection must survive a watchdog restart:
                # without this, finalize() would only see post-resume save
                # points and could silently pick a worse checkpoint
                "save_geometry": [[int(s), float(m)]
                                  for s, m in self._save_geometry]}

    def finalize(self):
        """Save the Final_Model.nn inference artifact (main.py:104).

        ``final_model_selection == "best_geometry"`` (beyond-reference,
        opt-in): instead of the last-step weights, pick the save point whose
        validation renders scored the lowest height error against the
        *training-time prior* DSM — never the GT, so nothing leaks.  Our
        full-budget runs (docs/QUALITY_r3.md) show geometry peaks
        mid-training, worth ~0.3 m DSM MAE from the same run."""
        cfg = self.cfg
        params, stats, steps = self.state.params, self.state.batch_stats, \
            self.step
        meta = {"fc_units": cfg.fc_units,
                "n_classes": cfg.number_low_frequency_cases}
        mode = cfg.final_model_selection
        if mode in ("best_geometry", "best_geometry_on_decay"):
            if not self._save_geometry:
                warnings.warn(
                    f"final_model_selection={mode!r} requested but no "
                    "save-point geometry scores exist (needs a DSM prior, "
                    "and save_point_val_renders must not be 0); falling "
                    "back to the last-step weights")
            else:
                best_step, best_mae = min(self._save_geometry,
                                          key=lambda sm: sm[1])
                if mode == "best_geometry_on_decay":
                    # select-on-decay: keep the reference protocol (last
                    # step) on healthy runs; fall back to the best-geometry
                    # save point only when the run's own GT-free signal
                    # says phase-4 appearance training decayed the density
                    # field past the threshold (VERDICT r4 next #7b).
                    last_mae = self._save_geometry[-1][1]
                    drift = (last_mae - best_mae) / max(best_mae, 1e-9)
                    meta.update(geometry_drift=float(drift),
                                decay_threshold=cfg.geometry_decay_threshold)
                    if drift <= cfg.geometry_decay_threshold:
                        print(f"[finalize] best_geometry_on_decay: drift "
                              f"{drift:.1%} <= threshold "
                              f"{cfg.geometry_decay_threshold:.0%} — "
                              f"keeping the last-step weights (reference "
                              f"protocol)")
                        best_step, best_mae = self.step, last_mae
                meta.update(selection=mode,
                            selected_step=int(best_step),
                            prior_height_mae=float(best_mae))
                if best_step != self.step and cfg.logs_dir:
                    ckpt = os.path.join(cfg.logs_dir, f"Model_{best_step}.nn")
                    restored, _ = state_lib.load_checkpoint(ckpt, self.state)
                    params, stats, steps = restored.params, \
                        restored.batch_stats, best_step
                print(f"[finalize] best_geometry selected step {best_step} "
                      f"(prior-DSM MAE {best_mae:.4f}; last step "
                      f"{self.step})")
        meta["steps"] = steps
        if cfg.logs_dir:
            state_lib.save_model_artifact(
                os.path.join(cfg.logs_dir, "Final_Model.nn"),
                params, stats, meta=meta)
        self.writer.flush()

    # ------------------------------------------------------------------
    # validation rendering (eval_img equivalent, mg_run_NeRF.py:148-227)
    # ------------------------------------------------------------------
    def _render_chunk_fn(self):
        """Cached jitted validation-render kernel (one compile, reused
        across every validation image and save point)."""
        if getattr(self, "_render_chunk_cache", None) is not None:
            return self._render_chunk_cache
        cfg = self.cfg
        model = self.model
        has_stats = bool(jax.tree_util.tree_leaves(
            self.variables_template.get("batch_stats", {})))

        @jax.jit
        def render_chunk(state, batch_rows, rng):
            b = decode_batch(batch_rows)
            variables = {"params": state.params}
            if has_stats:
                variables["batch_stats"] = state.batch_stats
            out, _ = rendering.eval_rays(
                model, variables, rng, b["top"], b["bot"], b["sun"], b["t4"],
                n_samples=cfg.n_samples, train=False,
                classic_solar=cfg.Solar_Type_2)
            surf, _ = rendering.expected_surface(out["ps"], out["pts"],
                                                 out["deltas"])
            return out["rendered"], surf[:, 2]

        self._render_chunk_cache = render_chunk
        return render_chunk

    def render_table_image(self, table: RayTable, img_index: int,
                           chunk: Optional[int] = None):
        """Render one validation image from its precomputed rays; returns
        (rendered [H,W,3], gt [H,W,3], height [H,W], mask [H,W])."""
        cfg = self.cfg
        # the fused val-render program (decode + sample + full net + surface)
        # trips the TPU register allocator at chunk 10240 x 96 samples on the
        # current toolchain (same live_range_finder RET_CHECK as the large-
        # batch train step); 4096-ray dispatches compile everywhere and the
        # extra dispatch count is noise next to the render itself
        chunk = min(chunk or cfg.chunk, 4096)
        mask_rows = table.img_ids == img_index
        rows = table.rows[mask_rows]
        H, W = table.img_sizes[img_index]
        render_chunk = self._render_chunk_fn()

        rend = np.zeros((H, W, 3), np.float32)
        gt = np.zeros((H, W, 3), np.float32)
        height = np.full((H, W), np.nan, np.float32)
        seen = np.zeros((H, W), bool)
        n = rows.shape[0]
        dev, parts = [], []   # pipeline dispatches; fetch once at the end
        for s in range(0, n, chunk):
            part = rows[s:s + chunk]
            pad = 0
            if part.shape[0] < chunk:
                pad = chunk - part.shape[0]
                part = np.concatenate([part, np.zeros((pad, part.shape[1]),
                                                      part.dtype)], 0)
            self.rng, k = jax.random.split(self.rng)
            dev.append(render_chunk(self.state, jnp.asarray(part), k))
            parts.append((part, pad))
            self._beat()
        for (col, z), (part, pad) in zip(jax.device_get(dev), parts):
            if pad:
                col, z, part = col[:-pad], z[:-pad], part[:-pad]
            ij = part[:, 0:2].astype(int)
            rend[ij[:, 0], ij[:, 1]] = col
            gt[ij[:, 0], ij[:, 1]] = part[:, 19:22]
            height[ij[:, 0], ij[:, 1]] = z
            seen[ij[:, 0], ij[:, 1]] = True
        if cfg.use_HSLuv:
            # model space is normalized HSLuv — convert render AND the
            # HSLuv-encoded GT rows back to sRGB for display + PSNR
            from season_nerf_tpu.utils.hsluv import hsluv_normalized_to_rgb
            rend = hsluv_normalized_to_rgb(np.clip(rend, 0, 1)).astype(
                np.float32)
            gt = hsluv_normalized_to_rgb(np.clip(gt, 0, 1)).astype(np.float32)
        return rend, gt, height, seen

    def validation_report(self, step: Optional[int] = None,
                          max_images: Optional[int] = None):
        """Render validation images; log them + PSNR + height MAE to the
        metric writer (eval_img, mg_run_NeRF.py:148-227).  ``max_images``
        caps the count (used at save points; None renders all)."""
        if self.val_table is None:
            return {}
        step = step if step is not None else self.step
        n_imgs = len(self.val_table.img_names)
        if max_images is not None:
            n_imgs = min(n_imgs, max_images)
        psnrs, maes, prior_maes = [], [], []
        for i in range(n_imgs):
            rend, gt, height, seen = self.render_table_image(self.val_table, i)
            p = float(psnr_metric(jnp.asarray(rend), jnp.asarray(gt),
                                  mask=jnp.asarray(seen)))
            psnrs.append(p)
            self.writer.image(f"Testing/render_{i}", rend, step)
            h_img = np.nan_to_num(height, nan=-1.0)
            h_img = (h_img + 1.0) / 2.0
            self.writer.image(f"Testing/height_{i}",
                              np.repeat(h_img[..., None], 3, -1), step)
            if self.gt_dsm is not None:
                mae = _height_mae(height, seen, self.gt_dsm,
                                  self.val_table, i)
                if mae is not None:
                    maes.append(mae)
            if self._prior_np is not None:
                mae = _height_mae(height, seen, self._prior_np,
                                  self.val_table, i)
                if mae is not None:
                    prior_maes.append(mae)
        report = {"Mean_PSNR": float(np.mean(psnrs))}
        if maes:
            report["Mean_Height_Error"] = float(np.mean(maes))
        if prior_maes:
            report["Prior_Height_Error"] = float(np.mean(prior_maes))
        self.writer.scalars("Testing", report, step)
        return report


def _height_mae(height, seen, gt_dsm, table: RayTable, img_index: int):
    """Per-pixel expected-surface height vs the GT DSM sampled at the ray's
    (x, y) footprint (the Mean_Height_Error diagnostic,
    mg_run_NeRF.py:203-224)."""
    rows = table.rows[table.img_ids == img_index]
    ij = rows[:, 0:2].astype(int)
    # surface (x, y) approximated by the ray midpoint footprint
    mid = (rows[:, 2:5] + rows[:, 5:8]) / 2
    g = gt_dsm.shape
    xi = np.clip(((mid[:, 0] + 1) / 2 * (g[0] - 1)).astype(int), 0, g[0] - 1)
    yi = np.clip(((mid[:, 1] + 1) / 2 * (g[1] - 1)).astype(int), 0, g[1] - 1)
    gt_h = gt_dsm[xi, yi]
    pred = height[ij[:, 0], ij[:, 1]]
    ok = np.isfinite(gt_h) & np.isfinite(pred)
    if not ok.any():
        return None
    return float(np.mean(np.abs(pred[ok] - gt_h[ok])))

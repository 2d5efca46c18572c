"""Configuration: one dataclass, CLI-compatible with the reference flags.

The reference has three near-duplicate argparse definitions (opt.py, opt2.py,
main_lite.py) round-tripped through ``opts.json`` (SURVEY.md §5).  Here they
collapse into a single serializable dataclass whose field names keep the
reference's public CLI contract (opt2.py:10-156): ``Use_MSE_loss``,
``jump_start``, ``Solar_Type_2``, ``skip_Bundle_Adjust``, ``Use_Solar``, etc.
A saved model directory remains self-describing via the same ``opts.json``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass
class Config:
    # --- identity / IO (opt2.py:129-142 directory-layout contract) --------
    exp_name: str = "exp"
    site_name: str = "OMA_281"
    IO_Location: str = "./io"
    cache_dir: str = ""
    logs_dir: str = ""
    root_dir: str = ""
    rpc_dir: str = ""
    testing_image_names: Optional[str] = None

    # --- mode flags (public contract) --------------------------------------
    Use_MSE_loss: bool = False
    jump_start: bool = True            # DSM prior on in phase 1
    Solar_Type_2: bool = False         # classic irradiance composite
    skip_Bundle_Adjust: bool = False
    Use_Solar: bool = True
    # accepted-but-inert, MATCHING the reference: Use_Reg gates only
    # commented-out code (Eval_Tools_2.py:404-412) and use_auto_balance is
    # never consumed there either — kept so reference command lines and
    # opts.json files round-trip unchanged
    Use_Reg: bool = False
    use_auto_balance: bool = False
    use_HSLuv: bool = False
    weight_training_samples: bool = False

    # --- training hypers (opt2.py:66-112 defaults) --------------------------
    max_train_steps: int = 50_000
    n_samples: int = 96
    n_importance: int = 0
    batch_size: int = 512
    lr: float = 10 ** -4.86
    lr_alpha_scale: float = 1000.0
    fc_units: int = 512
    fc_layers: int = 8
    sc_lambda: float = 0.03
    ds_lambda: float = 0.03
    p_lambda: float = 0.03
    number_low_frequency_cases: int = 4   # seasonal classes
    chunk: int = 5_120        # render rays per XLA dispatch.  The reference
    #                           defaults to 10240 (opt2.py:110; output is
    #                           chunk-invariant) but on the v5e chip XLA
    #                           compiles a faster program at 5120 — measured
    #                           189k vs 172k render-rays/s — and the larger
    #                           chunk intermittently trips the remote
    #                           compiler (docs/DESIGN.md "Compiler limits").
    #                           --chunk restores any value.
    n_saves: int = 20
    testing_size: int = 3
    img_training_downscale: int = 1
    img_validation_downscale: int = 1
    camera_model: str = "Pinhole"
    DSM_Mode: str = "Space_Carve"
    # explicit site height range in meters (min, max) for running a real
    # site WITHOUT the Track3-Truth lidar directory (the reference cannot:
    # it hard-requires <site>_DSM.tif for the height bounds,
    # mg_pre_NeRF.py:41-47); None = derive from the lidar DSM +-5 m
    height_range: Optional[Tuple[float, float]] = None

    # --- TPU-specific additions --------------------------------------------
    resume: bool = True               # auto-resume from latest Model_<k>.nn
    # synthetic-site generator knobs (SYNTH_* sites, data/synthetic.py)
    synth_views: int = 10
    synth_img_size: int = 96
    synth_grid: int = 96
    save_point_val_renders: int = -1  # validation images rendered to the
    #                                   metric writer at each save point:
    #                                   -1 = all of them (the reference's
    #                                   eval_img cadence, mg_run_NeRF.py:
    #                                   148-227), 0 = none, N = cap for
    #                                   smoke/bench configs
    remat_trunk: str = ""             # jax.checkpoint the network blocks in
    #                                   the train step: "full" (save nothing),
    #                                   "dots" (save matmul outputs, recompute
    #                                   elementwise only), "" = off.  Lower
    #                                   peak HBM -> batches >= 8192 compile
    #                                   (the r1 register-allocator wall,
    #                                   docs/DESIGN.md "Compiler limits")
    seed: int = 0
    scan_chunk: int = 20               # optimizer steps fused into one
    #                                    lax.scan dispatch between host
    #                                    events (Trainer.run); 1 disables
    #                                    the multi-step scan program
    mesh_shape: Optional[int] = None   # data-parallel devices; None = all,
    #                                    1 = force single-device (no mesh)
    compute_dtype: str = "bfloat16"    # trunk-matmul dtype.  bfloat16 is the
    #                                    qualified production point: +33%
    #                                    sustained training throughput on one
    #                                    v5e chip at full-budget quality
    #                                    parity with float32 (50k-step A/B on
    #                                    the same site, docs/QUALITY_r3.md);
    #                                    "float32" restores exact-reference
    #                                    arithmetic (params/accumulators are
    #                                    f32 either way)
    compile_cache: bool = True         # persistent XLA compile cache under
    #                                    <IO_Location>/Cache/jax — restarts
    #                                    (watchdog, resume) skip recompiles
    final_model_selection: str = "last"  # "last" = the reference protocol
    #                                    (Final_Model.nn = the 50k-step
    #                                    weights); "best_geometry" = pick the
    #                                    save point whose validation renders
    #                                    score the lowest height error vs the
    #                                    *prior* DSM (never the GT — no
    #                                    leakage).  Beyond-reference: our
    #                                    full-budget runs show geometry peaks
    #                                    mid-training (docs/QUALITY_r3.md),
    #                                    worth ~0.3 m DSM MAE from the same
    #                                    run.  "best_geometry_on_decay" =
    #                                    keep the last-step weights unless
    #                                    the run's own prior-MAE signal
    #                                    drifted > geometry_decay_threshold
    #                                    above its minimum (hard-site
    #                                    insurance that leaves healthy runs
    #                                    on the reference protocol).
    geometry_decay_threshold: float = 0.10  # relative prior-MAE drift that
    #                                    triggers the best_geometry_on_decay
    #                                    fallback (last vs best save point)
    phase4_prior_keepalive: float = 0.0  # beyond-reference, opt-in: keep a
    #                                    LINEARLY-DECAYING DSM-prior
    #                                    Alpha_Adjust MSE alive through phase
    #                                    4 instead of the reference's hard
    #                                    cut at the phase 1->4 boundary
    #                                    (Net_Tool_2.py:23-45).  Motivation:
    #                                    full-budget runs show validation
    #                                    geometry peaks mid-training and
    #                                    decays for the rest of phase 4 while
    #                                    the seasonal phase optimizes
    #                                    appearance (docs/QUALITY_r3.md).
    #                                    Weight = keepalive * (1 - phase-4
    #                                    progress), reaching exactly 0 at the
    #                                    final step.  0.0 = reference
    #                                    protocol (off).
    phase4_keepalive_barron: bool = False  # keepalive variant: replace the
    #                                    round-4 MSE keepalive (measured and
    #                                    rejected — it cannot down-weight
    #                                    the prior's own noise) with the
    #                                    same Barron adaptive alpha loss the
    #                                    prior phase trains (Net_Tool_2.py:
    #                                    85): learned alpha/scale discount
    #                                    prior outliers.  Only meaningful
    #                                    with phase4_prior_keepalive > 0 and
    #                                    the adaptive (non-MSE) loss.
    pallas_trunk: bool = False         # run the training trunk (fc1..fc9 +
    #                                    sigma/color heads) through the
    #                                    VMEM-resident fused Pallas kernel
    #                                    (ops/pallas_train.py): weights stay
    #                                    on-chip across the batch, backward
    #                                    recomputes the forward tile-by-tile,
    #                                    HBM sees only inputs/outputs/weight
    #                                    grads.  Arithmetic change: BatchNorm
    #                                    becomes GHOST batch norm (per-2048-
    #                                    row-tile statistics) and backward
    #                                    matmuls consume bf16 gradients —
    #                                    qualified by a full-budget quality
    #                                    A/B (docs/QUALITY_r5.md) before any
    #                                    default flip.  Requires
    #                                    compute_dtype=bfloat16 and
    #                                    batch_size*n_samples % 2048 == 0;
    #                                    unsupported configs fall back to the
    #                                    XLA path with a warning.
    fast_sine: bool = True             # polynomial sin activation (exact to
    #                                    f32 on the SIREN pre-activation
    #                                    range; ops/fast_math.py).  The
    #                                    exact-sin step is VPU-bound on its
    #                                    ~4.8k sins/point; the polynomial
    #                                    doubles measured train throughput
    #                                    (12.6k -> 24.9k rays/s on one v5e
    #                                    chip) at equal trained quality
    #                                    (docs/FAST_SINE_PARITY.md)
    prefetch_device: bool = True       # eagerly place the ray table on the
    #                                    device(s) (replicated over the mesh)
    #                                    at startup; False defers to first use

    def resolve_dirs(self, create=True):
        """Derive the implied directory layout from IO_Location
        (opt2.py:129-142) and optionally create it."""
        io = self.IO_Location
        if not self.cache_dir:
            self.cache_dir = os.path.join(io, "Cache", self.site_name)
        if not self.root_dir:
            self.root_dir = os.path.join(io, "IEEE_Data")
        if not self.rpc_dir:
            self.rpc_dir = os.path.join(io, "Cache", self.site_name, "RPCs")
        if not self.logs_dir:
            self.logs_dir = os.path.join(io, "Logs", self.exp_name)
        if create:
            for d in (self.cache_dir, self.logs_dir):
                os.makedirs(d, exist_ok=True)
        return self

    def enable_compile_cache(self):
        """Point JAX's persistent compiled-program cache at
        ``<IO_Location>/Cache/jax`` — a watchdog restart or a resumed run
        replays its compiles from disk instead of paying (and risking) the
        remote compile again.

        Mutates process-global JAX state, so it is called only from the CLI
        entry point (``get_opts``) — merely constructing a Config (tests,
        tools) must not repoint the global cache.  The
        ``JAX_COMPILATION_CACHE_DIR`` env var wins so operators can redirect
        or disable it."""
        if not self.compile_cache or "JAX_COMPILATION_CACHE_DIR" in os.environ:
            return self
        cache = os.path.join(self.IO_Location, "Cache", "jax")
        try:
            os.makedirs(cache, exist_ok=True)
            import jax
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 2.0)
        except Exception as e:
            import logging
            logging.getLogger(__name__).warning(
                "could not enable the persistent XLA compile cache at %s: %s",
                cache, e)
        return self

    # --- opts.json round trip ----------------------------------------------
    def save_json(self, path=None):
        path = path or os.path.join(self.logs_dir, "opts.json")
        with open(path, "w") as fout:
            json.dump(dataclasses.asdict(self), fout, indent=2)
        return path

    # Fields a resumed run must keep from its original opts.json: they set
    # the architecture, arithmetic, ray table, losses, or schedule of the
    # training trajectory.  (max_train_steps is deliberately absent —
    # extending a run is legitimate; seed too — the PRNG state resumes from
    # the checkpoint, not the seed.)
    _RESUME_CRITICAL = (
        "compute_dtype", "fast_sine", "fc_units", "fc_layers",
        "number_low_frequency_cases", "n_samples", "n_importance",
        "use_HSLuv", "Use_MSE_loss", "Use_Solar", "Solar_Type_2",
        "sc_lambda", "ds_lambda", "p_lambda", "lr", "lr_alpha_scale",
        "phase4_prior_keepalive", "phase4_keepalive_barron", "pallas_trunk",
        "batch_size", "n_saves", "jump_start", "DSM_Mode",
        "weight_training_samples", "img_training_downscale",
        "img_validation_downscale", "testing_size", "site_name",
        "camera_model", "skip_Bundle_Adjust",
    )

    def adopt_resume_settings(self):
        """If this experiment dir holds checkpoints from a previous run, its
        recorded opts.json wins for every trajectory-critical field: a run
        trained 30k/50k steps under float32/exact-sin must not silently
        finish under today's bfloat16/fast-sine defaults after an upgrade —
        and ``save_json`` afterwards must not destroy the record of how it
        was trained.  Pass ``--no-resume`` to retrain from scratch under the
        new settings instead.  Called from the CLI entry point
        (``get_opts``) before the opts.json dump."""
        path = os.path.join(self.logs_dir, "opts.json") if self.logs_dir \
            else ""
        if not self.resume or not path or not os.path.exists(path):
            return self
        import glob
        import re
        steps = [int(re.search(r"Model_(\d+)", p).group(1)) for p in
                 glob.glob(os.path.join(self.logs_dir, "Model_*.nn"))]
        if not steps or max(steps) == 0:
            return self
        saved = type(self).load_json(path)
        changed = []
        for name in self._RESUME_CRITICAL:
            old, new = getattr(saved, name), getattr(self, name)
            if old != new:
                setattr(self, name, old)
                changed.append(f"  {name}: {new!r} -> {old!r}")
        if changed:
            import warnings
            warnings.warn(
                "resuming an existing run: its recorded opts.json wins for "
                "trajectory-critical settings (pass --no-resume to retrain "
                "under the new values):\n" + "\n".join(changed))
        return self

    # Keys whose *class* default changed after dirs already existed.  A
    # saved opts.json missing one of these predates the knob, so it must get
    # the behavior it was trained/converted under — not today's default.
    # (Our own save_json always writes every field; this only fires for
    # minimal hand-written opts.json, e.g. around a converted reference
    # checkpoint, where f32 exact-sin is the output-identity contract.)
    _LEGACY_DEFAULTS = {"compute_dtype": "float32", "fast_sine": False}

    @classmethod
    def load_json(cls, path):
        with open(path, "r") as fin:
            d = json.load(fin)
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        for k, v in cls._LEGACY_DEFAULTS.items():
            kwargs.setdefault(k, v)
        return cls(**kwargs)


def apply_overrides(cfg: Config, pairs):
    """Apply ``KEY=VALUE`` string overrides with type-aware coercion.

    ``type(current)(value)`` is wrong for bools (``bool("False") is True``)
    and for fields currently ``None``; this coerces by the *declared* field
    type: bools accept true/false/1/0/yes/no (case-insensitive), None-able
    fields get int/float/str by annotation, and unknown field names raise.
    """
    fields = {f.name: f for f in dataclasses.fields(type(cfg))}
    for kv in pairs:
        key, _, val = kv.partition("=")
        if not _ or key not in fields:
            raise ValueError(f"unknown config override {kv!r} "
                             f"(expect KEY=VALUE with a Config field name)")
        cur = getattr(cfg, key)
        ann = str(fields[key].type)
        if isinstance(cur, bool) or ann == "bool":
            low = val.strip().lower()
            if low in ("1", "true", "yes", "on"):
                coerced = True
            elif low in ("0", "false", "no", "off"):
                coerced = False
            else:
                raise ValueError(f"boolean field {key} got {val!r}")
        elif val.strip().lower() == "none":
            # only fields declared Optional may be cleared — coercing e.g.
            # lr=none would otherwise crash far from the override site
            if "Optional" not in ann and "None" not in ann:
                raise ValueError(
                    f"config field {key} is not Optional; cannot set it "
                    f"to None (got {kv!r})")
            coerced = None
        elif isinstance(cur, bool) is False and isinstance(cur, int):
            coerced = int(val)
        elif isinstance(cur, float):
            coerced = float(val)
        elif cur is None:
            coerced = (int(val) if "int" in ann
                       else float(val) if "float" in ann else val)
        else:
            coerced = type(cur)(val)
        setattr(cfg, key, coerced)
    return cfg


def add_config_flags(parser: argparse.ArgumentParser, defaults: Config = None):
    """Register every Config field as a CLI flag (booleans as store_true /
    --no-X pairs), preserving the reference flag names."""
    defaults = defaults or Config()
    for f in dataclasses.fields(Config):
        default = getattr(defaults, f.name)
        flag = "--" + f.name
        if f.type == "bool" or isinstance(default, bool):
            group = parser.add_mutually_exclusive_group()
            group.add_argument(flag, dest=f.name, action="store_true", default=default)
            group.add_argument("--no-" + f.name, dest=f.name, action="store_false")
        elif f.name == "height_range":
            parser.add_argument(flag, type=float, nargs=2, default=None,
                                metavar=("MIN_M", "MAX_M"))
        elif default is None:
            typ = int if "int" in str(f.type) else str
            parser.add_argument(flag, type=typ, default=None)
        else:
            parser.add_argument(flag, type=type(default), default=default)
    return parser


def get_opts(argv=None, defaults: Config = None, **overrides) -> Config:
    """argparse -> Config -> resolved dirs -> opts.json dump, the reference's
    get_opts contract (opt2.py:10-156).  ``overrides`` force flags
    programmatically like the reference's keyword-forcing (opt.py:11-13)."""
    parser = argparse.ArgumentParser()
    add_config_flags(parser, defaults)
    args = parser.parse_args(argv)
    cfg = Config(**vars(args))
    for k, v in overrides.items():
        setattr(cfg, k, v)
    cfg.resolve_dirs()
    cfg.adopt_resume_settings()
    cfg.enable_compile_cache()
    cfg.save_json()
    return cfg


def lite_defaults() -> Config:
    """The main_lite.py quick-train defaults (main_lite.py:63-78): 5000
    steps, lr x3, 10 saves, train/val images downscaled 4x/8x."""
    return Config(exp_name="OMA_281_Lite", site_name="OMA_281",
                  max_train_steps=5000, lr=3 * 10 ** -4.86, n_saves=10,
                  img_training_downscale=4, img_validation_downscale=8)

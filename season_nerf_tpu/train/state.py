"""Training state + checkpointing with true resume.

The reference saves bare ``state_dict`` files (Model_<step>.nn) and cannot
resume training — optimizer/scheduler/Barron state is lost (SURVEY.md §5).
Here the checkpoint carries the FULL train state: network params +
batch-norm stats, both optimizer states (network and adaptive-loss latents),
the adaptive-loss latents and their carried configs, plus step/phase —
serialized with flax msgpack.  The artifact names keep the reference's
contract (``Final_Model.nn``, ``Model_<step>.nn``, sidecar ``opts.json`` /
``W2C_W2L_H.npy``) so a model directory stays self-describing
(main_run_Season_NeRF.py:46-57).
"""

from __future__ import annotations

import os
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization



class TrainState(NamedTuple):
    step: jnp.ndarray                  # global step (int32 scalar)
    params: Any                        # network params pytree
    batch_stats: Any                   # BatchNorm running stats
    opt_state: Any                     # optax state for params
    ada_params: Any                    # {"color":…, "alpha":…} latents or {}
    ada_opt_state: Any                 # optax state for ada_params


def onecycle(peak_lr: float, total_steps: int,
             pct_start=0.3, div_factor=25.0, final_div_factor=1e4):
    """torch OneCycleLR equivalent (cos anneal, pct_start=.3, div 25/1e4 —
    the defaults used at Net_Tool_2.py:123-129).

    Built from explicit cosine pieces instead of
    optax.cosine_onecycle_schedule, which divides by integer interval sizes
    and returns NaN when a piece rounds to zero steps (tiny test phases).
    """
    warmup = max(int(pct_start * total_steps), 1)
    decay = max(total_steps - warmup, 1)
    init_lr = peak_lr / div_factor
    final_lr = init_lr / final_div_factor

    def rise(count):
        frac = jnp.clip(count / warmup, 0.0, 1.0)
        return init_lr + (peak_lr - init_lr) * 0.5 * (1 - jnp.cos(jnp.pi * frac))

    def fall(count):
        frac = jnp.clip(count / decay, 0.0, 1.0)
        return final_lr + (peak_lr - final_lr) * 0.5 * (1 + jnp.cos(jnp.pi * frac))

    return optax.join_schedules([rise, fall], boundaries=[warmup])


def make_optimizers(lr: float, lr_alpha_scale: float, phase_len: int):
    """(net_opt, ada_opt): Adam + fresh OneCycle per phase; the ada latents
    train at lr*lr_alpha_scale (=1000x, opt2.py:76; Net_Tool_2.py:111-121)."""
    net_opt = optax.adam(onecycle(lr, phase_len))
    ada_opt = optax.adam(onecycle(lr * lr_alpha_scale, phase_len))
    return net_opt, ada_opt


def save_checkpoint(path: str, state: TrainState, extra: Optional[Dict] = None):
    """Full-state checkpoint (msgpack).  ``extra`` holds host metadata
    (phase index, ada cfgs as plain dicts, config echo)."""
    payload = {
        "state": serialization.to_state_dict(jax.device_get(state)),
        "extra": extra or {},
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_checkpoint(path: str, template: TrainState):
    """Restore into a template state built with matching shapes.
    Returns (state, extra)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = serialization.from_state_dict(template, payload["state"])
    return state, payload.get("extra", {})


def save_model_artifact(path: str, params, batch_stats, meta: Optional[Dict] = None):
    """Inference-only artifact — the ``Final_Model.nn`` equivalent: just the
    network variables (+ metadata), loadable without optimizer templates."""
    payload = {
        "params": serialization.to_state_dict(jax.device_get(params)),
        "batch_stats": serialization.to_state_dict(jax.device_get(batch_stats)),
        "meta": meta or {},
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_model_artifact(path: str):
    """-> (params_state_dict, batch_stats_state_dict, meta).  Restore into a
    freshly-initialized module with serialization.from_state_dict."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return payload["params"], payload["batch_stats"], payload.get("meta", {})


def restore_variables(model_init_variables, artifact_path: str):
    """Load a Final_Model.nn-style artifact into a variables dict created by
    ``model.init``; shapes are validated by from_state_dict."""
    params_sd, stats_sd, meta = load_model_artifact(artifact_path)
    params = serialization.from_state_dict(model_init_variables["params"], params_sd)
    variables = {"params": params}
    if "batch_stats" in model_init_variables:
        variables["batch_stats"] = serialization.from_state_dict(
            model_init_variables["batch_stats"], stats_sd)
    return variables, meta

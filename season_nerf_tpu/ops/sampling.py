"""Ray sampling ops (stratified coarse + weighted fine), pure jnp.

TPU-first replacements for the reference's ``misc.sample_pt_coarse``
(misc.py:234-247) and ``sample_ray_weighted_stratified_v2`` (misc.py:297-328):
fully vectorized, explicit PRNG keys, static shapes, jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_coarse(rng, tops, bots, n_samples, train=True, include_end=False):
    """Stratified uniform samples along top->bot segments.

    tops/bots: [R, 3].  Returns (pts [R, n, 3], deltas [R, n, 1]).

    Matches misc.py:234-247 semantics: n equal bins from top to bot, jittered
    within-bin during training (per-ray jitter here — strictly better
    stratification than the reference's batch-shared jitter vector), and the
    constant per-ray step ``delta = |top - bot| / n``.  With
    ``include_end and not train`` the samples span [0, 1] inclusive
    (the solar-ray path, Eval_Tools_2.py:297-317, needs the end point).
    """
    R = tops.shape[0]
    if include_end and not train:
        ts = jnp.linspace(0.0, 1.0, n_samples)[None, :]
        ts = jnp.broadcast_to(ts, (R, n_samples))
    else:
        ts = jnp.linspace(0.0, 1.0, n_samples + 1)[:-1][None, :]
        ts = jnp.broadcast_to(ts, (R, n_samples))
        if train:
            ts = ts + jax.random.uniform(rng, (R, n_samples)) / n_samples
    pts = tops[:, None, :] * (1.0 - ts[:, :, None]) + bots[:, None, :] * ts[:, :, None]
    deltas = jnp.sqrt(jnp.sum((tops - bots) ** 2, axis=1)) / n_samples
    deltas = jnp.broadcast_to(deltas[:, None, None], (R, n_samples, 1))
    return pts, deltas


def sample_fine(rng, tops, bots, base_pts, weights, n_fine):
    """Importance-resample n_fine extra points proportional to ``weights``
    (the per-sample surface probabilities), merge-sorted with the coarse
    points along the ray.

    TPU-native inverse-CDF sampling replacing the reference's host-side
    WeightedRandomSampler loop (misc.py:297-328).  base_pts: [R, S, 3],
    weights: [R, S].  Returns (all_pts [R, S+n_fine, 3], deltas [R, S+n_fine, 1]).
    """
    R, S, _ = base_pts.shape
    k_idx, k_shift = jax.random.split(rng)
    w = weights + 1e-5
    cdf = jnp.cumsum(w, axis=1)
    cdf = cdf / cdf[:, -1:]
    u = jax.random.uniform(k_idx, (R, n_fine))
    idx = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    idx = jnp.clip(idx, 0, S - 1)
    # jitter within the chosen bin
    mids = (base_pts[:, 1:] + base_pts[:, :-1]) / 2
    starts = jnp.concatenate([tops[:, None, :], mids], axis=1)          # [R, S, 3]
    ends = jnp.concatenate([mids, bots[:, None, :]], axis=1)            # [R, S, 3]
    shift = jax.random.uniform(k_shift, (R, n_fine, 1))
    take = jax.vmap(lambda a, i: a[i])
    new_pts = take(starts, idx) + (take(ends, idx) - take(starts, idx)) * shift
    all_pts = jnp.concatenate([base_pts, new_pts], axis=1)
    # order by distance from the ray top
    d2 = jnp.sum((tops[:, None, :] - all_pts) ** 2, axis=2)
    order = jnp.argsort(d2, axis=1)
    all_pts = take(all_pts, order)
    # per-segment deltas from midpoints (misc.py:292-294)
    mid2 = (all_pts[:, :-1] + all_pts[:, 1:]) / 2
    seg = jnp.concatenate([tops[:, None, :], mid2, bots[:, None, :]], axis=1)
    deltas = jnp.sqrt(jnp.sum((seg[:, 1:] - seg[:, :-1]) ** 2, axis=2))
    return all_pts, deltas[:, :, None]


def out_of_cube(pts, lo=-1.0, hi=1.0):
    """Boolean mask of points outside the scene cube (misc.py:249-261)."""
    return jnp.any((pts < lo) | (pts > hi), axis=-1)

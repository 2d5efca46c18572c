"""Device-resident ray dataset.

The reference streams 512-ray batches through 4 torch DataLoader worker
processes per step (mg_run_NeRF.py:74-82) — a host bottleneck.  On TPU the
whole ray table (tens of millions of 22-float rows at most) fits in HBM, so
we upload it once and sample batches *inside jit* with a fast PRNG gather:
zero host involvement in the hot loop, and the gather shards cleanly over a
device mesh (batch dimension = data parallel axis).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from season_nerf_tpu.data.rays import RayTable, decode_batch


class DeviceRayDataset:
    """Uploads a RayTable to device(s) and serves random batches.

    ``sample(rng, batch_size)`` is jit-friendly: it only uses the device
    array and the key.  For sharded training the returned batch is laid out
    [batch, 22] and can be sharded on axis 0 by the caller's in_shardings.
    """

    def __init__(self, table: RayTable, sharding=None, eager=True):
        self.n = len(table)
        rows = jnp.asarray(table.rows)
        if sharding is not None and eager:
            rows = jax.device_put(rows, sharding)
        self.rows = rows
        self.img_ids = jnp.asarray(table.img_ids)
        self.sun_vecs = jnp.asarray(table.sun_vecs)
        self.time_encs = jnp.asarray(table.time_encs)
        self.table = table

    def sample(self, rng, batch_size):
        """Uniform-with-replacement batch of rows.  [B, 22]."""
        idx = jax.random.randint(rng, (batch_size,), 0, self.n)
        return jnp.take(self.rows, idx, axis=0)

    def sample_dict(self, rng, batch_size):
        return decode_batch(self.sample(rng, batch_size))

    def epoch_batches(self, batch_size):
        """Host-side sequential iteration (for eval renders): yields numpy
        row slices covering the table once; the final slice may be short
        (callers feeding fixed-shape jitted kernels must pad-and-trim,
        the pattern hm_eval/space_carving use)."""
        for start in range(0, self.n, batch_size):
            yield self.table.rows[start:start + batch_size]

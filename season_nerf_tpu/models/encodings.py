"""Positional (sin/cos) encodings.

Equivalent capability to the reference's ``PE_Encode`` (misc.py:105-139):
frequencies 2^j * (pi/2), per input dimension the layout is
[cos(k_0 x) ... cos(k_{n-1} x), sin(k_0 x) ... sin(k_{n-1} x)], with the
"extended" option prepending the raw input.  The layout is kept identical so
reference checkpoints can be weight-converted layer-for-layer.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def positional_encode(x, n_freqs, extended=True, scale=np.pi / 2):
    """[N, D] -> [N, D * 2 * n_freqs (+ D if extended)].

    Per dimension d the output block is
    ``cos(k_0 x_d), ..., cos(k_{n-1} x_d), sin(k_0 x_d), ..., sin(k_{n-1} x_d)``
    with ``k_j = 2^j * scale`` — matching misc.py:105-139 so converted
    reference weights act on identically-ordered features.
    """
    if n_freqs == 0:
        return x
    k = (2.0 ** jnp.arange(n_freqs)) * scale          # [n]
    ang = x[..., :, None] * k                          # [N, D, n]
    enc = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)  # [N, D, 2n]
    enc = enc.reshape(*x.shape[:-1], x.shape[-1] * 2 * n_freqs)
    if extended:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def encoded_size(in_dim, n_freqs, extended=True):
    if n_freqs == 0:
        return in_dim
    return in_dim * (2 * n_freqs + (1 if extended else 0))

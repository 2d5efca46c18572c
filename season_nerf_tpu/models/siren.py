"""SIREN layers (sinusoidal-activation dense layers) for flax.

Same math as the reference's ``SineLayer`` (misc.py:148-194): a linear layer
whose pre-activation is scaled by omega_0 = 30 and passed through sin, with
SIREN initialization (uniform +-1/fan_in for the first layer, uniform
+-sqrt(6/fan_in)/omega_0 otherwise) and an optional BatchNorm applied to the
scaled pre-activation (torch ``BatchNorm1d(momentum=0.01)`` semantics:
``running = 0.99 * running + 0.01 * batch``; batch statistics during
training, running statistics at eval).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn


def siren_kernel_init(is_first: bool, omega_0: float):
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        if is_first:
            bound = 1.0 / fan_in
        else:
            bound = jnp.sqrt(6.0 / fan_in) / omega_0
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
    return init


def _torch_uniform_init(key, shape, dtype=jnp.float32):
    # torch.nn.Linear default init: U(+-1/sqrt(fan_in)); fan_in = shape[0]
    # for kernels.  For biases flax passes shape=(features,), so callers use
    # torch_dense() which closes over fan_in.
    bound = 1.0 / jnp.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_dense(features, in_features, name=None, dtype=None):
    """nn.Dense with torch.nn.Linear default initialization (used for every
    non-SIREN head layer in the reference)."""
    # static math must stay host-side (np): module setup may run under jit
    bound = 1.0 / float(np.sqrt(in_features))

    def bias_init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return nn.Dense(features, dtype=dtype, kernel_init=_torch_uniform_init,
                    bias_init=bias_init, name=name)


class SplitDense(nn.Module):
    """Drop-in ``nn.Dense`` (identical param tree — ``kernel [in_total,
    features]`` + ``bias``, same init draws) that accepts an optional second
    input: ``y = x @ k[:in_x] + extra @ k[in_x:] + b``, i.e. the math of
    ``dense(concat([x, extra]))`` WITHOUT materializing the concatenation:
    two dots on kernel slices read ``x`` and ``extra`` in place (e.g. the
    trunk skip input would otherwise materialize ``[393216, 575]``).  The
    split changes only the f32 accumulation grouping of the dot (two
    partial sums instead of one), never the operands.

    Measured effect (v5e, flagship train step, batch 4096): throughput-
    neutral — 36.9k rays/s before and after; XLA was already streaming the
    concat efficiently.  Kept because it removes the concat buffer from the
    step's live set (lower peak HBM at large batch) at zero cost."""
    features: int
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros_init()
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, extra=None):
        in_x = x.shape[-1]
        in_total = in_x + (extra.shape[-1] if extra is not None else 0)
        kernel = self.param("kernel", self.kernel_init,
                            (in_total, self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        from flax.linen import dtypes
        x, extra, kernel, bias = dtypes.promote_dtype(
            x, extra, kernel, bias, dtype=self.dtype)
        if extra is None:
            return x @ kernel + bias
        return x @ kernel[:in_x] + extra @ kernel[in_x:] + bias


class SineLayer(nn.Module):
    """sin(norm(omega_0 * (W x + b))) with SIREN init.

    ``use_norm`` enables the batch-norm variant used in the reference trunk
    (G_NeRF.py:42-50 passes use_norm=True for fc2..fc9).  ``dtype`` is the
    matmul compute dtype (bfloat16 puts the MXU in its fast mode; params and
    the sin/norm epilogue stay float32 — but the *activation output* is cast
    to ``dtype``: every consumer is a Dense that casts its input to ``dtype``
    anyway, so the early cast is value-identical downstream and makes the
    bf16 inter-layer boundary explicit.  Measured throughput-neutral at
    batch 4096 — XLA's convert motion already kept those boundaries bf16).

    ``extra`` is an optional second input concatenated (mathematically) after
    ``x`` — see SplitDense.
    """
    features: int
    is_first: bool = False
    omega_0: float = 30.0
    use_norm: bool = False
    dtype: Optional[jnp.dtype] = None
    fast_sine: bool = False   # polynomial sin (ops/fast_math.py): exact to
    #                           f32 resolution on the BatchNorm'd SIREN
    #                           pre-activation range, ~3x fewer VPU ops than
    #                           the full-range lowering

    @nn.compact
    def __call__(self, x, train: bool = False, extra=None):
        in_features = x.shape[-1] + (extra.shape[-1] if extra is not None
                                     else 0)
        bound = 1.0 / float(np.sqrt(in_features))
        dense = SplitDense(
            self.features,
            dtype=self.dtype,
            kernel_init=siren_kernel_init(self.is_first, self.omega_0),
            bias_init=lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, minval=-bound, maxval=bound),
            name="linear")
        z = self.omega_0 * dense(x, extra)
        # Under a bf16 compute dtype the dense output is bf16 and the weak
        # python-float omega keeps the product bf16 — so ``z`` carries bf16
        # precision regardless of its storage type.  Type the buffer as
        # ``dtype`` (NOT f32): bf16<->f32 conversion of bf16-valued data is
        # exact, BN statistics are accumulated in f32 from the same values
        # (flax _compute_stats upcasts), and the normalize/sin math below
        # promotes back to f32 — bit-exact against the old f32
        # materialization (tests/test_model_ops pins it).  Measured
        # throughput-neutral on the v5e (XLA was already narrowing the
        # stored forward buffer); kept because the bf16 typing also makes
        # z's backward cotangent bf16-eligible and halves the buffer in
        # any future remat/live-set accounting.
        if self.dtype is not None:
            z = z.astype(self.dtype)
        if self.use_norm:
            z = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,          # torch momentum=0.01
                epsilon=1e-5,
                dtype=jnp.float32,      # f32 normalize math (promote)
                name="norm")(z)
        z = z.astype(jnp.float32)       # register-level upcast; fuses into
        #                                 the consumer, costs no HBM traffic
        if self.fast_sine:
            from season_nerf_tpu.ops.fast_math import fast_sin
            y = fast_sin(z)
        else:
            y = jnp.sin(z)
        if self.dtype is not None:
            y = y.astype(self.dtype)
        return y

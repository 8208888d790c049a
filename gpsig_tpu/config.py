"""Global numeric policy for gpsig_tpu.

The reference stack (GPflow 1.x) runs float64 end-to-end
(``gpflow.settings.float_type``) with a default jitter of 1e-6. On TPU the
MXU wants bf16/f32, so the policy here is split:

- *parity* mode: float64 (requires ``jax.config.update("jax_enable_x64", True)``)
  — used by the oracle test-suite to match the reference bit-for-bit-ish.
- *throughput* mode: float32 accumulation, optionally bfloat16 inputs to the
  MXU matmuls — used by benchmarks.

Library code is dtype-polymorphic: it computes in the dtype of its inputs and
only consults this module for constants (jitter) and default initialisation
dtypes.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass
class Settings:
    """Mutable global settings (mirrors gpflow.settings's role)."""

    #: jitter added to Kuu / Cholesky factorisations (gpflow default: 1e-6)
    jitter: float = 1e-6
    #: default dtype for parameter initialisation
    default_float: jnp.dtype = jnp.float32
    #: dtype fed to MXU matmuls in throughput mode (None = same as inputs)
    matmul_dtype: jnp.dtype | None = None


settings = Settings()


def default_float():
    return settings.default_float


def default_jitter():
    return settings.jitter

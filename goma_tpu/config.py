"""Global numeric configuration.

The reference (Goma) is double-precision everywhere. On TPU, f64 is emulated
and slow; the framework therefore carries an explicit working dtype:

- tests / parity runs: float64 (requires ``jax.config.update("jax_enable_x64", True)``)
- TPU production runs: float32 accumulation with bfloat16 matmul inputs where safe.
"""

from __future__ import annotations

import jax.numpy as jnp

_FP_DTYPE = jnp.float64


def set_fp_dtype(dtype) -> None:
    global _FP_DTYPE
    _FP_DTYPE = jnp.dtype(dtype)


def fp_dtype():
    """Working floating dtype. Falls back to f32 when x64 is disabled."""
    import jax

    if _FP_DTYPE == jnp.float64 and not jax.config.jax_enable_x64:
        return jnp.dtype(jnp.float32)
    return jnp.dtype(_FP_DTYPE)

"""Int8 vector quantization for HBM-resident corpora.

Per-row symmetric quantization: ``row_int8 = round(row / scale)`` with
``scale = max|row| / 127``.  Dot products against a float query then
dequantize in the matmul epilogue: ``score = (q @ e_int8.T) * scale_e``.
This quarters HBM footprint vs fp32 (halves vs bf16) and keeps the MXU
fed with int8 multiplicands (reference target: BASELINE.md config #2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_int8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Quantize ``[N, D]`` float rows to int8 with per-row scales.

    Returns ``(values_int8 [N, D], scales_f32 [N])``.  All-zero rows get
    scale 0 and decode back to zero.
    """
    absmax = jnp.max(jnp.abs(x), axis=-1)
    scale = absmax / 127.0
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(x / safe[..., None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def dequantize_int8(q: jax.Array, scale: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scale[..., None]

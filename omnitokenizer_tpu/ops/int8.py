"""Int8 weight quantization for the AR decode serving path (W8A8).

The LM decode step is weight-bandwidth-bound (~1.36 GB of bf16 weights per
token for the 24L/1536 LM); int8 halves the weight bytes AND runs the MXU
at its native int8 rate.  Activations are quantized dynamically per row
(absmax), weights per output channel — the standard W8A8 recipe.

Quantized tensors ride a separate flax "quant" variables collection (the
"params" tree keeps its f32 masters untouched, so checkpoints and training
are unaffected); `quantize_gpt_decode_params` builds the collection
offline and `GPTConfig.int8_decode=True` makes the blocks read it.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

# Dense submodules replaced by int8 matmuls in each TransformerBlock
BLOCK_DENSE = ("query", "key", "value", "proj", "fc", "proj_out")


def quantize_weight(kernel: jnp.ndarray):
    """(K, N) f32 -> ((K, N) int8, (N,) f32 per-output-channel scales)."""
    kernel = jnp.asarray(kernel, jnp.float32)
    s = jnp.max(jnp.abs(kernel), axis=0) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(kernel / s[None, :]), -127, 127).astype(jnp.int8)
    return q, s


def int8_matmul(x: jnp.ndarray, wq: jnp.ndarray, ws: jnp.ndarray) -> jnp.ndarray:
    """x (..., K) float; wq (K, N) int8; ws (N,) f32 -> (..., N) f32.

    Per-row dynamic activation quantization; the int8 x int8 -> int32 dot
    reads the weights in int8 straight from HBM (no bf16 materialization).
    """
    xf = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    ax = jnp.maximum(ax, 1e-12)
    xi = jnp.clip(jnp.round(xf / ax), -127, 127).astype(jnp.int8)
    out = jax.lax.dot_general(
        xi, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return out.astype(jnp.float32) * ax * ws


def quantize_gpt_decode_params(params: Dict[str, Any], n_layer: int) -> Dict[str, Any]:
    """Build the "quant" collection for GPT decode: every block Dense and
    the LM head quantized to (int8 kernel, f32 scale); biases copied f32."""
    quant: Dict[str, Any] = {}
    for i in range(n_layer):
        bp = params[f"block{i}"]
        qb: Dict[str, Any] = {}
        for name in BLOCK_DENSE:
            q, s = quantize_weight(bp[name]["kernel"])
            qb[name] = {"q": q, "s": s,
                        "b": jnp.asarray(bp[name]["bias"], jnp.float32)}
        quant[f"block{i}"] = qb
    hq, hs = quantize_weight(params["head"]["kernel"])
    quant["head"] = {"q": hq, "s": hs}
    return quant

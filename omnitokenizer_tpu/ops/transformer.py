"""Block-string transformer dispatcher.

Reference: /root/reference/OmniTokenizer/modules/attention.py:588-689.
Block codes: 't' full attention (+PEG), 'w' window attention, 'a'/'m'/'l'
pooling, 'n'/'r' upsampling. PEG exists only on 't' blocks; pool/up blocks
replace (not residual-add) the token tensor; FF is always residual.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .attention import Attention, FeedForward, Pooling, Up
from .norms import LayerNormGamma
from .peg import PEG
from .window import WindowAttention


class Transformer(nn.Module):
    dim: int
    depth: int
    block: str
    causal: bool = False
    dim_head: int = 64
    heads: int = 8
    ff_mult: float = 4.0
    peg: bool = True
    peg_causal: bool = True
    window_size: int = 4
    spatial_pos: str = "rel"
    attn_bias_mode: str = "sdpa"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        video_shape: Tuple[int, int, int, int],
        is_spatial: bool = True,
        training: bool = False,
    ) -> jnp.ndarray:
        assert len(self.block) == self.depth
        vs = tuple(video_shape)
        for i, blk in enumerate(self.block):
            if blk == "t":
                if self.peg:
                    x = PEG(self.dim, causal=self.peg_causal, dtype=self.dtype,
                            name=f"layers_{i}_peg")(x, vs, residual=True)
                x = Attention(
                    dim=self.dim,
                    dim_head=self.dim_head,
                    heads=self.heads,
                    causal=self.causal,
                    spatial_pos=self.spatial_pos,
                    attn_bias_mode=self.attn_bias_mode,
                    dtype=self.dtype,
                    name=f"layers_{i}_attn",
                )(x, is_spatial=is_spatial,
                  n_frames=vs[1] if x.ndim == 2 else None,
                  training=training) + x
                x = FeedForward(self.dim, mult=self.ff_mult, dtype=self.dtype, name=f"layers_{i}_ff")(x, training=training) + x
            elif blk == "w":
                x = WindowAttention(
                    dim=self.dim,
                    window_size=self.window_size,
                    num_heads=self.heads,
                    dtype=self.dtype,
                    name=f"layers_{i}_attn",
                )(x) + x
                x = FeedForward(self.dim, mult=self.ff_mult, dtype=self.dtype, name=f"layers_{i}_ff")(x, training=training) + x
            elif blk in ("a", "m", "l"):
                x = Pooling(blk, self.dim, dtype=self.dtype, name=f"layers_{i}_attn")(x)
                x = FeedForward(self.dim, mult=self.ff_mult, dtype=self.dtype, name=f"layers_{i}_ff")(x, training=training) + x
                vs = (vs[0], vs[1], vs[2] // 2, vs[3] // 2)
            elif blk in ("n", "r"):
                x = Up(blk, self.dim, dtype=self.dtype, name=f"layers_{i}_attn")(x)
                x = FeedForward(self.dim, mult=self.ff_mult, dtype=self.dtype, name=f"layers_{i}_ff")(x, training=training) + x
                vs = (vs[0], vs[1], vs[2] * 2, vs[3] * 2)
            else:
                raise NotImplementedError(blk)

        return LayerNormGamma(self.dim, dtype=self.dtype, name="norm_out")(x)

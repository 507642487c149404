"""OmniTokenizer spatial-temporal transformer VQGAN / VAE.

Reference semantics: /root/reference/OmniTokenizer/omnitokenizer.py:63-1118.

Layout: everything inside this module is channels-LAST (B, T, H, W, C) —
the natural TPU layout where the channel dim rides the 128-lane axis and all
patch embeds / projections become plain MXU matmuls.  The channels-first
torch layout exists only at the public wrapper boundary
(models/wrapper.py) for drop-in API compatibility.

Key structural parity points:
 * first frame is patch-embedded separately at temporal stride 1
   (omnitokenizer.py:934-947) and preserved by temporal pooling (:910-914);
 * encoder: spatial transformer over (b t) (h w) d then temporal over
   (b h w) t d (:881-916); decoder mirrors it (:1059-1098);
 * PEG receives the *original* (B, T, H, W) video shape in both passes,
   reproducing the reference's reshape quirk (see ops/peg.py).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from ..config import TokenizerConfig
from ..ops.codebook import Codebook
from ..ops.gaussian import DiagonalGaussian
from ..ops.norms import LayerNorm
from ..ops.patch_fold import DenseParams, NormParams, fast_to_pixels, folded_patch_embed
from ..ops.precision import mm_precision
from ..ops.transformer import Transformer


class _CnnNormalize(nn.Module):
    """GroupNorm(32) / BatchNorm for the cnn patch-embed path
    (base.py:272-277); BatchNorm stats live in the 'batch_stats' collection
    and sync across the mesh via GSPMD's global reductions."""

    channels: int
    norm_type: str = "group"

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.norm_type == "group":
            return nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        return nn.BatchNorm(use_running_average=not training, epsilon=1e-5,
                            momentum=0.9, name="norm")(x)


class Encoder(nn.Module):
    """omnitokenizer.py:772-947 (linear patch embed path)."""

    cfg: TokenizerConfig

    @nn.compact
    def __call__(self, video: jnp.ndarray, is_image: bool,
                 training: bool = False) -> jnp.ndarray:
        cfg = self.cfg

        p = cfg.patch_size
        pt = cfg.temporal_patch_size
        if cfg.patch_embed == "linear":
            if cfg.defer_temporal_pool:
                pt //= 2
            if cfg.defer_spatial_pool:
                p //= 2

        B, T, H, W, C = video.shape
        assert (T - 1) % pt == 0, (
            f"frames-1 ({T - 1}) must be divisible by temporal patch size ({pt})")

        # cast pixels to the compute dtype BEFORE patchify: the rearrange is
        # a full-resolution layout copy and costs 2x in f32 (trace-verified)
        video = video.astype(cfg.dtype)
        first, rest = video[:, :1], video[:, 1:]

        if cfg.patch_embed == "linear":
            # bf16 fast path: LN1+Linear folded into one strided conv
            # (ops/patch_fold.py); identical param tree, bf16-level numerics
            fast = cfg.fast_patchify and cfg.dtype == jnp.bfloat16
            if fast:
                g1, b1 = NormParams(C * p * p, name="to_patch_emb_first_frame_norm1")()
                k1, kb1 = DenseParams(cfg.embedding_dim, C * p * p,
                                      name="to_patch_emb_first_frame_proj")()
                ff = folded_patch_embed(first, g1, b1, k1, kb1, 1, p, cfg.dtype)
            else:
                ff = rearrange(first, "b t (h p1) (w p2) c -> b t h w (c p1 p2)", p1=p, p2=p)
                ff = LayerNorm(C * p * p, name="to_patch_emb_first_frame_norm1")(ff)
                ff = nn.Dense(cfg.embedding_dim, dtype=cfg.dtype,
                              precision=mm_precision(cfg.dtype), name="to_patch_emb_first_frame_proj")(ff)
            ff = LayerNorm(cfg.embedding_dim, dtype=cfg.dtype, name="to_patch_emb_first_frame_norm2")(ff)

            if rest.shape[1] > 0:
                if fast:
                    g2, b2 = NormParams(C * pt * p * p, name="to_patch_emb_norm1")()
                    k2, kb2 = DenseParams(cfg.embedding_dim, C * pt * p * p,
                                          name="to_patch_emb_proj")()
                    rf = folded_patch_embed(rest, g2, b2, k2, kb2, pt, p, cfg.dtype)
                else:
                    rf = rearrange(rest, "b (t pt) (h p1) (w p2) c -> b t h w (c pt p1 p2)", pt=pt, p1=p, p2=p)
                    rf = LayerNorm(C * pt * p * p, name="to_patch_emb_norm1")(rf)
                    rf = nn.Dense(cfg.embedding_dim, dtype=cfg.dtype,
                                  precision=mm_precision(cfg.dtype), name="to_patch_emb_proj")(rf)
                rf = LayerNorm(cfg.embedding_dim, dtype=cfg.dtype, name="to_patch_emb_norm2")(rf)
                tokens = jnp.concatenate([ff, rf], axis=1)
            else:
                tokens = ff
        elif cfg.patch_embed == "cnn":
            # omnitokenizer.py:823-838: strided Conv3d patchify + Normalize
            ff = nn.Conv(cfg.embedding_dim, (1, p, p), strides=(1, p, p),
                         padding="VALID", dtype=cfg.dtype,
                         name="to_patch_emb_first_frame_conv")(first)
            ff = _CnnNormalize(cfg.embedding_dim, cfg.norm_type,
                               name="to_patch_emb_first_frame_cnorm")(ff, training)
            if rest.shape[1] > 0:
                rf = nn.Conv(cfg.embedding_dim, (pt, p, p), strides=(pt, p, p),
                             padding="VALID", dtype=cfg.dtype,
                             name="to_patch_emb_conv")(rest)
                rf = _CnnNormalize(cfg.embedding_dim, cfg.norm_type,
                                   name="to_patch_emb_cnorm")(rf, training)
                tokens = jnp.concatenate([ff, rf], axis=1)
            else:
                tokens = ff
        else:
            raise NotImplementedError(cfg.patch_embed)

        b, t, h, w, d = tokens.shape
        video_shape = (b, t, h, w)

        x = tokens.reshape(b * t, h * w, d)
        x = Transformer(
            dim=cfg.embedding_dim,
            depth=len(cfg.enc_block),
            block=cfg.enc_block,
            causal=False,
            dim_head=cfg.dim_head,
            heads=cfg.heads,
            ff_mult=cfg.ff_mult,
            peg=True,
            peg_causal=cfg.causal_in_peg,
            window_size=cfg.twod_window_size,
            spatial_pos=cfg.spatial_pos,
            attn_bias_mode=cfg.attn_bias_mode,
            dtype=cfg.dtype,
            name="enc_spatial_transformer",
        )(x, video_shape, is_spatial=True, training=training)

        hw = x.shape[1]
        nh = nw = int(hw ** 0.5)
        x = x.reshape(b, t, nh, nw, d)
        video_shape2 = (b, t, nh, nw)
        # bf16/TPU serving keeps the temporal stack token-flat 2D: the
        # ((b h w) t) row order makes PEG's quirk reshape a bitcast and
        # removes the 5-sublane relayout copies of the (B', t, d) form
        flat_temporal = cfg.use_flat_temporal(t)
        if flat_temporal:
            x = rearrange(x, "b t h w d -> (b h w t) d")
        else:
            x = rearrange(x, "b t h w d -> (b h w) t d")
        x = Transformer(
            dim=cfg.embedding_dim,
            depth=cfg.temporal_depth,
            block="t" * cfg.temporal_depth,
            causal=cfg.causal_in_temporal_transformer,
            dim_head=cfg.dim_head,
            heads=cfg.heads,
            ff_mult=cfg.ff_mult,
            peg=True,
            peg_causal=cfg.causal_in_peg,
            spatial_pos="rel",
            attn_bias_mode=cfg.attn_bias_mode,
            dtype=cfg.dtype,
            name="enc_temporal_transformer",
        )(x, video_shape2, is_spatial=False, training=training)
        if flat_temporal:
            tokens = rearrange(x, "(b h w t) d -> b t h w d", b=b, h=nh, w=nw, t=t)
        else:
            tokens = rearrange(x, "(b h w) t d -> b t h w d", b=b, h=nh, w=nw)

        if cfg.defer_spatial_pool and cfg.patch_embed == "linear":
            tokens = nn.avg_pool(
                tokens.reshape(b * t, nh, nw, d), (2, 2), (2, 2)).reshape(b, t, nh // 2, nw // 2, d)
        if tokens.shape[1] > 1 and cfg.defer_temporal_pool and cfg.patch_embed == "linear":
            first_t, rest_t = tokens[:, :1], tokens[:, 1:]
            rt = rest_t.shape[1]
            rest_t = rest_t.reshape(b, rt // 2, 2, *rest_t.shape[2:]).mean(axis=2)
            tokens = jnp.concatenate([first_t, rest_t], axis=1)

        return tokens  # (B, t, h, w, d)


class Decoder(nn.Module):
    """omnitokenizer.py:950-1118 (linear to-pixels path)."""

    cfg: TokenizerConfig

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, is_image: bool,
                 training: bool = False) -> jnp.ndarray:
        cfg = self.cfg

        p = cfg.patch_size
        if cfg.gen_upscale is not None:
            p *= cfg.gen_upscale
        pt = cfg.temporal_patch_size
        if cfg.patch_embed == "linear":
            if cfg.defer_temporal_pool:
                pt //= 2
            if cfg.defer_spatial_pool:
                p //= 2
        C = cfg.image_channels

        b = tokens.shape[0]
        if tokens.shape[1] > 1 and cfg.defer_temporal_pool and cfg.patch_embed == "linear":
            first_t, rest_t = tokens[:, :1], tokens[:, 1:]
            rest_t = jnp.repeat(rest_t, 2, axis=1)
            tokens = jnp.concatenate([first_t, rest_t], axis=1)
        if cfg.defer_spatial_pool and cfg.patch_embed == "linear":
            tokens = jnp.repeat(jnp.repeat(tokens, 2, axis=2), 2, axis=3)

        _, t, h, w, d = tokens.shape
        video_shape = (b, t, h, w)

        flat_temporal = cfg.use_flat_temporal(t)
        if flat_temporal:
            x = rearrange(tokens, "b t h w d -> (b h w t) d")
        else:
            x = rearrange(tokens, "b t h w d -> (b h w) t d")
        x = Transformer(
            dim=cfg.embedding_dim,
            depth=cfg.temporal_depth,
            block="t" * cfg.temporal_depth,
            causal=cfg.causal_in_temporal_transformer,
            dim_head=cfg.dim_head,
            heads=cfg.heads,
            ff_mult=cfg.ff_mult,
            peg=True,
            peg_causal=cfg.causal_in_peg,
            spatial_pos="rel",
            attn_bias_mode=cfg.attn_bias_mode,
            dtype=cfg.dtype,
            name="dec_temporal_transformer",
        )(x, video_shape, is_spatial=False, training=training)

        # omnitokenizer.py:1077-1081: spatial up-blocks ('n'/'r') start from a
        # down_ratio-smaller grid; standard configs have down_ratio == 1.
        down_op = cfg.dec_block.count("n") + cfg.dec_block.count("r")
        down_ratio = 2 ** down_op
        if flat_temporal:
            x = rearrange(x, "(b h w t) d -> (b t) (h w) d",
                          b=b, h=h // down_ratio, w=w // down_ratio, t=t)
        else:
            x = rearrange(x, "(b h w) t d -> (b t) (h w) d",
                          b=b, h=h // down_ratio, w=w // down_ratio)
        x = Transformer(
            dim=cfg.embedding_dim,
            depth=len(cfg.dec_block),
            block=cfg.dec_block,
            causal=False,
            dim_head=cfg.dim_head,
            heads=cfg.heads,
            ff_mult=cfg.ff_mult,
            peg=True,
            peg_causal=cfg.causal_in_peg,
            window_size=cfg.twod_window_size,
            spatial_pos=cfg.spatial_pos,
            attn_bias_mode=cfg.attn_bias_mode,
            dtype=cfg.dtype,
            name="dec_spatial_transformer",
        )(x, video_shape, is_spatial=True, training=training)
        x = rearrange(x, "(b t) (h w) d -> b t h w d", b=b, h=h, w=w)

        first_tok, rest_tok = x[:, :1], x[:, 1:]
        if cfg.patch_embed == "linear":
            # bf16 fast path: weight-side column permutation makes the
            # un-patchify a coarse-chunk transpose (ops/patch_fold.py)
            fast = cfg.fast_patchify and cfg.dtype == jnp.bfloat16
            if fast:
                kf, bf = DenseParams(C * p * p, x.shape[-1],
                                     name="to_pixels_first_frame")()
                first_frame = fast_to_pixels(first_tok, kf, bf, 1, p, C, cfg.dtype,
                                             mm_precision(cfg.dtype))
            else:
                ff = nn.Dense(C * p * p, dtype=cfg.dtype,
                              precision=mm_precision(cfg.dtype), name="to_pixels_first_frame")(first_tok)
                first_frame = rearrange(ff, "b t h w (c p1 p2) -> b t (h p1) (w p2) c", p1=p, p2=p)

            if rest_tok.shape[1] > 0:
                if fast:
                    kr, br = DenseParams(C * pt * p * p, x.shape[-1],
                                         name="to_pixels")()
                    rest_frames = fast_to_pixels(rest_tok, kr, br, pt, p, C, cfg.dtype,
                                                 mm_precision(cfg.dtype))
                else:
                    rf = nn.Dense(C * pt * p * p, dtype=cfg.dtype,
                                  precision=mm_precision(cfg.dtype), name="to_pixels")(rest_tok)
                    rest_frames = rearrange(
                        rf, "b t h w (c pt p1 p2) -> b (t pt) (h p1) (w p2) c", pt=pt, p1=p, p2=p)
                recon = jnp.concatenate([first_frame, rest_frames], axis=1)
            else:
                recon = first_frame
        elif cfg.patch_embed == "cnn":
            # omnitokenizer.py:1019-1035: plain strided ConvTranspose3d
            # un-patchify; kernel == stride makes it exactly a per-token
            # linear + depth-to-space, kept in torch kernel layout
            # (dim, C, kt, p, p) for direct checkpoint conversion.
            dim = x.shape[-1]

            def unpatch(tok, kt, name):
                kernel = self.param(f"{name}_kernel",
                                    nn.initializers.lecun_normal(),
                                    (dim, C, kt, p, p), jnp.float32)
                bias = self.param(f"{name}_bias", nn.initializers.zeros,
                                  (C,), jnp.float32)
                y = jnp.einsum("bthwd,dcijl->bthwijlc",
                               tok.astype(cfg.dtype), kernel.astype(cfg.dtype),
                               precision=mm_precision(cfg.dtype))
                y = rearrange(y, "b t h w i j l c -> b (t i) (h j) (w l) c")
                y = y + bias.astype(cfg.dtype)
                return _CnnNormalize(C, cfg.norm_type, name=f"{name}_cnorm")(y, training)

            first_frame = unpatch(first_tok, 1, "to_pixels_first_frame_conv")
            if rest_tok.shape[1] > 0:
                rest_frames = unpatch(rest_tok, pt, "to_pixels_conv")
                recon = jnp.concatenate([first_frame, rest_frames], axis=1)
            else:
                recon = first_frame
        else:
            raise NotImplementedError(cfg.patch_embed)

        return recon  # (B, T, H, W, C)


class OmniTokenizerNet(nn.Module):
    """The full tokenizer: encoder -> pre-vq -> codebook|gaussian -> post-vq
    -> decoder.  All tensors channels-last."""

    cfg: TokenizerConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = Encoder(cfg)
        self.decoder = Decoder(cfg)
        out_dim = cfg.codebook_dim * (2 if cfg.use_vae else 1)
        # fp32_quant (default): keep the pre-VQ projection f32 even on the
        # bf16 serving path so codebook indices stay exact vs the oracle
        # graph; --no_fp32_quant trades that for ~0.3 ms/call (PERF.md r3)
        vq_dtype = jnp.float32 if cfg.fp32_quant else cfg.dtype
        self.pre_vq_conv = nn.Dense(out_dim, dtype=vq_dtype,
                                    precision=mm_precision(vq_dtype), name="pre_vq_conv")
        self.post_vq_conv = nn.Dense(cfg.embedding_dim, dtype=cfg.dtype,
                                     precision=mm_precision(cfg.dtype), name="post_vq_conv")
        self.codebook = Codebook(
            n_codes=cfg.n_codes,
            embedding_dim=cfg.codebook_dim,
            no_random_restart=cfg.no_random_restart,
            restart_thres=cfg.restart_thres,
        )

    # -- pieces ---------------------------------------------------------
    def encode_latent(self, x: jnp.ndarray, is_image: bool,
                      training: bool = False) -> jnp.ndarray:
        """pixels (B,T,H,W,C) -> pre-quant latents (B,t,h,w,code_dim[*2])."""
        h = self.encoder(x, is_image, training=training)
        vq_dtype = jnp.float32 if self.cfg.fp32_quant else self.cfg.dtype
        return self.pre_vq_conv(h.astype(vq_dtype))

    def quantize(self, h: jnp.ndarray, training: bool = False, axis_name: Optional[str] = None):
        if self.cfg.l2_code:
            from ..ops.attention import l2norm

            h = l2norm(h)  # zero-safe backward (see ops.attention.l2norm)
        return self.codebook(h, training=training, axis_name=axis_name)

    def decode_latent(self, z: jnp.ndarray, is_image: bool,
                      training: bool = False) -> jnp.ndarray:
        """post-quant latents (B,t,h,w,code_dim) -> pixels (B,T,H,W,C)."""
        return self.decoder(self.post_vq_conv(z.astype(self.cfg.dtype)), is_image,
                            training=training)

    # -- public-contract methods -----------------------------------------
    def encode(self, x: jnp.ndarray, is_image: bool, include_embeddings: bool = False):
        """VQ mode: token indices (B,t,h,w) [+ embeddings];
        VAE mode: sampled continuous latents (B,t,h,w,code_dim)."""
        h = self.encode_latent(x, is_image)
        if not self.cfg.use_vae:
            vq = self.quantize(h)
            if include_embeddings:
                return vq["embeddings"], vq["encodings"]
            return vq["encodings"]
        posterior = DiagonalGaussian.from_params(h, axis=-1)
        key = self.make_rng("gaussian") if self.has_rng("gaussian") else None
        z = posterior.sample(key) if key is not None else posterior.mode()
        return z

    def decode(self, encodings: jnp.ndarray, is_image: bool) -> jnp.ndarray:
        """Accepts VQ indices — flat (B, N) or grid (B,t,h,w) — or VAE
        latents (B,t,h,w,c) / flat (B,N,c), reproducing the reshape contract
        of omnitokenizer.py:268-317."""
        cfg = self.cfg
        if not cfg.use_vae:
            z = self.codebook.lookup(encodings)
            if encodings.ndim == 2:  # flat indices
                n = encodings.shape[1]
                if is_image:
                    hh = int(n ** 0.5)
                    z = z.reshape(z.shape[0], 1, hh, hh, z.shape[-1])
                else:
                    hh = cfg.resolution // cfg.patch_size
                    t = n // (hh * hh)
                    z = z.reshape(z.shape[0], t, hh, hh, z.shape[-1])
        else:
            z = encodings
            if z.ndim == 3:  # (B, N, c) flat latents
                n = z.shape[1]
                if is_image:
                    hh = int(n ** 0.5)
                    z = z.reshape(z.shape[0], 1, hh, hh, z.shape[-1])
                else:
                    hh = cfg.resolution // cfg.patch_size
                    t = n // (hh * hh)
                    z = z.reshape(z.shape[0], t, hh, hh, z.shape[-1])
            elif z.ndim == 4:  # (B, h, w, c) image latent without time axis
                z = z[:, None]
        return self.decode_latent(z, is_image)

    def __call__(
        self,
        x: jnp.ndarray,
        is_image: bool,
        training: bool = False,
        axis_name: Optional[str] = None,
    ):
        """Full autoencode pass; returns (x_recon, aux dict)."""
        h = self.encode_latent(x, is_image, training=training)
        if not self.cfg.use_vae:
            vq = self.quantize(h, training=training, axis_name=axis_name)
            x_recon = self.decode_latent(vq["embeddings"], is_image, training=training)
            return x_recon, vq
        posterior = DiagonalGaussian.from_params(h, axis=-1)
        key = self.make_rng("gaussian") if self.has_rng("gaussian") else None
        z = posterior.sample(key) if key is not None else posterior.mode()
        x_recon = self.decode_latent(z, is_image, training=training)
        kl = posterior.kl()
        kl_loss = jnp.sum(kl) / kl.shape[0] * self.cfg.kl_weight
        return x_recon, dict(commitment_loss=kl_loss, kl_loss=kl_loss, posterior=posterior)

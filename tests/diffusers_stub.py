"""Faithful mini-stub of the diffusers==0.24 surface that
`/root/reference/Diffusion/Latte/models/latte_t2v.py` imports.

diffusers is not installed in this environment, so the reference T2V model
cannot be imported as-is.  This module re-implements ONLY the primitives the
reference composes — per the public diffusers 0.24.0 semantics (PixArt-alpha
`ada_norm_single` stack) — so the reference file's OWN 989 lines (temporal
interleave, joint image-video routing, caption/mask broadcasting, final
layer) can run as the parity oracle for omnitokenizer_tpu/models/latte_t2v.py.

The stub is the oracle's *primitive layer* only; every reference-unique
code path still executes from the reference file itself.
"""

from __future__ import annotations

import functools
import inspect
import math
import sys
import types
from dataclasses import dataclass

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

USE_PEFT_BACKEND = False


def _mk(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


# --------------------------------------------------------------------- lora
class LoRACompatibleLinear(nn.Linear):
    def forward(self, hidden_states, scale: float = 1.0):
        return F.linear(hidden_states, self.weight, self.bias)


class LoRACompatibleConv(nn.Conv2d):
    def forward(self, hidden_states, scale: float = 1.0):
        return super().forward(hidden_states)


# -------------------------------------------------------------- activations
class GELU(nn.Module):
    def __init__(self, dim_in, dim_out, approximate="none"):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out)
        self.approximate = approximate

    def forward(self, hidden_states):
        return F.gelu(self.proj(hidden_states), approximate=self.approximate)


class GEGLU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        linear_cls = LoRACompatibleLinear if not USE_PEFT_BACKEND else nn.Linear
        self.proj = linear_cls(dim_in, dim_out * 2)

    def forward(self, hidden_states, scale: float = 1.0):
        hidden_states, gate = self.proj(hidden_states).chunk(2, dim=-1)
        return hidden_states * F.gelu(gate)


class ApproximateGELU(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out)

    def forward(self, x):
        return self.proj(x) * torch.sigmoid(1.702 * self.proj(x))


# --------------------------------------------------------------- embeddings
def get_1d_sincos_pos_embed_from_grid(embed_dim, pos):
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000**omega
    pos = np.asarray(pos).reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim, grid_size, interpolation_scale=1.0,
                            base_size=16):
    grid_h = (np.arange(grid_size, dtype=np.float32)
              / (grid_size / base_size) / interpolation_scale)
    grid_w = (np.arange(grid_size, dtype=np.float32)
              / (grid_size / base_size) / interpolation_scale)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first (diffusers order)
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


class PatchEmbed(nn.Module):
    """diffusers 0.24 PatchEmbed: conv patchify + fixed 2D sincos."""

    def __init__(self, height=224, width=224, patch_size=16, in_channels=3,
                 embed_dim=768, layer_norm=False, flatten=True, bias=True,
                 interpolation_scale=1):
        super().__init__()
        num_patches = (height // patch_size) * (width // patch_size)
        self.flatten = flatten
        self.layer_norm = layer_norm
        self.patch_size = patch_size
        self.proj = nn.Conv2d(in_channels, embed_dim,
                              kernel_size=(patch_size, patch_size),
                              stride=patch_size, bias=bias)
        if layer_norm:
            self.norm = nn.LayerNorm(embed_dim, elementwise_affine=False,
                                     eps=1e-6)
        else:
            self.norm = None
        self.base_size = height // patch_size
        pos_embed = get_2d_sincos_pos_embed(
            embed_dim, int(num_patches**0.5), base_size=self.base_size,
            interpolation_scale=interpolation_scale)
        self.register_buffer("pos_embed",
                             torch.from_numpy(pos_embed).float().unsqueeze(0),
                             persistent=False)

    def forward(self, latent):
        latent = self.proj(latent)
        if self.flatten:
            latent = latent.flatten(2).transpose(1, 2)  # BCHW -> BND
        if self.layer_norm:
            latent = self.norm(latent)
        return (latent + self.pos_embed).to(latent.dtype)


class Timesteps(nn.Module):
    def __init__(self, num_channels, flip_sin_to_cos, downscale_freq_shift):
        super().__init__()
        self.num_channels = num_channels
        self.flip_sin_to_cos = flip_sin_to_cos
        self.downscale_freq_shift = downscale_freq_shift

    def forward(self, timesteps):
        half_dim = self.num_channels // 2
        exponent = -math.log(10000) * torch.arange(
            half_dim, dtype=torch.float32, device=timesteps.device)
        exponent = exponent / (half_dim - self.downscale_freq_shift)
        emb = timesteps[:, None].float() * torch.exp(exponent)[None, :]
        emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
        if self.flip_sin_to_cos:
            emb = torch.cat([emb[:, half_dim:], emb[:, :half_dim]], dim=-1)
        return emb


class TimestepEmbedding(nn.Module):
    def __init__(self, in_channels, time_embed_dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, time_embed_dim)
        self.act = nn.SiLU()
        self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

    def forward(self, sample):
        return self.linear_2(self.act(self.linear_1(sample)))


class CombinedTimestepSizeEmbeddings(nn.Module):
    def __init__(self, embedding_dim, size_emb_dim,
                 use_additional_conditions=False):
        super().__init__()
        assert not use_additional_conditions, "1024px PixArt conds unused"
        self.time_proj = Timesteps(num_channels=256, flip_sin_to_cos=True,
                                   downscale_freq_shift=0)
        self.timestep_embedder = TimestepEmbedding(in_channels=256,
                                                   time_embed_dim=embedding_dim)

    def forward(self, timestep, resolution=None, aspect_ratio=None,
                batch_size=None, hidden_dtype=None):
        timesteps_proj = self.time_proj(timestep)
        return self.timestep_embedder(timesteps_proj.to(dtype=hidden_dtype))


class CaptionProjection(nn.Module):
    def __init__(self, in_features, hidden_size, num_tokens=120):
        super().__init__()
        self.linear_1 = nn.Linear(in_features, hidden_size)
        self.act_1 = nn.GELU(approximate="tanh")
        self.linear_2 = nn.Linear(hidden_size, hidden_size)
        self.register_buffer(
            "y_embedding",
            torch.randn(num_tokens, in_features) / in_features**0.5)

    def forward(self, caption, force_drop_ids=None):
        return self.linear_2(self.act_1(self.linear_1(caption)))


class ImagePositionalEmbeddings(nn.Module):  # vectorized branch only
    def __init__(self, *a, **k):
        super().__init__()
        raise NotImplementedError("vectorized input branch not stubbed")


class SinusoidalPositionalEmbedding(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()
        raise NotImplementedError


# ------------------------------------------------------------ normalization
class AdaLayerNorm(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()
        raise NotImplementedError("only ada_norm_single is stubbed")


class AdaLayerNormZero(AdaLayerNorm):
    pass


# ---------------------------------------------------------------- attention
class Attention(nn.Module):
    """diffusers 0.24 Attention with the AttnProcessor2_0 (sdpa) path."""

    def __init__(self, query_dim, cross_attention_dim=None, heads=8,
                 dim_head=64, dropout=0.0, bias=False,
                 upcast_attention=False, out_bias=True, **kw):
        super().__init__()
        self.inner_dim = dim_head * heads
        self.heads = heads
        self.upcast_attention = upcast_attention
        cross_attention_dim = (cross_attention_dim
                               if cross_attention_dim is not None else query_dim)
        self.to_q = nn.Linear(query_dim, self.inner_dim, bias=bias)
        self.to_k = nn.Linear(cross_attention_dim, self.inner_dim, bias=bias)
        self.to_v = nn.Linear(cross_attention_dim, self.inner_dim, bias=bias)
        self.to_out = nn.ModuleList(
            [nn.Linear(self.inner_dim, query_dim, bias=out_bias),
             nn.Dropout(dropout)])

    def prepare_attention_mask(self, attention_mask, target_length,
                               batch_size):
        if attention_mask is None:
            return None
        current_length = attention_mask.shape[-1]
        if current_length != target_length:
            attention_mask = F.pad(attention_mask,
                                   (0, target_length - current_length),
                                   value=0.0)
        if attention_mask.shape[0] < batch_size * self.heads:
            attention_mask = attention_mask.repeat_interleave(self.heads,
                                                              dim=0)
        return attention_mask

    def forward(self, hidden_states, encoder_hidden_states=None,
                attention_mask=None, **cross_attention_kwargs):
        batch_size, sequence_length, _ = (
            hidden_states.shape if encoder_hidden_states is None
            else encoder_hidden_states.shape)
        attention_mask = self.prepare_attention_mask(
            attention_mask, sequence_length, batch_size)
        if attention_mask is not None:
            attention_mask = attention_mask.view(
                hidden_states.shape[0], self.heads, -1,
                attention_mask.shape[-1])
        if encoder_hidden_states is None:
            encoder_hidden_states = hidden_states
        q = self.to_q(hidden_states)
        k = self.to_k(encoder_hidden_states)
        v = self.to_v(encoder_hidden_states)
        head_dim = self.inner_dim // self.heads

        def split(x):
            return x.view(x.shape[0], -1, self.heads, head_dim).transpose(1, 2)

        q, k, v = split(q), split(k), split(v)
        if self.upcast_attention:
            q, k = q.float(), k.float()
        out = F.scaled_dot_product_attention(
            q, k, v, attn_mask=attention_mask, dropout_p=0.0, is_causal=False)
        out = out.transpose(1, 2).reshape(q.shape[0], -1, self.inner_dim)
        out = out.to(v.dtype)
        return self.to_out[1](self.to_out[0](out))


class FeedForward(nn.Module):
    """diffusers 0.24 FeedForward (spatial blocks use this one)."""

    def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                 activation_fn="geglu", final_dropout=False):
        super().__init__()
        inner_dim = int(dim * mult)
        dim_out = dim_out if dim_out is not None else dim
        linear_cls = LoRACompatibleLinear if not USE_PEFT_BACKEND else nn.Linear
        if activation_fn == "gelu":
            act_fn = GELU(dim, inner_dim)
        elif activation_fn == "gelu-approximate":
            act_fn = GELU(dim, inner_dim, approximate="tanh")
        elif activation_fn == "geglu":
            act_fn = GEGLU(dim, inner_dim)
        elif activation_fn == "geglu-approximate":
            act_fn = ApproximateGELU(dim, inner_dim)
        self.net = nn.ModuleList([act_fn, nn.Dropout(dropout),
                                  linear_cls(inner_dim, dim_out)])
        if final_dropout:
            self.net.append(nn.Dropout(dropout))

    def forward(self, hidden_states, scale: float = 1.0):
        for module in self.net:
            if isinstance(module, (GEGLU, LoRACompatibleLinear)):
                hidden_states = module(hidden_states, scale)
            else:
                hidden_states = module(hidden_states)
        return hidden_states


class BasicTransformerBlock(nn.Module):
    """diffusers 0.24 BasicTransformerBlock — `ada_norm_single` (PixArt)
    path only: norm1+mod -> self-attn -> gated; cross-attn with NO pre-norm;
    norm2+mod -> FF -> gated."""

    def __init__(self, dim, num_attention_heads, attention_head_dim,
                 dropout=0.0, cross_attention_dim=None, activation_fn="geglu",
                 num_embeds_ada_norm=None, attention_bias=False,
                 only_cross_attention=False, double_self_attention=False,
                 upcast_attention=False, norm_elementwise_affine=True,
                 norm_type="layer_norm", norm_eps=1e-5, final_dropout=False,
                 attention_type="default", positional_embeddings=None,
                 num_positional_embeddings=None):
        super().__init__()
        assert norm_type == "ada_norm_single", (
            "stub supports the shipped PixArt ada_norm_single config only")
        assert not only_cross_attention and not double_self_attention
        self.pos_embed = None
        self.norm1 = nn.LayerNorm(dim, elementwise_affine=norm_elementwise_affine,
                                  eps=norm_eps)
        self.attn1 = Attention(query_dim=dim, heads=num_attention_heads,
                               dim_head=attention_head_dim, dropout=dropout,
                               bias=attention_bias, cross_attention_dim=None,
                               upcast_attention=upcast_attention)
        if cross_attention_dim is not None:
            self.norm2 = nn.LayerNorm(dim, norm_eps, norm_elementwise_affine)
            self.attn2 = Attention(query_dim=dim,
                                   cross_attention_dim=cross_attention_dim,
                                   heads=num_attention_heads,
                                   dim_head=attention_head_dim,
                                   dropout=dropout, bias=attention_bias,
                                   upcast_attention=upcast_attention)
        else:
            self.norm2 = None
            self.attn2 = None
        # (0.24: norm3 skipped entirely under ada_norm_single)
        self.ff = FeedForward(dim, dropout=dropout,
                              activation_fn=activation_fn,
                              final_dropout=final_dropout)
        self.scale_shift_table = nn.Parameter(torch.randn(6, dim) / dim**0.5)

    def forward(self, hidden_states, attention_mask=None,
                encoder_hidden_states=None, encoder_attention_mask=None,
                timestep=None, cross_attention_kwargs=None,
                class_labels=None):
        batch_size = hidden_states.shape[0]
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
            self.scale_shift_table[None]
            + timestep.reshape(batch_size, 6, -1)).chunk(6, dim=1)
        norm_hidden_states = self.norm1(hidden_states)
        norm_hidden_states = norm_hidden_states * (1 + scale_msa) + shift_msa
        norm_hidden_states = norm_hidden_states.squeeze(1)
        attn_output = self.attn1(norm_hidden_states,
                                 encoder_hidden_states=None,
                                 attention_mask=attention_mask)
        attn_output = gate_msa * attn_output
        hidden_states = attn_output + hidden_states
        if self.attn2 is not None:
            # PixArt: norm2 is NOT applied before cross-attention
            attn_output = self.attn2(hidden_states,
                                     encoder_hidden_states=encoder_hidden_states,
                                     attention_mask=encoder_attention_mask)
            hidden_states = attn_output + hidden_states
        norm_hidden_states = self.norm2(hidden_states)
        norm_hidden_states = norm_hidden_states * (1 + scale_mlp) + shift_mlp
        ff_output = self.ff(norm_hidden_states)
        ff_output = gate_mlp * ff_output
        return ff_output + hidden_states


# -------------------------------------------------------------- config/model
def register_to_config(init):
    @functools.wraps(init)
    def inner_init(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
        object.__setattr__(self, "_internal_config", types.SimpleNamespace(**cfg))
        init(self, *args, **kwargs)

    return inner_init


class ConfigMixin:
    @property
    def config(self):
        return self._internal_config

    @classmethod
    def from_config(cls, config, **kwargs):
        sig = inspect.signature(cls.__init__)
        valid = {k: v for k, v in dict(config).items() if k in sig.parameters}
        valid.update(kwargs)
        return cls(**valid)


class ModelMixin(nn.Module):
    pass


class BaseOutput:
    def __init__(self, *a, **k):
        for key, v in k.items():
            setattr(self, key, v)


def deprecate(*args, **kwargs):
    pass


def maybe_allow_in_graph(cls):
    return cls


class _Placeholder:
    def __init__(self, *a, **k):
        raise NotImplementedError


def install_diffusers_stub() -> None:
    if "diffusers" in sys.modules:
        return
    d = _mk("diffusers")
    models = _mk("diffusers.models")
    models.Transformer2DModel = _Placeholder
    models.AutoencoderKL = _Placeholder
    utils = _mk("diffusers.utils")
    utils.USE_PEFT_BACKEND = USE_PEFT_BACKEND
    utils.BaseOutput = BaseOutput
    utils.deprecate = deprecate
    emb = _mk("diffusers.models.embeddings")
    emb.get_1d_sincos_pos_embed_from_grid = get_1d_sincos_pos_embed_from_grid
    emb.get_2d_sincos_pos_embed = get_2d_sincos_pos_embed
    emb.ImagePositionalEmbeddings = ImagePositionalEmbeddings
    emb.CaptionProjection = CaptionProjection
    emb.PatchEmbed = PatchEmbed
    emb.CombinedTimestepSizeEmbeddings = CombinedTimestepSizeEmbeddings
    emb.SinusoidalPositionalEmbedding = SinusoidalPositionalEmbedding
    cfgu = _mk("diffusers.configuration_utils")
    cfgu.ConfigMixin = ConfigMixin
    cfgu.register_to_config = register_to_config
    mu = _mk("diffusers.models.modeling_utils")
    mu.ModelMixin = ModelMixin
    att = _mk("diffusers.models.attention")
    att.BasicTransformerBlock = BasicTransformerBlock
    att.FeedForward = FeedForward
    lora = _mk("diffusers.models.lora")
    lora.LoRACompatibleConv = LoRACompatibleConv
    lora.LoRACompatibleLinear = LoRACompatibleLinear
    tu = _mk("diffusers.utils.torch_utils")
    tu.maybe_allow_in_graph = maybe_allow_in_graph
    norm = _mk("diffusers.models.normalization")
    norm.AdaLayerNorm = AdaLayerNorm
    norm.AdaLayerNormZero = AdaLayerNormZero
    ap = _mk("diffusers.models.attention_processor")
    ap.Attention = Attention
    act = _mk("diffusers.models.activations")
    act.GEGLU = GEGLU
    act.GELU = GELU
    act.ApproximateGELU = ApproximateGELU
    d.models = models
    d.utils = utils
    d.configuration_utils = cfgu

"""Typed configuration for the OmniTokenizer TPU framework.

Field names mirror the reference argparse flags (see
/root/reference/OmniTokenizer/omnitokenizer.py:694-768 and base.py:245-269) so
that the `hyper_parameters.args` namespace embedded in released Lightning
checkpoints maps 1:1 onto this dataclass (utils/checkpoint.py does the
conversion).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class TokenizerConfig:
    """Architecture + loss configuration of the OmniTokenizer VQGAN/VAE.

    Defaults correspond to the released stage-2/3 recipe
    (/root/reference/scripts/recons/train.sh): patch 8, temporal patch 4,
    enc 'ttww', dec 'tttt', window 8, RoPE spatial positions, 8192x8 codebook.
    """

    # core dims
    embedding_dim: int = 512
    n_codes: int = 8192
    codebook_dim: int = 8
    resolution: int = 256
    sequence_length: int = 17
    image_channels: int = 3

    # patchification
    patch_embed: str = "linear"  # 'linear' | 'cnn'
    patch_size: int = 8
    temporal_patch_size: int = 4
    defer_temporal_pool: bool = False
    defer_spatial_pool: bool = False

    # transformer stack
    enc_block: str = "ttww"
    dec_block: str = "tttt"
    spatial_depth: int = 4
    temporal_depth: int = 4
    twod_window_size: int = 8
    spatial_pos: str = "rope"  # 'rel' | 'rope'
    causal_in_temporal_transformer: bool = True
    causal_in_peg: bool = True
    dim_head: int = 64
    heads: int = 8
    ff_mult: float = 4.0
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    norm_type: str = "batch"  # 'group' | 'batch' (cnn patch embed / discriminators)
    gen_upscale: Optional[int] = None
    initialize_vit: bool = False

    # quantizer
    use_vae: bool = False
    l2_code: bool = True
    use_external_codebook: bool = False
    no_random_restart: bool = True
    restart_thres: float = 1.0
    commitment_weight: float = 1.0
    kl_weight: float = 1e-6
    # quantize (pre_vq projection + codebook distances) in f32 even on the
    # bf16 serving path — index-exactness vs the oracle graph at ~0.3 ms/call
    # (A/B + agreement numbers in PERF.md round 3)
    fp32_quant: bool = True

    # attention semantics: the reference computes spatial rel-bias and AliBi
    # but silently drops them on its SDPA fast path
    # (/root/reference/OmniTokenizer/modules/attention.py:439-451).  All
    # released checkpoints were evaluated with torch>=2.1, i.e. with the SDPA
    # behaviour.  'sdpa' reproduces that; 'einsum' reproduces the slow path
    # (rel bias + AliBi actually applied).
    attn_bias_mode: str = "sdpa"

    # compute dtype for the transformer stack (params always f32)
    dtype: Any = jnp.float32

    # bf16 serving fast path: fold the patchify LayerNorm+Linear into one
    # strided conv and un-patchify via weight-side column permutation
    # (ops/patch_fold.py); numerics differ from the reference path only at
    # bf16 rounding level.  f32 always uses the exact reference path.
    fast_patchify: bool = True

    # bf16 serving fast path: run the temporal transformer stack token-flat
    # 2D ((b h w t), d) instead of ((b h w), t, d) — kills the 5-sublane
    # relayout copies and makes PEG's quirk reshape a bitcast.  'auto' = on
    # for bf16 TPU serving with t <= 8 (the benched graph); 'on'/'off' force
    # it so CPU parity tests can exercise the exact serving composition.
    flat_temporal: str = "auto"  # 'auto' | 'on' | 'off'

    def use_flat_temporal(self, t: int) -> bool:
        if self.flat_temporal == "on":
            return True
        if self.flat_temporal == "off":
            return False
        import jax as _jax
        return (self.dtype == jnp.bfloat16 and t <= 8
                and _jax.default_backend() == "tpu")

    @property
    def latent_t(self) -> int:
        """Latent frames for a full-length clip: 1 + (T-1)/pt."""
        return 1 + (self.sequence_length - 1) // self.temporal_patch_size

    @property
    def latent_hw(self) -> int:
        return self.resolution // self.patch_size

    def replace(self, **kw) -> "TokenizerConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class LossConfig:
    """GAN / reconstruction loss weights (reference train.sh stage 2)."""

    recon_loss_type: str = "l1"  # 'l1' | 'l2'
    l1_weight: float = 4.0
    perceptual_weight: float = 4.0
    video_perceptual_weight: float = 0.0
    image_gan_weight: float = 0.0
    video_gan_weight: float = 0.01
    gan_feat_weight: float = 4.0
    logitslaplace_weight: float = 0.0
    disc_loss_type: str = "hinge"  # 'hinge' | 'vanilla'
    disc_channels: int = 64
    disc_layers: int = 3
    discriminator_iter_start: int = 0
    sigmoid_in_disc: bool = False
    activation_in_disc: str = "leaky_relu"
    apply_blur: bool = False
    apply_noise: bool = True
    apply_diffaug: bool = False
    apply_allframes: bool = False


@dataclass(frozen=True)
class TrainConfig:
    """Optimization schedule (reference omnitokenizer.py:620-663)."""

    lr: float = 5e-5
    lr_min: float = 5e-5
    warmup_steps: int = 50_000
    warmup_lr_init: float = 0.0
    max_steps: int = 500_000
    dis_lr_multiplier: float = 0.1
    dis_minlr_multiplier: bool = True
    dis_warmup_steps: int = 500_000
    grad_accumulates: int = 1
    grad_clip_val: Optional[float] = 1.0
    grad_clip_val_disc: Optional[float] = 1.0
    disloss_check_thres: Optional[float] = 0.001
    perloss_check_thres: Optional[float] = None
    recloss_check_thres: Optional[float] = None
    resolution_scale: Optional[Sequence[float]] = None
    sample_ratio: Optional[Sequence[float]] = None
    force_alternation: bool = False
    batch_size: int = 8
    seed: int = 1234
    # freeze every {enc,dec}_{spatial,temporal}_transformer parameter —
    # the finetune-stage flag (vqgan_train.py:153-157)
    freeze_trans: bool = False
    # 2 (default): exact reference dynamics — the D pass re-runs the
    # generator forward, advancing the codebook EMA a second time per step
    # (omnitokenizer.py:548,582); ABLATION.md's 500-step A/B shows this
    # cadence holds ~38 live codes vs ~24, so it is the default so that raw
    # reference flags reproduce reference codebook dynamics.  1: the fused
    # one-forward step, ~25% cheaper, for throughput-bound runs.
    ema_advances_per_step: int = 2


@dataclass(frozen=True)
class GPTConfig:
    """LM synthesis backbone (reference modules/gpt.py:54-71,170-194;
    canonical values from scripts/lm_train/*.sh)."""

    vocab_size: int = 9193  # 8192 codes + 1000 classes + 1 sos
    block_size: int = 1025
    n_layer: int = 24
    n_head: int = 16
    n_embd: int = 1536
    embd_pdrop: float = 0.0
    resid_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    n_unmasked: int = 0
    vtokens_pos: bool = False
    dtype: Any = jnp.float32
    # serving: read int8 weights from the "quant" variables collection
    # (ops/int8.py) instead of the f32/bf16 Dense params — halves decode
    # weight bandwidth and uses the MXU's native int8 rate
    int8_decode: bool = False
    # training forward (cache=None): route causal attention through the
    # streaming flash kernel on TPU — the materialized (B,H,T,T) f32 score
    # tensors (512 MB each at B=8/T=1024) OOM a 16 GB chip at the flagship
    # batch; flash keeps scores in VMEM fwd AND bwd (custom vjp)
    flash_attention: bool = True


@dataclass(frozen=True)
class Net2NetConfig:
    """Net2NetTransformer wiring (reference lm_transformer.py:19-79)."""

    gpt: GPTConfig = field(default_factory=GPTConfig)
    class_cond_dim: int = 1000
    unconditional: bool = False
    starts_with_sos: bool = True
    class_first: bool = False
    p_drop_cond: Optional[float] = None
    pkeep: float = 1.0
    sos_token: int = 0
    first_stage_vocab_size: int = 8192
    cond_stage_key: str = "label"  # 'label' | 'text' | 'stft'
    sample_every_n_latent_frames: int = 0


# Canonical presets mirroring the released checkpoints' embedded hparams.
def imagenet_k600_config(use_vae: bool = False) -> TokenizerConfig:
    return TokenizerConfig(use_vae=use_vae)


def imagenet_only_config() -> TokenizerConfig:
    # stage-1: temporal patch 2, 'rel' spatial positions
    return TokenizerConfig(temporal_patch_size=2, spatial_pos="rel")

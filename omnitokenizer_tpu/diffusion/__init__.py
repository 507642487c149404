"""Latent-diffusion synthesis stack (the TPU-native counterpart of
/root/reference/Diffusion — DiT + Latte over OmniTokenizer VAE latents).

Layout convention: everything in this package is channels-LAST
((B, H, W, C) images / (B, F, H, W, C) videos) — the TPU-friendly layout.
The `models.diffusion_adapter.DiffusionVAEAdapter` seam converts from the
torch-layout public tokenizer API.
"""

from .gaussian import (
    GaussianDiffusion,
    LossType,
    MeanType,
    VarType,
    create_diffusion,
    get_named_beta_schedule,
    space_timesteps,
)
from .timestep_sampler import LossSecondMomentResampler, UniformSampler, create_named_schedule_sampler

__all__ = [
    "GaussianDiffusion",
    "LossType",
    "MeanType",
    "VarType",
    "create_diffusion",
    "get_named_beta_schedule",
    "space_timesteps",
    "UniformSampler",
    "LossSecondMomentResampler",
    "create_named_schedule_sampler",
]

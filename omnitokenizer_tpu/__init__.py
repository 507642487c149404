"""omnitokenizer_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of
FoundationVision/OmniTokenizer: joint image-video VQGAN/VAE tokenizer, LM
synthesis stack, and evaluation tooling.

Public surface mirrors /root/reference/OmniTokenizer/__init__.py:1-8.
"""

from .config import (
    GPTConfig,
    LossConfig,
    Net2NetConfig,
    TokenizerConfig,
    TrainConfig,
    imagenet_k600_config,
    imagenet_only_config,
)
from .models.wrapper import OmniTokenizerVQGAN

__all__ = [
    "GPTConfig",
    "LossConfig",
    "Net2NetConfig",
    "TokenizerConfig",
    "TrainConfig",
    "OmniTokenizerVQGAN",
    "imagenet_k600_config",
    "imagenet_only_config",
]

__version__ = "0.1.0"

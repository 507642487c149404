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

# The reference's exact export name (OmniTokenizer/__init__.py:8)
OmniTokenizer_VQGAN = OmniTokenizerVQGAN

# Lazy reference-parity exports (OmniTokenizer/__init__.py:1-8): data and LM
# classes pull in PIL/imageio/flax-model deps, so resolve them on first use.
_LAZY = {
    "VideoData": ("omnitokenizer_tpu.data.loader", "VideoData"),
    "ImageDataset": ("omnitokenizer_tpu.data.image", "ImageDataset"),
    "VideoDataset": ("omnitokenizer_tpu.data.video", "VideoDataset"),
    # decord-equivalent video dataset under the reference's name
    "DecordVideoDataset": ("omnitokenizer_tpu.data.video", "VideoDataset"),
    "Net2NetTransformer": ("omnitokenizer_tpu.models.net2net",
                           "Net2NetTransformer"),
    # legacy TATS-style CNN VQGAN, exported as `VQGAN` like the reference
    "VQGAN": ("omnitokenizer_tpu.models.cnn_vqgan", "CnnVQGAN"),
    "load_vqgan": ("omnitokenizer_tpu.download", "load_vqgan"),
    "load_transformer": ("omnitokenizer_tpu.download", "load_transformer"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'omnitokenizer_tpu' has no attribute {name!r}")


__all__ = [
    "GPTConfig",
    "LossConfig",
    "Net2NetConfig",
    "TokenizerConfig",
    "TrainConfig",
    "OmniTokenizerVQGAN",
    "OmniTokenizer_VQGAN",
    "imagenet_k600_config",
    "imagenet_only_config",
    *sorted(_LAZY),
]

__version__ = "0.1.0"

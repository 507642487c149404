"""Model registry + loader helpers — analogue of
/root/reference/OmniTokenizer/download.py (load_vqgan :48-60, load_transformer,
download :15-45).

This environment has no egress, so `download()` only resolves local paths /
cache hits; the gdrive ids are kept for reference so users with connectivity
can fetch the released checkpoints themselves.
"""

from __future__ import annotations

import os
from typing import Optional

# released checkpoint registry (README.md:42-56 model zoo)
_MODEL_ZOO = {
    "imagenet_only": "imagenet_only.ckpt",
    "celebahq": "celebahq.ckpt",
    "ffhq": "ffhq.ckpt",
    "imagenet_ucf": "imagenet_ucf.ckpt",
    "imagenet_k600": "imagenet_k600.ckpt",
    "imagenet_mit": "imagenet_mit.ckpt",
    "imagenet_sthv2": "imagenet_sthv2.ckpt",
    "imagenet_ucf_vae": "imagenet_ucf_vae.ckpt",
    "imagenet_k600_vae": "imagenet_k600_vae.ckpt",
    "imagenet_class_lm": "imagenet_class_lm.ckpt",
    "ucf_class_lm": "ucf_class_lm.ckpt",
    "k600_uncond_lm": "k600_uncond_lm.ckpt",
}

DEFAULT_CACHE = os.environ.get(
    "OMNITOKENIZER_CACHE", os.path.expanduser("~/.cache/omnitokenizer_tpu"))


def resolve_checkpoint(name_or_path: str, cache_dir: str = DEFAULT_CACHE) -> str:
    """Return a local checkpoint path for a zoo name or passthrough path."""
    if os.path.exists(name_or_path):
        return name_or_path
    fname = _MODEL_ZOO.get(name_or_path)
    if fname is None:
        raise FileNotFoundError(
            f"'{name_or_path}' is neither a file nor a known model name "
            f"({sorted(_MODEL_ZOO)})")
    for root in (cache_dir, "./ckpts_pub", "."):
        cand = os.path.join(root, fname)
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(
        f"checkpoint '{fname}' not found in {cache_dir}, ./ckpts_pub or cwd; "
        "download it from the OmniTokenizer release and place it there "
        "(this environment has no network egress)")


def load_vqgan(name_or_path: str, cfg=None):
    """Zoo-name or path -> OmniTokenizerVQGAN (torch ckpts convert on load)."""
    from .models.wrapper import OmniTokenizerVQGAN

    return OmniTokenizerVQGAN.load_from_checkpoint(
        resolve_checkpoint(name_or_path), cfg=cfg)


def load_transformer(gpt_name_or_path: str, vqvae_name_or_path: str,
                     net2net_cfg=None):
    """Zoo-name or path pair -> Net2NetTransformer with converted GPT weights."""
    from .config import GPTConfig, Net2NetConfig
    from .models.net2net import Net2NetTransformer
    from .utils.checkpoint import load_torch_state_dict
    from .utils.gpt_checkpoint import convert_gpt_state

    tok = load_vqgan(vqvae_name_or_path)
    path = resolve_checkpoint(gpt_name_or_path)

    sd, args = load_torch_state_dict(path)
    if net2net_cfg is None:
        if args is None:
            raise ValueError("LM ckpt has no embedded hparams; pass net2net_cfg")
        vocab = tok.cfg.n_codes
        cond = 0 if getattr(args, "unconditional", False) else getattr(args, "class_cond_dim", 1000)
        sos = getattr(args, "starts_with_sos", False)
        gpt_cfg = GPTConfig(
            vocab_size=vocab + cond + (1 if sos else 0),
            block_size=getattr(args, "block_size", 1025),
            n_layer=getattr(args, "n_layer", 24),
            n_head=getattr(args, "n_head", 16),
            n_embd=getattr(args, "n_embd", 1536))
        net2net_cfg = Net2NetConfig(
            gpt=gpt_cfg, class_cond_dim=cond if cond else 1000,
            unconditional=getattr(args, "unconditional", False),
            starts_with_sos=sos,
            class_first=getattr(args, "class_first", False),
            first_stage_vocab_size=tok.cfg.n_codes)

    params = convert_gpt_state(sd, net2net_cfg.gpt)
    return Net2NetTransformer(net2net_cfg, tok, gpt_params=params)

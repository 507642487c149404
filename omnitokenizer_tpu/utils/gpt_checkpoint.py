"""torch GPT (minGPT / Net2Net Lightning) checkpoint -> flax GPT params.

Torch naming (reference modules/gpt.py:170-194, prefixed 'transformer.' in
Net2Net checkpoints): tok_emb.weight, pos_emb,
blocks.{i}.{ln1,ln2}.{weight,bias},
blocks.{i}.attn.{key,query,value,proj}.{weight,bias},
blocks.{i}.mlp.{0,2}.{weight,bias}, ln_f.{weight,bias}, head.weight.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

from ..config import GPTConfig


def convert_gpt_state(sd: Dict[str, np.ndarray], cfg: GPTConfig) -> Dict[str, Any]:
    # strip the Net2Net prefix if present
    if any(k.startswith("transformer.") for k in sd):
        sd = {k[len("transformer."):]: v for k, v in sd.items()
              if k.startswith("transformer.")}

    def t(k):
        return np.ascontiguousarray(np.asarray(sd[k], np.float32).T)

    def a(k):
        return np.asarray(sd[k], np.float32)

    params: Dict[str, Any] = {
        "tok_emb": {"embedding": a("tok_emb.weight")},
        "pos_emb": a("pos_emb"),
        "ln_f": {"scale": a("ln_f.weight"), "bias": a("ln_f.bias")},
        "head": {"kernel": t("head.weight")},
    }
    for i in range(cfg.n_layer):
        b = f"blocks.{i}"
        params[f"block{i}"] = {
            "ln1": {"scale": a(f"{b}.ln1.weight"), "bias": a(f"{b}.ln1.bias")},
            "ln2": {"scale": a(f"{b}.ln2.weight"), "bias": a(f"{b}.ln2.bias")},
            "query": {"kernel": t(f"{b}.attn.query.weight"),
                      "bias": a(f"{b}.attn.query.bias")},
            "key": {"kernel": t(f"{b}.attn.key.weight"),
                    "bias": a(f"{b}.attn.key.bias")},
            "value": {"kernel": t(f"{b}.attn.value.weight"),
                      "bias": a(f"{b}.attn.value.bias")},
            "proj": {"kernel": t(f"{b}.attn.proj.weight"),
                     "bias": a(f"{b}.attn.proj.bias")},
            "fc": {"kernel": t(f"{b}.mlp.0.weight"), "bias": a(f"{b}.mlp.0.bias")},
            "proj_out": {"kernel": t(f"{b}.mlp.2.weight"),
                         "bias": a(f"{b}.mlp.2.bias")},
        }
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.asarray, params)


def load_gpt_torch_checkpoint(path: str, cfg: GPTConfig) -> Dict[str, Any]:
    from .checkpoint import load_torch_state_dict

    sd, _ = load_torch_state_dict(path)
    return convert_gpt_state(sd, cfg)


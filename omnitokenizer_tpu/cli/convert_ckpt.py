"""Checkpoint conversion CLI: torch Lightning .ckpt -> native .msgpack.

    python -m omnitokenizer_tpu.cli.convert_ckpt \
        --src imagenet_k600.ckpt --dst imagenet_k600.msgpack [--kind tokenizer]

Tokenizer checkpoints self-describe via the embedded hparams; GPT ones need
the LM flags (or rely on the embedded namespace too).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser("convert_ckpt")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--kind", default="tokenizer", choices=["tokenizer", "gpt"])
    args = p.parse_args(argv)

    from . import args as A

    A.apply_platform_env()

    if args.kind == "tokenizer":
        from ..utils.checkpoint import load_tokenizer_checkpoint, save_tokenizer_checkpoint

        cfg, variables = load_tokenizer_checkpoint(args.src)
        save_tokenizer_checkpoint(args.dst, variables)
        meta = {k: v for k, v in cfg.__dict__.items() if not k.startswith("_")
                and isinstance(v, (int, float, str, bool, type(None)))}
        with open(args.dst + ".json", "w") as f:
            json.dump(meta, f, indent=2)
        print(f"converted tokenizer -> {args.dst} (config sidecar {args.dst}.json)")
    else:
        from flax import serialization

        from ..config import GPTConfig
        from ..utils.checkpoint import load_torch_state_dict
        from ..utils.gpt_checkpoint import convert_gpt_state

        sd, ns = load_torch_state_dict(args.src)
        if ns is None:
            raise SystemExit("GPT ckpt has no embedded hparams; convert via python API")
        vocab = max(v.shape[0] for k, v in sd.items() if k.endswith("tok_emb.weight"))
        cfg = GPTConfig(vocab_size=vocab,
                        block_size=getattr(ns, "block_size", 1025),
                        n_layer=getattr(ns, "n_layer", 24),
                        n_head=getattr(ns, "n_head", 16),
                        n_embd=getattr(ns, "n_embd", 1536))
        params = convert_gpt_state(sd, cfg)
        with open(args.dst, "wb") as f:
            f.write(serialization.to_bytes((params, None, 0)))
        print(f"converted gpt -> {args.dst}")


if __name__ == "__main__":
    main()

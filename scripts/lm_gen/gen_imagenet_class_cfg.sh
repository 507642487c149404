#!/usr/bin/env bash
# Class-conditional CFG image generation (reference scripts/lm_gen):
# top_k 2048, cfg 1.5; classes shard across processes automatically.
# --int8 enables the W8A8 decode path; --decode_bucket bounds the
# per-step attention sweep to the written prefix.
python -m omnitokenizer_tpu.cli.transformer_eval --inference_type class \
  --gpt_ckpt {GPT_CKPT} --vqvae {VQVAE_CKPT} \
  --save ./gen_inet_cfg1.5 --n_sample 50000 --class_first --cfg_ratio 1.5 \
  --top_k 2048 --top_p 1.0 --starts_with_sos --sequence_length 1 \
  --block_size 1025 --n_layer 24 --n_head 16 --n_embd 1536 \
  --decode_bucket 256 --int8 --bf16

#!/usr/bin/env bash
# Frame prediction: encode a 2-latent-frame prefix from val clips,
# AR-continue 3x32x32 tokens, decode to pixels (npz outputs).
python -m omnitokenizer_tpu.cli.transformer_eval --inference_type frame_prediction \
  --gpt_ckpt {GPT_CKPT} --vqvae {VQVAE_CKPT} \
  --data_path {DATA_DIR} --val_datalist {DATALIST} \
  --save ./k600_fp --n_sample 2048 --top_k 2048 --top_p 0.9 --unconditional \
  --block_size 5120 --n_layer 24 --n_head 16 --n_embd 1536 \
  --resolution 256 --sequence_length 17 --decode_bucket 512 --int8 --bf16

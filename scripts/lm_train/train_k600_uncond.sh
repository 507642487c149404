#!/usr/bin/env bash
# Unconditional video LM (K600): block 5120 = 5x32x32 latent tokens.
python -m omnitokenizer_tpu.cli.transformer_train \
  --vqvae {VQVAE_CKPT} --default_root_dir {CKPT_DIR} \
  --data_path {DATA_DIR} --train_datalist {DATALIST} --val_datalist {DATALIST} \
  --batch_size 8 --num_workers 32 --unconditional \
  --lr 1e-3 --lr_min 1e-3 --warmup_steps 1 \
  --block_size 5120 --n_layer 24 --n_head 16 --n_embd 1536 \
  --resolution 256 --sequence_length 17 --max_steps 4000000 --bf16

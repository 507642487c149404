#!/usr/bin/env bash
# Class-conditional image LM over frozen-tokenizer codes — canonical
# hyperparameters from /root/reference/scripts/lm_train (24L/16H/1536,
# block 1025 = 32x32 tokens + sos/class).  Swap {VQVAE_CKPT}/{DATA_DIR}/
# {DATALIST}/{CKPT_DIR}.
python -m omnitokenizer_tpu.cli.transformer_train \
  --vqvae {VQVAE_CKPT} --default_root_dir {CKPT_DIR} \
  --data_path {DATA_DIR} --train_datalist {DATALIST} --val_datalist {DATALIST} \
  --batch_size 8 --num_workers 32 --cond_stage_key label \
  --lr 1e-3 --lr_min 1e-3 --warmup_steps 1 \
  --block_size 1025 --n_layer 24 --n_head 16 --n_embd 1536 \
  --resolution 256 --sequence_length 17 --max_steps 4000000 \
  --starts_with_sos --p_drop_cond 0.1 --class_first --bf16

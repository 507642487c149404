#!/usr/bin/env bash
# Class-conditional video LM (UCF101) — mirror of
# /root/reference/scripts/lm_train/train_ucf.sh: block 5121 =
# sos + class + 5x32x32 latent tokens, p_drop_cond 0.1 for CFG.
python -m omnitokenizer_tpu.cli.transformer_train \
  --vqvae ./ckpts_pub/imagenet_ucf.ckpt --default_root_dir {CKPT_DIR} \
  --data_path {DATA_DIR} --train_datalist ./annotations/ucf_train.txt \
  --val_datalist ./annotations/ucf_val.txt \
  --batch_size 4 --num_workers 32 --cond_stage_key label \
  --lr 1e-3 --lr_min 1e-3 --warmup_steps 1 \
  --block_size 5121 --n_layer 24 --n_head 16 --n_embd 1536 \
  --resolution 256 --sequence_length 17 --max_steps 4000000 \
  --starts_with_sos --p_drop_cond 0.1 --bf16

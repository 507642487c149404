#!/usr/bin/env bash
# Class-conditional CFG video generation (UCF101) — mirror of
# /root/reference/scripts/lm_gen/ucf_gen.sh: top_k 4096, top_p 0.9,
# cfg 0.5 without step scaling; 2048 samples sharded across processes.
python -m omnitokenizer_tpu.cli.transformer_eval --inference_type class \
  --gpt_ckpt ./ckpts_pub/ucf_class_lm.ckpt --vqvae ./ckpts_pub/imagenet_ucf.ckpt \
  --save ./ucf_classcond_eval4096_0.9_cfg0.5_noscale --n_sample 2048 \
  --cfg_ratio 0.5 --no_scale_cfg --top_k 4096 --top_p 0.9 \
  --starts_with_sos --batch_size 1 --sequence_length 17 \
  --block_size 5121 --n_layer 24 --n_head 16 --n_embd 1536 \
  --decode_bucket 1024 --bf16

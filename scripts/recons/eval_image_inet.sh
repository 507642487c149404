#!/usr/bin/env bash
# rFID eval: reconstruct ImageNet val 256^2 with the converted
# imagenet_k600.ckpt, dump input/recon trees + PSNR/SSIM/usage.
python -m omnitokenizer_tpu.cli.vqgan_eval \
  --inference_type image --patch_embed linear --patch_size 8 --temporal_patch_size 4 \
  --spatial_depth 4 --temporal_depth 4 --embedding_dim 512 --disc_layers 3 \
  --enc_block ttww --dec_block tttt --twod_window_size 8 \
  --causal_in_temporal_transformer --causal_in_peg --dim_head 64 --heads 8 \
  --apply_noise --apply_blur --spatial_pos rope \
  --n_codes 8192 --codebook_dim 8 --l2_code --no_random_restart \
  --vqgan_ckpt ./ckpts_pub/imagenet_k600.ckpt \
  --batch_size 16 --data_path {PATH_TO_DATA_DIR} \
  --train_datalist ./annotations/imagenet_train.txt \
  --val_datalist ./annotations/imagenet_val.txt \
  --loader_type joint --save ./inet \
  --resolution 256 --sequence_length 17 --norm_type batch

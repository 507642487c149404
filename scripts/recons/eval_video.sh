#!/usr/bin/env bash
# rFVD eval mirrors of /root/reference/scripts/recons/eval_video.sh:
# 17x256^2 center-sampled clips, batch 8, videogpt-I3D FVD + usage.
# Swap {DATA_DIR} and point --i3d_path at i3d_pretrained_400.pt (converted
# on the fly) to get the rFVD number; PSNR/usage print regardless.

COMMON="--inference_type video --patch_embed linear --patch_size 8 \
  --temporal_patch_size 4 --spatial_depth 4 --temporal_depth 4 \
  --embedding_dim 512 --disc_layers 3 --enc_block ttww --dec_block tttt \
  --twod_window_size 8 --causal_in_temporal_transformer --causal_in_peg \
  --dim_head 64 --heads 8 --apply_noise --apply_blur --spatial_pos rope \
  --n_codes 8192 --codebook_dim 8 --l2_code --no_random_restart \
  --batch_size 8 --loader_type joint --resolution 256 --sequence_length 17 \
  --norm_type batch --replacewithgt 0 --data_path {DATA_DIR}"

# VQ: imagenet_k600 (README rFVD 25.97) and imagenet_ucf (42.35)
python -m omnitokenizer_tpu.cli.vqgan_eval $COMMON \
  --vqgan_ckpt ./ckpts_pub/imagenet_k600.ckpt --save ./k600 \
  --train_datalist ./annotations/k600_train.txt --val_datalist ./annotations/k600_val.txt

python -m omnitokenizer_tpu.cli.vqgan_eval $COMMON \
  --vqgan_ckpt ./ckpts_pub/imagenet_ucf.ckpt --save ./ucf \
  --train_datalist ./annotations/ucf_train.txt --val_datalist ./annotations/ucf_val.txt

# VAE variants (README rFVD 13.02 / 23.44)
python -m omnitokenizer_tpu.cli.vqgan_eval $COMMON --use_vae \
  --vqgan_ckpt ./ckpts_pub/imagenet_k600_vae.ckpt --save ./k600_vae --save_videos \
  --train_datalist ./annotations/k600_train.txt --val_datalist ./annotations/k600_val.txt

python -m omnitokenizer_tpu.cli.vqgan_eval $COMMON --use_vae \
  --vqgan_ckpt ./ckpts_pub/imagenet_ucf_vae.ckpt --save ./ucf_vae --save_videos \
  --train_datalist ./annotations/ucf_train.txt --val_datalist ./annotations/ucf_val.txt

#!/usr/bin/env bash
# Face-dataset rFID mirrors of /root/reference/scripts/recons/eval_image_face.sh:
# CelebAHQ / FFHQ, image-only and joint (+UCF/+K600) checkpoints.
# The *_only ckpts use rel spatial pos + temporal_patch_size 2; joint use rope + 4.

BASE="--inference_type image --patch_embed linear --patch_size 8 \
  --spatial_depth 4 --temporal_depth 4 --embedding_dim 512 --disc_layers 3 \
  --enc_block ttww --dec_block tttt --twod_window_size 8 \
  --causal_in_temporal_transformer --causal_in_peg --dim_head 64 --heads 8 \
  --apply_noise --apply_blur --n_codes 8192 --codebook_dim 8 --l2_code \
  --no_random_restart --batch_size 16 --loader_type joint \
  --resolution 256 --sequence_length 17 --norm_type batch --data_path {DATA_DIR}"

CELEB="--train_datalist ./annotations/celebahq.txt --val_datalist ./annotations/celebahq.txt"
FFHQ="--train_datalist ./annotations/ffhq.txt --val_datalist ./annotations/ffhq.txt"

python -m omnitokenizer_tpu.cli.vqgan_eval $BASE $CELEB --temporal_patch_size 2 \
  --vqgan_ckpt ./ckpts_pub/celebahq.ckpt --save ./celebahq
python -m omnitokenizer_tpu.cli.vqgan_eval $BASE $FFHQ --temporal_patch_size 2 \
  --vqgan_ckpt ./ckpts_pub/ffhq.ckpt --save ./ffhq

python -m omnitokenizer_tpu.cli.vqgan_eval $BASE $CELEB --temporal_patch_size 4 --spatial_pos rope \
  --vqgan_ckpt ./ckpts_pub/celebahq_ucf.ckpt --save ./celebahq_ucf
python -m omnitokenizer_tpu.cli.vqgan_eval $BASE $FFHQ --temporal_patch_size 4 --spatial_pos rope \
  --vqgan_ckpt ./ckpts_pub/ffhq_ucf.ckpt --save ./ffhq_ucf

python -m omnitokenizer_tpu.cli.vqgan_eval $BASE $CELEB --temporal_patch_size 4 --spatial_pos rope \
  --vqgan_ckpt ./ckpts_pub/celebahq_k600.ckpt --save ./celebahq_k600
python -m omnitokenizer_tpu.cli.vqgan_eval $BASE $FFHQ --temporal_patch_size 4 --spatial_pos rope \
  --vqgan_ckpt ./ckpts_pub/ffhq_k600.ckpt --save ./ffhq_k600

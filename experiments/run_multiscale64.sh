#!/bin/bash
# 64px multiscale factor-out + sampling artifact (VERDICT round 2, item 6;
# BASELINE config 5: CelebA-5bit 64px, factor_out=True, fc_end=True —
# reference /root/reference/lib/implicit_flow.py:199-251 factor-out path and
# qualitative_samples.py). Synthetic-structured data (zero-egress image);
# a few hundred steps prove the multiscale forward AND the factored inverse
# sampling path at realistic depth, then qualitative_samples.py renders a
# grid from the checkpoint via the inverse solves.
set -x
SAVE=${SAVE:-experiments/celeba64_multiscale_r3}
timeout 3000 python train_img.py \
  --data celeba_5bit --nbits 5 --imagesize 64 --actnorm True \
  --nblocks 2-2-2 --idim 128 --act swish --kernels 3-1-3 --vnorms 2222 \
  --factor-out True --fc-end True --preact True --coeff 0.9 \
  --n-exact-terms 4 --batchsize 32 --val-batchsize 32 \
  --synthetic-data True --synthetic-structured True --synthetic-n 4096 \
  --nepochs 3 --max-iters-per-epoch 128 --vis-freq 128 --warmup-iters 100 \
  --seed 7 --save "$SAVE" || exit 1
timeout 900 python qualitative_samples.py \
  --ckpt "$SAVE/most_recent.pkl" --out "$SAVE/samples_t08.png" \
  --nsamples 16 --nrow 4 --temperature 0.8 || exit 1
echo OK

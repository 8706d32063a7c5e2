#!/bin/bash
# Round-4 64px multiscale LEARNING run (VERDICT round 3, weak #4): BASELINE
# config 5 (celeba_5bit at 64px, factor_out=True, 3 scales) on the structured
# INFINITE stream for ~2.6k steps — the r3 artifact trained 384 steps on a
# finite 4096-example set and sat at the 5-bit floor (eval bpd 5.067
# flat). Done = eval bpd visibly descending below the floor + a re-rendered
# temperature-sampling grid from the factored inverse.
set -x
SAVE=${SAVE:-experiments/celeba64_multiscale_r4}
timeout 10800 python train_img.py --data celeba_5bit --imagesize 64 \
  --nbits 5 --nblocks 2-2-2 --idim 128 --factor-out True --act swish \
  --kernels 3-1-3 --vnorms 2222 --fc-end False --preact True --coeff 0.9 \
  --n-exact-terms 2 --actnorm True --batchsize 32 --val-batchsize 32 \
  --synthetic-data True --synthetic-structured True --synthetic-n 4096 \
  --synthetic-infinite True --max-iters-per-epoch 128 --nepochs 20 \
  --warmup-iters 200 --seed 42 --vis-freq 100000 --save "$SAVE" || exit 1
timeout 1200 python qualitative_samples.py --ckpt "$SAVE/most_recent.pkl" \
  --out "$SAVE/samples_t08.png" --nsamples 16 --nrow 4 --temperature 0.8

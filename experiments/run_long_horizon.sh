#!/bin/bash
# Long-horizon training evidence on the CIFAR-10 recipe (VERDICT.md item 2).
#
# Runs the reference recipe (/root/reference/run_cifar10.sh:1-3) on structured
# synthetic data (real CIFAR-10 absent in this zero-egress image) for ~5.4k
# steps in two segments — the second resumes from the first's most_recent.pkl,
# proving the mid-run checkpoint/resume path — then distills the log into
# experiments/long_horizon_r2.json via experiments/long_horizon.py.
set -x
SAVE=experiments/cifar10_long_r2
COMMON="--data cifar10 --actnorm True --nblocks 2-2-2 --idim 512 --act swish \
  --kernels 3-1-3 --vnorms 2222 --fc-end False --preact True --coeff 0.9 \
  --n-exact-terms 10 --synthetic-data True --synthetic-structured True \
  --synthetic-n 8192 --seed 42 --save $SAVE --vis-freq 1280"

# segment 1: epochs 0-29 (128 steps/epoch at batch 64 -> 3840 steps)
timeout 3600 python train_img.py $COMMON --nepochs 30 || exit 1
# segment 2: resume -> epochs 30-41 (+1536 steps, total 5376)
timeout 1800 python train_img.py $COMMON --nepochs 42 \
  --resume $SAVE/most_recent.pkl --begin-epoch 30 || exit 1

python experiments/long_horizon.py $SAVE experiments/long_horizon_r2.json

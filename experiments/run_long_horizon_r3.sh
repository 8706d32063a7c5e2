#!/bin/bash
# Round-3 flagship long-horizon run (VERDICT round 2, item 1): the CIFAR-10
# recipe on the infinite synthetic stream for ~6.2k steps with the round-3
# solver policy — guarded stall exit, Newton first direction, and the solve
# precision chosen by the hard-regime lab (experiments/hard_regime_r3*.json).
# Two segments (the second resumes mid-run), then distilled into
# experiments/long_horizon_r3.json; healthy requires >= 0.95 of examples in
# the reference's 3x-eps acceptance band on train AND eval, descending bpd,
# and the solver inside its budget.
set -x
SAVE=${SAVE:-experiments/cifar10_long_r3}
PRECISION=${PRECISION:-float32}
COMMON="--data cifar10 --actnorm True --nblocks 2-2-2 --idim 512 --act swish \
  --kernels 3-1-3 --vnorms 2222 --fc-end False --preact True --coeff 0.9 \
  --n-exact-terms 10 --synthetic-data True --synthetic-structured True \
  --synthetic-n 50000 --synthetic-infinite True --seed 42 --save $SAVE \
  --vis-freq 2000 --kernel-config solver_precision=$PRECISION"

# segment 1: epochs 0-5 (781 steps/epoch at batch 64 -> 4686 steps)
timeout 4200 python train_img.py $COMMON --nepochs 6 || exit 1
# segment 2: resume -> epochs 6-7 (+1562 steps, total 6248)
timeout 2400 python train_img.py $COMMON --nepochs 8 \
  --resume $SAVE/most_recent.pkl || exit 1

python experiments/long_horizon.py $SAVE experiments/long_horizon_r3.json

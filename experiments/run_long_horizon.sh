#!/bin/bash
# Long-horizon training evidence on the CIFAR-10 recipe (VERDICT.md item 2).
#
# Runs the reference recipe (/root/reference/run_cifar10.sh:1-3) on structured
# synthetic data (real CIFAR-10 absent in this zero-egress image) for ~6.2k
# steps in two segments — the second resumes from the first's most_recent.pkl,
# proving the mid-run checkpoint/resume path — then distills the log into
# experiments/long_horizon_r2.json via experiments/long_horizon.py.
#
# The synthetic train set is CIFAR-sized (50k): a first pass with n=8192
# (experiments/cifar10_long_r2) was memorized within ~15 epochs, driving
# Lipschitz saturation past the reference's regime (Broyden iters ~20,
# converged ~0.9) and exposing the EMA-eval stale-sigma bug fixed in 5bd0637.
set -x
SAVE=${SAVE:-experiments/cifar10_long_r2c}
# EXTRA="" reproduces the finite-set stress variant (cifar10_long_r2b);
# default runs the infinite-stream variant (no memorisation: the train set
# is redrawn each epoch, so solver hardness reflects the data, not a
# shrinking support).
EXTRA=${EXTRA:---synthetic-infinite True}
COMMON="--data cifar10 --actnorm True --nblocks 2-2-2 --idim 512 --act swish \
  --kernels 3-1-3 --vnorms 2222 --fc-end False --preact True --coeff 0.9 \
  --n-exact-terms 10 --synthetic-data True --synthetic-structured True \
  --synthetic-n 50000 --seed 42 --save $SAVE --vis-freq 2000 $EXTRA"

# segment 1: epochs 0-5 (781 steps/epoch at batch 64 -> 4686 steps)
timeout 3500 python train_img.py $COMMON --nepochs 6 || exit 1
# segment 2: resume -> epochs 6-7 (+1562 steps, total 6248)
timeout 1800 python train_img.py $COMMON --nepochs 8 \
  --resume $SAVE/most_recent.pkl || exit 1

python experiments/long_horizon.py $SAVE experiments/long_horizon_r2.json

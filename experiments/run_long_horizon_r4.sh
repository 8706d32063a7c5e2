#!/bin/bash
# Round-4 flagship long-horizon run (VERDICT round 3, items 1/10): the
# CIFAR-10 recipe on the infinite synthetic stream with the DEFAULT round-4
# solver policy — tf32 phase-1 + f32 precision-ladder tail
# (config.solver_tail, ops/fused_solve.py) — aiming for strict per-example
# converged ~1.0 at tf32-class wall-clock. Two segments (the second resumes
# mid-run), distilled into experiments/long_horizon_r4.json.
set -x
SAVE=${SAVE:-experiments/cifar10_long_r4}
COMMON="--data cifar10 --actnorm True --nblocks 2-2-2 --idim 512 --act swish \
  --kernels 3-1-3 --vnorms 2222 --fc-end False --preact True --coeff 0.9 \
  --n-exact-terms 10 --synthetic-data True --synthetic-structured True \
  --synthetic-n 50000 --synthetic-infinite True --seed 42 --save $SAVE \
  --vis-freq 2000"

# segment 1: epochs 0-5 (781 steps/epoch at batch 64 -> 4686 steps)
timeout 4800 python train_img.py $COMMON --nepochs 6 || exit 1
# segment 2: resume -> epochs 6-13 (+6248 steps, total ~10.9k)
timeout 9600 python train_img.py $COMMON --nepochs 14 \
  --resume $SAVE/most_recent.pkl || exit 1

# hard_regime_r4.json (the solver-fidelity lab on this run's final
# checkpoint) attaches the conditioning-limited / fidelity evidence
python experiments/long_horizon.py $SAVE experiments/long_horizon_r4.json \
  experiments/hard_regime_r4.json

#!/bin/bash
# Round-4 tabular long-horizon artifact (VERDICT round 3, item 8): the POWER
# recipe (reference run_tabular.sh:1-2 — 20 blocks, 128x4, sin, coeff 0.99,
# batch 1000, eps_forward 1e-5) on the synthetic correlated-Gaussian POWER
# stand-in, device-resident train tensors (commit c066b1c), --scan-blocks for
# O(1)-compile depth. ~40 epochs x 100 steps = 4k steps, then distilled into
# experiments/tabular_power_r4.json with a health verdict.
set -x
SAVE=${SAVE:-experiments/tabular_power_r4}
timeout 10800 python train_tabular.py --nblocks 20 --vnorms '222222' \
  --dims '128-128-128-128' --act sin --data power --batchsize 1000 \
  --coeff 0.99 --epsf 1e-5 --synthetic-data True --scan-blocks True \
  --nepochs 40 --save "$SAVE" || exit 1
python experiments/tabular_health.py "$SAVE" experiments/tabular_power_r4.json

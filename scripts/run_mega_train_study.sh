#!/bin/bash
# Megakernel-training accuracy study: STAIR_MEGA_TRAIN=auto vs the
# autodiff control on one world, two seeds each. Decides whether the
# training megakernel (ops/mega_grad.py) can become the trainer default:
# its dropout masks are hash-counter (not threefry) and its backward is
# hand-written, so equivalence must be demonstrated statistically, not
# assumed from gradient parity at a point.
set -x
ROOT=${1:-/tmp/mt_study}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

if [ ! -f "$ROOT/build_meta.json" ]; then
  python -m scripts.parity_study --func build --root "$ROOT" \
    --num-workers 2 || exit 1
fi

for seed in 1 2; do
  STAIR_MEGA_TRAIN=0 python -m scripts.parity_study --func ours \
    --root "$ROOT" --ours-run "ctl_s${seed}" --rand-seed "$seed"
  STAIR_MEGA_TRAIN=auto python -m scripts.parity_study --func ours \
    --root "$ROOT" --ours-run "mega_s${seed}" --rand-seed "$seed"
done
echo STUDY_DONE

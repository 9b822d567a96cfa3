#!/bin/bash
# Round-3 more_steps study: control vs accumulation-window contrastive
# parity (VERDICT r2 item 1). One world; reference once; two seeds per arm.
set -x
ROOT=${1:-/tmp/ms_study}
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

python -m scripts.parity_study --func build --root "$ROOT" --num-workers 1 \
  || exit 1

# Reference (CPU, slow) first so its predictions exist for every report.
python -m scripts.parity_study --func reference --root "$ROOT" || exit 1

for seed in 1 2; do
  python -m scripts.parity_study --func ours --root "$ROOT" \
    --ours-run "ours_s${seed}" --rand-seed "$seed"
  python -m scripts.parity_study --func ours --root "$ROOT" \
    --ours-run "ours_w32_s${seed}" --contrastive-window 32 \
    --rand-seed "$seed"
done

python -m scripts.parity_study --func report --root "$ROOT" \
  --ours-run ours_s1 | tail -40

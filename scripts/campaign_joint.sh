#!/usr/bin/env bash
# Round-4 joint-FastDiff convergence segment (VERDICT r3 item 5).
#
# Trains the reference's CANONICAL composition — acoustic model + FastDiff
# vocoder fine-tuning + diffusion variance adaptor + diffusion speaker
# generator (reference scripts/train.sh:44-55, ~28.8M params measured) —
# on the campaign corpus for >=4k steps, recording per-branch loss trends
# (mel / variances / duration / fastdiff eps / speakers) so diffusion
# training stability at scale is demonstrated, not smoke-tested.
#
# Reuses _campaign/{corpus,train,valid} from scripts/campaign.sh (run that
# first if absent). Artifacts land in _campaign/joint_*.
#
# Usage: bash scripts/campaign_joint.sh [extra train-CLI flags...]
set -euo pipefail
cd "$(dirname "$0")/.."

[ -d _campaign/train ] || { echo "run scripts/campaign.sh first"; exit 1; }

TRAIN_CORPUS=_campaign/train VALID_CORPUS=_campaign/valid \
CKPT_DIR=_campaign/joint_ckpts \
bash scripts/train.sh \
  --fastdiff_vocoder True --fastdiff_variances True --fastdiff_speakers True \
  --batch_size 8 \
  --accumulate_grad_batches 1 \
  --max_length 6.0 \
  --lr 2e-4 \
  --warmup_steps 1000 \
  --max_steps 4000 \
  --train_min_samples_per_speaker 50 \
  --log_dir _campaign/joint_logs \
  --cache_path _campaign/cache \
  --log_every 100 \
  --eval_every 1000 \
  --checkpoint_every 2000 \
  --num_workers 2 \
  "$@"

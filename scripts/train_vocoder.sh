#!/usr/bin/env bash
# HiFi-GAN vocoder training/fine-tuning launch (upstream recipe defaults:
# batch 16, lr 2e-4, segment 8192 — third_party/hifigan/config.json:3-24).
set -euo pipefail

python -m lightningfastspeech2_tpu.cli.train_vocoder \
  --train_target_path "${TRAIN_CORPUS:-../data/train-clean-100}" \
  --checkpoint_dir "${CKPT_DIR:-vocoder_checkpoints}" \
  --log_dir "${LOG_DIR:-vocoder_logs}" \
  "$@"

# fine-tune from a released torch generator:
#   train_vocoder.sh --from_torch_hifigan generator_universal.pth.tar

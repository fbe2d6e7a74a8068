#!/usr/bin/env bash
# Canonical training launch — analog of the reference's scripts/train.sh
# (same knobs, our CLI). Single host; multi-host runs launch this once per
# host with JAX_COORDINATOR_ADDRESS set.
set -euo pipefail

python -m lightningfastspeech2_tpu.cli.train \
  --train_target_path "${TRAIN_CORPUS:-../data/train-clean-100-aligned}" \
  --valid_target_path "${VALID_CORPUS:-}" \
  --batch_size 4 \
  --accumulate_grad_batches 12 \
  --gradient_clip_val 1.0 \
  --encoder_hidden 256 \
  --encoder_conv_filter_size 1024 \
  --variance_filter_size 256 \
  --duration_filter_size 256 \
  --decoder_hidden 256 \
  --decoder_conv_filter_size 1024 \
  --encoder_head 2 \
  --decoder_head 2 \
  --variance_loss_weights 1 1 1 1 \
  --duration_loss_weight 1 \
  --duration_nlayers 5 \
  --duration_dropout 0.1 \
  --variances pitch energy snr srmr \
  --variance_levels frame frame frame frame \
  --variance_transforms none none none none \
  --variance_losses mse mse mse mse \
  --variance_dropout 0.1 0.1 0.1 0.1 \
  --variance_early_stopping none \
  --decoder_layers 6 \
  --decoder_kernel_sizes 9 9 9 9 9 9 \
  --speaker_type dvector \
  --train_min_samples_per_speaker 50 \
  --priors_gmm True \
  --priors_gmm_max_components 2 \
  --priors energy duration snr pitch srmr \
  --sort_data_by_length True \
  --precision bf16 \
  --checkpoint_dir "${CKPT_DIR:-checkpoints}" \
  "$@"

# FastDiff joint training (the reference's canonical config enables it,
# scripts/train.sh:44-47) — append:
#   --fastdiff_vocoder True --fastdiff_variances True --fastdiff_speakers True

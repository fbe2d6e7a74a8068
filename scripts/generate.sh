#!/usr/bin/env bash
# Synthesis launch — analog of the reference's scripts/generate.sh.
set -euo pipefail

python -m lightningfastspeech2_tpu.cli.generate \
  --checkpoint_dir "${CKPT_DIR:-checkpoints}" \
  --output_path "${OUT_DIR:-generated}" \
  --sentence "${SENTENCE:-The quick brown fox jumps over the lazy dog.}" \
  "$@"

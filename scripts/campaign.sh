#!/usr/bin/env bash
# Round-3 convergence/quality campaign (VERDICT r2 item 3).
#
# Trains the CANONICAL flagship config (scripts/train.sh flags: 256-hidden
# conformer encoder + 6-layer decoder, depthwise convs, all four variances
# incl. SRMR, d-vector speakers, all five priors with GMMs) on the richest
# corpus constructible offline — data/synthetic.py:make_rich_corpus (24
# speakers x 56 utts, speaker-correlated F0/formants, declination, focus
# words; no real speech ships in this environment). Loss curves, eval
# metrics (mel MAE / Jensen-Shannon / soft-DTW / duration MAE), and eval
# media artifacts land in _campaign/; BASELINE.md records the trends.
#
# Usage: bash scripts/campaign.sh [extra train-CLI flags...]
set -euo pipefail
cd "$(dirname "$0")/.."

CAMP=_campaign
if [ ! -d "$CAMP/corpus" ]; then
  python -c "
from pathlib import Path
from lightningfastspeech2_tpu.data.synthetic import make_rich_corpus
make_rich_corpus(Path('$CAMP/corpus'), n_speakers=24, n_utts=56, seed=7)
print('corpus generated')"
fi

# held-out split: last 4 utterances of each speaker -> valid (52 train
# utts/speaker keeps --train_min_samples_per_speaker 50 satisfied)
if [ ! -d "$CAMP/train" ]; then
  python - <<'EOF'
from pathlib import Path
corpus = Path("_campaign/corpus")
for split in ("train", "valid"):
    for spk in sorted(corpus.iterdir()):
        out = Path("_campaign") / split / spk.name
        out.mkdir(parents=True, exist_ok=True)
        for f in sorted(spk.glob("*.wav")):
            utt = int(f.stem.split("utt")[1])
            if (utt >= 52) == (split == "valid"):
                for ext in (".wav", ".TextGrid"):
                    dst = out / (f.stem + ext)
                    if not dst.exists():
                        dst.symlink_to(f.with_suffix(ext).resolve())
print("split done")
EOF
fi

TRAIN_CORPUS=$CAMP/train VALID_CORPUS=$CAMP/valid \
CKPT_DIR=$CAMP/ckpts \
bash scripts/train.sh \
  --batch_size 16 \
  --accumulate_grad_batches 1 \
  --max_length 10.0 \
  --lr 2e-4 \
  --warmup_steps 1000 \
  --max_steps 12000 \
  --train_min_samples_per_speaker 50 \
  --log_dir $CAMP/logs \
  --cache_path $CAMP/cache \
  --log_every 100 \
  --eval_every 1000 \
  --checkpoint_every 2000 \
  --num_workers 3 \
  "$@"

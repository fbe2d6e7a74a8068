#!/usr/bin/env python
"""Pre-compute per-utterance d-vector caches for a corpus, CPU-only.

The train CLI embeds d-vectors at dataset init (reference embeds there
too, ``litfass/dataset/datasets.py:652-690``). On this machine a process
that has initialized the remote-TPU backend pays a tunnel round trip per
utterance even for CPU-scoped jits (measured ~1.3 s/utt vs ~40 ms
CPU-only), so warming the ``<utt>.npy`` caches from a CPU-ONLY process
first makes the real (TPU) training launch skip straight past the
embedding phase via cache hits.

Usage:
  python scripts/precompute_dvectors.py _campaign/train _campaign/valid
"""

import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")  # before first device use

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lightningfastspeech2_tpu.data.dataset import DataConfig, TTSDataset  # noqa: E402
from lightningfastspeech2_tpu.data.dvector import DVectorPipeline  # noqa: E402

# Mirrors the campaign launch (scripts/train.sh + scripts/campaign.sh
# overrides) so the feature-cache key matches and the scan is cache-hits.
DCFG = dict(
    max_length=10.0,
    variances=("pitch", "energy", "snr", "srmr"),
    variance_levels=("frame", "frame", "frame", "frame"),
    variance_transforms=("none", "none", "none", "none"),
    priors=("energy", "duration", "snr", "pitch", "srmr"),
    speaker_type="dvector",
    # 0, not the campaign's 50: valid has only 4 utts/speaker, so the
    # campaign filter would embed nothing there. Shared with the campaign
    # run: the per-utterance feature cache (keyed on per-item params,
    # dataset.py _cached key_parts) and the <utt>.npy d-vector caches.
    # NOT shared: stats_<key>.json — TTSDataset.cache_key hashes the full
    # cfg, so the stats this scan writes (min_samples=0) are dead weight
    # for the campaign run (cheap: it recomputes stats via warm feature
    # caches).
    min_samples_per_speaker=0,
    mel_dtype="bfloat16",
)


def main():
    roots = sys.argv[1:] or ["_campaign/train", "_campaign/valid"]
    pipeline = DVectorPipeline(params=None, sampling_rate=22050)
    for root in roots:
        dcfg = DataConfig(**DCFG)
        ds = TTSDataset(root=Path(root), cfg=dcfg,
                        cache_dir=Path("_campaign/cache"))
        ds.create_dvectors(pipeline)
        print(f"{root}: {len(ds)} utterances embedded, "
              f"{len(ds.speaker2dvector)} speakers", flush=True)


if __name__ == "__main__":
    main()

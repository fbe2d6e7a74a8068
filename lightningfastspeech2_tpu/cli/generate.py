"""Synthesis CLI: single sentence or whole-dataset re-synthesis.

Mirrors the reference's ``litfass/generate.py:23-252``:
- ``--sentence`` mode: text -> wav via SpeechGenerator,
- ``--dataset`` mode: iterate an aligned corpus and re-synthesize up to
  ``--hours`` of audio, writing per-speaker wav + original + .lab text.

Checkpoints come from core/checkpoint.py directories (the torch->JAX
converter in utils/torch_convert.py handles reference .ckpt files).
"""

from __future__ import annotations

import argparse
import pickle
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native FastSpeech2 synthesis")
    p.add_argument("--checkpoint_dir", type=str, default=None)
    p.add_argument("--hub", type=str, default=None,
                   help="HuggingFace Hub repo id to download a checkpoint "
                        "directory from (generate.py:106-112 analog)")
    p.add_argument("--checkpoint_step", type=str, default=None)
    p.add_argument("--output_path", type=str, default="generated")
    p.add_argument("--sentence", type=str, default=None)
    p.add_argument("--speaker", type=str, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--prior_strategy", type=str, default="sample",
                   choices=["sample", "gmm"])
    p.add_argument("--prior_values", nargs="*", type=float, default=[])
    p.add_argument("--lexicon_path", type=str, default=None)
    # dataset re-synthesis mode (generate.py:134-252)
    p.add_argument("--dataset", type=str, default=None,
                   help="aligned corpus root for re-synthesis mode")
    p.add_argument("--hours", type=float, default=1.0)
    # vocoder
    p.add_argument("--hifigan_checkpoint", type=str, default=None,
                   help="torch HiFi-GAN generator checkpoint to convert")
    p.add_argument("--no_vocoder", action="store_true")
    return p


def load_generator(args):
    import jax

    if args.hub and not args.checkpoint_dir:
        from huggingface_hub import snapshot_download

        args.checkpoint_dir = snapshot_download(args.hub)
    assert args.checkpoint_dir, "provide --checkpoint_dir or --hub"

    from lightningfastspeech2_tpu.core.checkpoint import Checkpointer
    from lightningfastspeech2_tpu.data.vocab import Vocab
    from lightningfastspeech2_tpu.models.variance_adaptor import VarianceStats
    from lightningfastspeech2_tpu.models.fastspeech2 import FastSpeech2
    from lightningfastspeech2_tpu.synthesis.g2p import EnglishG2P
    from lightningfastspeech2_tpu.synthesis.generator import SpeechGenerator
    from lightningfastspeech2_tpu.vocoder import hifigan as hg

    ckpt = Checkpointer(args.checkpoint_dir)
    path = None
    if args.checkpoint_step:
        path = Path(args.checkpoint_dir) / f"step_{int(args.checkpoint_step):08d}"
    tree, cfg, sidecar = ckpt.restore(path)
    assert cfg is not None, "checkpoint has no config.json"

    vocab = Vocab.from_dict(sidecar.get("phone2id", {"[PAD]": 0}))
    stats = sidecar.get("stats") or {}
    stats_tree = tuple(
        (v, VarianceStats(**stats[v])) for v in cfg.model.variance.variances
        if v in stats
    )
    prior_stats = tuple(
        (p, VarianceStats(**stats[f"priors_{p}"])) for p in cfg.model.priors
        if f"priors_{p}" in stats
    )
    from lightningfastspeech2_tpu.core import config as C

    mcfg = C.replace(cfg.model, vocab_size=max(len(vocab), 2))
    model = FastSpeech2(mcfg, stats=stats_tree, prior_stats=prior_stats)

    synthesiser = None
    if not args.no_vocoder:
        params = None
        if args.hifigan_checkpoint:
            import torch

            state = torch.load(args.hifigan_checkpoint, map_location="cpu")
            if "generator" in state:
                state = state["generator"]
            state = {k: v.numpy() for k, v in state.items()}
            params = jax.tree_util.tree_map(
                np.asarray, hg.convert_torch_state_dict(state)
            )
        synthesiser = hg.Synthesiser(hg.HifiGanConfig(), params=params)

    speaker_gmms = None
    gmm_path = Path(args.checkpoint_dir) / "prior_gmms.pkl"
    if gmm_path.exists():
        import pickle

        with open(gmm_path, "rb") as fh:
            speaker_gmms = pickle.load(fh)

    gen = SpeechGenerator(
        C.replace(cfg, model=mcfg), model, tree["params"], vocab, EnglishG2P(args.lexicon_path),
        synthesiser=synthesiser,
        speaker2dvector=sidecar.get("speaker2dvector"),
        speaker2id=sidecar.get("speaker2id"),
        speaker2priors=sidecar.get("speaker2priors"),
        speaker_gmms=speaker_gmms,
    )
    return gen, cfg, sidecar


def main(argv=None):
    args = build_parser().parse_args(argv)
    gen, cfg, sidecar = load_generator(args)
    out_dir = Path(args.output_path)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.sentence:
        prior_values = {
            p: (args.prior_values[i] if i < len(args.prior_values) else -1)
            for i, p in enumerate(cfg.model.priors)
        }
        wav = gen.generate_from_text(
            args.sentence, speaker=args.speaker, seed=args.seed,
            prior_strategy=args.prior_strategy, prior_values=prior_values,
        )
        out = out_dir / "sentence.wav"
        gen.save_audio(out, wav)
        print(f"wrote {out} ({len(wav) / gen.sampling_rate:.2f}s)")
        return

    if args.dataset:
        from lightningfastspeech2_tpu.data.dataset import DataConfig, TTSDataset

        dcfg = DataConfig(
            variances=cfg.model.variance.variances,
            variance_levels=cfg.model.variance.levels,
            variance_transforms=cfg.model.variance.transforms,
            priors=cfg.model.priors,
            speaker_type=cfg.model.speaker_type,
            augment_duration=0.0,
            max_phones=cfg.model.max_phones,
            max_frames=cfg.model.max_frames,
        )
        ds = TTSDataset(root=Path(args.dataset), cfg=dcfg, compute_stats=False)
        budget_s = args.hours * 3600
        total_s = 0.0
        for idx in range(len(ds)):
            item = ds.__getitem__(idx, augment=False)
            batch = ds.collate([item])
            audios = gen.generate_samples(
                {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            )
            wav = audios[0]
            speaker_dir = out_dir / str(item["speaker_key"])
            speaker_dir.mkdir(parents=True, exist_ok=True)
            gen.save_audio(speaker_dir / f"{item['id']}.wav", wav)
            (speaker_dir / f"{item['id']}.lab").write_text(item.get("text", ""))
            with open(speaker_dir / f"{item['id']}.meta", "wb") as fh:
                pickle.dump(
                    {"phones": item["phones"], "durations": item["duration"]}, fh
                )
            total_s += len(wav) / gen.sampling_rate
            if total_s >= budget_s:
                break
        print(f"re-synthesized {total_s / 3600:.2f} hours into {out_dir}")
        return

    raise SystemExit("provide --sentence or --dataset")


if __name__ == "__main__":
    main()

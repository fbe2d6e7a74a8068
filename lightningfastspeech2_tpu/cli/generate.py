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
    p.add_argument("--sample_dvector", action="store_true",
                   help="draw a novel d-vector from the speaker's GMM "
                        "(needs dvector_gmms.pkl from train --dvector_gmm)")
    p.add_argument("--prior_values", nargs="*", type=float, default=[])
    p.add_argument("--lexicon_path", type=str, default="builtin",
                   help="CMUdict-format lexicon; 'builtin' = the shipped "
                        "expanded English lexicon (data/"
                        "lexicon_en_expanded.txt), 'none' disables")
    p.add_argument("--g2p_model", type=str, default="builtin",
                   help="NeuralG2P .npz (scripts/train_g2p.py) used for "
                        "OOV words, like the reference's g2p_en fallback "
                        "(g2p.py:4); 'builtin' = the shipped data/"
                        "g2p_en.npz (held-out PER 0.059 vs rule LTS "
                        "0.385, BASELINE.md), 'none' = rule LTS only")
    # dataset re-synthesis mode (generate.py:134-252)
    p.add_argument("--dataset", type=str, default=None,
                   help="aligned corpus root for re-synthesis mode")
    p.add_argument("--hours", type=float, default=1.0)
    # vocoder
    p.add_argument("--hifigan_checkpoint", type=str, default=None,
                   help="torch HiFi-GAN generator checkpoint to convert")
    p.add_argument("--no_vocoder", action="store_true")
    p.add_argument("--vocoder_precision", type=int, default=32,
                   choices=[16, 32],
                   help="16 runs the vocoder (HiFi-GAN or FastDiff) in "
                        "bf16 (HiFi-GAN: 2.8x with the fused kernel on "
                        "v5e, ~39 dB SNR vs the f32 output)")
    # multi-device serving placement (reference puts the TTS model and the
    # vocoder on different GPUs: generate.py:34-35,77-80 --device /
    # --synth_device; here: jax.devices() indices)
    p.add_argument("--tts_device", type=int, default=None,
                   help="jax.devices() index for the acoustic model")
    p.add_argument("--vocoder_device", type=int, default=None,
                   help="jax.devices() index for the vocoder")
    p.add_argument("--use_fastdiff", type=str2bool, default=False,
                   help="vocode with the checkpoint's jointly-trained "
                        "FastDiff (reference generate.py:37-38,163-171)")
    p.add_argument("--fastdiff_n", type=int, default=None,
                   help="reverse-diffusion steps (default: checkpoint cfg)")
    p.add_argument("--vocoder_fast_gating", type=str2bool, default=False,
                   help="rational sigmoid/tanh approximations in the "
                        "FastDiff LVC gates (serving speed knob; SNR vs "
                        "exact measured in BASELINE.md)")
    p.add_argument("--restore", type=str2bool, default=False,
                   help="post-vocoder restoration to 44.1 kHz (declip + "
                        "denoise + band-limited upsample + band "
                        "replication) — the reference's VoiceFixer slot "
                        "(its generate.py --voicefixer)")
    # post-vocoder waveform augmentations (reference reflects
    # audiomentations' params as flags, generate.py:48-104; the native
    # transforms live in synthesis/augment.py)
    p.add_argument("--augment_pitch_shift", type=str2bool, default=False)
    p.add_argument("--augment_pitch_shift_min_semitones", type=float,
                   default=-1.0)
    p.add_argument("--augment_pitch_shift_max_semitones", type=float,
                   default=1.0)
    p.add_argument("--augment_gaussian_snr", type=str2bool, default=False)
    p.add_argument("--augment_gaussian_snr_min_snr_db", type=float,
                   default=15.0)
    p.add_argument("--augment_gaussian_snr_max_snr_db", type=float,
                   default=30.0)
    p.add_argument("--augment_room", type=str2bool, default=False)
    return p


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")


def load_generator(args):
    import jax

    from lightningfastspeech2_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()

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
    acoustic_params = tree["params"]
    if mcfg.fastdiff_vocoder and "acoustic" in acoustic_params:
        # joint checkpoint: {"acoustic": ..., "fastdiff": ...}
        fastdiff_params = acoustic_params.get("fastdiff")
        acoustic_params = acoustic_params["acoustic"]
        model = FastSpeech2(mcfg, stats=stats_tree, prior_stats=prior_stats,
                            use_fastdiff_head=True)
    else:
        fastdiff_params = None
        model = FastSpeech2(mcfg, stats=stats_tree, prior_stats=prior_stats)

    synthesiser = None
    if args.use_fastdiff:
        assert fastdiff_params is not None, (
            "--use_fastdiff needs a checkpoint trained with "
            "--fastdiff_vocoder true"
        )
        from lightningfastspeech2_tpu.models.joint import make_fastdiff_config
        from lightningfastspeech2_tpu.vocoder.fastdiff import FastDiffVocoder

        import jax.numpy as jnp

        from lightningfastspeech2_tpu.core.config import (
            replace as cfg_replace,
        )

        fd_dtype = (jnp.bfloat16 if args.vocoder_precision == 16
                    else jnp.float32)
        fd_cfg = make_fastdiff_config(mcfg)
        if args.vocoder_fast_gating:
            fd_cfg = cfg_replace(fd_cfg, fast_gating=True)
        fd = FastDiffVocoder(fd_cfg,
                             params={"params": fastdiff_params},
                             dtype=fd_dtype)
        n_steps = args.fastdiff_n or mcfg.fastdiff_inference_steps

        def synthesiser(mel, _fd=fd, _n=n_steps):
            # N-step reverse sampler (reference generate.py:163-171);
            # x32768 matches the HiFi-GAN Synthesiser's int16 contract
            wav = np.asarray(_fd.inference(np.asarray(mel)[None], N=_n))
            return wav[0] * 32768.0
    elif not args.no_vocoder:
        params = None
        voc_cfg = hg.HifiGanConfig()
        if args.hifigan_checkpoint:
            hc = Path(args.hifigan_checkpoint)
            if hc.is_dir():
                # a cli.train_vocoder checkpoint directory ({gen, disc}
                # orbax tree); the generator architecture rides in the
                # sidecar (train_vocoder supports non-V1 shapes)
                from lightningfastspeech2_tpu.core.checkpoint import (
                    Checkpointer,
                )

                # locals must NOT shadow the acoustic checkpoint's tree/
                # sidecar — a clobber here cost sentence-mode its speaker
                # and prior tables whenever --hifigan_checkpoint was a
                # trainer dir (round-5 regression find)
                voc_tree, _, voc_sidecar = Checkpointer(hc).restore()
                gc = (voc_sidecar or {}).get("hifigan_config")
                if gc:
                    voc_cfg = hg.HifiGanConfig(
                        resblock=gc["resblock"],
                        upsample_rates=tuple(gc["upsample_rates"]),
                        upsample_kernel_sizes=tuple(
                            gc["upsample_kernel_sizes"]),
                        upsample_initial_channel=gc[
                            "upsample_initial_channel"],
                        resblock_kernel_sizes=tuple(
                            gc["resblock_kernel_sizes"]),
                        resblock_dilation_sizes=tuple(
                            tuple(d) for d in gc["resblock_dilation_sizes"]
                        ),
                        num_mels=gc["num_mels"],
                        sampling_rate=gc["sampling_rate"],
                    )
                params = jax.tree_util.tree_map(
                    np.asarray, voc_tree["params"]["gen"]
                )
            else:
                params = hg.load_torch_generator(args.hifigan_checkpoint,
                                                 voc_cfg)
        import jax.numpy as jnp

        voc_dtype = (jnp.bfloat16 if args.vocoder_precision == 16
                     else jnp.float32)
        synthesiser = hg.Synthesiser(voc_cfg, params=params,
                                     dtype=voc_dtype)

    speaker_gmms = None
    gmm_path = Path(args.checkpoint_dir) / "prior_gmms.pkl"
    if gmm_path.exists():
        import pickle

        with open(gmm_path, "rb") as fh:
            speaker_gmms = pickle.load(fh)

    dvector_gmms = None
    dv_gmm_path = Path(args.checkpoint_dir) / "dvector_gmms.pkl"
    if dv_gmm_path.exists():
        import pickle

        with open(dv_gmm_path, "rb") as fh:
            dvector_gmms = pickle.load(fh)

    from pathlib import Path as _Path

    _data_dir = _Path(__file__).parent.parent / "data"
    lexicon_path = args.lexicon_path
    if lexicon_path == "builtin":
        builtin_lex = _data_dir / "lexicon_en_expanded.txt"
        lexicon_path = str(builtin_lex) if builtin_lex.exists() else None
    elif lexicon_path in ("none", ""):
        lexicon_path = None

    neural_g2p = None
    g2p_model = args.g2p_model
    if g2p_model == "builtin":
        builtin_g2p = _data_dir / "g2p_en.npz"
        g2p_model = str(builtin_g2p) if builtin_g2p.exists() else None
    elif g2p_model in ("none", ""):
        g2p_model = None
    if g2p_model:
        from lightningfastspeech2_tpu.synthesis.neural_g2p import NeuralG2P

        neural_g2p = NeuralG2P.load(g2p_model)

    # device placement: committed params pin each jitted program to its
    # device; activations follow (XLA inserts the host/ICI transfer)
    if args.tts_device is not None:
        acoustic_params = jax.device_put(
            acoustic_params, jax.devices()[args.tts_device]
        )
    if args.vocoder_device is not None and synthesiser is not None:
        synthesiser.params = jax.device_put(
            synthesiser.params, jax.devices()[args.vocoder_device]
        )

    gen = SpeechGenerator(
        C.replace(cfg, model=mcfg), model, acoustic_params, vocab,
        EnglishG2P(lexicon_path, neural=neural_g2p),
        synthesiser=synthesiser,
        speaker2dvector=sidecar.get("speaker2dvector"),
        speaker2id=sidecar.get("speaker2id"),
        speaker2priors=sidecar.get("speaker2priors"),
        speaker_gmms=speaker_gmms,
        dvector_gmms=dvector_gmms,
    )
    return gen, cfg, sidecar


def main(argv=None):
    args = build_parser().parse_args(argv)
    gen, cfg, sidecar = load_generator(args)
    restorer = None
    if args.restore:
        from lightningfastspeech2_tpu.synthesis.restore import AudioRestorer

        restorer = AudioRestorer()
    augment = None
    if args.augment_pitch_shift or args.augment_gaussian_snr or args.augment_room:
        from lightningfastspeech2_tpu.synthesis.augment import from_args

        augment = from_args(
            pitch_shift=args.augment_pitch_shift,
            gaussian_snr=args.augment_gaussian_snr,
            room=args.augment_room,
            seed=args.seed,
            pitch_shift_min_semitones=args.augment_pitch_shift_min_semitones,
            pitch_shift_max_semitones=args.augment_pitch_shift_max_semitones,
            gaussian_snr_min_snr_db=args.augment_gaussian_snr_min_snr_db,
            gaussian_snr_max_snr_db=args.augment_gaussian_snr_max_snr_db,
            # explicit opt-in via flag -> always applied
            pitch_shift_p=1.0, gaussian_snr_p=1.0, room_p=1.0,
        )
    if restorer is not None or augment is not None:
        from lightningfastspeech2_tpu.synthesis.generator import (
            PostProcessChain,
        )

        # applied post-vocoder: restore first, then augment at the
        # restored rate (reference generator.py:173-201)
        gen.set_postprocess(PostProcessChain(restorer, augment))
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
            sample_dvector=args.sample_dvector,
        )
        out = out_dir / "sentence.wav"
        gen.save_audio(out, wav)
        print(f"wrote {out} ({len(wav) / gen.output_sampling_rate:.2f}s)")
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
        # the sidecar's d-vector table / stats keep speaker identity and
        # normalization consistent with training (otherwise unknown
        # speakers fall back to hash-placeholder vectors)
        s2d = sidecar.get("speaker2dvector")
        ds = TTSDataset(
            root=Path(args.dataset), cfg=dcfg, compute_stats=False,
            stats=sidecar.get("stats"),
            speaker2dvector={k: np.asarray(v) for k, v in s2d.items()}
            if s2d else None,
        )
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
            # ground-truth copy beside the synthesis (reference writes the
            # original too, generate.py:228-231; scripts/eval_vocoder.py
            # --compare_dir consumes these pairs)
            import shutil

            src = ds.entries[idx].audio_path
            try:
                shutil.copyfile(src, speaker_dir / f"{item['id']}_original.wav")
            except OSError:
                pass
            (speaker_dir / f"{item['id']}.lab").write_text(item.get("text", ""))
            with open(speaker_dir / f"{item['id']}.meta", "wb") as fh:
                pickle.dump(
                    {"phones": item["phones"], "durations": item["duration"]}, fh
                )
            total_s += len(wav) / gen.output_sampling_rate
            if total_s >= budget_s:
                break
        print(f"re-synthesized {total_s / 3600:.2f} hours into {out_dir}")
        return

    raise SystemExit("provide --sentence or --dataset")


if __name__ == "__main__":
    main()

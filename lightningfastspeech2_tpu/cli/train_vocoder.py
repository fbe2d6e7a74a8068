"""HiFi-GAN vocoder training / fine-tuning CLI.

The reference ships the HiFi-GAN generator inference-only (its vocoder
fine-tuning story is the FastDiff joint path); BASELINE.json config #5
asks for end-to-end "acoustic model + HiFi-GAN fine-tune to waveform".
This CLI makes the in-framework adversarial recipe
(vocoder/hifigan_train.py: MPD + MSD + LSGAN + feature matching + mel L1,
upstream config ``/root/reference/litfass/third_party/hifigan/config.json:3-24``)
reachable on a plain wav corpus:

    python -m lightningfastspeech2_tpu.cli.train_vocoder \
        --train_target_path corpus --checkpoint_dir voc_ckpts \
        --max_steps 100000

Data handling is deliberately simple and TPU-friendly: every step draws
``batch_size`` random fixed-length waveform segments (static shapes, no
bucketing needed at segment_size 8192), the conditioning log-mel is
computed on device by the jitted front-end (audio/mel.py — identical to
the acoustic model's mel, so a fine-tuned generator consumes acoustic-
model output without any scale shim), and the whole
G/D update runs as one jitted step.

Warm starts:
- ``--from_torch_hifigan``: a torch generator checkpoint
  (``generator_universal.pth.tar`` layout, weight norm folded by
  ``vocoder.hifigan.convert_torch_state_dict``),
- ``--from_checkpoint``: resume a run saved by this CLI.

Checkpoints are orbax trees {gen, disc} + both optimizer states; the
generate CLI accepts the directory via ``--hifigan_checkpoint``.
"""

from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path
from typing import List, NamedTuple

import numpy as np


class VocoderState(NamedTuple):
    """Duck-types train.step.TrainState for core.checkpoint.Checkpointer."""

    params: dict
    opt_state: dict
    step: int


def _unflatten_like(template, leaves):
    """Rebuild ``template``'s pytree from restored leaves. Orbax may hand
    a saved leaf list back as {'0': a, '1': b, ...}; normalize first."""
    import jax

    if isinstance(leaves, dict):
        leaves = [leaves[k] for k in sorted(leaves, key=int)]
    import jax.numpy as jnp

    leaves = [jnp.asarray(l) for l in leaves]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native HiFi-GAN training")
    p.add_argument("--train_target_path", type=str, required=True,
                   help="directory of .wav files (searched recursively)")
    p.add_argument("--checkpoint_dir", type=str, default="vocoder_checkpoints")
    p.add_argument("--log_dir", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=16,
                   help="upstream config.json batch_size")
    p.add_argument("--segment_size", type=int, default=8192)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--adam_b1", type=float, default=0.8)
    p.add_argument("--adam_b2", type=float, default=0.99)
    p.add_argument("--lr_decay", type=float, default=0.999)
    p.add_argument("--mel_weight", type=float, default=45.0)
    p.add_argument("--fm_weight", type=float, default=2.0)
    p.add_argument("--max_steps", type=int, default=100000)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--checkpoint_every", type=int, default=5000)
    p.add_argument("--seed", type=int, default=42)
    # generator architecture (defaults = HiFi-GAN V1 / config.json)
    p.add_argument("--upsample_rates", nargs="+", type=int,
                   default=[8, 8, 2, 2])
    p.add_argument("--upsample_kernel_sizes", nargs="+", type=int,
                   default=[16, 16, 4, 4])
    p.add_argument("--upsample_initial_channel", type=int, default=512)
    p.add_argument("--resblock_kernel_sizes", nargs="+", type=int,
                   default=[3, 7, 11])
    p.add_argument("--from_torch_hifigan", type=str, default=None,
                   help="torch generator checkpoint to fine-tune from")
    p.add_argument("--from_checkpoint", type=str, default=None,
                   help="checkpoint dir of a previous run to resume")
    p.add_argument("--wandb_mode", type=str, default="offline")
    p.add_argument("--wandb_project", type=str, default="lfs2_tpu_vocoder")
    return p


class SegmentSampler:
    """Random fixed-length waveform segments from a wav corpus.

    Files are loaded lazily and kept in an in-memory cache (float32 at
    22.05 kHz mono ≈ 88 KB/s — a LibriTTS-sized corpus fits host RAM;
    the cache is capped to ``cache_files`` with FIFO eviction for larger
    ones). Short files are zero-padded to one segment, matching the
    upstream trainer's behavior for tail segments.
    """

    def __init__(self, root: Path, sr: int, segment_size: int,
                 seed: int = 0, cache_files: int = 4096):
        from lightningfastspeech2_tpu.data import wav as wav_io

        self._read, self._resample = wav_io.read, wav_io.resample
        self.paths: List[Path] = sorted(root.rglob("*.wav"))
        if not self.paths:
            raise SystemExit(f"no .wav files under {root}")
        self.sr, self.segment_size = sr, segment_size
        self.rng = np.random.default_rng(seed)
        self.cache_files = cache_files
        self._cache: dict = {}

    def _load(self, path: Path) -> np.ndarray:
        wav = self._cache.get(path)
        if wav is None:
            raw, file_sr = self._read(path)
            wav = self._resample(raw.astype(np.float32), file_sr, self.sr)
            peak = np.max(np.abs(wav))
            if peak > 0:
                wav = wav / peak  # load-time peak norm (datasets.py:369)
            if len(self._cache) >= self.cache_files:
                self._cache.pop(next(iter(self._cache)))
            self._cache[path] = wav
        return wav

    def batch(self, batch_size: int) -> np.ndarray:
        seg = self.segment_size
        out = np.zeros((batch_size, seg), np.float32)
        picks = self.rng.integers(0, len(self.paths), batch_size)
        for row, pi in enumerate(picks):
            wav = self._load(self.paths[int(pi)])
            if len(wav) <= seg:
                out[row, : len(wav)] = wav
            else:
                start = int(self.rng.integers(0, len(wav) - seg))
                out[row] = wav[start : start + seg]
        return out


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from lightningfastspeech2_tpu.audio.mel import mel_spectrogram
    from lightningfastspeech2_tpu.core.checkpoint import Checkpointer
    from lightningfastspeech2_tpu.core.config import AudioConfig
    from lightningfastspeech2_tpu.train.metrics_logger import MetricsLogger
    from lightningfastspeech2_tpu.vocoder import hifigan as hg
    from lightningfastspeech2_tpu.vocoder.hifigan_train import (
        HifiGanTrainConfig,
        HifiGanTrainer,
    )

    gen_cfg = hg.HifiGanConfig(
        upsample_rates=tuple(args.upsample_rates),
        upsample_kernel_sizes=tuple(args.upsample_kernel_sizes),
        upsample_initial_channel=args.upsample_initial_channel,
        resblock_kernel_sizes=tuple(args.resblock_kernel_sizes),
        resblock_dilation_sizes=((1, 3, 5),) * len(args.resblock_kernel_sizes),
    )
    # the conditioning mel must live on the generator's hop grid
    # (frames * hop == segment samples)
    audio_cfg = AudioConfig(hop_length=gen_cfg.hop_length)
    tcfg = HifiGanTrainConfig(
        lr=args.lr, adam_b1=args.adam_b1, adam_b2=args.adam_b2,
        lr_decay=args.lr_decay, mel_weight=args.mel_weight,
        fm_weight=args.fm_weight, segment_size=args.segment_size,
    )
    trainer = HifiGanTrainer(gen_cfg, tcfg, audio_cfg,
                             rng=jax.random.PRNGKey(args.seed))

    start_step = 0
    if args.from_torch_hifigan:
        trainer.gen_params = jax.tree_util.tree_map(
            jnp.asarray, hg.load_torch_generator(args.from_torch_hifigan,
                                                 gen_cfg)
        )
        print(f"warm-started generator from {args.from_torch_hifigan}")
    elif args.from_checkpoint:
        tree, _, _ = Checkpointer(args.from_checkpoint).restore()
        trainer.gen_params = jax.tree_util.tree_map(
            jnp.asarray, tree["params"]["gen"]
        )
        trainer.disc_params = jax.tree_util.tree_map(
            jnp.asarray, tree["params"]["disc"]
        )
        # optimizer states were checkpointed as flat leaf lists (optax
        # NamedTuple containers don't round-trip orbax structurally);
        # rebuild them against the live optimizer trees
        trainer.gen_opt = _unflatten_like(trainer.gen_opt,
                                          tree["opt_state"]["gen"])
        trainer.disc_opt = _unflatten_like(trainer.disc_opt,
                                           tree["opt_state"]["disc"])
        start_step = int(tree["step"])
        print(f"resumed from {args.from_checkpoint} at step {start_step}")

    # fold the resume step into the sampler seed so a resumed run draws a
    # fresh continuation of the segment stream instead of replaying it
    sampler = SegmentSampler(Path(args.train_target_path),
                             audio_cfg.sampling_rate, args.segment_size,
                             seed=args.seed + start_step)
    print(f"{len(sampler.paths)} wav files", flush=True)

    seg_mel = args.segment_size // gen_cfg.hop_length

    @jax.jit
    def wav_to_mel(wav):
        # front-end yields 1 + N//hop frames; the generator's static
        # contract is N//hop (frames * hop == segment samples), so drop
        # the final (window-tail) frame
        return jax.vmap(lambda w: mel_spectrogram(w, audio_cfg))(wav)[
            :, :seg_mel
        ]

    # async: the GAN step never stalls for the disk write (the save only
    # blocks for the device->host copy; ``latest`` advances on commit)
    ckptr = Checkpointer(args.checkpoint_dir, use_async=True)
    logger = MetricsLogger(args.log_dir, use_wandb=args.wandb_mode == "online",
                           wandb_project=args.wandb_project)

    import time

    t_last = time.perf_counter()
    last_log_step = start_step
    for step in range(start_step, args.max_steps):
        wav = jnp.asarray(sampler.batch(args.batch_size))
        mel = wav_to_mel(wav)
        metrics = trainer.train_step(mel, wav)
        if step % args.log_every == 0 or step == args.max_steps - 1:
            # metrics are device scalars; float() only here so the hot
            # loop never waits on a host read (remote-tunnel RTT)
            metrics = {k: float(v) for k, v in metrics.items()}
            now = time.perf_counter()
            done = step - last_log_step
            metrics["steps_per_s"] = done / (now - t_last) if done else 0.0
            t_last, last_log_step = now, step
            logger.log(step, {f"train/{k}": v for k, v in metrics.items()})
        if (step and step % args.checkpoint_every == 0) or (
            step == args.max_steps - 1
        ):
            state = VocoderState(
                params={"gen": trainer.gen_params,
                        "disc": trainer.disc_params},
                opt_state={
                    "gen": jax.tree_util.tree_leaves(trainer.gen_opt),
                    "disc": jax.tree_util.tree_leaves(trainer.disc_opt),
                },
                step=np.asarray(step + 1, np.int32),
            )
            # the generator architecture rides in the sidecar so the
            # generate CLI can rebuild the right module from the
            # directory alone
            ckptr.save(step + 1, state,
                       sidecar={"hifigan_config": dataclasses.asdict(gen_cfg)})
            print(f"checkpointed step {step + 1} -> {args.checkpoint_dir}",
                  flush=True)
    ckptr.wait_until_finished()  # commit any in-flight async write
    logger.close()


if __name__ == "__main__":
    main()

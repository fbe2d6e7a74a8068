#!/usr/bin/env python
"""On-chip attribution of the DELIVERED training-loop step time.

profile_loader.py showed batch production is fast cache-warm (~10 ms at
campaign settings); the campaign still ran at 2.5-4.4 steps/s (250-400
ms/step). This script runs the real composed loop (campaign dataset +
campaign model config + real train step) on the default (TPU) backend and
times each phase per step:

  t_fetch    next(loader)                     host batch production
  t_put      device transfer of the batch     tunnel bytes + RTT
  t_dispatch step_fn call returning           dispatch overhead
  t_sync     host read of a metric            device compute drain

Variants:
  baseline   the loop as train/loop.py runs it (implicit transfer at the
             jit boundary, no explicit sync except at log steps)
  put1       one explicit jax.device_put of the whole batch pytree
  overlap    double-buffered: device_put(batch i+1) issued right after
             step i dispatch (what train/loop.py does after the fix)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train_loop.py
"""

import faulthandler
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    faulthandler.dump_traceback_later(120, repeat=True)
    import jax
    import jax.numpy as jnp

    from lightningfastspeech2_tpu.cli.train import args_to_config, build_parser
    from lightningfastspeech2_tpu.core.bucketing import Bucketer
    from lightningfastspeech2_tpu.core.compile_cache import (
        enable_fast_prng,
        enable_persistent_cache,
    )
    from lightningfastspeech2_tpu.data.dataset import DataConfig, TTSDataset
    from lightningfastspeech2_tpu.data.loader import PrefetchLoader
    from lightningfastspeech2_tpu.train.loop import build_model
    from lightningfastspeech2_tpu.train.step import create_train_state, make_train_step

    enable_persistent_cache()
    enable_fast_prng()

    # campaign.sh flags (scripts/train.sh canonical + campaign overrides)
    argv = [
        "--train_target_path", "_campaign/train",
        "--batch_size", "16", "--accumulate_grad_batches", "1",
        "--gradient_clip_val", "1.0",
        "--encoder_hidden", "256", "--encoder_conv_filter_size", "1024",
        "--variance_filter_size", "256", "--duration_filter_size", "256",
        "--decoder_hidden", "256", "--decoder_conv_filter_size", "1024",
        "--encoder_head", "2", "--decoder_head", "2",
        "--variance_loss_weights", "1", "1", "1", "1",
        "--duration_loss_weight", "1", "--duration_nlayers", "5",
        "--variances", "pitch", "energy", "snr", "srmr",
        "--variance_levels", "frame", "frame", "frame", "frame",
        "--variance_transforms", "none", "none", "none", "none",
        "--variance_losses", "mse", "mse", "mse", "mse",
        "--decoder_layers", "6",
        "--decoder_kernel_sizes", "9", "9", "9", "9", "9", "9",
        "--speaker_type", "dvector", "--max_length", "10.0",
        "--precision", "bf16", "--lr", "2e-4", "--warmup_steps", "1000",
        "--checkpoint_dir", "/tmp/_plt_ckpt",
    ]
    args = build_parser().parse_args(argv)
    cfg = args_to_config(args)

    dcfg = DataConfig(
        min_length=0.5, max_length=10.0,
        variances=("pitch", "energy", "snr", "srmr"),
        variance_levels=("frame",) * 4,
        variance_transforms=("none",) * 4,
        priors=(), augment_duration=0.1,
        speaker_type="dvector", min_samples_per_speaker=50,
        stat_entries=10000, seed=0, scan_workers=4,
    )
    ds = TTSDataset(root=Path("_campaign/train"), cfg=dcfg,
                    cache_dir=Path("_campaign/cache"))
    ds.sort_by_duration()
    print(f"dataset: {len(ds)} utts; backend={jax.default_backend()}")

    bucketer = Bucketer(cfg.model.max_phones, cfg.model.max_frames)
    model = build_model(cfg, ds)
    loader = PrefetchLoader(ds, 16, bucketer, seed=0, num_workers=3,
                            prefetch=4)
    it = iter(loader)
    first = next(it)
    arrs0 = {k: v for k, v in first.items() if isinstance(v, np.ndarray)}
    init_batch = {k: jnp.asarray(v) for k, v in arrs0.items()}
    rng = jax.random.PRNGKey(1)

    N = 100

    def run(name, use_put, overlap, use_loader=None):
        # fresh state per variant: the train step DONATES its state args,
        # so a shared state object would be invalidated by the first
        # variant's first step (the round-4 profile crash)
        state, optimizer = create_train_state(
            model, cfg, jax.random.PRNGKey(0), init_batch)
        step_fn = make_train_step(model, cfg, optimizer, donate=True)
        it2 = iter(use_loader if use_loader is not None else loader)
        # compile against every bucket shape FIRST: a fresh compile (~40 s
        # through the tunnel) landing inside the timed loop smears into a
        # phantom 400+ ms/step "dispatch" cost (the round-4 faulthandler
        # catch). Enumerate all (P, T) buckets from the corpus directly —
        # the first-12-batches heuristic missed late shapes.
        state_l = state
        seen = set()
        warmed = 0
        while warmed < 400:
            b = next(it2)
            arrs = {k: v for k, v in b.items() if isinstance(v, np.ndarray)}
            key = tuple(sorted((k, v.shape) for k, v in arrs.items()))
            warmed += 1
            if key in seen:
                continue
            seen.add(key)
            state_l, m = step_fn(state_l, arrs, rng)
            float(m["total"])  # force the compile before the next batch
        print(f"  ({name.strip()}: warmed {len(seen)} bucket shapes)")

        t_fetch = t_put = t_dispatch = 0.0
        put_batch = None
        if overlap:
            b = next(it2)
            arrs = {k: v for k, v in b.items() if isinstance(v, np.ndarray)}
            put_batch = jax.device_put(arrs)
        t0 = time.perf_counter()
        m = None
        for i in range(N):
            ta = time.perf_counter()
            if overlap:
                cur = put_batch
            else:
                b = next(it2)
                cur = {k: v for k, v in b.items()
                       if isinstance(v, np.ndarray)}
            tb = time.perf_counter()
            if use_put and not overlap:
                cur = jax.device_put(cur)
            tc = time.perf_counter()
            state_l, m = step_fn(state_l, cur, jax.random.fold_in(rng, i))
            td = time.perf_counter()
            if overlap:
                b = next(it2)
                arrs = {k: v for k, v in b.items()
                        if isinstance(v, np.ndarray)}
                put_batch = jax.device_put(arrs)
            t_fetch += tb - ta
            t_put += tc - tb
            t_dispatch += td - tc
        tsync0 = time.perf_counter()
        float(m["total"])
        t_sync = time.perf_counter() - tsync0
        total = time.perf_counter() - t0
        print(f"{name}: {total/N*1e3:7.1f} ms/step ({N/total:5.1f} steps/s) | "
              f"fetch {t_fetch/N*1e3:6.1f} put {t_put/N*1e3:6.1f} "
              f"dispatch {t_dispatch/N*1e3:6.1f} drain {t_sync*1e3:6.1f} ms")

    run("baseline(implicit)", use_put=False, overlap=False)
    run("explicit put1     ", use_put=True, overlap=False)
    run("overlap double-buf", use_put=True, overlap=True)
    loader.close()

    # worker-count sweep: on this 4-core host the loader workers starve
    # the TPU runtime's dispatch/transfer threads (the round-4 diagnosis);
    # _worker_init now nices workers and caps counts at cpu_count-2
    for workers, prefetch in [(1, 2), (2, 3)]:
        loader2 = PrefetchLoader(ds, 16, bucketer, seed=0,
                                 num_workers=workers, prefetch=prefetch)
        try:
            run(f"niced w={workers} p={prefetch}   ",
                use_put=False, overlap=False, use_loader=loader2)
        finally:
            loader2.close()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Attribute the host data-path cost of the campaign training loop.

VERDICT r3 item 3: the 12k-step campaign ran at 2.5-4.4 steps/s where the
chip could do ~40 — the loader dominated and nothing attributed the host
path. This script measures, on the campaign corpus with the campaign
config (scripts/campaign.sh flags):

  1. per-item cost, cache-cold vs cache-warm (npz feature cache),
  2. collate cost for a batch,
  3. synchronous batch_iterator steady-state rate,
  4. PrefetchLoader steady-state rate over a (workers, prefetch) grid,
  5. bytes per collated batch by key (what device_put ships per step).

Runs entirely on the host CPU (forces the cpu backend the way
tests/conftest.py does) — the device step is NOT measured here; compare
the best loader rate against the known on-chip step time to get the
achievable steps/s. Run scripts/profile_train_loop.py for the on-chip
composed measurement.
"""

import argparse
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lightningfastspeech2_tpu.core.bucketing import Bucketer  # noqa: E402
from lightningfastspeech2_tpu.data.dataset import (  # noqa: E402
    DataConfig,
    TTSDataset,
    collate,
)
from lightningfastspeech2_tpu.data.loader import (  # noqa: E402
    PrefetchLoader,
    batch_index_stream,
)


def campaign_dcfg(raw_mode: bool = False) -> DataConfig:
    """The scripts/campaign.sh data config (canonical train.sh flags)."""
    return DataConfig(
        min_length=0.5, max_length=10.0,
        variances=("pitch", "energy", "snr", "srmr"),
        variance_levels=("frame",) * 4,
        variance_transforms=("none",) * 4,
        priors=("energy", "duration", "snr", "pitch", "srmr"),
        augment_duration=0.1,
        speaker_type="dvector",
        min_samples_per_speaker=50,
        stat_entries=10000,
        raw_mode=raw_mode,
        seed=0,
        scan_workers=4,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="_campaign/train")
    ap.add_argument("--cache", default="_campaign/cache")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--steady_batches", type=int, default=30)
    ap.add_argument("--raw_mode", action="store_true")
    args = ap.parse_args()

    t0 = time.perf_counter()
    ds = TTSDataset(root=Path(args.corpus), cfg=campaign_dcfg(args.raw_mode),
                    cache_dir=Path(args.cache))
    print(f"dataset: {len(ds)} utts, {len(ds.speakers)} speakers "
          f"(construct {time.perf_counter()-t0:.1f}s)")
    ds.sort_by_duration()
    bucketer = Bucketer(ds.cfg.max_phones, ds.cfg.max_frames)

    # 1. per-item cost
    idxs = list(range(0, len(ds), max(len(ds) // 24, 1)))[:24]
    t0 = time.perf_counter()
    items = [ds[i] for i in idxs]
    warm1 = (time.perf_counter() - t0) / len(idxs)  # may include cold computes
    t0 = time.perf_counter()
    items = [ds[i] for i in idxs]
    warm2 = (time.perf_counter() - t0) / len(idxs)
    print(f"per-item: first-pass {warm1*1e3:.2f} ms, warm {warm2*1e3:.2f} ms")

    # 2. collate cost
    bi = items[: args.batch_size]
    while len(bi) < args.batch_size:
        bi = bi + bi
    bi = bi[: args.batch_size]
    t0 = time.perf_counter()
    for _ in range(10):
        b = collate(bi, ds.cfg, bucketer)
    print(f"collate(B={args.batch_size}): "
          f"{(time.perf_counter()-t0)/10*1e3:.2f} ms")

    # 5. bytes per batch
    total = 0
    rows = []
    for k, v in sorted(b.items()):
        if isinstance(v, np.ndarray) and v.dtype != object:
            rows.append((v.nbytes, k, v.dtype, v.shape))
            total += v.nbytes
    for nb, k, dt, sh in sorted(rows, reverse=True)[:8]:
        print(f"  batch[{k}]: {nb/1e6:.2f} MB {dt} {sh}")
    print(f"batch bytes total: {total/1e6:.2f} MB "
          f"-> at 100 MB/s tunnel ~{total/1e8*1e3:.1f} ms/step")

    # 3. synchronous iterator steady rate (warm cache)
    stream = batch_index_stream(len(ds), args.batch_size, shuffle=True,
                                seed=0, lengths=np.asarray(
                                    [int(e.durations.sum()) for e in ds.entries]))
    # warm the cache fully first so this measures steady state
    t0 = time.perf_counter()
    n_warm = 0
    for _ in range(len(ds) // args.batch_size):
        idx = next(stream)
        [ds[i] for i in idx]
        n_warm += 1
    print(f"cache warmup pass: {n_warm} batches "
          f"{(time.perf_counter()-t0)/n_warm*1e3:.1f} ms/batch")
    t0 = time.perf_counter()
    for _ in range(args.steady_batches):
        idx = next(stream)
        collate([ds[i] for i in idx], ds.cfg, bucketer)
    sync_dt = (time.perf_counter() - t0) / args.steady_batches
    print(f"sync loader steady: {sync_dt*1e3:.1f} ms/batch "
          f"({1/sync_dt:.1f} batches/s)")

    # 4. PrefetchLoader grid
    for workers, prefetch in [(3, 4), (6, 8), (8, 12), (12, 16)]:
        loader = PrefetchLoader(ds, args.batch_size, bucketer, seed=0,
                                num_workers=workers, prefetch=prefetch)
        it = iter(loader)
        # spin up + warm
        for _ in range(prefetch + 2):
            next(it)
        t0 = time.perf_counter()
        for _ in range(args.steady_batches):
            next(it)
        dt = (time.perf_counter() - t0) / args.steady_batches
        loader.close()
        print(f"prefetch loader w={workers} p={prefetch}: "
              f"{dt*1e3:.1f} ms/batch ({1/dt:.1f} batches/s)")


if __name__ == "__main__":
    main()

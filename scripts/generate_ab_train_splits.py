#!/usr/bin/env python
"""Symlink-based per-speaker balanced A/B split of an aligned corpus.

Analog of the reference's ``scripts/generate_ab_train_splits.py``: for each
speaker directory, alternate utterances between ``<corpus>-a`` and
``<corpus>-b`` trees so both halves keep every speaker with ~equal counts.
"""

import argparse
from pathlib import Path


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("corpus", type=Path, help="aligned corpus root")
    p.add_argument("--suffixes", nargs=2, default=["-a", "-b"])
    args = p.parse_args(argv)

    roots = [Path(str(args.corpus) + s) for s in args.suffixes]
    for r in roots:
        r.mkdir(parents=True, exist_ok=True)

    n = [0, 0]
    for spk_dir in sorted(d for d in args.corpus.iterdir() if d.is_dir()):
        # group files per utterance stem
        stems = sorted({f.stem for f in spk_dir.glob("*.TextGrid")})
        for i, stem in enumerate(stems):
            side = i % 2
            dst_dir = roots[side] / spk_dir.name
            dst_dir.mkdir(parents=True, exist_ok=True)
            for f in spk_dir.glob(f"{stem}.*"):
                link = dst_dir / f.name
                if not link.exists():
                    link.symlink_to(f.resolve())
            n[side] += 1
    print(f"split: {n[0]} utterances -> {roots[0]}, {n[1]} -> {roots[1]}")


if __name__ == "__main__":
    main()

"""scripts/generate_ab_train_splits.py: per-speaker balanced symlink split."""

import importlib.util
from pathlib import Path

from lightningfastspeech2_tpu.data.synthetic import make_corpus

spec = importlib.util.spec_from_file_location(
    "ab_split", Path(__file__).parent.parent
    / "scripts" / "generate_ab_train_splits.py"
)
ab_split = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ab_split)


def test_ab_split_balanced(tmp_path):
    root = make_corpus(tmp_path / "corpus", n_speakers=2, n_utts=5, seed=9)
    ab_split.main([str(root)])
    a, b = Path(str(root) + "-a"), Path(str(root) + "-b")
    for spk in ("spk0", "spk1"):
        na = len(list((a / spk).glob("*.TextGrid")))
        nb = len(list((b / spk).glob("*.TextGrid")))
        assert na + nb == 5 and abs(na - nb) <= 1
    # links resolve to real files and each utterance keeps its wav pair
    tg = next((a / "spk0").glob("*.TextGrid"))
    assert tg.is_symlink() and tg.resolve().exists()
    assert tg.with_suffix(".wav").exists()
    # the split halves are themselves usable corpora
    from lightningfastspeech2_tpu.data.dataset import DataConfig, TTSDataset

    entries = TTSDataset.scan(a, DataConfig())
    assert len(entries) > 0

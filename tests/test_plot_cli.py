"""cli.plot renders composite item figures from an aligned corpus."""

from lightningfastspeech2_tpu.data.synthetic import make_corpus


def test_plot_cli(tmp_path):
    from lightningfastspeech2_tpu.cli.plot import main

    root = make_corpus(tmp_path / "corpus", n_speakers=2, n_utts=2, seed=5)
    out = tmp_path / "plots"
    main([
        "--target_path", str(root),
        "--output_path", str(out),
        "--n", "2",
        "--variances", "pitch", "energy",
        "--variance_transforms", "cwt", "none",
        "--stat_entries", "4",
    ])
    pngs = list(out.glob("*.png"))
    assert len(pngs) == 2
    assert all(p.stat().st_size > 1000 for p in pngs)

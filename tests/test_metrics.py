"""Eval metrics: KDE-JS, MAE, evaluate() loop, variance early stopping."""

import numpy as np
import pytest

from lightningfastspeech2_tpu.train.metrics import (
    VarianceEarlyStopping,
    kde_jensen_shannon,
    masked_mae,
)


def test_js_zero_for_identical_and_positive_for_shifted():
    g = np.random.default_rng(0)
    a = g.standard_normal(400)
    same = kde_jensen_shannon(a, a.copy())
    far = kde_jensen_shannon(a, a + 5.0)
    assert same < 0.05
    assert far > 0.5
    assert far <= 1.0 + 1e-6


def test_masked_mae():
    pred = np.array([[1.0, 2.0], [3.0, 5.0]])
    true = np.array([[1.0, 4.0], [3.0, 9.0]])
    mask = np.array([[True, True], [True, False]])
    assert masked_mae(pred, true, mask) == pytest.approx(2.0 / 3)


def test_variance_early_stopping_freezes_after_patience():
    es = VarianceEarlyStopping(("pitch", "energy"), mode="mae", patience=2)
    snap = {"pitch": "p0", "energy": "e0"}
    # improving
    es.update({"eval/mae_pitch": 1.0, "eval/mae_energy": 1.0}, snap)
    assert es.frozen == []
    # pitch stalls twice -> frozen; energy keeps improving
    es.update({"eval/mae_pitch": 1.1, "eval/mae_energy": 0.9}, snap)
    es.update({"eval/mae_pitch": 1.2, "eval/mae_energy": 0.8}, snap)
    assert es.frozen == ["pitch"]
    assert es.best_params["pitch"] == "p0"


def test_evaluate_loop_runs(tmp_path):
    from lightningfastspeech2_tpu.data.dataset import DataConfig, TTSDataset
    from lightningfastspeech2_tpu.data.synthetic import make_corpus
    from lightningfastspeech2_tpu.train.loop import build_model, evaluate, fit
    from tests.test_end_to_end import small_train_config

    corpus = make_corpus(tmp_path / "c", n_speakers=1, n_utts=4, seed=2)
    dcfg = DataConfig(
        variances=("pitch", "energy"),
        variance_levels=("phone", "frame"),
        variance_transforms=("none", "none"),
        augment_duration=0.0, speaker_type="dvector",
        stat_entries=4, max_phones=32, max_frames=256,
    )
    ds = TTSDataset(root=corpus, cfg=dcfg)
    cfg = small_train_config()
    result = fit(cfg, ds, max_steps=2)
    model = build_model(cfg, ds)
    metrics = evaluate(cfg, ds, model, result.state.params, max_batches=1)
    for key in (
        "eval/jensenshannon_pitch", "eval/mae_energy", "eval/mae_duration",
        "eval/softdtw_mel", "eval/mae_mel", "eval/total_loss",
    ):
        assert key in metrics, sorted(metrics)
        assert np.isfinite(metrics[key]) or np.isnan(metrics[key])


def test_evaluate_mesh_matches_unsharded(tmp_path):
    """Mesh-sharded evaluate() (the multi-chip path the CLI uses when a
    mesh is configured) is numerically identical to the single-device
    eval — the reference evaluates under the same DDP strategy as
    training (sync_dist=True, fastspeech2.py:802-807)."""
    import jax

    from lightningfastspeech2_tpu.core.config import MeshConfig
    from lightningfastspeech2_tpu.data.dataset import DataConfig, TTSDataset
    from lightningfastspeech2_tpu.data.synthetic import make_corpus
    from lightningfastspeech2_tpu.parallel import mesh as mesh_lib
    from lightningfastspeech2_tpu.train.loop import build_model, evaluate, fit
    from tests.test_end_to_end import small_train_config

    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    corpus = make_corpus(tmp_path / "c", n_speakers=1, n_utts=4, seed=2)
    dcfg = DataConfig(
        variances=("pitch", "energy"),
        variance_levels=("phone", "frame"),
        variance_transforms=("none", "none"),
        augment_duration=0.0, speaker_type="dvector",
        stat_entries=4, max_phones=32, max_frames=256,
    )
    ds = TTSDataset(root=corpus, cfg=dcfg)
    cfg = small_train_config()
    result = fit(cfg, ds, max_steps=2)
    model = build_model(cfg, ds)
    ref = evaluate(cfg, ds, model, result.state.params, max_batches=1)
    mesh = mesh_lib.make_mesh(MeshConfig(data=4, model=2))
    sharded = evaluate(cfg, ds, model, result.state.params, max_batches=1,
                       mesh=mesh)
    assert set(ref) == set(sharded)
    for k in ref:
        a, b = ref[k], sharded[k]
        if np.isnan(a) and np.isnan(b):
            continue
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3, err_msg=k)


def test_mcd_properties():
    from lightningfastspeech2_tpu.train.metrics import mel_cepstral_distortion

    rng = np.random.default_rng(0)
    t = rng.normal(size=(50, 80))
    assert mel_cepstral_distortion(t, t) == 0.0
    # a constant spectral offset lives entirely in c0 (excluded): MCD 0
    assert mel_cepstral_distortion(t + 1.7, t) < 1e-9
    # spectral-shape distortion is positive and grows with magnitude
    d1 = mel_cepstral_distortion(t + 0.1 * rng.normal(size=t.shape), t)
    d2 = mel_cepstral_distortion(t + 0.5 * rng.normal(size=t.shape), t)
    assert 0 < d1 < d2

"""Train-step tests: loss goes down, grad accumulation matches the
mean-of-grads contract, and the pjit'd step runs data-parallel on the
virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lightningfastspeech2_tpu.core import config as C
from lightningfastspeech2_tpu.core.config import MeshConfig
from lightningfastspeech2_tpu.models.fastspeech2 import FastSpeech2, make_dummy_batch
from lightningfastspeech2_tpu.parallel import mesh as mesh_lib
from lightningfastspeech2_tpu.train.optim import make_optimizer, noam_schedule
from lightningfastspeech2_tpu.train.step import (
    create_train_state,
    make_train_step,
    shard_batch_for_mesh,
)
from tests.test_model import tiny_config


def _setup(batch_size=4, accum=None, cfg=None):
    cfg = cfg or tiny_config()
    model = FastSpeech2(cfg.model)
    batch = make_dummy_batch(cfg.model, batch_size=batch_size, n_phones=8, seed=0)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    if accum:
        batch = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * accum), batch
        )
    state, optimizer = create_train_state(
        model, cfg, jax.random.PRNGKey(0),
        jax.tree_util.tree_map(lambda x: x[0] if accum else x, batch),
    )
    return cfg, model, batch, state, optimizer


def test_noam_schedule_values():
    sched = noam_schedule(1e-4, 4000)
    # warmup: linear ramp; peak at warmup; decay ~ s^-1/2 after
    assert float(sched(1)) < float(sched(1000)) < float(sched(4000))
    assert float(sched(16000)) < float(sched(4000))
    np.testing.assert_allclose(
        float(sched(4000)), 1e-4 * 4000**0.5 * 4000**-0.5, rtol=1e-6
    )


def test_train_step_decreases_loss():
    cfg = C.replace(
        tiny_config(), **{"train.lr": 3e-3, "train.warmup_steps": 5}
    )
    cfg, model, batch, state, optimizer = _setup(cfg=cfg)
    step = make_train_step(model, cfg, optimizer, donate=False)
    losses = []
    rng = jax.random.PRNGKey(1)
    for i in range(20):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics["total"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert int(state.step) == 20


def _no_dropout(cfg: C.Config) -> C.Config:
    m = cfg.model
    return C.replace(
        cfg,
        **{
            "model.encoder": C.replace(m.encoder, dropout=0.0),
            "model.decoder": C.replace(m.decoder, dropout=0.0),
            "model.variance": C.replace(
                m.variance, dropouts=(0.0,) * len(m.variance.variances)
            ),
            "model.duration": C.replace(m.duration, dropout=0.0),
        },
    )


def test_grad_accum_equals_mean_of_grads():
    cfg = _no_dropout(tiny_config())
    cfg, model, batch, state, optimizer = _setup(batch_size=2, accum=3, cfg=cfg)
    step = make_train_step(model, cfg, optimizer, donate=False)
    # identical microbatches, no dropout -> identical update to one microbatch
    single = jax.tree_util.tree_map(lambda x: x[0], batch)
    rng = jax.random.PRNGKey(2)
    s_accum, m_accum = step(state, batch, rng)
    s_single, m_single = step(state, single, rng)
    np.testing.assert_allclose(
        float(m_accum["total"]), float(m_single["total"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_accum.params),
        jax.tree_util.tree_leaves(s_single.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_pjit_data_parallel_step():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    mesh = mesh_lib.make_mesh(MeshConfig(data=8, model=1))
    cfg, model, batch, state, optimizer = _setup(batch_size=8)
    step = make_train_step(model, cfg, optimizer, mesh=mesh, donate=False)
    sharded = shard_batch_for_mesh(mesh, batch, accum_axis=False)
    with mesh:
        state2, metrics = step(state, sharded, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["total"]))
    # replicated output state matches an unsharded step numerically
    step_ref = make_train_step(model, cfg, optimizer, donate=False)
    state3, metrics_ref = step_ref(state, batch, jax.random.PRNGKey(3))
    np.testing.assert_allclose(
        float(metrics["total"]), float(metrics_ref["total"]), rtol=1e-4
    )
    l2 = jax.tree_util.tree_leaves(state2.params)
    l3 = jax.tree_util.tree_leaves(state3.params)
    for a, b in zip(l2, l3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_mesh_construction_helpers():
    mesh = mesh_lib.make_mesh(MeshConfig(data=-1, model=2))
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(MeshConfig(data=3, model=2))


def test_frozen_components_receive_exactly_zero_updates():
    """Freezing must stop ALL updates — including adamw weight decay and
    residual momentum (reference requires_grad=False semantics,
    model.py:240-247)."""
    cfg, model, batch, state, optimizer = _setup()
    step = make_train_step(model, cfg, optimizer, donate=False)
    rng = jax.random.PRNGKey(3)
    # warm steps WITHOUT freezing -> non-zero optimizer moments
    for i in range(2):
        state, _ = step(state, batch, jax.random.fold_in(rng, i))
    before = jax.device_get(state.params["variance_adaptor"]["encoder_pitch"])
    state, _ = step(state, batch, jax.random.fold_in(rng, 9),
                    frozen=("pitch",))
    after = jax.device_get(state.params["variance_adaptor"]["encoder_pitch"])
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # unfrozen components keep moving
    enc_before = jax.tree_util.tree_leaves(
        jax.device_get(state.params["encoder"]))
    state, _ = step(state, batch, jax.random.fold_in(rng, 10),
                    frozen=("pitch",))
    enc_after = jax.tree_util.tree_leaves(
        jax.device_get(state.params["encoder"]))
    assert any(
        not np.array_equal(a, b) for a, b in zip(enc_before, enc_after)
    )


def test_fit_restores_best_params_when_freezing():
    """fit() writes eval_fn-returned best snapshots back into the state
    before freezing (reference fastspeech2.py:1097-1115)."""
    from lightningfastspeech2_tpu.train.loop import fit
    from lightningfastspeech2_tpu.data.synthetic import make_corpus
    from lightningfastspeech2_tpu.data.dataset import DataConfig, TTSDataset
    from tests.test_end_to_end import small_train_config
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as tmp:
        corpus = make_corpus(Path(tmp) / "c", n_speakers=1, n_utts=4, seed=5)
        dcfg = DataConfig(
            variances=("pitch", "energy"), variance_levels=("phone", "frame"),
            variance_transforms=("none", "none"), augment_duration=0.0,
            speaker_type="dvector", stat_entries=4,
            max_phones=32, max_frames=256,
        )
        ds = TTSDataset(root=corpus, cfg=dcfg)
        cfg = small_train_config()
        cfg = C.replace(cfg, **{"train.eval_every": 2})

        snapshot = {}

        def eval_fn(step_i, state):
            # freeze pitch at a recognizable snapshot: all-zeros tree
            snap = jax.tree_util.tree_map(
                lambda x: np.zeros_like(np.asarray(x)),
                jax.device_get(state.params["variance_adaptor"]["encoder_pitch"]),
            )
            snapshot["tree"] = snap
            return ("pitch",), {"pitch": snap}

        result = fit(cfg, ds, max_steps=4, eval_fn=eval_fn)
        final = jax.device_get(
            result.state.params["variance_adaptor"]["encoder_pitch"]
        )
        # restored to the snapshot AND untouched by subsequent frozen steps
        for leaf in jax.tree_util.tree_leaves(final):
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.zeros_like(np.asarray(leaf)))

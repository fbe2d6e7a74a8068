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

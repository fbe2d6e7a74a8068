"""ZeRO-1 optimizer-state sharding: numerics match the replicated step and
the moments are actually sharded over the data axis."""

import jax
import jax.numpy as jnp
import numpy as np

from lightningfastspeech2_tpu.core.config import MeshConfig
from lightningfastspeech2_tpu.models.fastspeech2 import FastSpeech2, make_dummy_batch
from lightningfastspeech2_tpu.parallel import mesh as mesh_lib
from lightningfastspeech2_tpu.train.step import (
    create_train_state,
    make_train_step,
    shard_batch_for_mesh,
    shard_state_zero1,
    zero1_shardings,
)
from tests.test_model import tiny_config


def test_zero1_step_matches_replicated():
    assert jax.device_count() >= 8
    mesh = mesh_lib.make_mesh(MeshConfig(data=8, model=1))
    cfg = tiny_config()
    model = FastSpeech2(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in make_dummy_batch(cfg.model, 8, 8).items()}
    state, optimizer = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                          batch)

    # replicated baseline
    step_ref = make_train_step(model, cfg, optimizer, donate=False)
    s_ref, m_ref = step_ref(state, batch, jax.random.PRNGKey(3))

    # zero-1 path
    placed, shardings = shard_state_zero1(mesh, state)
    step_z1 = make_train_step(model, cfg, optimizer, mesh=mesh, donate=False,
                              zero1=True)
    sharded_batch = shard_batch_for_mesh(mesh, batch, accum_axis=False)
    with mesh:
        s_z1, m_z1 = step_z1(placed, sharded_batch, jax.random.PRNGKey(3))

    np.testing.assert_allclose(float(m_z1["total"]), float(m_ref["total"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_z1.params),
                    jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    # at least one optimizer moment is genuinely sharded over 'data'
    sharded_any = False
    for leaf in jax.tree_util.tree_leaves(s_z1.opt_state):
        if hasattr(leaf, "sharding") and leaf.sharding.spec and any(
            s == "data" for s in leaf.sharding.spec
        ):
            sharded_any = True
            break
    assert sharded_any, "no optimizer state leaf sharded over the data axis"


def test_zero1_shardings_structure():
    mesh = mesh_lib.make_mesh(MeshConfig(data=8, model=1))
    cfg = tiny_config()
    model = FastSpeech2(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in make_dummy_batch(cfg.model, 2, 8).items()}
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    shardings = zero1_shardings(mesh, state)
    # params replicated
    for s in jax.tree_util.tree_leaves(
        shardings.params, is_leaf=lambda x: hasattr(x, "spec")
    ):
        assert not any(ax == "data" for ax in (s.spec or ()))


def test_zero1_with_bf16_moments():
    """ZeRO-1 sharding composes with the bf16 first-moment option: the mu
    leaves are bf16 AND sharded over the data axis, and the step runs."""
    from lightningfastspeech2_tpu.core import config as C

    assert jax.device_count() >= 8
    mesh = mesh_lib.make_mesh(MeshConfig(data=8, model=1))
    cfg = C.replace(tiny_config(), **{"train.bf16_moments": True})
    model = FastSpeech2(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in make_dummy_batch(cfg.model, 8, 8).items()}
    state, optimizer = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                          batch)
    placed, _ = shard_state_zero1(mesh, state)
    step_z1 = make_train_step(model, cfg, optimizer, mesh=mesh, donate=False,
                              zero1=True)
    sharded_batch = shard_batch_for_mesh(mesh, batch, accum_axis=False)
    with mesh:
        s_z1, m_z1 = step_z1(placed, sharded_batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(m_z1["total"]))

    adam = [s for s in jax.tree_util.tree_leaves(
        s_z1.opt_state, is_leaf=lambda x: hasattr(x, "mu"))
        if hasattr(s, "mu")]
    assert adam
    mu_leaves = jax.tree_util.tree_leaves(adam[0].mu)
    assert all(l.dtype == jnp.bfloat16 for l in mu_leaves)
    assert any(
        hasattr(l, "sharding") and l.sharding.spec
        and any(s == "data" for s in l.sharding.spec)
        for l in mu_leaves
    ), "no bf16 mu leaf sharded over the data axis"

"""Async checkpointing (core/checkpoint.py use_async=True).

The write happens on a background thread; the ``latest`` marker must only
advance once the write committed (wait_until_finished / next save /
restore), so a crash mid-write leaves ``latest`` at the previous durable
checkpoint.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lightningfastspeech2_tpu.core.checkpoint import Checkpointer
from lightningfastspeech2_tpu.models.fastspeech2 import (
    FastSpeech2,
    make_dummy_batch,
)
from lightningfastspeech2_tpu.train.step import create_train_state
from tests.test_model import tiny_config


def _state():
    cfg = tiny_config()
    model = FastSpeech2(cfg.model)
    batch = {k: jnp.asarray(v)
             for k, v in make_dummy_batch(cfg.model, 2, 8).items()}
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    return cfg, state


def test_async_roundtrip_and_deferred_latest(tmp_path):
    cfg, state = _state()
    ck = Checkpointer(tmp_path / "ckpt", use_async=True)
    ck.save(3, state, cfg, {"phone2id": {"[PAD]": 0, "a": 1}})

    ck.wait_until_finished()
    marker = tmp_path / "ckpt" / "latest"
    assert marker.read_text() == "step_00000003"

    tree, cfg2, side = ck.restore()
    assert int(tree["step"]) == int(state.step)
    assert side["phone2id"]["a"] == 1
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(tree["params"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_back_to_back_async_saves_serialize(tmp_path):
    cfg, state = _state()
    ck = Checkpointer(tmp_path / "ckpt", use_async=True)
    # the second save must finalize the first (and publish its marker)
    # before starting; the final restore waits for the second
    ck.save(1, state, cfg)
    ck.save(2, state, cfg)
    tree, _, _ = ck.restore()
    assert (tmp_path / "ckpt" / "latest").read_text() == "step_00000002"
    assert int(tree["step"]) == int(state.step)
    # both step dirs are durable on disk
    assert (tmp_path / "ckpt" / "step_00000001" / "tree").exists()
    assert (tmp_path / "ckpt" / "step_00000002" / "tree").exists()


def test_restore_implicitly_waits(tmp_path):
    cfg, state = _state()
    ck = Checkpointer(tmp_path / "ckpt", use_async=True)
    ck.save(7, state, cfg)
    # no explicit wait: restore() must block until the write committed
    tree, _, _ = ck.restore()
    assert int(tree["step"]) == int(state.step)


def test_sync_mode_unchanged(tmp_path):
    cfg, state = _state()
    ck = Checkpointer(tmp_path / "ckpt")
    ck.save(4, state, cfg)
    # sync mode publishes the marker inside save()
    assert (tmp_path / "ckpt" / "latest").read_text() == "step_00000004"
    ck.wait_until_finished()  # no-op
    tree, _, _ = ck.restore()
    assert int(tree["step"]) == int(state.step)

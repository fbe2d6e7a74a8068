"""pjit'd training/eval steps.

The reference delegates the step loop to PyTorch Lightning
(reference ``fastspeech2.py:786-797`` + Trainer). Here the step is a single
jitted program over the ``('data','model')`` mesh: batch sharded over
``data``, params replicated (the 76M model fits per chip — BASELINE.json),
gradient all-reduce emitted by XLA from the sharding annotations, riding
ICI. Gradient accumulation (``--accumulate_grad_batches 12`` analog,
scripts/train.sh:7) is a ``lax.scan`` over a leading microbatch axis inside
the same program; donated state keeps HBM flat.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lightningfastspeech2_tpu.core.config import Config
from lightningfastspeech2_tpu.models.fastspeech2 import FastSpeech2
from lightningfastspeech2_tpu.train.losses import compute_losses
from lightningfastspeech2_tpu.train.optim import make_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(
    model: FastSpeech2, cfg: Config, rng: jax.Array, batch: Dict[str, jnp.ndarray]
) -> Tuple[TrainState, optax.GradientTransformation]:
    batch = _maybe_on_device_features(model, cfg, batch)
    init = jax.jit(lambda rngs, b: model.init(rngs, b, deterministic=True))
    variables = init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1),
         "sdp": jax.random.fold_in(rng, 2)},
        batch,
    )
    optimizer = make_optimizer(cfg.train)
    opt_state = optimizer.init(variables["params"])
    return (
        TrainState(variables["params"], opt_state, jnp.zeros((), jnp.int32)),
        optimizer,
    )


def _maybe_on_device_features(model, cfg, batch):
    if cfg.train.on_device_features and "wav" in batch and "mel" not in batch:
        from lightningfastspeech2_tpu.train.on_device_features import (
            augment_batch_with_features,
        )

        batch = augment_batch_with_features(batch, cfg, model.stats)
    return batch


def _zero_frozen_leaf(frozen: Tuple[str, ...]):
    """tree_map_with_path fn zeroing leaves under frozen components
    (variance encoders / the duration predictor)."""

    def fn(path, g):
        keys = "/".join(str(getattr(p, "key", p)) for p in path)
        for comp in frozen:
            if f"encoder_{comp}" in keys or (
                comp == "duration" and "duration_predictor" in keys
            ):
                return jnp.zeros_like(g)
        return g

    return fn


def _loss_fn(params, model, cfg, batch, rng, tf, frozen, schedule_p=None):
    batch = _maybe_on_device_features(model, cfg, batch)
    kwargs = {}
    if schedule_p is not None:
        # joint FastSpeech2+FastDiff model: epoch-indexed P(condition the
        # vocoder on predicted mel), traced so the schedule never retraces
        kwargs["schedule_p"] = schedule_p
    out = model.apply(
        {"params": params},
        batch,
        deterministic=False,
        tf=tf,
        rngs={"dropout": rng, "sdp": jax.random.fold_in(rng, 7)},
        **kwargs,
    )
    losses = compute_losses(out, batch, cfg, frozen)
    return losses["total"], losses


def make_train_step(
    model: FastSpeech2,
    cfg: Config,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    zero1: bool = False,
):
    """Returns jitted ``step(state, batch, rng) -> (state, metrics)``.

    ``batch`` arrays may have a leading microbatch axis (A, B, ...) for
    gradient accumulation; grads are averaged over microbatches before one
    optimizer update. Teacher forcing flag ``tf`` is static (two program
    variants at most).
    """

    def step(state: TrainState, batch, rng, tf: bool = True,
             frozen: Tuple[str, ...] = (), schedule_p=None):
        accum = batch["phones"].ndim == 3  # leading microbatch axis

        grad_fn = jax.grad(_loss_fn, has_aux=True)

        if accum:
            n_micro = batch["phones"].shape[0]

            def micro(carry, xs):
                grads_acc, losses_acc = carry
                mb, r = xs
                grads, losses = grad_fn(
                    state.params, model, cfg, mb, r, tf, frozen, schedule_p
                )
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                losses_acc = jax.tree_util.tree_map(jnp.add, losses_acc, losses)
                return (grads_acc, losses_acc), None

            zero_grads = jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p), state.params
            )
            mb0 = jax.tree_util.tree_map(lambda x: x[0], batch)
            rngs = jax.random.split(rng, n_micro)
            (grads0, losses0) = grad_fn(state.params, model, cfg, mb0, rngs[0],
                                        tf, frozen, schedule_p)
            rest = jax.tree_util.tree_map(lambda x: x[1:], batch)
            (grads, losses), _ = jax.lax.scan(
                micro, (grads0, losses0), (rest, rngs[1:])
            )
            grads = jax.tree_util.tree_map(lambda g: g / n_micro, grads)
            losses = jax.tree_util.tree_map(lambda l: l / n_micro, losses)
        else:
            grads, losses = grad_fn(state.params, model, cfg, batch, rng, tf,
                                    frozen, schedule_p)

        if frozen:
            # freeze component params entirely (reference sets
            # requires_grad=False, model.py:240-247): zero their grads AND
            # their post-optimizer updates — adamw otherwise still applies
            # weight decay (and residual momentum) to zero-grad params
            grads = jax.tree_util.tree_map_with_path(
                _zero_frozen_leaf(frozen), grads
            )

        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        if frozen:
            updates = jax.tree_util.tree_map_with_path(
                _zero_frozen_leaf(frozen), updates
            )
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    donate_args = (0,) if donate else ()
    if mesh is not None:
        replicated = NamedSharding(mesh, P())
        if zero1:
            # ZeRO-1: optimizer state stays sharded over the data axis.
            # The jitted fn is built ONCE, on first call (out_shardings
            # need the state's tree structure) — jit's own cache then
            # handles the tf/frozen variants without retracing per step.
            cache: Dict[str, Any] = {}

            def jitted(state, batch, rng, tf=True, frozen=(), schedule_p=None):
                if "fn" not in cache:
                    shardings = zero1_shardings(mesh, state)
                    cache["fn"] = jax.jit(
                        step, static_argnames=("tf", "frozen"),
                        donate_argnums=donate_args,
                        out_shardings=(shardings, replicated),
                    )
                return cache["fn"](state, batch, rng, tf=tf, frozen=frozen,
                                   schedule_p=schedule_p)

            return jitted
        # state and metrics replicated; the batch arrives data-sharded via
        # shard_batch_for_mesh and XLA inserts the gradient all-reduce
        return jax.jit(
            step,
            static_argnames=("tf", "frozen"),
            donate_argnums=donate_args,
            out_shardings=(replicated, replicated),
        )
    return jax.jit(step, static_argnames=("tf", "frozen"), donate_argnums=donate_args)


def zero1_shardings(mesh: Mesh, state: TrainState):
    """ZeRO-1-style sharding tree for a TrainState: params replicated,
    optimizer moments sharded over the ``data`` axis on their largest
    divisible dimension (SURVEY.md §2.8 "cheap insurance"). XLA then
    computes the AdamW update shard-wise and all-gathers only the updates —
    the classic ZeRO-1 communication pattern — with per-chip optimizer
    memory cut by the data-axis size."""
    n_data = mesh.devices.shape[0]
    replicated = NamedSharding(mesh, P())

    def opt_leaf(x):
        shape = getattr(x, "shape", ())
        for dim, size in enumerate(shape):
            if size % n_data == 0 and size >= n_data:
                spec = [None] * len(shape)
                spec[dim] = "data"
                return NamedSharding(mesh, P(*spec))
        return replicated

    return TrainState(
        params=jax.tree_util.tree_map(lambda _: replicated, state.params),
        opt_state=jax.tree_util.tree_map(opt_leaf, state.opt_state),
        step=replicated,
    )


def shard_state_zero1(mesh: Mesh, state: TrainState) -> Tuple[TrainState, Any]:
    """Place a TrainState according to zero1_shardings; returns (state,
    shardings) — pass the shardings as the train step's out_shardings."""
    shardings = zero1_shardings(mesh, state)
    placed = jax.tree_util.tree_map(jax.device_put, state, shardings)
    return placed, shardings


def make_eval_step(model: FastSpeech2, cfg: Config, mesh: Optional[Mesh] = None):
    """Teacher-forced loss pass + free-running forward (reference
    validation_step, ``fastspeech2.py:799-827``).

    With ``mesh`` the eval program runs data-sharded over the mesh like the
    training step (the reference evaluates under the same DDP strategy as
    training, sync_dist=True at fastspeech2.py:802-807) — callers shard the
    batch via ``shard_batch_for_mesh``; outputs come back replicated.

    Returns ``(losses, out, out_inf, feat_batch)`` — ``feat_batch`` is the
    batch after on-device feature extraction (identical to the input batch
    when ``on_device_features`` is off), so callers can read ``mel`` /
    ``variances_*`` targets in raw-wav mode too."""

    jit_kwargs = {}
    if mesh is not None:
        replicated = NamedSharding(mesh, P())
        jit_kwargs["out_shardings"] = replicated

    @functools.partial(jax.jit, **jit_kwargs)
    def step(params, batch, rng=None):
        rng = jax.random.PRNGKey(0) if rng is None else rng
        rngs = {"sdp": rng}
        batch = _maybe_on_device_features(model, cfg, batch)
        out = model.apply({"params": params}, batch, deterministic=True,
                          rngs=rngs)
        losses = compute_losses(out, batch, cfg)
        out_inf = model.apply(
            {"params": params}, batch, inference=True, deterministic=True,
            rngs=rngs,
        )
        return losses, out, out_inf, batch

    return step


def shard_batch_for_mesh(mesh: Mesh, batch, accum_axis: bool):
    """Place host batch on the mesh: data-sharded over the (micro)batch
    dim.

    Single-process: ``device_put`` (the host array IS the global batch).
    Multi-process: each host's array is its LOCAL shard (the host-sharded
    input pipeline gives every process different entries —
    data/dataset.py shard_across_hosts), so the global array is assembled
    via ``make_array_from_process_local_data``; ``device_put`` here would
    wrongly treat the local shard as the full global batch."""
    import numpy as np

    spec = P(None, "data") if accum_axis else P("data")
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)

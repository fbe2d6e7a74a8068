"""Host-side training loop: dataset -> bucketed batches -> pjit'd steps.

Replaces the reference's Lightning ``Trainer.fit`` spine
(reference ``litfass/train.py:285-292``). Deliberately thin: batching and
sharding are explicit, metrics go to a pluggable logger
(train/metrics_logger.py), checkpoints via core/checkpoint.py.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import jax
import numpy as np

from lightningfastspeech2_tpu.core.bucketing import Bucketer
from lightningfastspeech2_tpu.core.config import Config
from lightningfastspeech2_tpu.data.dataset import TTSDataset
from lightningfastspeech2_tpu.models.fastspeech2 import FastSpeech2
from lightningfastspeech2_tpu.models.variance_adaptor import VarianceStats
from lightningfastspeech2_tpu.train.step import (
    create_train_state,
    make_train_step,
    shard_batch_for_mesh,
)


def stats_tree(dataset: TTSDataset, names) -> Tuple[Tuple[str, VarianceStats], ...]:
    out = []
    for name in names:
        s = (dataset.stats or {}).get(name)
        out.append(
            (
                name,
                VarianceStats(**s) if s else VarianceStats(),
            )
        )
    return tuple(out)


def prior_stats_tree(dataset: TTSDataset, priors):
    out = []
    for name in priors:
        s = (dataset.stats or {}).get(f"priors_{name}")
        out.append((name, VarianceStats(**s) if s else VarianceStats()))
    return tuple(out)


def build_model(cfg: Config, dataset: TTSDataset, dtype=None) -> FastSpeech2:
    """Assemble the model against the dataset's vocab and statistics."""
    import jax.numpy as jnp
    from lightningfastspeech2_tpu.core import config as C

    mcfg = cfg.model
    vocab_size = max(len(dataset.vocab), 2)
    if mcfg.vocab_size != vocab_size:
        mcfg = C.replace(mcfg, vocab_size=vocab_size)
    return FastSpeech2(
        mcfg,
        stats=stats_tree(dataset, mcfg.variance.variances),
        prior_stats=prior_stats_tree(dataset, mcfg.priors),
        dtype=dtype or (jnp.bfloat16 if cfg.train.bf16 else jnp.float32),
    )


def batch_iterator(
    dataset: TTSDataset,
    batch_size: int,
    bucketer: Optional[Bucketer] = None,
    shuffle: bool = True,
    seed: int = 0,
    epochs: Optional[int] = None,
    sort_by_length: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yields collated numpy batches forever (or for ``epochs``)."""
    n = len(dataset)
    if n < batch_size:
        # without this, next() on the generator blocks forever
        raise ValueError(
            f"dataset has {n} usable utterances but batch_size={batch_size}; "
            "check the corpus path / length filters"
        )
    order = np.arange(n)
    if sort_by_length:
        lengths = np.asarray([int(e.durations.sum()) for e in dataset.entries])
        order = np.argsort(lengths)
    epoch = 0
    rng = np.random.default_rng(seed)
    while epochs is None or epoch < epochs:
        idx = order.copy()
        if shuffle and not sort_by_length:
            rng.shuffle(idx)
        elif shuffle:
            # shuffle whole batches, keep length-local ordering
            starts = np.arange(0, n, batch_size)
            rng.shuffle(starts)
            idx = np.concatenate([order[s : s + batch_size] for s in starts])
        for s in range(0, n - batch_size + 1, batch_size):
            items = [dataset[int(i)] for i in idx[s : s + batch_size]]
            yield dataset.collate(items, bucketer)
        epoch += 1


class StopTraining(Exception):
    """Raised by an eval_fn to end training early (EarlyStopping analog,
    reference train.py:275-280)."""


@dataclass
class TrainResult:
    state: Any
    history: List[Dict[str, float]]


def evaluate(
    cfg: Config,
    dataset: TTSDataset,
    model: FastSpeech2,
    params,
    max_batches: int = 8,
) -> Dict[str, float]:
    """Validation pass (reference validation_step + epoch end,
    ``fastspeech2.py:799-827,998-1163``): teacher-forced losses + inference
    forward, then KDE-JS / MAE / soft-DTW metrics."""
    import jax.numpy as jnp

    from lightningfastspeech2_tpu.train.metrics import eval_metrics
    from lightningfastspeech2_tpu.train.step import make_eval_step

    bucketer = Bucketer(cfg.model.max_phones, cfg.model.max_frames)
    eval_step = make_eval_step(model, cfg)
    it = batch_iterator(dataset, cfg.train.batch_size, bucketer,
                        shuffle=False, epochs=1)
    accum: Dict[str, List[np.ndarray]] = {}
    losses_sum: Dict[str, float] = {}
    n_batches = 0
    variances = cfg.model.variance.variances
    for batch in it:
        if n_batches >= max_batches:
            break
        arrs = {k: jnp.asarray(v) for k, v in batch.items()
                if isinstance(v, np.ndarray)}
        losses, out, out_inf = eval_step(params, arrs)
        n_batches += 1
        for k, v in losses.items():
            losses_sum[k] = losses_sum.get(k, 0.0) + float(v)
        phone_mask = np.asarray(out["phone_mask"])
        frame_mask_inf = np.asarray(out_inf["frame_mask"])
        for i, var in enumerate(variances):
            if cfg.model.variance.transforms[i] == "cwt":
                continue  # distribution metrics use the scalar signals
            mask = (
                phone_mask if cfg.model.variance.levels[i] == "phone"
                else frame_mask_inf
            )
            pred = np.asarray(out_inf[f"variances_{var}"])
            true_full = np.asarray(batch[f"variances_{var}"])
            true_mask = (
                phone_mask if cfg.model.variance.levels[i] == "phone"
                else np.asarray(out["frame_mask"])
            )
            accum.setdefault(f"{var}_pred", []).append(pred[mask])
            accum.setdefault(f"{var}_true", []).append(
                true_full[:, : true_mask.shape[1]][true_mask]
            )
        accum.setdefault("duration_pred", []).append(
            np.asarray(out_inf["duration_rounded"])[phone_mask]
        )
        accum.setdefault("duration_true", []).append(
            np.asarray(batch["duration"])[:, : phone_mask.shape[1]][phone_mask]
        )
        mel_pred = np.asarray(out["mel"])
        mel_true = np.asarray(batch["mel"])
        tf_mask = np.asarray(out["frame_mask"])
        for b in range(mel_pred.shape[0]):
            accum.setdefault("mel_pred", []).append(mel_pred[b][tf_mask[b]])
            accum.setdefault("mel_true", []).append(
                mel_true[b][: tf_mask[b].sum()]
            )
    metrics = eval_metrics(accum, variances)
    for k, v in losses_sum.items():
        metrics[f"eval/{k}_loss"] = v / max(n_batches, 1)
    return metrics


def fit(
    cfg: Config,
    dataset: TTSDataset,
    max_steps: Optional[int] = None,
    mesh=None,
    log_fn: Optional[Callable[[int, Dict[str, float]], None]] = None,
    checkpoint_fn: Optional[Callable[[int, Any], None]] = None,
    eval_fn: Optional[Callable[[int, Any], Tuple]] = None,
    state=None,
) -> TrainResult:
    import jax.numpy as jnp

    model = build_model(cfg, dataset)
    bucketer = Bucketer(cfg.model.max_phones, cfg.model.max_frames)
    max_steps = max_steps or cfg.train.max_steps

    batches = batch_iterator(
        dataset, cfg.train.batch_size * max(cfg.train.grad_accum, 1), bucketer,
        seed=cfg.train.seed,
    )
    first = next(batches)
    init_batch = {k: jnp.asarray(v) for k, v in first.items()
                  if isinstance(v, np.ndarray)}
    if cfg.train.grad_accum > 1:
        init_batch = jax.tree_util.tree_map(
            lambda x: x[: cfg.train.batch_size], init_batch
        )

    if state is None:
        state, optimizer = create_train_state(
            model, cfg, jax.random.PRNGKey(cfg.train.seed), init_batch
        )
    else:
        from lightningfastspeech2_tpu.train.optim import make_optimizer

        optimizer = make_optimizer(cfg.train)
    # donate the state buffers: the previous step's params/opt-state are
    # dead after each update, halving peak HBM for the optimizer tree
    step_fn = make_train_step(model, cfg, optimizer, mesh=mesh, donate=True)

    rng = jax.random.PRNGKey(cfg.train.seed + 1)
    history: List[Dict[str, float]] = []
    accum = max(cfg.train.grad_accum, 1)
    batch = first
    frozen: Tuple[str, ...] = ()
    t_start = time.time()
    for step_i in range(max_steps):
        arrs = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        if accum > 1:
            arrs = {
                k: v.reshape((accum, cfg.train.batch_size) + v.shape[1:])
                for k, v in arrs.items()
            }
        if mesh is not None:
            arrs = shard_batch_for_mesh(mesh, arrs, accum_axis=accum > 1)
        tf = True
        if cfg.model.tf_ratio < 1.0:
            # teacher-forcing draw per step (model.py:272); static bool ->
            # at most two compiled programs
            tf = bool(np.random.default_rng(cfg.train.seed + step_i).uniform()
                      <= cfg.model.tf_ratio)
        state, metrics = step_fn(
            state, arrs, jax.random.fold_in(rng, step_i), tf=tf, frozen=frozen
        )
        if (step_i % cfg.train.log_every == 0) or step_i == max_steps - 1:
            snap = {k: float(v) for k, v in metrics.items()}
            snap["steps_per_s"] = (step_i + 1) / (time.time() - t_start)
            from lightningfastspeech2_tpu.train.optim import noam_schedule

            snap["lr"] = float(
                noam_schedule(cfg.train.lr, cfg.train.warmup_steps)(step_i + 1)
            )
            history.append(snap)
            if log_fn:
                log_fn(step_i, snap)
        if checkpoint_fn and (step_i + 1) % cfg.train.checkpoint_every == 0:
            checkpoint_fn(step_i, state)
        if eval_fn and (step_i + 1) % cfg.train.eval_every == 0:
            # eval_fn may return a new frozen-components tuple (variance
            # early stopping); recompile happens at most once per change
            try:
                new_frozen = eval_fn(step_i, state)
            except StopTraining:
                break
            if new_frozen:
                frozen = tuple(new_frozen)
        batch = next(batches)
    return TrainResult(state=state, history=history)

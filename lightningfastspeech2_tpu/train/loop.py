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
    """Assemble the model against the dataset's vocab and statistics.
    With ``cfg.model.fastdiff_vocoder`` the returned module is the joint
    acoustic+FastDiff wrapper (reference wires the vocoder inside the
    LightningModule, fastspeech2.py:390-411)."""
    import jax.numpy as jnp
    from lightningfastspeech2_tpu.core import config as C

    mcfg = cfg.model
    vocab_size = max(len(dataset.vocab), 2)
    if mcfg.vocab_size != vocab_size:
        mcfg = C.replace(mcfg, vocab_size=vocab_size)
    dtype = dtype or (jnp.bfloat16 if cfg.train.bf16 else jnp.float32)
    common = dict(
        stats=stats_tree(dataset, mcfg.variance.variances),
        prior_stats=prior_stats_tree(dataset, mcfg.priors),
        dtype=dtype,
    )
    if mcfg.fastdiff_vocoder:
        from lightningfastspeech2_tpu.models.joint import (
            JointFastSpeech2FastDiff,
            make_fastdiff_config,
        )

        return JointFastSpeech2FastDiff(
            mcfg, fastdiff_cfg=make_fastdiff_config(mcfg), **common
        )
    return FastSpeech2(mcfg, **common)


def batch_iterator(
    dataset: TTSDataset,
    batch_size: int,
    bucketer: Optional[Bucketer] = None,
    shuffle: bool = True,
    seed: int = 0,
    epochs: Optional[int] = None,
    sort_by_length: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yields collated numpy batches forever (or for ``epochs``),
    synchronously. For a prefetched multiprocess pipeline use
    ``data.loader.PrefetchLoader`` (same batch order)."""
    from lightningfastspeech2_tpu.data.loader import batch_index_stream

    lengths = None
    if sort_by_length:
        lengths = np.asarray([int(e.durations.sum()) for e in dataset.entries])
    for idx in batch_index_stream(
        len(dataset), batch_size, shuffle, seed, epochs, lengths
    ):
        items = [dataset[i] for i in idx]
        yield dataset.collate(items, bucketer)


class StopTraining(Exception):
    """Raised by an eval_fn to end training early (EarlyStopping analog,
    reference train.py:275-280)."""


def local_batch_size(cfg: Config) -> int:
    """Per-host batch size: ``cfg.train.batch_size`` is the GLOBAL
    per-step batch; under multi-host each process loads its share (the
    dataset is host-sharded via shard_across_hosts and the global array
    is assembled in shard_batch_for_mesh)."""
    import jax

    if jax.process_count() > 1:
        from lightningfastspeech2_tpu.parallel.mesh import (
            host_local_batch_size,
        )

        return host_local_batch_size(cfg.train.batch_size)
    return cfg.train.batch_size


def restore_encoder_params(params, restores: Dict[str, Any]):
    """Write best variance-encoder snapshots back into a param tree before
    freezing (reference load_state_dict of {key}_encoder_best.pt,
    fastspeech2.py:1097-1115). Handles the joint model's ``acoustic``
    nesting transparently."""
    params = dict(params)
    if "acoustic" in params and "variance_adaptor" not in params:
        params["acoustic"] = restore_encoder_params(
            params["acoustic"], restores
        )
        return params
    adaptor = dict(params.get("variance_adaptor", {}))
    for var, snap in restores.items():
        if snap is None:
            continue
        key = ("duration_predictor" if var == "duration"
               else f"encoder_{var}")
        if key in adaptor:
            adaptor[key] = snap
    params["variance_adaptor"] = adaptor
    return params


@dataclass
class TrainResult:
    state: Any
    history: List[Dict[str, float]]
    # stochastic-weight-averaged params when cfg.train.swa is on
    # (reference train.py:282-283 StochasticWeightAveraging callback)
    swa_params: Any = None


def evaluate(
    cfg: Config,
    dataset: TTSDataset,
    model: FastSpeech2,
    params,
    max_batches: int = 8,
    media_dir=None,
    step: int = 0,
    vocoder=None,
    max_examples: int = 10,
    mesh=None,
) -> Dict[str, float]:
    """Validation pass (reference validation_step + epoch end,
    ``fastspeech2.py:799-827,998-1163``): teacher-forced losses + inference
    forward, then KDE-JS / MAE / soft-DTW metrics. With ``mesh`` the eval
    forward runs data-sharded over the same mesh as training."""
    import jax.numpy as jnp

    from lightningfastspeech2_tpu.train.metrics import eval_metrics
    from lightningfastspeech2_tpu.train.step import make_eval_step

    bucketer = Bucketer(cfg.model.max_phones, cfg.model.max_frames)
    eval_step = make_eval_step(model, cfg, mesh=mesh)
    it = batch_iterator(dataset, local_batch_size(cfg), bucketer,
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
        if mesh is not None:
            arrs = shard_batch_for_mesh(mesh, arrs, accum_axis=False)
        losses, out, out_inf, feat_b = eval_step(params, arrs)
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
            # feat_b carries the targets in raw-wav mode too
            true_full = np.asarray(feat_b[f"variances_{var}"])
            true_mask = (
                phone_mask if cfg.model.variance.levels[i] == "phone"
                else np.asarray(out["frame_mask"])
            )
            accum.setdefault(f"{var}_pred", []).append(pred[mask])
            accum.setdefault(f"{var}_true", []).append(
                true_full[:, : true_mask.shape[1]][true_mask]
            )
            # teacher-forced predictions share the target's frame grid —
            # MAE uses these aligned pairs (reference compares same-length
            # teacher-forced tensors, fastspeech2.py:1024-1056)
            pred_tf = np.asarray(out[f"variances_{var}"])
            accum.setdefault(f"{var}_pred_tf", []).append(
                pred_tf[:, : true_mask.shape[1]][true_mask]
            )
        accum.setdefault("duration_pred", []).append(
            np.asarray(out_inf["duration_rounded"])[phone_mask]
        )
        accum.setdefault("duration_true", []).append(
            np.asarray(batch["duration"])[:, : phone_mask.shape[1]][phone_mask]
        )
        mel_pred = np.asarray(out["mel"])
        mel_true = np.asarray(feat_b["mel"])
        tf_mask = np.asarray(out["frame_mask"])
        for b in range(mel_pred.shape[0]):
            accum.setdefault("mel_pred", []).append(mel_pred[b][tf_mask[b]])
            accum.setdefault("mel_true", []).append(
                mel_true[b][: tf_mask[b].sum()]
            )
    metrics = eval_metrics(accum, variances)
    for k, v in losses_sum.items():
        metrics[f"eval/{k}_loss"] = v / max(n_batches, 1)
    if media_dir is not None and jax.process_index() == 0:
        # pred/true spectrogram pngs (+ vocoded audio when a vocoder is
        # given), host-0 only — the reference logs these to wandb every
        # eval (fastspeech2.py:809-957,998-1011)
        from lightningfastspeech2_tpu.utils.plotting import save_eval_examples

        mels_pred = accum.get("mel_pred", [])[:max_examples]
        mels_true = accum.get("mel_true", [])[:max_examples]
        audios = None
        if vocoder is not None:
            audios = [
                np.asarray(vocoder(m), np.float32).reshape(-1) / 32768.0
                for m in mels_pred
            ]
        save_eval_examples(
            media_dir, step, mels_pred, mels_true, audios,
            sampling_rate=cfg.model.audio.sampling_rate,
            max_examples=max_examples,
        )
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

    if cfg.train.fast_prng:
        from lightningfastspeech2_tpu.core.compile_cache import enable_fast_prng

        enable_fast_prng()

    model = build_model(cfg, dataset)
    bucketer = Bucketer(cfg.model.max_phones, cfg.model.max_frames)
    max_steps = max_steps or cfg.train.max_steps
    local_bs = local_batch_size(cfg)

    loader = None
    if cfg.train.num_workers > 0:
        from lightningfastspeech2_tpu.data.loader import PrefetchLoader

        loader = PrefetchLoader(
            dataset, local_bs * max(cfg.train.grad_accum, 1),
            bucketer, seed=cfg.train.seed,
            num_workers=cfg.train.num_workers, prefetch=cfg.train.prefetch,
        )
        batches = iter(loader)
    else:
        batches = batch_iterator(
            dataset, local_bs * max(cfg.train.grad_accum, 1),
            bucketer, seed=cfg.train.seed,
        )
    first = next(batches)
    init_batch = {k: jnp.asarray(v) for k, v in first.items()
                  if isinstance(v, np.ndarray)}
    if cfg.train.grad_accum > 1:
        init_batch = jax.tree_util.tree_map(
            lambda x: x[:local_bs], init_batch
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
    zero1 = cfg.train.zero1 and mesh is not None
    step_fn = make_train_step(model, cfg, optimizer, mesh=mesh, donate=True,
                              zero1=zero1)
    if zero1:
        from lightningfastspeech2_tpu.train.step import shard_state_zero1

        state, _ = shard_state_zero1(mesh, state)
    elif mesh is not None and jax.process_count() > 1:
        # locally-initialized state must be explicitly replicated over the
        # global mesh before the first multi-host step (committed local
        # arrays can't feed a cross-process jit)
        from lightningfastspeech2_tpu.parallel.mesh import replicate

        state = replicate(mesh, state)

    rng = jax.random.PRNGKey(cfg.train.seed + 1)
    history: List[Dict[str, float]] = []
    accum = max(cfg.train.grad_accum, 1)
    batch = first
    frozen: Tuple[str, ...] = ()
    t_start = time.time()
    try:
        return _fit_loop(
            cfg, model, state, step_fn, batches, batch, rng, frozen,
            history, accum, max_steps, mesh, t_start,
            log_fn, checkpoint_fn, eval_fn, len(dataset),
        )
    finally:
        if loader is not None:
            loader.close()


def _fit_loop(cfg, model, state, step_fn, batches, batch, rng, frozen,
              history, accum, max_steps, mesh, t_start,
              log_fn, checkpoint_fn, eval_fn, len_dataset=1) -> TrainResult:
    import jax.numpy as jnp

    swa = None
    if cfg.train.swa:
        from lightningfastspeech2_tpu.train.swa import SWA

        swa = SWA(start_step=int(max_steps * cfg.train.swa_start_pct))
    schedule_fn = None
    if cfg.model.fastdiff_vocoder:
        # epoch-indexed P(condition vocoder on predicted mel) (reference
        # fastspeech2.py:403-411); passed traced so epochs never retrace
        from lightningfastspeech2_tpu.models.joint import schedule_probability

        steps_per_epoch = max(
            len_dataset // (cfg.train.batch_size * max(cfg.train.grad_accum, 1)),
            1,
        )
        schedule_fn = lambda s: jnp.asarray(
            schedule_probability(cfg.model, s // steps_per_epoch), jnp.float32
        )
    rate_anchor = (0, t_start)
    for step_i in range(max_steps):
        arrs = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
        if accum > 1:
            # batches are host-local: under multi-host each process loads
            # batch_size/process_count items per microbatch
            arrs = {
                k: v.reshape((accum, local_batch_size(cfg)) + v.shape[1:])
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
        kwargs = {}
        if schedule_fn is not None:
            kwargs["schedule_p"] = schedule_fn(step_i)
        state, metrics = step_fn(
            state, arrs, jax.random.fold_in(rng, step_i), tf=tf,
            frozen=frozen, **kwargs,
        )
        if swa is not None:
            swa.update(step_i, state.params)
        if (step_i % cfg.train.log_every == 0) or step_i == max_steps - 1:
            snap = {k: float(v) for k, v in metrics.items()}
            # interval rate, not lifetime average: a lifetime number stays
            # diluted by startup compiles for thousands of steps (round-4
            # campaign read 4.3 when the loop was doing 24)
            now = time.time()
            prev_step, prev_t = rate_anchor
            snap["steps_per_s"] = (step_i + 1 - prev_step) / max(
                now - prev_t, 1e-9)
            rate_anchor = (step_i + 1, now)
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
            # early stopping), optionally paired with {var: best encoder
            # params} to restore before freezing (reference reloads the
            # best state_dict, fastspeech2.py:1097-1115); recompile happens
            # at most once per change
            try:
                ret = eval_fn(step_i, state)
            except StopTraining:
                break
            restores = {}
            if (isinstance(ret, tuple) and len(ret) == 2
                    and isinstance(ret[1], dict)):
                new_frozen, restores = ret
            else:
                new_frozen = ret
            if restores:
                state = state._replace(
                    params=restore_encoder_params(state.params, restores)
                )
            if new_frozen:
                frozen = tuple(new_frozen)
        batch = next(batches)
    return TrainResult(state=state, history=history,
                       swa_params=None if swa is None else swa.params)

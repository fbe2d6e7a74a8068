"""Optimizer & LR schedule (reference ``litfass/fastspeech2/noam.py``,
``fastspeech2.py:1166-1182``): AdamW(lr, betas=(0.9,0.98), wd=0.01) under a
Noam warmup schedule stepped per optimizer step, plus global-norm gradient
clipping (Lightning ``gradient_clip_val`` analog).
"""

from __future__ import annotations

import optax

from lightningfastspeech2_tpu.core.config import TrainConfig


def noam_schedule(base_lr: float, warmup_steps: int) -> optax.Schedule:
    """lr(step) = base_lr * warmup^0.5 * min(s^-0.5, s * warmup^-1.5),
    s = max(step, 1) (reference noam.py:20-25)."""

    def schedule(count):
        import jax.numpy as jnp

        s = jnp.maximum(count, 1).astype(jnp.float32)
        scale = warmup_steps**0.5 * jnp.minimum(
            s**-0.5, s * warmup_steps**-1.5
        )
        return base_lr * scale

    return schedule


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    import jax.numpy as jnp

    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=noam_schedule(cfg.lr, cfg.warmup_steps),
            b1=cfg.betas[0],
            b2=cfg.betas[1],
            eps=cfg.eps,
            weight_decay=cfg.weight_decay,
            # bf16 first moment cuts optimizer-state HBM + per-step
            # traffic by a third (update math still runs f32)
            mu_dtype=jnp.bfloat16 if getattr(cfg, "bf16_moments", False)
            else None,
        ),
    )

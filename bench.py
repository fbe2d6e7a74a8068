#!/usr/bin/env python
"""Headline benchmark: audio-seconds of mel synthesized per second per chip.

The reference publishes no throughput numbers (BASELINE.md) — round 1
*established* the baseline (22,527.75 audio-s/s/chip, BENCH_r01.json) and
``vs_baseline`` is measured against it from round 2 on.

Workloads (all flagship multi-speaker LightSpeech, bf16, batch 8 x 2048
frames = 190.5 audio-seconds per step at hop 256 / 22.05 kHz):
  1. headline: teacher-forced forward filling the full frame bucket (100%
     frame utilization) — mel-generation compute ceiling,
  2. inference-mode forward: predicted durations -> rounding + rescue ->
     length-regulate (the real synthesis acoustic path),
  3. HiFi-GAN V1 mel->wav vocoder throughput (+bf16, +fused Pallas),
  3b. FastDiff N=4 mel->wav throughput (+bf16),
  3c. end-to-end serving chain (acoustic -> fused HiFi-GAN bf16, one
      dispatch; + FastDiff N=4 variant; + realistic-length T=512 bucket),
  3d. scale rows with measured n_params: vanilla-conv FastSpeech2 (35.0M),
      true-76M LightSpeech (76.6M), canonical joint composition (28.8M),
  4. training step (fwd+bwd+AdamW) time.

FAIL-SOFT CONTRACT (round-3 hardening; the round-2 bench lost all its
already-measured workloads when the training step hit a Pallas VMEM
overflow): every workload runs under its own try/except; a failure is
recorded in ``extra["<name>_error"]`` and the workload is retried ONCE
with all Pallas kernels disabled (LFS2_USE_PALLAS=0 etc. — the gates
read the env at trace time and each retry rebuilds its jitted closures,
so the flip takes effect).  The final JSON line ALWAYS prints, even if
setup itself dies.

Prints ONE JSON line; the extra workloads ride in the same object under
"extra" so the driver's single-line parser still sees metric/value/unit/
vs_baseline.
"""

import contextlib
import json
import os
import re
import sys
import time
import traceback

BASELINE_AUDIO_S_PER_S = 22527.75  # round-1 record (BENCH_r01.json)

PALLAS_ENV_FLAGS = ("LFS2_USE_PALLAS", "LFS2_FUSED_FFN", "LFS2_PALLAS_LR")

# ANSI escapes + control chars: tunnel-runtime log text can leak into
# exception messages, and round 4 lost its official record when escape
# bytes inside an error string made the JSON line unparseable
_CTRL_RE = re.compile(r"\x1b\[[0-9;?]*[A-Za-z]|[\x00-\x08\x0b-\x1f\x7f]")


def _errstr(e: BaseException) -> str:
    tb = traceback.format_exception_only(type(e), e)
    return _CTRL_RE.sub("", ("".join(tb)).strip())[:600]


@contextlib.contextmanager
def _pallas_disabled():
    """Force every Pallas kernel gate off for the duration of the block.

    All gates (ops/kernel_gate.py, models/layers.py _flash_ok /
    _fused_ffn_ok, ops/length_regulator.py) read their env var at trace
    time; combined with fresh jitted closures per retry this reliably
    routes the retried workload through the XLA fallback paths."""
    from lightningfastspeech2_tpu.ops import kernel_gate

    saved = {k: os.environ.get(k) for k in PALLAS_ENV_FLAGS}
    for k in PALLAS_ENV_FLAGS:
        os.environ[k] = "0"
    kernel_gate.reset_cache()
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        kernel_gate.reset_cache()


def _chain_run(fn, state0, iters):
    """Timed loop with a data-dependency carry and ONE final host read —
    the remote-TPU tunnel acks dispatches before execution completes, so
    naive block_until_ready undercounts."""
    carry = state0
    t0 = time.perf_counter()
    for _ in range(iters):
        carry = fn(carry)
    _ = float(carry[0] if hasattr(carry, "shape") and carry.shape else carry)
    return time.perf_counter() - t0


def _rate(fn, state0, iters, audio_seconds):
    lat = min(_chain_run(fn, state0, 1), _chain_run(fn, state0, 1))
    total = _chain_run(fn, state0, iters)
    dt = max(total - lat, 1e-9) / max(iters - 1, 1)
    return audio_seconds / dt, dt


def _setup():
    """Shared model/params/batch for workloads 1/2/4. May raise."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightningfastspeech2_tpu.core import config as C
    from lightningfastspeech2_tpu.models.fastspeech2 import (
        FastSpeech2,
        make_dummy_batch,
    )

    B = int(os.environ.get("BENCH_BATCH", 8))
    P = int(os.environ.get("BENCH_PHONES", 256))
    T = int(os.environ.get("BENCH_FRAMES", 2048))
    iters = int(os.environ.get("BENCH_ITERS", 50))

    cfg = C.lightspeech_flagship()
    mcfg = C.replace(cfg.model, max_phones=P, max_frames=T)
    model = FastSpeech2(mcfg, dtype=jnp.bfloat16)

    n_valid = P - 16
    batch = make_dummy_batch(mcfg, batch_size=B, n_phones=n_valid)
    # teacher durations exactly fill the frame bucket -> 100% frame
    # utilization, every batch item synthesizes T frames of audio
    per = T // n_valid
    rem = T - per * n_valid
    dur = np.zeros((B, P), dtype=np.int32)
    dur[:, :n_valid] = per
    dur[:, :rem] += 1
    batch["duration"] = dur
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    init = jax.jit(lambda rngs, b: model.init(rngs, b, deterministic=True))
    params = init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "sdp": jax.random.PRNGKey(2)},
        batch,
    )

    hop, sr = mcfg.audio.hop_length, mcfg.audio.sampling_rate
    return dict(
        cfg=cfg, mcfg=mcfg, model=model, batch=batch, params=params,
        B=B, P=P, T=T, iters=iters, hop=hop, sr=sr,
        audio_seconds=B * T * hop / sr,
    )


def _make_bucket_batch(mcfg, B, P, T):
    """Teacher-duration batch whose durations exactly fill the T bucket."""
    import jax.numpy as jnp
    import numpy as np

    from lightningfastspeech2_tpu.models.fastspeech2 import make_dummy_batch

    n_valid = P - 16
    batch = make_dummy_batch(mcfg, batch_size=B, n_phones=n_valid)
    per = T // n_valid
    rem = T - per * n_valid
    dur = np.zeros((B, P), dtype=np.int32)
    dur[:, :n_valid] = per
    dur[:, :rem] += 1
    batch["duration"] = dur
    return {k: jnp.asarray(v) for k, v in batch.items()}


# ---- 1. headline: teacher-forced mel synthesis --------------------------
def _wl_headline(S, extra):
    import jax
    import jax.numpy as jnp

    model, params, batch = S["model"], S["params"], S["batch"]
    iters, audio_seconds = S["iters"], S["audio_seconds"]

    @jax.jit
    def synthesize(params, batch, carry):
        # epsilon-scaled carry creates a data dependency between steps; it
        # cannot be folded away (carry varies per step) and perturbs
        # nothing at fp precision
        b = dict(batch)
        b["speaker"] = batch["speaker"] + carry * 1e-30
        out = model.apply(params, b, deterministic=True)
        return out["mel"], out["duration_prediction"]

    def tf_step(carry):
        mel, dpred = synthesize(params, batch, carry)
        return dpred[0, 0].astype(jnp.float32)

    mel, dpred = synthesize(params, batch, jnp.zeros(()))  # compile
    float(jnp.sum(dpred.astype(jnp.float32)))
    headline, dt_tf = _rate(tf_step, jnp.zeros(()), iters, audio_seconds)

    # device-side scan variant: the whole chained loop is ONE program, so
    # per-dispatch tunnel/host overhead (~1-7 ms here) is excluded — this
    # is the true on-chip step time
    @jax.jit
    def tf_scan(params, batch):
        def body(c, _):
            b = dict(batch)
            b["speaker"] = batch["speaker"] + c * 1e-30
            out = model.apply(params, b, deterministic=True)
            # the carry must consume BOTH outputs — a dpred-only carry
            # lets XLA dead-code-eliminate the whole decoder + mel head
            return (out["mel"][0, 0, 0].astype(jnp.float32)
                    + out["duration_prediction"][0, 0].astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
        return c

    float(tf_scan(params, batch))  # compile
    t0 = time.perf_counter()
    float(tf_scan(params, batch))
    dt_scan = (time.perf_counter() - t0) / iters
    extra["device_fwd_ms"] = round(dt_scan * 1e3, 3)
    extra["device_audio_s_per_s"] = round(audio_seconds / dt_scan, 2)

    # carry-chain sanity: the on-chip scan is ground truth (one program,
    # nothing to overlap). If the host loop's dispatches pipelined past
    # the physical device time, its number is bogus — fall back to the
    # scan-derived rate instead of crashing the bench.
    extra["chain_ratio_fwd"] = round(dt_tf / dt_scan, 3)
    if dt_tf <= 0.85 * dt_scan:
        extra["headline_chain_warning"] = (
            f"host-loop {dt_tf*1e3:.2f} ms/step < device scan "
            f"{dt_scan*1e3:.2f} ms/step; using device-scan rate"
        )
        headline = audio_seconds / dt_scan
    elif dt_tf >= 1.5 * dt_scan:
        # symmetric guard (round 5): a tunnel latency storm inflated the
        # chained loop 6x while the on-chip scan stayed at its usual
        # ~7.6 ms — healthy sessions measure chain_ratio 0.92-1.2, so
        # beyond 1.5x the extra time is dispatch stalls, not compute.
        # The scan is the hardware truth either way.
        extra["headline_chain_warning"] = (
            f"host-loop {dt_tf*1e3:.2f} ms/step >> device scan "
            f"{dt_scan*1e3:.2f} ms/step (tunnel latency); using "
            f"device-scan rate"
        )
        headline = audio_seconds / dt_scan
    return headline


# ---- 2. inference-mode forward (predicted durations) --------------------
def _wl_inference(S, extra):
    import jax
    import jax.numpy as jnp

    model, params, batch = S["model"], S["params"], S["batch"]
    iters, audio_seconds = S["iters"], S["audio_seconds"]
    hop, sr = S["hop"], S["sr"]

    @jax.jit
    def infer(params, batch, carry):
        b = dict(batch)
        b["speaker"] = batch["speaker"] + carry * 1e-30
        out = model.apply(params, b, inference=True, deterministic=True,
                          rngs={"sdp": jax.random.PRNGKey(0)})
        return out["mel"], out["duration_rounded"], out["frame_mask"]

    def inf_step(carry):
        mel, dr, fm = infer(params, batch, carry)
        return dr[0, 0].astype(jnp.float32)

    mel_i, dr, fm = infer(params, batch, jnp.zeros(()))
    # honest audio accounting: only frames the model actually produced
    produced_s = float(jnp.sum(fm)) * hop / sr
    float(jnp.sum(dr.astype(jnp.float32)))
    inf_rate, dt_inf = _rate(inf_step, jnp.zeros(()), iters, produced_s)
    # produced-audio rate is utilization-dependent (untrained duration
    # predictions fill ~1 frame/phone); the ceiling assumes a full bucket
    extra["inference_mode_audio_s_per_s"] = round(inf_rate, 2)
    extra["inference_mode_step_ms"] = round(dt_inf * 1e3, 3)
    extra["inference_mode_full_bucket_audio_s_per_s"] = round(
        audio_seconds / dt_inf, 2
    )


# ---- 3. HiFi-GAN V1 mel->wav throughput ----------------------------------
def _wl_hifigan(S, extra):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightningfastspeech2_tpu.vocoder import hifigan as hg

    hop, sr, iters = S["hop"], S["sr"], S["iters"]
    voc = hg.Synthesiser(hg.HifiGanConfig(), rng=jax.random.PRNGKey(3))
    Tv = int(os.environ.get("BENCH_VOC_FRAMES", 1024))
    Bv = int(os.environ.get("BENCH_VOC_BATCH", 4))
    mel_voc = jnp.asarray(
        np.random.default_rng(0).standard_normal((Bv, Tv, 80)), jnp.float32
    )

    @jax.jit
    def vocode(params, mel, carry):
        wav = voc.model.apply(params, mel + carry * 1e-30)
        return wav

    def voc_step(carry):
        wav = vocode(voc.params, mel_voc, carry)
        return wav[0, 0].astype(jnp.float32) * 1e-30

    _ = vocode(voc.params, mel_voc, jnp.zeros(()))  # compile
    voc_audio_s = Bv * Tv * hop / sr
    voc_iters = max(iters // 2, 10)
    voc_rate, dt_voc = _rate(voc_step, jnp.zeros(()), voc_iters, voc_audio_s)
    extra["hifigan_vocoder_audio_s_per_s"] = round(voc_rate, 2)
    extra["hifigan_vocoder_step_ms"] = round(dt_voc * 1e3, 3)

    # bf16 vocoder variant (generate --vocoder_precision 16; ~39 dB SNR
    # vs the f32 output — opt-in)
    voc16 = hg.Generator(hg.HifiGanConfig(), jnp.bfloat16)

    @jax.jit
    def vocode16(params, mel, carry):
        return voc16.apply(params, mel + carry * 1e-30)

    def voc16_step(carry):
        wav = vocode16(voc.params, mel_voc, carry)
        return wav[0, 0].astype(jnp.float32) * 1e-30

    _ = vocode16(voc.params, mel_voc, jnp.zeros(()))
    voc16_rate, dt16 = _rate(voc16_step, jnp.zeros(()), voc_iters, voc_audio_s)
    extra["hifigan_vocoder_bf16_audio_s_per_s"] = round(voc16_rate, 2)

    # bf16 + fused Pallas resblock kernel (the production bf16 serving
    # path: Synthesiser(dtype=bf16) picks it automatically on TPU) —
    # guarded separately so a Mosaic failure doesn't void the XLA rows
    if jax.default_backend() != "cpu" and os.environ.get(
        "LFS2_USE_PALLAS", "auto"
    ).lower() not in ("0", "false", "off"):
        try:
            @jax.jit
            def vocode_fused(params, mel, carry):
                return hg.generator_apply_fused(
                    params, mel + carry * 1e-30, hg.HifiGanConfig(),
                    dtype=jnp.bfloat16,
                )

            def voc_fused_step(carry):
                wav = vocode_fused(voc.params, mel_voc, carry)
                return wav[0, 0].astype(jnp.float32) * 1e-30

            _ = vocode_fused(voc.params, mel_voc, jnp.zeros(()))
            vocf_rate, dtf = _rate(
                voc_fused_step, jnp.zeros(()), voc_iters, voc_audio_s
            )
            extra["hifigan_vocoder_fused_audio_s_per_s"] = round(vocf_rate, 2)
            extra["hifigan_vocoder_fused_step_ms"] = round(dtf * 1e3, 3)
        except Exception as e:  # pylint: disable=broad-except
            extra["hifigan_fused_error"] = _errstr(e)


# ---- 3b. FastDiff N=4 mel->wav throughput --------------------------------
def _wl_fastdiff(S, extra):
    # the reference's quality vocoder (generate.py --use_fastdiff,
    # FastDiff.py:149-195); N=4 is its canonical serving schedule
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lightningfastspeech2_tpu.vocoder import diffusion as fd_diff
    from lightningfastspeech2_tpu.vocoder.fastdiff import (
        FastDiffConfig,
        FastDiffVocoder,
    )

    sr, iters = S["sr"], S["iters"]
    fd = FastDiffVocoder(FastDiffConfig(), rng=jax.random.PRNGKey(7))
    Tf = int(os.environ.get("BENCH_FASTDIFF_FRAMES", 256))
    Bf = int(os.environ.get("BENCH_FASTDIFF_BATCH", 4))
    mel_fd = jnp.asarray(
        np.random.default_rng(1).standard_normal((Bf, Tf, 80)), jnp.float32
    )
    fd_sched = fd_diff.make_inference_schedule(fd.hp, 4)
    fd_shape = (Bf, Tf * fd.cfg.hop_length)
    fd_audio_s = Bf * Tf * fd.cfg.hop_length / sr
    fd_iters = max(iters // 5, 5)
    extra["fastdiff_fused"] = bool(fd.fused)

    def make_vocode(fdv):
        # the SERVING path the vocoder actually takes: the fused
        # LVC-stack Pallas kernel on TPU (ops/pallas_fastdiff.py),
        # FastDiff.apply elsewhere — same routing as fdv.inference()
        from lightningfastspeech2_tpu.vocoder.fastdiff import (
            eps_apply_fused,
        )

        @jax.jit
        def vocode(params, mel, carry):
            mel_c = mel + carry * 1e-30
            if fdv.fused:
                eps_fn = lambda x, ts: eps_apply_fused(
                    params, fdv.cfg, x, mel_c, ts, dtype=fdv.dtype
                ).astype(jnp.float32)
            else:
                eps_fn = lambda x, ts: fdv.model.apply(
                    params, x, mel_c, ts).astype(jnp.float32)
            return fd_diff.reverse_sample(
                eps_fn, fd_shape, fd_sched, jax.random.PRNGKey(8)
            )

        return vocode

    import dataclasses as _dc

    variants = [
        ("fastdiff_vocoder_n4", fd, True),
        ("fastdiff_vocoder_n4_bf16",
         FastDiffVocoder(FastDiffConfig(), params=fd.params,
                         dtype=jnp.bfloat16), False),
        # FALLBACK-ONLY row: fast gating pays only on the XLA fallback
        # path; in the fused kernel exact sigmoid*tanh is FASTER
        # (BASELINE.md round 3) and the serving default is fused+exact.
        # Kept measured so the fallback path has a number on record.
        ("fastdiff_vocoder_n4_bf16_fast_gating_fallback_only",
         FastDiffVocoder(_dc.replace(FastDiffConfig(), fast_gating=True),
                         params=fd.params, dtype=jnp.bfloat16), False),
    ]
    for name, fdv, record_ms in variants:
        vocode = make_vocode(fdv)

        def step(carry, _v=vocode, _p=fd.params):
            wav = _v(_p, mel_fd, carry)
            return wav[0, 0].astype(jnp.float32) * 1e-30

        _ = vocode(fd.params, mel_fd, jnp.zeros(()))  # compile
        rate_v, dt_v = _rate(step, jnp.zeros(()), fd_iters, fd_audio_s)
        extra[f"{name}_audio_s_per_s"] = round(rate_v, 2)
        if record_ms:
            extra[f"{name}_step_ms"] = round(dt_v * 1e3, 3)


# ---- 3c. end-to-end serving chain: phones -> mel -> waveform --------------
def _wl_serving_e2e(S, extra):
    """The composed serving workload the reference's SpeechGenerator runs
    (reference ``litfass/synthesis/generator.py:96-224``): acoustic
    inference-mode forward -> HiFi-GAN (fused bf16 serving path) in one
    chained dispatch, at 100% frame-bucket utilization (teacher-filled
    durations so every step synthesizes B*T frames of audio). Reported as
    ``serving_e2e_audio_s_per_s`` — the honest number for "how fast can
    this framework speak", vocoder-bound by construction.

    Also measures the realistic-length bucketed-serving path (VERDICT r3
    item 7): the acoustic pass at frame bucket T=512 (typical 4-6 s
    utterances) instead of the full 2048 bucket.
    """
    import jax
    import jax.numpy as jnp

    from lightningfastspeech2_tpu.core import config as C
    from lightningfastspeech2_tpu.vocoder import hifigan as hg

    model, params, batch = S["model"], S["params"], S["batch"]
    mcfg, hop, sr = S["mcfg"], S["hop"], S["sr"]
    B, T, iters = S["B"], S["T"], S["iters"]
    audio_seconds = S["audio_seconds"]

    voc = hg.Synthesiser(hg.HifiGanConfig(), rng=jax.random.PRNGKey(3))
    vcfg = hg.HifiGanConfig()
    use_fused = jax.default_backend() != "cpu" and os.environ.get(
        "LFS2_USE_PALLAS", "auto").lower() not in ("0", "false", "off")
    voc_bf16 = hg.Generator(vcfg, jnp.bfloat16)

    @jax.jit
    def e2e(params, vparams, batch, carry):
        b = dict(batch)
        b["speaker"] = batch["speaker"] + carry * 1e-30
        out = model.apply(params, b, deterministic=True)
        mel = out["mel"].astype(jnp.float32)
        if use_fused:
            return hg.generator_apply_fused(
                vparams, mel, vcfg, dtype=jnp.bfloat16)
        return voc_bf16.apply(vparams, mel)

    def e2e_step(carry):
        wav = e2e(params, voc.params, batch, carry)
        return wav[0, 0].astype(jnp.float32) * 1e-30

    _ = e2e(params, voc.params, batch, jnp.zeros(()))  # compile
    e2e_iters = max(iters // 4, 8)
    rate, dt = _rate(e2e_step, jnp.zeros(()), e2e_iters, audio_seconds)
    extra["serving_e2e_audio_s_per_s"] = round(rate, 2)
    extra["serving_e2e_step_ms"] = round(dt * 1e3, 3)

    # FastDiff N=4 variant (the reference's quality-vocoder serving config)
    try:
        from lightningfastspeech2_tpu.vocoder import diffusion as fd_diff
        from lightningfastspeech2_tpu.vocoder.fastdiff import (
            FastDiffConfig,
            FastDiffVocoder,
            eps_apply_fused,
        )

        fdv = FastDiffVocoder(FastDiffConfig(), rng=jax.random.PRNGKey(7),
                              dtype=jnp.bfloat16)
        fd_sched = fd_diff.make_inference_schedule(fdv.hp, 4)
        # FastDiff at audio rate is ~30x costlier than HiFi-GAN; chain it
        # on a T=256 slice (its bench shape) for a bounded-time row
        Tf = 256
        fd_shape = (B, Tf * fdv.cfg.hop_length)
        fd_audio_s = B * Tf * fdv.cfg.hop_length / sr

        mcfg_fd = C.replace(mcfg, max_frames=Tf)
        model_fd = type(model)(mcfg_fd, dtype=model.dtype)
        batch_fd = _make_bucket_batch(mcfg_fd, B, S["P"], Tf)

        @jax.jit
        def e2e_fd(params, fparams, batch, carry):
            b = dict(batch)
            b["speaker"] = batch["speaker"] + carry * 1e-30
            out = model_fd.apply(params, b, deterministic=True)
            mel = out["mel"].astype(jnp.float32)
            if fdv.fused:
                eps_fn = lambda x, ts: eps_apply_fused(
                    fparams, fdv.cfg, x, mel, ts, dtype=fdv.dtype
                ).astype(jnp.float32)
            else:
                eps_fn = lambda x, ts: fdv.model.apply(
                    fparams, x, mel, ts).astype(jnp.float32)
            return fd_diff.reverse_sample(
                eps_fn, fd_shape, fd_sched, jax.random.PRNGKey(8)
            )

        def e2e_fd_step(carry):
            wav = e2e_fd(params, fdv.params, batch_fd, carry)
            return wav[0, 0].astype(jnp.float32) * 1e-30

        _ = e2e_fd(params, fdv.params, batch_fd, jnp.zeros(()))
        fd_rate, fd_dt = _rate(e2e_fd_step, jnp.zeros(()),
                               max(iters // 5, 5), fd_audio_s)
        extra["serving_e2e_fastdiff_n4_audio_s_per_s"] = round(fd_rate, 2)
    except Exception as e:  # pylint: disable=broad-except
        extra["serving_e2e_fastdiff_error"] = _errstr(e)

    # realistic-length serving: inference-mode acoustic at the T=512
    # bucket (the two-pass bucketed path in synthesis/generator.py picks
    # this bucket for typical 4-6 s utterances; full-bucket inference
    # paid a ~4x padding tax, BENCH_r03)
    try:
        Tb = 512
        mcfg_b = C.replace(mcfg, max_frames=Tb)
        model_b = type(model)(mcfg_b, dtype=model.dtype)
        batch_b = _make_bucket_batch(mcfg_b, B, S["P"], Tb)
        bucket_audio_s = B * Tb * hop / sr

        @jax.jit
        def infer_b(params, batch, carry):
            b = dict(batch)
            b["speaker"] = batch["speaker"] + carry * 1e-30
            out = model_b.apply(params, b, inference=True,
                                deterministic=True,
                                rngs={"sdp": jax.random.PRNGKey(0)})
            return out["mel"], out["duration_rounded"]

        def b_step(carry):
            mel, dr = infer_b(params, batch_b, carry)
            return dr[0, 0].astype(jnp.float32)

        _ = infer_b(params, batch_b, jnp.zeros(()))
        b_rate, b_dt = _rate(b_step, jnp.zeros(()), iters, bucket_audio_s)
        extra["inference_bucket512_audio_s_per_s"] = round(b_rate, 2)
        extra["inference_bucket512_step_ms"] = round(b_dt * 1e3, 3)

        # device-scan twin: the chained host loop on this row has shown
        # 6x tunnel-noise swings between runs (r5: 1.77 vs 10.48 ms);
        # the scan excludes per-dispatch overhead and is authoritative
        @jax.jit
        def infer_b_scan(params, batch):
            def body(c, _):
                b = dict(batch)
                b["speaker"] = batch["speaker"] + c * 1e-30
                out = model_b.apply(params, b, inference=True,
                                    deterministic=True,
                                    rngs={"sdp": jax.random.PRNGKey(0)})
                return out["duration_rounded"][0, 0].astype(jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
            return c

        import time as _t

        float(infer_b_scan(params, batch_b))
        t0 = _t.perf_counter()
        float(infer_b_scan(params, batch_b))
        sdt = (_t.perf_counter() - t0) / iters
        extra["inference_bucket512_scan_step_ms"] = round(sdt * 1e3, 3)
        extra["inference_bucket512_scan_audio_s_per_s"] = round(
            bucket_audio_s / sdt, 2)
    except Exception as e:  # pylint: disable=broad-except
        extra["inference_bucket_error"] = _errstr(e)

    # the REAL bucketed-serving shape (VERDICT r4 item 8): the two-pass
    # SpeechGenerator path buckets PHONES as well as frames
    # (core/bucketing.py), and a server batches utterances per bucket —
    # a 512-frame (~6 s) utterance carries ~70-80 phones -> P bucket 96,
    # and B scales so the chip sees the same frame count as the
    # full-bucket row (32*512 == 8*2048). The P=256/B=8 row above keeps
    # the historical (pessimistic) comparison.
    try:
        Tb, Pb, Bb = 512, 96, 4 * B
        mcfg_r = C.replace(mcfg, max_frames=Tb, max_phones=Pb)
        model_r = type(model)(mcfg_r, dtype=model.dtype)
        batch_r = _make_bucket_batch(mcfg_r, Bb, Pb, Tb)
        r_audio_s = Bb * Tb * hop / sr

        @jax.jit
        def infer_r(params, batch, carry):
            b = dict(batch)
            b["speaker"] = batch["speaker"] + carry * 1e-30
            out = model_r.apply(params, b, inference=True,
                                deterministic=True,
                                rngs={"sdp": jax.random.PRNGKey(0)})
            return out["mel"], out["duration_rounded"]

        def r_step(carry):
            mel, dr = infer_r(params, batch_r, carry)
            return dr[0, 0].astype(jnp.float32)

        _ = infer_r(params, batch_r, jnp.zeros(()))
        r_rate, r_dt = _rate(r_step, jnp.zeros(()), iters, r_audio_s)
        extra["serving_bucket512_batched_audio_s_per_s"] = round(r_rate, 2)
        extra["serving_bucket512_batched_step_ms"] = round(r_dt * 1e3, 3)
        extra["serving_bucket512_batched_shape"] = f"B={Bb},P={Pb},T={Tb}"
    except Exception as e:  # pylint: disable=broad-except
        extra["serving_bucket512_batched_error"] = _errstr(e)


# ---- 3d. scale rows: 27M-class, 76M-class, joint composition --------------
def _wl_scale(S, extra):
    """Throughput at tens-of-millions scale (VERDICT r3 item 4): the
    vanilla-conv FastSpeech2 preset (measured 35.0M), the genuinely
    76M-parameter LightSpeech-style config (76.6M — the north-star
    "audio-s/s at 76M" row), and the reference's canonical ~28.8M joint
    acoustic+FastDiff composition. Every row carries its measured
    ``n_params`` (jax.eval_shape count) so no downstream consumer
    mistakes scale classes (the README's 27M/76M are not reproducible
    from reference configs; BASELINE.md "Param-count correction")."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from lightningfastspeech2_tpu.core import config as C
    from lightningfastspeech2_tpu.models.fastspeech2 import (
        FastSpeech2,
        count_params,
    )

    B, P, T, iters = S["B"], S["P"], S["T"], S["iters"]
    hop, sr = S["hop"], S["sr"]

    def scan_fwd_ms(model, params, batch, n):
        @jax.jit
        def fwd_scan(params, batch):
            # carry rides on a float input every config consumes
            # (fs2_vanilla has no speaker key; CWT configs have
            # variances_*_spectrogram instead of variances_*): teacher
            # variance targets feed the bucketize embeddings, so the data
            # dependency survives DCE and 1e-30 perturbs nothing
            ck = next(k for k in batch
                      if k.startswith("variances_")
                      and not k.endswith(("_mean", "_std", "_signal")))

            def body(c, _):
                b = dict(batch)
                b[ck] = batch[ck] + c * 1e-30
                out = model.apply(params, b, deterministic=True)
                return (out["mel"][0, 0, 0].astype(jnp.float32)
                        + out["duration_prediction"][0, 0].astype(
                            jnp.float32)), None
            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=n)
            return c

        float(fwd_scan(params, batch))  # compile
        t0 = _time.perf_counter()
        float(fwd_scan(params, batch))
        return (_time.perf_counter() - t0) / n * 1e3

    def train_ms(cfg, model, batch, n):
        import optax

        from lightningfastspeech2_tpu.train.step import (
            _loss_fn,
            create_train_state,
        )

        state, optimizer = create_train_state(
            model, cfg, jax.random.PRNGKey(4), batch)

        @jax.jit
        def train_scan(state, batch):
            def body(carry, i):
                st = carry
                grads, losses = jax.grad(_loss_fn, has_aux=True)(
                    st.params, model, cfg, batch,
                    jax.random.fold_in(jax.random.PRNGKey(6), i), True, ()
                )
                updates, opt_state = optimizer.update(
                    grads, st.opt_state, st.params)
                params = optax.apply_updates(st.params, updates)
                return (type(st)(params, opt_state, st.step + 1),
                        losses["total"])
            st, tot = jax.lax.scan(body, state, jnp.arange(n))
            return tot[-1]

        float(train_scan(state, batch))  # compile
        t0 = _time.perf_counter()
        float(train_scan(state, batch))
        return (_time.perf_counter() - t0) / n * 1e3

    audio_s = B * T * hop / sr
    n = max(iters // 3, 10)
    for name, cfg in (
        ("fs2_vanilla", C.fastspeech2_27m()),
        ("true76m", C.lightspeech_true76m()),
    ):
        def preset_row(name=name, cfg=cfg):
            mcfg = C.replace(cfg.model, max_phones=P, max_frames=T)
            extra[f"{name}_n_params"] = count_params(mcfg)
            model = FastSpeech2(mcfg, dtype=jnp.bfloat16)
            batch = _make_bucket_batch(mcfg, B, P, T)
            init = jax.jit(
                lambda rngs, b, m=model: m.init(rngs, b, deterministic=True))
            params = init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1),
                 "sdp": jax.random.PRNGKey(2)}, batch)
            dt = scan_fwd_ms(model, params, batch, n)
            extra[f"{name}_fwd_ms"] = round(dt, 3)
            extra[f"{name}_fwd_audio_s_per_s"] = round(audio_s / dt * 1e3, 2)
            tcfg = C.replace(cfg, **{"model.max_phones": P,
                                     "model.max_frames": T})
            tdt = train_ms(tcfg, model, batch, n)
            extra[f"{name}_train_step_ms"] = round(tdt, 3)
            extra[f"{name}_train_audio_s_per_s"] = round(
                audio_s / tdt * 1e3, 2)

        # per-row fail-soft WITH the Pallas-off retry: round 4 caught
        # row exceptions here without retrying, which defeated
        # _run_workload's workload-level fallback for exactly the rows
        # that needed it (VERDICT r4 weak #4)
        _row_fail_soft(name, preset_row, extra)

    # joint composition: fwd+bwd+update through acoustic + FastDiff
    # vocoder + diffusion variances + diffusion speakers (the reference's
    # canonical experiment, scripts/train.sh:44-55). Reference-realistic
    # shapes: batch 4 (train.sh:4), T=1024 frames (<=12 s utterances).
    def joint_row():
        import numpy as np
        import optax

        from lightningfastspeech2_tpu.models.joint import (
            JointFastSpeech2FastDiff,
            make_fastdiff_config,
        )
        from lightningfastspeech2_tpu.train.losses import compute_losses

        Bj, Tj = 4, int(os.environ.get("BENCH_JOINT_FRAMES", 1024))
        cfg = C.canonical_joint()
        mcfg = C.replace(cfg.model, max_phones=P, max_frames=Tj)
        fd_cfg = make_fastdiff_config(mcfg)
        model = JointFastSpeech2FastDiff(mcfg, fd_cfg, dtype=jnp.bfloat16)
        batch = _make_bucket_batch(mcfg, Bj, P, Tj)
        batch = dict(batch)
        batch["wav"] = jnp.asarray(
            np.random.default_rng(2).standard_normal(
                (Bj, Tj * hop)).astype(np.float32))
        batch["utterance_dvec"] = jnp.asarray(
            np.random.default_rng(3).standard_normal(
                (Bj, mcfg.dvector_dim)).astype(np.float32))
        rngs = {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1),
                "sdp": jax.random.PRNGKey(2)}
        shapes = jax.eval_shape(
            lambda: model.init(rngs, batch, deterministic=True))
        extra["joint_n_params"] = int(sum(
            np.prod(x.shape) for x in jax.tree.leaves(shapes)))
        init = jax.jit(lambda r, b: model.init(r, b, deterministic=True))
        params = init(rngs, batch)

        tx = optax.adamw(1e-4)
        opt_state = jax.jit(tx.init)(params)

        def loss_fn(params, batch, rng):
            out = model.apply(
                params, batch, deterministic=False, schedule_p=0.5,
                rngs={"dropout": rng, "sdp": jax.random.fold_in(rng, 1)})
            losses = compute_losses(out, batch, cfg)
            return losses["total"], losses

        nj = max(iters // 5, 5)

        @jax.jit
        def joint_scan(params, opt_state, batch):
            def body(carry, i):
                p, o = carry
                grads, losses = jax.grad(loss_fn, has_aux=True)(
                    p, batch, jax.random.fold_in(jax.random.PRNGKey(5), i))
                updates, o = tx.update(grads, o, p)
                p = optax.apply_updates(p, updates)
                return (p, o), losses["total"]
            (p, o), tot = jax.lax.scan(
                body, (params, opt_state), jnp.arange(nj))
            return tot[-1]

        float(joint_scan(params, opt_state, batch))  # compile
        t0 = _time.perf_counter()
        float(joint_scan(params, opt_state, batch))
        jdt = (_time.perf_counter() - t0) / nj * 1e3
        extra["joint_train_step_ms"] = round(jdt, 3)
        extra["joint_train_audio_s_per_s"] = round(
            Bj * Tj * hop / sr / jdt * 1e3, 2)
        extra["joint_train_shape"] = f"B={Bj},T={Tj}"

    _row_fail_soft("joint", joint_row, extra)


# ---- 4. training step time ------------------------------------------------
def _wl_train(S, extra):
    import jax
    import jax.numpy as jnp
    import optax

    from lightningfastspeech2_tpu.core import config as C
    from lightningfastspeech2_tpu.train.step import (
        _loss_fn,
        create_train_state,
        make_train_step,
    )

    model, batch, cfg = S["model"], S["batch"], S["cfg"]
    P, T, iters, audio_seconds = S["P"], S["T"], S["iters"], S["audio_seconds"]

    tbatch = dict(batch)
    tcfg = C.replace(cfg, **{"model.max_phones": P, "model.max_frames": T})
    state, optimizer = create_train_state(
        model, tcfg, jax.random.PRNGKey(4), tbatch
    )
    step = make_train_step(model, tcfg, optimizer, donate=False)

    box = [state]

    def train_step(carry):
        b = dict(tbatch)
        b["speaker"] = tbatch["speaker"] + carry * 1e-30
        box[0], metrics = step(box[0], b, jax.random.PRNGKey(5))
        return metrics["total"].astype(jnp.float32) * 1e-30

    _ = train_step(jnp.zeros(()))  # compile
    train_rate, dt_train = _rate(train_step, jnp.zeros(()),
                                 max(iters // 2, 10), audio_seconds)
    extra["train_step_ms"] = round(dt_train * 1e3, 3)
    extra["train_audio_s_per_s"] = round(train_rate, 2)

    # device-side train scan (true on-chip fwd+bwd+AdamW time)
    n_scan = max(iters // 2, 10)

    @jax.jit
    def train_scan(state, batch):
        def body(carry, i):
            st = carry
            grads, losses = jax.grad(_loss_fn, has_aux=True)(
                st.params, model, tcfg, batch,
                jax.random.fold_in(jax.random.PRNGKey(6), i), True, ()
            )
            updates, opt_state = optimizer.update(
                grads, st.opt_state, st.params
            )
            params = optax.apply_updates(st.params, updates)
            return type(st)(params, opt_state, st.step + 1), losses["total"]
        st, tot = jax.lax.scan(body, state, jnp.arange(n_scan))
        return tot[-1]

    float(train_scan(state, tbatch))  # compile
    t0 = time.perf_counter()
    float(train_scan(state, tbatch))
    dt_tscan = (time.perf_counter() - t0) / n_scan
    extra["device_train_step_ms"] = round(dt_tscan * 1e3, 3)
    extra["chain_ratio_train"] = round(dt_train / dt_tscan, 3)
    if dt_train <= 0.85 * dt_tscan:
        extra["train_chain_warning"] = (
            f"host-loop {dt_train*1e3:.2f} ms/step < device scan "
            f"{dt_tscan*1e3:.2f} ms/step; device-scan time is authoritative"
        )


def _row_fail_soft(label, fn, extra):
    """Run one bench ROW fail-soft: record the error and retry ONCE with
    Pallas disabled. Row bodies build all their jitted closures inside
    ``fn``, so the env flip takes effect on retry (the gates read env at
    trace time)."""
    try:
        return fn()
    except Exception as e:  # pylint: disable=broad-except
        extra[f"{label}_error"] = _errstr(e)
        print(f"[bench] row {label} failed ({type(e).__name__}); "
              f"retrying with Pallas kernels disabled", file=sys.stderr)
    try:
        with _pallas_disabled():
            out = fn()
        extra[f"{label}_pallas_fallback"] = True
        return out
    except Exception as e:  # pylint: disable=broad-except
        extra[f"{label}_fallback_error"] = _errstr(e)
        return None


def _run_workload(name, fn, S, extra):
    """Run one workload fail-soft; retry once with Pallas disabled."""
    try:
        return fn(S, extra)
    except Exception as e:  # pylint: disable=broad-except
        extra[f"{name}_error"] = _errstr(e)
        print(f"[bench] workload {name} failed ({type(e).__name__}); "
              f"retrying with Pallas kernels disabled", file=sys.stderr)
    try:
        with _pallas_disabled():
            out = fn(S, extra)
        extra[f"{name}_pallas_fallback"] = True
        return out
    except Exception as e:  # pylint: disable=broad-except
        extra[f"{name}_fallback_error"] = _errstr(e)
        return None


def main():
    extra = {}
    headline = None
    try:
        from lightningfastspeech2_tpu.core.compile_cache import (
            enable_fast_prng,
            enable_persistent_cache,
        )

        enable_persistent_cache()
        enable_fast_prng()

        try:
            S = _setup()
        except Exception as e:  # pylint: disable=broad-except
            extra["setup_error"] = _errstr(e)
            with _pallas_disabled():
                S = _setup()
            extra["setup_pallas_fallback"] = True

        # headline config scale, machine-readable (the README's "76M" is
        # not reproducible; measured count is authoritative — BASELINE.md)
        try:
            from lightningfastspeech2_tpu.models.fastspeech2 import (
                count_params,
            )

            extra["n_params"] = count_params(S["mcfg"])
            extra["bench_config"] = (
                "lightspeech_flagship (reference-HEAD default dims; "
                "README claims 76M, measured count is authoritative)"
            )
        except Exception as e:  # pylint: disable=broad-except
            extra["n_params_error"] = _errstr(e)

        headline = _run_workload("headline", _wl_headline, S, extra)
        _run_workload("inference", _wl_inference, S, extra)
        _run_workload("hifigan", _wl_hifigan, S, extra)
        _run_workload("fastdiff", _wl_fastdiff, S, extra)
        _run_workload("serving_e2e", _wl_serving_e2e, S, extra)
        _run_workload("scale", _wl_scale, S, extra)
        _run_workload("train", _wl_train, S, extra)
    except Exception as e:  # pylint: disable=broad-except
        extra["fatal_error"] = _errstr(e)
        traceback.print_exc(file=sys.stderr)

    if headline is None:
        # last-resort headline: the device-scan rate if workload 1 got
        # that far, else 0.0 with the error on record
        headline = float(extra.get("device_audio_s_per_s", 0.0))
    vs = headline / BASELINE_AUDIO_S_PER_S if BASELINE_AUDIO_S_PER_S else 1.0
    line = json.dumps(
        {
            "metric": "audio_seconds_synthesized_per_s_per_chip",
            "value": round(headline, 2),
            "unit": "audio-s/s/chip",
            "vs_baseline": round(vs, 3),
            "extra": extra,
        }
    )
    # the result must survive a corrupted stdout (round-4 failure mode:
    # tunnel log lines shared the stream and the driver parsed null) —
    # write it to a file next to this script as well
    try:
        out_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_out.json")
        with open(out_path, "w") as f:
            f.write(line + "\n")
    except OSError as e:
        print(f"[bench] could not write bench_out.json: {e}",
              file=sys.stderr)
    sys.stderr.flush()
    # leading newline guarantees the JSON starts its own line even if a
    # runtime logger left a partial line on stdout
    sys.stdout.write("\n" + line + "\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()

"""Pure-JAX audio signal processing (on-device prosody front-end)."""

from lightningfastspeech2_tpu.audio import cwt, features, mel, pitch, snr  # noqa: F401

"""lightningfastspeech2_tpu — a TPU-native FastSpeech2/LightSpeech TTS framework.

A brand-new JAX/XLA/Pallas/pjit implementation of the capabilities of
MiniXC/LightningFastSpeech2 (surveyed in SURVEY.md), designed TPU-first:

- static-shape bucketed batching (no recompiles),
- fused/Pallas hot ops (length-regulator gather, depthwise-separable convs,
  soft-DTW wavefront),
- pjit data parallelism over a ``('data', 'model')`` device mesh with XLA
  collectives over ICI,
- on-device prosody feature extraction (mel/energy/pitch/CWT/SNR).

Subpackages
-----------
core        config tree, PRNG threading, bucketing, checkpointing
audio       pure-JAX signal processing (STFT/mel, pitch, energy, SNR, CWT, SRMR)
data        corpus ingestion (TextGrid alignments), vocab, stats, collation
models      acoustic model: FFT/conformer blocks, variance adaptor, SDP flow
ops         Pallas TPU kernels + reference JAX implementations
parallel    device mesh, sharding rules, distributed init
vocoder     HiFi-GAN and FastDiff vocoders
train       losses, optimizers, train/eval steps, metrics
synthesis   G2P and end-to-end speech generation
cli         command-line entry points (train / generate)
"""

__version__ = "0.1.0"

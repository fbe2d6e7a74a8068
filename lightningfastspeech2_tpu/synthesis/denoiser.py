"""Learned spectral-mask denoiser for the restoration chain.

The reference's VoiceFixer slot is a *neural* restorer
(reference ``litfass/synthesis/generator.py:173-195``); round 3 replaced
it with a DSP chain whose declipping is competitive (+17-21 dB SI-SNR) but
whose spectral-gating denoise lifts noisy input only +2.4-3.1 dB — the
usual ceiling for single-channel stationary-noise subtraction without a
learned prior (BASELINE.md "Restoration-chain quality"). This module adds
that learned prior: a small (~33k param) convolutional mask estimator over
log-magnitude STFT patches, trained on synthetic (clean, clean+noise)
pairs, predicting a per-bin soft mask in [0, 1] that is applied to the
magnitude with the noisy phase kept — the standard masking formulation.

Kept deliberately small: it ships in-tree as ``data/denoiser.npz`` (~130 KB)
and adds one conv stack per restore call. Training runs on the host CPU in
minutes (scripts/train_denoiser.py); inference rides the same jit-per-
bucket path as the rest of ``synthesis/restore.py``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

BUILTIN_PATH = Path(__file__).resolve().parent.parent / "data" / "denoiser.npz"


class MaskNet(nn.Module):
    """(T, F) normalized log-magnitude -> (T, F) mask in [0, 1].

    Three 5x5 conv layers (17x17 receptive field: ~200 ms x ~1.4 kHz
    context) — enough to separate speech harmonics/formant ridges from
    broadband noise, small enough to train on a laptop-class CPU."""

    ch: int = 24

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x[None, :, :, None]
        h = nn.relu(nn.Conv(self.ch, (5, 5))(h))
        h = nn.relu(nn.Conv(self.ch, (5, 5))(h))
        h = nn.relu(nn.Conv(self.ch, (5, 5))(h))
        h = nn.Conv(1, (5, 5))(h)
        return nn.sigmoid(h)[0, :, :, 0]


def _normalize(logmag: jnp.ndarray) -> jnp.ndarray:
    mu = jnp.mean(logmag)
    sd = jnp.std(logmag) + 1e-5
    return (logmag - mu) / sd


def apply_mask_net(params, mag: jnp.ndarray, floor: float = 0.03,
                   frame_valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Masked magnitude; ``floor`` matches the DSP chain's spectral floor
    so residual noise stays broadband instead of going musical.

    ``frame_valid``: (T,) bool — when the caller zero-padded the signal
    to a bucket (synthesis/restore.py does), the normalization stats
    MUST come from the valid frames only: padded log-magnitudes sit at
    log(1e-6), dragging the global mean far down so real content all
    looks "loud" and the mask opens to ~1 (measured round 5: mask mean
    0.78 padded vs 0.06 unpadded on the same noisy signal — the entire
    denoise effect vanished in the serving chain)."""
    logm = jnp.log(mag + 1e-6)
    if frame_valid is None:
        x = _normalize(logm)
    else:
        w = frame_valid.astype(logm.dtype)[:, None]
        n = jnp.maximum(jnp.sum(w) * logm.shape[1], 1.0)
        mu = jnp.sum(logm * w) / n
        var = jnp.sum(jnp.square(logm - mu) * w) / n
        x = (logm - mu) / (jnp.sqrt(var) + 1e-5)
        # keep padded frames at the distribution's silence level rather
        # than an extreme outlier the convs never trained on
        valid_min = jnp.min(jnp.where(w > 0, x, jnp.inf))
        x = jnp.where(w > 0, x, valid_min)
    mask = MaskNet().apply({"params": params}, x)
    return mag * jnp.maximum(mask, floor)


def save(params, path) -> None:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    np.savez(path, **{jax.tree_util.keystr(k): np.asarray(v)
                      for k, v in flat})


def load(path=None) -> Optional[Dict]:
    """Builtin weights (or ``path``); None when absent."""
    path = Path(path) if path else BUILTIN_PATH
    if not path.exists():
        return None
    import re

    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    params: Dict = {}
    for key, v in flat.items():
        parts = re.findall(r"\['([^']+)'\]", key)
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return params


# ---------------------------------------------------------------------------
# training (host CPU)
# ---------------------------------------------------------------------------

def train_denoiser(
    clean_clips,
    steps: int = 3000,
    batch: int = 4,
    frames: int = 256,
    lr: float = 1e-3,
    sr: int = 22050,
    n_fft: int = 1024,
    hop: int = 256,
    seed: int = 0,
    verbose: bool = False,
):
    """Train MaskNet on (clean, degraded) STFT pairs.

    Degradations per draw: white noise at SNR U(0, 25) dB (70%), pink
    noise (20%), or NONE (10% — identity examples keep the mask
    transparent on already-clean input, the chain's measured 53 dB
    clean-null property). Loss: L1 on masked vs clean magnitude plus L1
    on their logs (the log term weights low-energy bins where residual
    noise is audible)."""
    import optax

    rng = np.random.default_rng(seed)
    win = np.hanning(n_fft + 1)[:-1].astype(np.float32)

    def stft_mag(x):
        n = (len(x) - n_fft) // hop + 1
        idx = np.arange(n_fft)[None, :] + hop * np.arange(n)[:, None]
        return np.abs(np.fft.rfft(x[idx] * win, axis=-1)).astype(np.float32)

    def pink(n):
        w = rng.standard_normal(n + 1).astype(np.float32)
        f = np.fft.rfft(w)
        f /= np.maximum(np.sqrt(np.arange(len(f), dtype=np.float32)), 1.0)
        return np.fft.irfft(f, n=n + 1)[:n].astype(np.float32)

    seg_len = (frames - 1) * hop + n_fft

    def draw():
        clip = clean_clips[rng.integers(len(clean_clips))]
        if len(clip) <= seg_len:
            x = np.pad(clip, (0, seg_len - len(clip)))
        else:
            s = int(rng.integers(0, len(clip) - seg_len))
            x = clip[s : s + seg_len]
        u = rng.uniform()
        if u < 0.1:
            d = x
        else:
            noise = pink(len(x)) if u < 0.3 else rng.standard_normal(
                len(x)).astype(np.float32)
            snr = rng.uniform(0.0, 25.0)
            p_sig = np.mean(x**2) + 1e-12
            scale = np.sqrt(p_sig / (np.mean(noise**2) + 1e-12)
                            / 10 ** (snr / 10))
            d = x + scale * noise
        return stft_mag(x), stft_mag(d)

    model = MaskNet()
    sample = draw()
    params = model.init(jax.random.PRNGKey(seed),
                        _normalize(jnp.log(jnp.asarray(sample[1]) + 1e-6))
                        )["params"]
    tx = optax.adam(lr)
    opt = tx.init(params)

    def loss_fn(params, clean_mag, noisy_mag):
        # supervise the RATIO MASK directly (ideal mask = clean/noisy,
        # clipped to [0,1]), magnitude-weighted so audible bins dominate.
        # The round-4 magnitude-L1 objective had a trivial basin — with
        # noise energy above speech energy on average, "mask=0
        # everywhere" beats "mask=1 everywhere" and sigmoid saturation
        # keeps the net there (shipped weights measured mask ~= floor on
        # ALL input, i.e. a uniform -30 dB gain: SI-SNR delta exactly 0).
        def one(m):
            x = _normalize(jnp.log(m + 1e-6))
            return MaskNet().apply({"params": params}, x)

        mask = jax.vmap(one)(noisy_mag)
        target = jnp.clip(clean_mag / (noisy_mag + 1e-6), 0.0, 1.0)
        w = jnp.log1p(noisy_mag)
        l_mask = jnp.sum(w * jnp.abs(mask - target)) / jnp.sum(w)
        out = noisy_mag * jnp.maximum(mask, 0.03)
        l_mag = jnp.mean(jnp.abs(out - clean_mag))
        return l_mask + 0.1 * l_mag

    @jax.jit
    def step(params, opt, clean_mag, noisy_mag):
        l, g = jax.value_and_grad(loss_fn)(params, clean_mag, noisy_mag)
        updates, opt = tx.update(g, opt)
        return optax.apply_updates(params, updates), opt, l

    for i in range(steps):
        pairs = [draw() for _ in range(batch)]
        cm = jnp.asarray(np.stack([c for c, _ in pairs]))
        nm = jnp.asarray(np.stack([d for _, d in pairs]))
        params, opt, l = step(params, opt, cm, nm)
        if verbose and (i % 200 == 0 or i == steps - 1):
            print(f"denoiser step {i}: loss {float(l):.4f}", flush=True)
    return params

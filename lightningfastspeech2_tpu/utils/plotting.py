"""Dataset/eval visualization (reference ``TTSDataset.plot``,
``litfass/dataset/datasets.py:888-1015``): composite figure with the mel
image, phone-boundary ticks, overlaid normalized variance curves, optional
CWT spectrogram panels, and per-prior density panels with a sample marker.
Returns a PIL image like the reference (consumed by the wandb/media
logger)."""

from __future__ import annotations

import io
from typing import Dict, Optional, Sequence

import numpy as np


def plot_item(
    mel: np.ndarray,                       # (T, n_mels)
    durations: Optional[np.ndarray] = None,
    phones: Optional[Sequence[str]] = None,
    variances: Optional[Dict[str, np.ndarray]] = None,     # frame-level
    cwt_spectrograms: Optional[Dict[str, np.ndarray]] = None,  # (T, scales)
    priors: Optional[Dict[str, float]] = None,
    prior_stats: Optional[Dict[str, Dict[str, float]]] = None,
    title: str = "",
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    variances = variances or {}
    cwt_spectrograms = cwt_spectrograms or {}
    priors = priors or {}

    n_extra = len(cwt_spectrograms) + (1 if priors else 0)
    fig, axes = plt.subplots(
        1 + n_extra, 1,
        figsize=(10, 4 + 2 * n_extra),
        squeeze=False,
        gridspec_kw={"height_ratios": [3] + [1] * n_extra},
    )
    ax = axes[0][0]
    ax.imshow(mel.T, origin="lower", aspect="auto", interpolation="none",
              cmap="magma")
    ax.set_ylabel("mel bin")
    if title:
        ax.set_title(title)

    # phone tick marks at duration boundaries (datasets.py:905-930)
    if durations is not None:
        bounds = np.cumsum(np.asarray(durations))
        for i, b in enumerate(bounds[:-1]):
            ax.axvline(b, color="white", alpha=0.3, linewidth=0.5)
        if phones is not None:
            centers = bounds - np.asarray(durations) / 2
            step = max(len(phones) // 40, 1)  # avoid label soup
            for i in range(0, len(phones), step):
                ax.text(centers[i], mel.shape[1] + 1, phones[i],
                        fontsize=6, ha="center")

    # overlaid normalized variance curves (datasets.py:932-960)
    T = mel.shape[0]
    n_mels = mel.shape[1]
    for name, curve in variances.items():
        curve = np.asarray(curve, np.float64)[:T]
        lo, hi = np.nanmin(curve), np.nanmax(curve)
        scaled = (curve - lo) / max(hi - lo, 1e-9) * (n_mels - 1)
        ax.plot(scaled, linewidth=1.2, label=name, alpha=0.9)
    if variances:
        ax.legend(loc="upper right", fontsize=7)

    row = 1
    for name, spec in cwt_spectrograms.items():
        a = axes[row][0]
        a.imshow(np.asarray(spec).T, origin="lower", aspect="auto",
                 cmap="viridis")
        a.set_ylabel(f"{name} cwt")
        row += 1

    if priors:
        a = axes[row][0]
        for i, (name, value) in enumerate(priors.items()):
            stats = (prior_stats or {}).get(name, {})
            mean = stats.get("mean", value)
            std = max(stats.get("std", 1.0), 1e-6)
            xs = np.linspace(mean - 4 * std, mean + 4 * std, 200)
            pdf = np.exp(-0.5 * ((xs - mean) / std) ** 2) / (
                std * np.sqrt(2 * np.pi)
            )
            line, = a.plot(xs, pdf / pdf.max() + i, label=name)
            a.axvline(value, color=line.get_color(), linestyle="--",
                      linewidth=1)
        a.legend(fontsize=7)
        a.set_ylabel("priors")

    fig.tight_layout()
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=120)
    plt.close(fig)
    buf.seek(0)
    try:
        from PIL import Image

        return Image.open(buf)
    except ImportError:
        return buf  # raw PNG bytes buffer when PIL is unavailable


def save_eval_examples(
    out_dir,
    step: int,
    mels_pred: Sequence[np.ndarray],
    mels_true: Sequence[np.ndarray],
    audios: Optional[Sequence[np.ndarray]] = None,
    sampling_rate: int = 22050,
    max_examples: int = 10,
) -> None:
    """On-disk analog of the reference's wandb example table
    (``fastspeech2.py:900-944``): pred/true spectrogram pngs + wavs."""
    from pathlib import Path

    from lightningfastspeech2_tpu.data import wav as wav_io

    out = Path(out_dir) / f"step_{step:08d}"
    out.mkdir(parents=True, exist_ok=True)
    for i, (p, t) in enumerate(zip(mels_pred, mels_true)):
        if i >= max_examples:
            break
        img = plot_item(np.asarray(p), title=f"pred {i}")
        _save_img(img, out / f"{i}_pred.png")
        img = plot_item(np.asarray(t), title=f"true {i}")
        _save_img(img, out / f"{i}_true.png")
        if audios is not None and i < len(audios):
            wav_io.write(out / f"{i}_pred.wav", audios[i], sampling_rate)


def _save_img(img, path) -> None:
    if hasattr(img, "save"):
        img.save(path)
    else:
        with open(path, "wb") as fh:
            fh.write(img.read())

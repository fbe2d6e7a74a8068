"""Log-space Gaussian mixture over utterance priors.

Same behavior as the reference wrapper
(reference ``litfass/fastspeech2/log_gmm.py``): features are max-scaled
(+eps), selected dims log-transformed, a sklearn GaussianMixture fitted on
top; samples are mapped back through exp/scale. Per-speaker fitting selects
the component count 1..max by BIC with a min-samples-per-component guard
(reference ``fastspeech2.py:501-528``).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np
from sklearn.mixture import GaussianMixture


class LogGMM:
    def __init__(self, n_components: int = 1, logs: Sequence[int] = (),
                 eps: float = 1e-10, reg_covar: float = 1e-3,
                 random_state: Optional[int] = None):
        self.logs = list(logs)
        self.eps = eps
        self.max_vals: Optional[np.ndarray] = None
        self.gmm = GaussianMixture(
            n_components=n_components, reg_covar=reg_covar,
            random_state=random_state,
        )

    def _transform(self, X: np.ndarray) -> np.ndarray:
        X = np.array(X, dtype=np.float64, copy=True)
        if self.max_vals is None:
            self.max_vals = np.max(X, axis=0)
        X = X / self.max_vals + self.eps
        for i in self.logs:
            X[:, i] = np.log(X[:, i])
        return X

    def fit(self, X):
        return self.gmm.fit(self._transform(X))

    def bic(self, X) -> float:
        return float(self.gmm.bic(self._transform(X)))

    def score(self, X) -> float:
        return float(self.gmm.score(self._transform(X)))

    def sample(self, n_samples: int = 1, random_state: Optional[int] = None):
        if random_state is not None:
            self.gmm.random_state = random_state
            np.random.seed(random_state)
        X, comp = self.gmm.sample(n_samples)
        X = np.array(X)
        for i in range(X.shape[1]):
            if i in self.logs:
                X[:, i] = (np.exp(X[:, i]) - self.eps) * self.max_vals[i]
            else:
                X[:, i] = (X[:, i] - self.eps) * self.max_vals[i]
        return X, comp


def fit_speaker_gmms(
    speaker2priors: Dict[str, Dict[str, np.ndarray]],
    priors: Sequence[str],
    max_components: int = 5,
    min_samples_per_component: int = 20,
    reg_covar: float = 1e-3,
    logs: Sequence[int] = (0, 1, 2, 3),
    seed: int = 0,
) -> Dict[str, LogGMM]:
    """BIC-selected per-speaker GMMs (fastspeech2.py:501-528)."""
    out: Dict[str, LogGMM] = {}
    for speaker, d in speaker2priors.items():
        X = np.stack([d[p] for p in priors], axis=1)
        n = len(X)
        best: Optional[LogGMM] = None
        best_bic = np.inf
        max_k = max(1, min(max_components, n // max(min_samples_per_component, 1)))
        logs_k = [i for i in logs if i < X.shape[1]]
        for k in range(1, max_k + 1):
            gmm = LogGMM(n_components=k, logs=logs_k, reg_covar=reg_covar,
                         random_state=seed)
            try:
                gmm.fit(X)
            except ValueError:
                continue
            bic = gmm.bic(X)
            if bic < best_bic:
                best, best_bic = gmm, bic
        if best is None:
            best = LogGMM(n_components=1, logs=logs_k, reg_covar=reg_covar,
                          random_state=seed)
            best.fit(X)
        out[speaker] = best
    return out


def fit_dvector_gmms(
    speaker_dvectors: Iterable,
    n_components: int = 10,
    reg_covar: float = 1e-6,
    seed: int = 0,
) -> Dict[str, LogGMM]:
    """Per-speaker GMMs over utterance d-vectors for novel-voice sampling
    (reference ``_fit_speaker_dvector_gmms``, fastspeech2.py:492-499:
    ``LogGMM(n_components=10, random_state=0)`` per speaker, no log dims).

    ``speaker_dvectors``: iterable of ``(speaker, (n_utts, dim) array)``
    — e.g. ``TTSDataset.get_speaker_dvectors()``. Component count is
    clamped to the utterance count (the reference crashes on speakers with
    fewer than 10 utterances; documented deviation).
    """
    out: Dict[str, LogGMM] = {}
    for speaker, X in speaker_dvectors:
        X = np.asarray(X, dtype=np.float64)
        k = max(1, min(n_components, len(X)))
        gmm = LogGMM(n_components=k, reg_covar=reg_covar, random_state=seed)
        gmm.fit(X)
        out[speaker] = gmm
    return out

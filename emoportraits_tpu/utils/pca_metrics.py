"""Expression-space PCA diagnostics: explained-variance spectrum, AUC, and coverage
counts over collected expression vectors.

Reference: utils/non_specific.py:95-122 (`pca_metrics`, sklearn PCA on standardized
vectors; AUC + #components above variance thresholds + cumulative 99/99.9/99.99%
indices), consumed per test epoch at va_losses_and_visuals.py:670-674 and plotted by
the logger (utils/logger_wandb.py:226-264). Pure numpy here — no sklearn dependency.
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def pca_metrics(vectors: np.ndarray, n_comp: int | None = None) -> Dict[str, float]:
    """vectors: (N, D) expression embeddings collected over the eval epoch."""
    x = np.asarray(vectors, np.float64)
    n, d = x.shape
    n_comp = min(n_comp or d, d, n)
    mu = x.mean(axis=0)
    sd = x.std(axis=0) + 1e-12
    xs = (x - mu) / sd
    cov = (xs.T @ xs) / max(n - 1, 1)
    eig = np.linalg.eigvalsh(cov)[::-1][:n_comp]
    eig = np.clip(eig, 0, None)
    ratio = eig / max(eig.sum(), 1e-12)

    xs_axis = np.arange(1, n_comp + 1)
    auc = float(np.trapezoid(ratio, xs_axis))
    cum = np.cumsum(ratio)

    def first_above(th):
        idx = np.argmax(cum > th)
        return float(idx) if cum[-1] > th else float(n_comp)

    return {
        "explained_variance_ratio": ratio,
        "auc": auc,
        "n_above_1pct": float((ratio * 100 > 1).sum()),
        "n_above_0p1pct": float((ratio * 100 > 0.1).sum()),
        "n_above_0p01pct": float((ratio * 100 > 0.01).sum()),
        "n_99": first_above(0.99),
        "n_999": first_above(0.999),
        "n_9999": first_above(0.9999),
    }

"""FDR utilities — twin of ``assoc/my_fdr.py``.

``p_adjust_fdr`` reproduces the reference's R-p.adjust-style scaling
(``my_fdr.py:18-27``), including its behaviour of not enforcing
monotonicity (documented reference semantics, preserved deliberately).
``fdr_threshold`` implements the Nichols FDR thresholds (``my_fdr.py:30-60``).
"""

from __future__ import annotations

import numpy as np


def p_adjust_fdr(p: np.ndarray) -> np.ndarray:
    """Benjamini-Hochberg scaling p*n/rank, clipped at 1."""
    p = np.asarray(p)
    p2 = np.zeros(p.shape, dtype=np.float32)
    idx = np.argsort(p)
    n = len(p)
    p2[idx] = (p[idx] * n) / np.arange(1, n + 1)
    p2[p2 > 1] = 1
    return p2


def fdr_threshold(p: np.ndarray, q: float):
    """Return (pID, pN): FDR p-value thresholds under
    independence/positive dependence and under no assumptions."""
    p2 = np.asarray(p)
    p2 = p2[~np.isnan(p2)]
    p2 = np.sort(p2)
    n = len(p2)
    I = np.arange(1, n + 1)
    cVID = 1
    cVN = np.sum(1.0 / I)

    idx = np.nonzero(p2 <= ((I * q) / (n * cVID)))[0]
    pID = p2[np.max(idx)] if len(idx) >= 1 else 0

    idx = np.nonzero(p2 <= ((I * q) / (n * cVN)))[0]
    pN = p2[np.max(idx)] if len(idx) >= 1 else 0
    return pID, pN

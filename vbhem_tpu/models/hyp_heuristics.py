"""Heuristic hyperparameter setting + pretty-printing.

Parity map: `src/hmm/vbhmm_set_hyperparam.m` (image-center 'c' and
data-driven empirical 'd' modes, `:47-88`) and
`src/hmm/vbhmm_print_hyps.m`.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

from ..config import VBConfig
from ..containers import SeqBatch


def set_hyperparam(config: VBConfig, batches: Sequence[SeqBatch],
                   mode: str = "d",
                   image_size: Optional[Tuple[int, int]] = None) -> VBConfig:
    """Return a config with mu0/W0 set heuristically.

    mode 'c' (`vbhmm_set_hyperparam.m:47-66`): image center; ROI width
    (4 std) = 1/8 of the mean image dimension; duration mu=250ms std=25.
    mode 'd' (`:68-84`): data mean; std from pooled variance (circular).
    """
    x_all = np.concatenate([np.asarray(b.x)[np.asarray(b.mask)]
                            for b in batches], axis=0)
    d = x_all.shape[-1]
    if mode == "c":
        if image_size is None:
            raise ValueError("mode 'c' needs image_size=(width, height)")
        w_img, h_img = image_size
        mu = [0.5 * w_img, 0.5 * h_img]
        width = 0.5 * (w_img + h_img)
        s = (width / 8.0) / 4.0
        if d == 3:
            mu.append(250.0)
            w0 = (s ** -2, s ** -2, 25.0 ** -2)
        else:
            w0 = s ** -2
    elif mode == "d":
        mu = list(x_all.mean(axis=0))
        s = float(np.sqrt(x_all[:, :2].var(axis=0).mean()))
        if d == 3:
            st = float(x_all[:, 2].std())
            w0 = (s ** -2, s ** -2, st ** -2)
        else:
            w0 = s ** -2
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return dataclasses.replace(config, mu0=tuple(float(v) for v in mu),
                               w0=w0)


def format_hyps(hyps, names: Optional[Sequence[str]] = None) -> str:
    """Pretty string of the hyps (`vbhmm_print_hyps.m`)."""
    names = names or list(hyps._fields)
    parts = []
    for n in names:
        v = np.asarray(getattr(hyps, n))
        if v.size == 1:
            parts.append(f"{n}={float(v):.4g}")
        else:
            parts.append(f"{n}=[" + ", ".join(f"{x:.4g}" for x in v.ravel())
                         + "]")
    return "; ".join(parts)

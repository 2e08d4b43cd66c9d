"""Data ingest utilities.

Parity map: `src/util/read_xls_fixations.m` — Excel/CSV with columns
SubjectID / TrialID / FixX / FixY / [FixD] becomes nested per-subject,
per-trial sequences; here each subject becomes a padded
:class:`~vbhem_tpu.containers.SeqBatch`.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from ..containers import SeqBatch, pack_sequences


def read_fixations(path: str, t_max: Optional[int] = None,
                   dtype=np.float64) -> Dict[str, SeqBatch]:
    """Read a fixation table (xls/xlsx/csv) into per-subject SeqBatches.

    Columns (case-insensitive, `read_xls_fixations.m:6-34`):
      SubjectID, TrialID, FixX, FixY, optionally FixD (duration -> 3rd
      data dimension).
    Returns {subject_id: SeqBatch}.
    """
    import pandas as pd

    if path.endswith((".xls", ".xlsx")):
        try:
            df = pd.read_excel(path)
        except ImportError:
            # legacy BIFF8 .xls needs the optional xlrd package; fall
            # back to the vendored minimal reader (utils/xls.py)
            from .xls import read_xls_table
            header, rows = read_xls_table(path)
            df = pd.DataFrame(rows, columns=header)
    else:
        df = pd.read_csv(path)
    cols = {c.lower().strip(): c for c in df.columns}

    def col(name):
        if name.lower() not in cols:
            raise ValueError(f"missing column {name!r}; found "
                             f"{list(df.columns)}")
        return cols[name.lower()]

    subj_c, trial_c = col("SubjectID"), col("TrialID")
    val_cols = [col("FixX"), col("FixY")]
    if "fixd" in cols:
        val_cols.append(cols["fixd"])

    out: Dict[str, SeqBatch] = {}
    for subj, g in df.groupby(subj_c, sort=False):
        seqs: List[np.ndarray] = []
        for _, t in g.groupby(trial_c, sort=False):
            seqs.append(t[val_cols].to_numpy(dtype=dtype))
        out[str(subj)] = pack_sequences(seqs, dtype=dtype, t_max=t_max)
    return out


def batches_from_nested(data: Sequence[Sequence[np.ndarray]],
                        t_max: Optional[int] = None,
                        dtype=np.float64) -> List[SeqBatch]:
    """Nested [subject][trial] -> list of SeqBatch (the reference's
    `data{subj}{trial}` cell layout)."""
    return [pack_sequences([np.asarray(s) for s in subj], dtype=dtype,
                           t_max=t_max) for subj in data]


def get_median_length(data) -> float:
    """Median sequence length over nested data
    (`src/util/get_median_length.m`); accepts SeqBatches, arrays, or
    nested lists thereof.  Used to pick the virtual length tau."""
    lengths: List[int] = []

    def walk(obj):
        if isinstance(obj, SeqBatch):
            lengths.extend(int(v) for v in np.asarray(obj.lengths))
        elif hasattr(obj, "shape") and getattr(obj, "ndim", 0) >= 2:
            lengths.append(int(obj.shape[-2]))
        elif isinstance(obj, (list, tuple)):
            for o in obj:
                walk(o)
        else:
            raise TypeError(f"cannot get lengths from {type(obj)}")

    walk(data)
    return float(np.median(lengths))

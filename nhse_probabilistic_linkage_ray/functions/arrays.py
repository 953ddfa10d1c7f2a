"""Per-row array/set operations + the cartesian explode.

Parity with the reference's array machinery (SURVEY.md D2/D5/D6):

- ``array_distinct`` / ``array_remove_nulls``: per-row set ops
  (ref ``/root/reference/utils/preprocessing_utils.py:176,199``).
- ``cartesian_explode``: one row with k list-columns -> the cross product of
  their elements, keeping one null per empty list — the ``explode_pds``
  combination semantics whose 2x2x2 -> 8 contract is pinned by the reference
  test ``/root/reference/tests/dataset_ingestion_tests.py:249-309`` and by
  tests/test_arrays.py here.
"""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa


def array_distinct(values: np.ndarray) -> np.ndarray:
    """Sorted unique (the reference's array_distinct is unordered-set
    semantics; we pin sorted order for determinism)."""
    return np.unique(values)


def remove_empty(strings: list) -> list:
    """array_remove(arr, '') + drop nulls (ref dataset_ingestion_utils.py:229-231)."""
    return [s for s in strings if s not in (None, "")]


def cartesian_explode_batch(batch: pa.Table, list_cols: list) -> pa.Table:
    """Explode each row into the cross product of its list columns' elements.
    Empty/null lists contribute a single null element (explode_outer
    semantics, ref dataset_ingestion_utils.py:191-259)."""
    n = len(batch)
    scalar_cols = [c for c in batch.column_names if c not in list_cols]
    out = {c: [] for c in batch.column_names}
    pylists = {c: batch[c].to_pylist() for c in batch.column_names}
    for i in range(n):
        options = []
        for c in list_cols:
            v = pylists[c][i]
            options.append(v if v else [None])
        for combo in itertools.product(*options):
            for c, val in zip(list_cols, combo):
                out[c].append(val)
            for c in scalar_cols:
                out[c].append(pylists[c][i])
    return pa.table({c: pa.array(out[c]) for c in batch.column_names})


def cartesian_explode(ds, list_cols: list):
    """Dataset-level explode: flat_map semantics via vectorized map_batches."""
    return ds.map_batches(
        lambda t: cartesian_explode_batch(t, list_cols), batch_format="pyarrow"
    )

"""Generic sort + segment-scan grouped apply — the scale-safe replacement for
per-group ``map_groups`` with a pandas DataFrame per key.

Pattern (same as the pair-generation scan in ``stages/candidates.py:119-173``):
ONE global range-partitioning sort by (key, order cols), then a vectorized
per-block scan. Key segments fully interior to a block are complete (sort
range-partitions by the leading key) and are processed in place with numpy
slices — no per-key shuffle, no per-key pandas frame, one cheap Python call
per *multi-row group*. Only the rows of each block's first and last key (which
may straddle block boundaries) are deferred to a tiny groupby second pass.

At 10^12 rows this costs one sort of the projected columns; the reference's
equivalent is a Spark window (``row_number over partitionBy/orderBy``,
``/root/reference/utils/dataset_ingestion_utils.py:562-572``) which is the
same sort under the hood.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _sort_indices(cols: list, descending: list) -> np.ndarray:
    """np.lexsort over (col, desc) pairs; handles numeric, datetime64 and
    object/string columns (strings via rank inversion for descending)."""
    keys = []
    for a, d in zip(reversed(cols), reversed(descending)):
        a = np.asarray(a)
        if a.dtype.kind == "M":
            a = a.astype("int64")
        if d:
            if a.dtype.kind in "iufb":
                a = -a.astype(np.float64) if a.dtype.kind == "u" else -a
            else:
                order = np.argsort(a, kind="stable")
                r = np.empty(len(a), np.int64)
                r[order] = np.arange(len(a))
                a = -r
        keys.append(a)
    return np.lexsort(keys)


def grouped_segment_apply(
    ds: "ray.data.Dataset",
    key_col: str,
    sort_cols: list,
    descending: list,
    seg_fn,
    result_schema: "pa.Schema",
) -> "ray.data.Dataset":
    """Apply ``seg_fn`` once per complete group of ``key_col``, with the
    group's rows pre-sorted by ``sort_cols``/``descending``.

    ``seg_fn(group: dict[str, np.ndarray]) -> dict[str, list|np.ndarray]``
    returns the group's output rows (usually one) keyed by ``result_schema``
    field names. ``sort_cols[0]`` must be ``key_col``.
    """
    assert sort_cols[0] == key_col
    res_names = [f.name for f in result_schema]

    srt = ds.sort(sort_cols, descending=descending)

    def scan(batch: pa.Table) -> pa.Table:
        n = len(batch)
        in_cols = batch.column_names
        # unified schema: result cols + raw input cols (prefixed "_in_" —
        # result names may collide with input names) + tag (0=result, 1=deferred)
        raw_names = [f"_in_{c}" for c in in_cols]
        if n == 0:
            arrays = [pa.array([], f.type) for f in result_schema]
            arrays += [batch[c] for c in in_cols]
            arrays += [pa.array([], pa.uint8())]
            return pa.table(dict(zip(res_names + raw_names + ["_tag"], arrays)))
        key = np.asarray(batch[key_col].to_numpy(zero_copy_only=False))
        defer = (key == key[0]) | (key == key[-1])
        out = {nm: [] for nm in res_names}
        n_res = 0
        interior = ~defer
        if interior.any():
            idx = np.flatnonzero(interior)
            cols_np = {
                c: np.asarray(batch[c].to_numpy(zero_copy_only=False))[idx]
                for c in in_cols
            }
            karr = key[idx]
            bounds = np.flatnonzero(karr[1:] != karr[:-1]) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(karr)]))
            for s, e in zip(starts, ends):
                r = seg_fn({c: v[s:e] for c, v in cols_np.items()})
                for nm in res_names:
                    out[nm].append(np.atleast_1d(np.asarray(r[nm], dtype=object)
                                                 if result_schema.field(nm).type == pa.string()
                                                 else r[nm]))
            n_res = sum(len(x) for x in out[res_names[0]])
        d_idx = np.flatnonzero(defer)
        n_def = len(d_idx)
        res_arrays, raw_arrays = [], []
        for f in result_schema:
            vals = np.concatenate(out[f.name]) if out[f.name] else np.empty(0, object)
            res_arrays.append(pa.concat_arrays([
                pa.array(vals.tolist(), f.type),
                pa.nulls(n_def, f.type),
            ]))
        deferred_tbl = batch.take(pa.array(d_idx, pa.int64()))
        for c in in_cols:
            col = deferred_tbl[c].combine_chunks()
            raw_arrays.append(pa.concat_arrays([pa.nulls(n_res, col.type), col]))
        tag = pa.array(
            np.concatenate([np.zeros(n_res, np.uint8), np.ones(n_def, np.uint8)]),
            pa.uint8(),
        )
        return pa.table(dict(zip(res_names + raw_names + ["_tag"],
                                 res_arrays + raw_arrays + [tag])))

    scanned = srt.map_batches(scan, batch_format="pyarrow", batch_size=None).materialize()
    raw_names = [c for c in scanned.schema().names if c.startswith("_in_")]
    in_cols = [c[len("_in_"):] for c in raw_names]

    interior_res = scanned.map_batches(
        lambda t: t.filter(pa.array(t["_tag"].to_numpy(zero_copy_only=False) == 0))
                   .select(res_names),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    sub_desc = descending

    def group_fn(g: dict) -> dict:
        cols = [np.asarray(g[c]) for c in sort_cols]
        order = _sort_indices(cols, sub_desc)
        sorted_g = {c: np.asarray(g[c])[order] for c in in_cols}
        r = seg_fn(sorted_g)
        return {nm: np.atleast_1d(np.asarray(r[nm])) for nm in res_names}

    def strip_prefix(t: pa.Table) -> pa.Table:
        t = t.filter(pa.array(t["_tag"].to_numpy(zero_copy_only=False) == 1))
        return t.select(raw_names).rename_columns(in_cols)

    deferred = scanned.map_batches(strip_prefix, batch_format="pyarrow",
                                   zero_copy_batch=True)
    boundary = deferred.groupby(key_col).map_groups(group_fn, batch_format="numpy")

    def cast(batch: pa.Table) -> pa.Table:
        return pa.table({
            f.name: batch[f.name].combine_chunks().cast(f.type) for f in result_schema
        })

    boundary = boundary.map_batches(cast, batch_format="pyarrow")
    return interior_res.union(boundary)

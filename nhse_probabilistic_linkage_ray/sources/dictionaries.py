"""CSV dimension dictionaries -> broadcast lookup objects.

Parity with the reference's nicknames dictionary flow (S3/T2/J3:
``documentation/names.csv`` converted once and then joined as a small
dimension table at ``/root/reference/utils/preprocessing_utils.py:508-540``).
Here the code-dedup analogs are per-language stop-shingle / boilerplate-token
lists: read the CSV ONCE with ray.data.read_csv, collapse to a plain dict,
``ray.put`` it, and look it up inside map_batches — never a shuffle join.
"""

from __future__ import annotations

import ray
import ray.data


def load_csv_dictionary(path: str, key_col: str, value_col: str):
    """CSV -> {key: [values...]} -> ray.put ref. Multi-valued keys aggregate
    into lists (the nicknames table maps one name to several nicknames)."""
    ds = ray.data.read_csv(path)
    out: dict = {}
    for batch in ds.iter_batches(batch_format="pyarrow"):
        keys = batch[key_col].to_pylist()
        vals = batch[value_col].to_pylist()
        for k, v in zip(keys, vals):
            out.setdefault(k, []).append(v)
    return ray.put(out)


def apply_dictionary_column(ds: "ray.data.Dataset", dict_ref, key_col: str, out_col: str):
    """Annotate rows with the dictionary lookup (list value, empty when
    missing) — the broadcast left-join-small-dim pattern (SURVEY.md J3)."""
    import pyarrow as pa

    def fn(batch: pa.Table) -> pa.Table:
        lookup = ray.get(dict_ref)
        vals = [lookup.get(k, []) for k in batch[key_col].to_pylist()]
        return batch.append_column(out_col, pa.array(vals, pa.list_(pa.string())))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)

"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
calls ray.init()/ray.shutdown().

- ``entry()``   — flagship MinHash-LSH dedup pipeline over sf0.001.
- ``queries()`` — one callable per implemented operator/pipeline (SURVEY.md §2
  + the training-data-pipeline extras); each takes ``sf_dir``.
- ``oracle_sql()`` — DuckDB-equivalent SQL for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: full near-duplicate
    detection + clustering over the files-shaped documents adapter."""
    from nhse_probabilistic_linkage_ray.pipelines.queries_dedup import q_minhash_dedup_clusters

    return q_minhash_dedup_clusters("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from nhse_probabilistic_linkage_ray.pipelines.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from nhse_probabilistic_linkage_ray.pipelines.queries import oracle_sql as _o

    return _o()

"""Dump Ray Data per-operator stats for the flagship dedupe pipeline.

The measure-don't-guess loop: run the pipeline on a corpus, print each output
Dataset's ``.stats()`` (per-operator wall time, CPU time, rows, block sizes)
so optimization targets are evidence, not intuition.

Usage: python tools/stage_stats.py [files.parquet] [num_cpus]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    import ray

    path = sys.argv[1] if len(sys.argv) > 1 else None
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.min_parallelism = max(8, 2 * ncpu)

    from nhse_probabilistic_linkage_ray.config import PipelineConfig
    from nhse_probabilistic_linkage_ray.pipelines.dedupe import dedupe_dataset

    if path:
        files = ray.data.read_parquet(path)
    else:
        import bench

        files = ray.data.read_parquet(bench.corpus_path())

    out = dedupe_dataset(files, PipelineConfig())
    n = out["clusters"].count()
    print(f"=== clusters: {n} rows ===")
    for name in ("exact_mapped", "signatures", "scored_pairs", "clusters"):
        print(f"\n######## {name} ########")
        print(out[name].stats())
    ray.shutdown()


if __name__ == "__main__":
    main()

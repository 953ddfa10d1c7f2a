"""CLI entry point — the ``ray job submit`` surface.

Parity with the reference's ``run_pipeline.py`` notebook driver
(``/root/reference/run_pipeline.py:16-84``: mode + serialized params -> child
notebooks): here each stage is a module-level function of (config, paths) and
the CLI drives the checkpointed pipeline.

Usage:
    python -m nhse_probabilistic_linkage_ray.run \
        --input /data/files_parquet --workdir /data/run1 \
        [--config cfg.json] [--no-resume] [--save-model STORE --description D]

    ray job submit --working-dir . -- python -m nhse_probabilistic_linkage_ray.run ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Ray-Data-native code dedup pipeline")
    ap.add_argument("--input", required=True, help="Parquet files table (repo,path,commit,lang,content)")
    ap.add_argument("--workdir", required=True, help="checkpoint + output directory")
    ap.add_argument("--mode", choices=("dedupe", "link", "train"), default="dedupe",
                    help="dedupe the input, link it (as the external table) "
                         "against --corpus, or train FS parameters from it "
                         "(ref dual-mode run_pipeline.py:16 + "
                         "training_dedupe.py:105-155)")
    ap.add_argument("--corpus", help="corpus Parquet files table (link mode)")
    ap.add_argument("--training-rules", type=int, default=4,
                    help="train mode: number of band-subset training rules "
                         "(ref loops 7 training blocking rules)")
    ap.add_argument("--max-u-pairs", type=int, default=1_000_000,
                    help="train mode: cap on random pairs for u estimation")
    ap.add_argument("--config", help="PipelineConfig JSON file (default: defaults)")
    ap.add_argument("--no-auto-banding", action="store_true",
                    help="dedupe mode: keep the config's (num_perms, num_bands) "
                         "instead of auto-tiering from the measured corpus size "
                         "(auto is also off whenever --config pins a "
                         "non-default banding)")
    ap.add_argument("--no-resume", action="store_true", help="ignore existing checkpoints")
    ap.add_argument("--num-cpus", type=int, default=None, help="ray.init num_cpus (default: autodetect)")
    ap.add_argument("--save-model", help="model store dir to record the config in")
    ap.add_argument("--description", default="", help="model description for --save-model")
    args = ap.parse_args(argv)
    if args.mode == "link" and not args.corpus:
        ap.error("--mode link requires --corpus")

    from nhse_probabilistic_linkage_ray.config import PipelineConfig

    if args.config:
        with open(args.config) as f:
            config = PipelineConfig.from_json(f.read())
    else:
        config = PipelineConfig()

    import ray

    if not ray.is_initialized():
        # glibc: keep freed large blocks on the heap instead of munmap'ing
        # them — on a memory-overcommitted host, re-provisioning fresh pages
        # on every scratch allocation is 25-300x slower than reuse. Set
        # before ray.init so every spawned worker inherits it.
        os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(512 << 20))
        os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(512 << 20))
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True)
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    # size shuffle parallelism to the cluster (the 200-task default is a
    # CPU-independent constant that dominates small clusters)
    ctx.min_parallelism = max(8, 2 * int(ray.cluster_resources().get("CPU", 8)))

    if args.mode == "train":
        from nhse_probabilistic_linkage_ray.pipelines.training import run_training

        os.makedirs(args.workdir, exist_ok=True)
        result = run_training(
            ray.data.read_parquet(args.input), config,
            n_training_rules=args.training_rules, max_u_pairs=args.max_u_pairs,
            store_dir=args.save_model or os.path.join(args.workdir, "model_store"),
            description=args.description or "trained model")
        trained = result["config"]
        with open(os.path.join(args.workdir, "trained_config.json"), "w") as f:
            f.write(trained.to_json())
        print(json.dumps({"workdir": args.workdir,
                          "config_hash": trained.config_hash, "mode": "train",
                          "m_probabilities": list(trained.m_probabilities),
                          "u_probabilities": list(trained.u_probabilities),
                          "prior": trained.prior,
                          "n_rules_used": len(result["per_rule_m"]),
                          "model_path": result["model_path"]}))
        ray.shutdown()
        return 0

    if args.mode == "link":
        from nhse_probabilistic_linkage_ray.pipelines.linking import run_link

        out = run_link(args.input, args.corpus, args.workdir, config,
                       resume=not args.no_resume)
        n = out["best_matches"].count()
    else:
        from nhse_probabilistic_linkage_ray.pipelines.dedupe import run_dedupe

        out = run_dedupe(args.input, args.workdir, config,
                         resume=not args.no_resume,
                         auto_banding=False if args.no_auto_banding else None)
        config = out.get("config", config)  # the tier the run actually used
        n = out["clusters"].count()
    print(json.dumps({"workdir": args.workdir, "config_hash": config.config_hash,
                      "mode": args.mode, "rows": n,
                      "num_perms": config.num_perms,
                      "num_bands": config.num_bands}))

    if args.save_model:
        from nhse_probabilistic_linkage_ray.sources.model_store import save_model

        path = save_model(args.save_model, config, args.description)
        print(json.dumps({"model_saved": path}))

    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

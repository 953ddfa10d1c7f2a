"""Config/model store: save/load pipeline configs as JSON with a manifest.

Parity with the reference's model persistence (S5, ``save_model``/``get_model``
at ``/root/reference/utils/model_utils.py:107-158``): models are JSON rows in
an append-only log keyed by timestamp + description; "latest" = max timestamp;
lookup by description supported. Here: one JSON file per save under
``<store>/models/`` named ``<utc-timestamp>_<config-hash>.json`` plus an
append-only ``manifest.jsonl`` — "latest" is the lexicographic max filename,
no engine involvement (tiny metadata, filesystem is the right tool)."""

from __future__ import annotations

import json
import os
import time

from nhse_probabilistic_linkage_ray.config import PipelineConfig


def save_model(store_dir: str, config: PipelineConfig, description: str = "") -> str:
    os.makedirs(os.path.join(store_dir, "models"), exist_ok=True)
    ts = time.strftime("%Y%m%dT%H%M%S", time.gmtime())
    name = f"{ts}_{config.config_hash}.json"
    path = os.path.join(store_dir, "models", name)
    record = {
        "name": name,
        "datetime": ts,
        "description": description,
        "config_hash": config.config_hash,
        "config": json.loads(config.to_json()),
    }
    # unique even for same-second saves with identical configs
    i = 0
    while os.path.exists(path):
        i += 1
        name = f"{ts}_{config.config_hash}_{i}.json"
        path = os.path.join(store_dir, "models", name)
        record["name"] = name
    with open(path, "w") as f:
        json.dump(record, f, indent=1)
    with open(os.path.join(store_dir, "manifest.jsonl"), "a") as f:
        f.write(json.dumps({"name": name, "datetime": ts, "description": description,
                            "config_hash": config.config_hash}) + "\n")
    return path


def get_model(store_dir: str, description: str | None = None) -> PipelineConfig:
    """Latest model, optionally restricted to a description (ref get_model
    latest-by-datetime / by-description semantics)."""
    mdir = os.path.join(store_dir, "models")
    names = sorted(os.listdir(mdir))
    if description is not None:
        with open(os.path.join(store_dir, "manifest.jsonl")) as f:
            rows = [json.loads(line) for line in f]
        names = sorted(r["name"] for r in rows if r["description"] == description)
    if not names:
        raise FileNotFoundError(f"no model in {store_dir!r}"
                                + (f" with description {description!r}" if description else ""))
    with open(os.path.join(mdir, names[-1])) as f:
        record = json.load(f)
    return PipelineConfig.from_json(json.dumps(record["config"]))

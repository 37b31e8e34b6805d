"""S5/C6 — per-partition lineage manifests + resume planning
(SURVEY.md §2.1 S5, §2.4 C6; BASELINE.json:14 "resumable from checkpoint
with per-partition lineage + metrics").

One JSON file per index split under ``<index>/manifest/split_NNNN.json``.
A split is durably "done" only after its segment parquet has been
written to a temp dir and atomically renamed into place AND its manifest
written — so a crash mid-split leaves either nothing or a complete
segment, never a torn one. Resume = set difference (driver-side; split
counts are ≤ thousands even at 10^12 files, so this is not a scale
concern — the data never comes to the driver, only the plan does).
"""

from __future__ import annotations

import json
import os


def manifest_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest")


def split_manifest_path(index_dir: str, split_id: int) -> str:
    return os.path.join(manifest_dir(index_dir), f"split_{split_id:04d}.json")


def write_split_manifest(index_dir: str, split_id: int, metrics: dict) -> None:
    os.makedirs(manifest_dir(index_dir), exist_ok=True)
    path = split_manifest_path(index_dir, split_id)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"split_id": split_id, "status": "done", **metrics}, f, indent=1)
    os.replace(tmp, path)  # atomic on POSIX


def read_split_manifest(index_dir: str, split_id: int) -> dict | None:
    path = split_manifest_path(index_dir, split_id)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def done_splits(index_dir: str) -> set[int]:
    d = manifest_dir(index_dir)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("split_") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                m = json.load(f)
            if m.get("status") == "done":
                out.add(int(m["split_id"]))
    return out


def pending_splits(index_dir: str, n_splits: int) -> list[int]:
    done = done_splits(index_dir)
    return [s for s in range(n_splits) if s not in done]

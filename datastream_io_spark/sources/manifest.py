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


def write_task_marker(index_dir: str, name: str, payload: dict) -> None:
    """Atomic done-marker for a named build task (sharded stage /
    finalize tasks) — same tmp→rename discipline as split manifests."""
    os.makedirs(manifest_dir(index_dir), exist_ok=True)
    path = os.path.join(manifest_dir(index_dir), f"{name}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"task": name, "status": "done", **payload}, f, indent=1)
    os.replace(tmp, path)


def read_task_marker(index_dir: str, name: str) -> dict | None:
    path = os.path.join(manifest_dir(index_dir), f"{name}.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def claim_task(index_dir: str, claim_name: str, owner: str) -> bool:
    """Atomic advisory claim on a named task (``O_CREAT|O_EXCL``) — the
    generic form of :func:`claim_split`, used by the sharded stage and
    finalize fleets (claim names ``sclaim_*`` / ``fclaim_*``). Claims
    schedule; the task marker is the completion truth."""
    os.makedirs(manifest_dir(index_dir), exist_ok=True)
    path = os.path.join(manifest_dir(index_dir), claim_name)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    os.write(fd, owner.encode())
    os.close(fd)
    return True


def claim_split(index_dir: str, split_id: int, owner: str) -> bool:
    """Dynamic work-stealing for multi-worker builds: atomically claim a
    pending split via ``O_CREAT|O_EXCL`` on
    ``manifest/claim_NNNN``. Static ``split % n_workers`` assignment
    leaves a straggler tail — with S splits over W workers the last
    wave idles up to a whole split per worker (measured 25% of the
    segment phase at S/W=4); claiming lets fast workers steal the tail.
    Claims are advisory scheduling state, NOT correctness state:
    completion is still the atomic segment-rename + manifest, and a
    crashed worker's stale claim is released by ``release_claims``
    (claims of done splits are ignored everywhere).
    """
    os.makedirs(manifest_dir(index_dir), exist_ok=True)
    path = os.path.join(manifest_dir(index_dir), f"claim_{split_id:04d}")
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return False
    os.write(fd, owner.encode())
    os.close(fd)
    return True


def release_task_claims(index_dir: str, prefix: str) -> int:
    """Remove ALL claim files with the given prefix (``sclaim_`` /
    ``fclaim_`` / ``vclaim_``) — the recovery path for a crashed
    stage/finalize/partitioned fleet. Run ONLY when no worker is live:
    chunk claims cannot be mapped back to individual task markers, so
    this drops live and stale claims alike; completed tasks are still
    skipped via their done markers, so re-claiming them is a no-op."""
    d = manifest_dir(index_dir)
    if not os.path.isdir(d):
        return 0
    n = 0
    for name in os.listdir(d):
        if name.startswith(prefix):
            os.unlink(os.path.join(d, name))
            n += 1
    return n


def release_claims(index_dir: str, only_undone: bool = True) -> int:
    """Remove claim files (all of them, or only those whose split has no
    done manifest — the stale claims of crashed workers). Run before a
    resume fleet when a previous fleet may have died mid-split."""
    d = manifest_dir(index_dir)
    if not os.path.isdir(d):
        return 0
    done = done_splits(index_dir)
    n = 0
    for name in os.listdir(d):
        if not name.startswith("claim_"):
            continue
        sid = int(name.split("_")[1])
        if only_undone and sid in done:
            continue
        os.unlink(os.path.join(d, name))
        n += 1
    return n

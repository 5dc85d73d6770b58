"""Atomic snapshot/commit log for the lake table.

An Iceberg-style metadata log implemented directly (no Iceberg jar in
this sandbox): ``metadata/v{N}.json`` snapshot files plus a
``version-hint.text`` pointer, both committed by write-temp-then-rename —
the same atomicity idiom as the reference's file position tracker
(``pkg/position/file_tracker.go:115-132``). The snapshot records the
logical schema, the data files per bucket, and the ledger of committed
batch keys — which is what makes micro-batch application idempotent
(exactly-once: a replayed batch key is detected and skipped; the
reference only *declared* this, its checkpoints are no-ops —
``pkg/streams/mysql_stream.go:190-207``).

Single-writer (the Spark driver) is assumed, matching Structured
Streaming's one-query-per-checkpoint model. On a shared object store the
rename becomes a conditional PUT / catalog swap; the API is unchanged.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import dataclass, field
from typing import Any


@dataclass
class Snapshot:
    version: int
    parent: int | None
    schema_json: str  # logical StructType json (no engine columns)
    num_buckets: int
    files: dict[str, list[str]]  # bucket id (str) -> data file paths
    committed_batches: dict[str, int] = field(default_factory=dict)  # batch_key -> version
    props: dict[str, Any] = field(default_factory=dict)
    committed_at_ms: int = 0
    # MERGE key columns, fixed at create time and carried by every
    # snapshot so read()/compact() resolve LWW on the same keys merge()
    # used (None in pre-upgrade snapshots → model.KEY_COLS).
    key_cols: list[str] | None = None

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "Snapshot":
        return Snapshot(**json.loads(s))


def _atomic_write(path: str, data: str) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)  # atomic on POSIX
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def meta_dir(root: str) -> str:
    return os.path.join(root, "metadata")


def _hint_path(root: str) -> str:
    return os.path.join(meta_dir(root), "version-hint.text")


def _snap_path(root: str, version: int) -> str:
    return os.path.join(meta_dir(root), f"v{version}.json")


def current_version(root: str) -> int | None:
    try:
        with open(_hint_path(root)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def load_snapshot(root: str, version: int | None = None) -> Snapshot | None:
    """Load a snapshot; ``version`` enables time travel."""
    v = current_version(root) if version is None else version
    if v is None:
        return None
    with open(_snap_path(root, v)) as f:
        return Snapshot.from_json(f.read())


def commit_snapshot(root: str, snap: Snapshot) -> None:
    """Two-step atomic commit: snapshot file, then pointer swap.

    A crash between the two steps leaves a dangling v{N}.json that the
    hint never references — harmless, identical to an uncommitted
    Iceberg snapshot. Readers only follow the hint.
    """
    snap.committed_at_ms = int(time.time() * 1000)
    _atomic_write(_snap_path(root, snap.version), snap.to_json())
    _atomic_write(_hint_path(root), str(snap.version))


def list_versions(root: str) -> list[int]:
    try:
        names = os.listdir(meta_dir(root))
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        if n.startswith("v") and n.endswith(".json"):
            try:
                out.append(int(n[1:-5]))
            except ValueError:
                pass
    return sorted(out)

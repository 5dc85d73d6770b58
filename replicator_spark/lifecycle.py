"""Stream lifecycle control: pause / resume / status.

The reference exposes per-stream Start/Stop/Pause/Resume/Restart over a
management HTTP API (``pkg/api/streams.go``, state machine in
``pkg/models/models.go:78-105``). The Spark engine's lifecycle primitive
is "stop and restart from checkpoint + ledger" — which makes pause a
*marker*, not a thread state: a paused stream simply declines to apply
further batches, and resume removes the marker so the next run continues
exactly where the ledger says it stopped. No state beyond the existing
exactly-once machinery is needed; that is the whole point.

Markers live under ``<table_root>/_control/<stream>.pause`` and are
written atomically (same idiom as the commit log). ``status`` is a
driver-side read of the snapshot log + markers — the CLI analogue of the
reference's ``GET /streams`` (``pkg/api/streams.go``).
"""

from __future__ import annotations

import json
import os

from . import commitlog as cl


def _control_dir(table_root: str) -> str:
    return os.path.join(table_root, "_control")


def _marker(table_root: str, stream: str) -> str:
    return os.path.join(_control_dir(table_root), f"{stream}.pause")


def pause(table_root: str, stream: str, reason: str = "") -> dict:
    """Mark a stream paused; running replays stop before the next batch
    (the current batch finishes — micro-batch is the pause granularity,
    matching the reference's drain-then-pause)."""
    cl._atomic_write(
        _marker(table_root, stream),
        json.dumps({"stream": stream, "reason": reason}),
    )
    return {"stream": stream, "state": "paused"}


def resume(table_root: str, stream: str) -> dict:
    """Clear the pause marker; the next run continues from the ledger."""
    try:
        os.unlink(_marker(table_root, stream))
    except FileNotFoundError:
        pass
    return {"stream": stream, "state": "running"}


def is_paused(table_root: str, stream: str) -> bool:
    return os.path.exists(_marker(table_root, stream))


def status(table_root: str) -> dict:
    """Snapshot of the table + per-stream apply state — the reference's
    stream-status endpoint, driver-side (no Spark job)."""
    snap = cl.load_snapshot(table_root)
    if snap is None:
        return {"table": table_root, "exists": False}
    streams: dict[str, dict] = {}
    for key, version in snap.committed_batches.items():
        p = cl.parse_batch_key(key)
        name = p[0] if p else key
        st = streams.setdefault(
            name, {"last_batch": None, "batches_retained": 0, "state": "idle"}
        )
        st["batches_retained"] += 1
        if p and (st["last_batch"] is None or p[1] > st["last_batch"]):
            st["last_batch"] = p[1]
    for name, floor in snap.ledger_floor.items():
        st = streams.setdefault(
            name, {"last_batch": None, "batches_retained": 0, "state": "idle"}
        )
        st["ledger_floor"] = floor
        if st["last_batch"] is None:
            st["last_batch"] = floor
    try:
        markers = os.listdir(_control_dir(table_root))
    except FileNotFoundError:
        markers = []
    for m in markers:
        if m.endswith(".pause"):
            name = m[: -len(".pause")]
            streams.setdefault(
                name, {"last_batch": None, "batches_retained": 0}
            )["state"] = "paused"
    return {
        "table": table_root,
        "exists": True,
        "version": snap.version,
        "num_buckets": snap.num_buckets,
        "key_cols": snap.key_cols,
        "max_seq": (snap.props or {}).get("max_seq"),
        "n_files": sum(len(f) for f in snap.files.values()),
        "n_delta_files": sum(
            len(f) for f in (snap.props or {}).get("deltas", {}).values()
        ),
        "streams": streams,
    }

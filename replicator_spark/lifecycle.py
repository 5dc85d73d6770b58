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


def resume_if_reason(table_root: str, stream: str, reason: str) -> bool:
    """Clear the pause marker only if it carries ``reason`` — used for
    transient engine-internal pauses (e.g. config reload) so an
    operator's own pause is never silently discarded. Atomic against a
    concurrent operator pause: the marker is STOLEN by rename first,
    inspected, and put back if it turns out to be someone else's (the
    reinstate window is micro-seconds and fails safe: the operator's
    marker reappears)."""
    m = _marker(table_root, stream)
    tmp = m + ".steal"
    try:
        os.rename(m, tmp)
    except FileNotFoundError:
        return False
    try:
        with open(tmp) as f:
            owner = json.load(f).get("reason") == reason
    except (OSError, ValueError):
        owner = False
    if owner:
        os.unlink(tmp)
        return True
    os.rename(tmp, m)  # not ours — reinstate
    return False


def _breaker_marker(table_root: str, stream: str) -> str:
    return os.path.join(_control_dir(table_root), f"{stream}.breaker.json")


def breaker_state_writer(table_root: str, stream: str):
    """Listener for qos.CircuitBreaker: persists every state transition
    to ``_control/<stream>.breaker.json`` (atomic write) so the health
    surface can see an open circuit from outside the driver process."""
    import time

    def _write(breaker) -> None:
        cl._atomic_write(
            _breaker_marker(table_root, stream),
            json.dumps(
                {
                    "stream": stream,
                    "state": breaker.state,
                    "consecutive_failures": breaker.consecutive_failures,
                    "ts_ms": int(time.time() * 1000),
                }
            ),
        )

    return _write


def breaker_states(table_root: str) -> dict[str, dict]:
    """Persisted breaker state per stream (absent file = never tripped,
    i.e. closed)."""
    out: dict[str, dict] = {}
    try:
        names = os.listdir(_control_dir(table_root))
    except FileNotFoundError:
        return out
    for n in names:
        if n.endswith(".breaker.json"):
            try:
                with open(os.path.join(_control_dir(table_root), n)) as f:
                    d = json.load(f)
                out[n[: -len(".breaker.json")]] = d
            except (OSError, json.JSONDecodeError):
                out[n[: -len(".breaker.json")]] = {"state": "unreadable"}
    return out


def health(
    table_root: str,
    *,
    feed_dir: str | None = None,
    checkpoint_dir: str | None = None,
    freshness_s: float = 600.0,
    extra_checks: tuple = (),
) -> dict:
    """Pluggable health checks — the reference's ``pkg/api/health.go``
    liveness/readiness surface as a driver-side probe (no Spark job).

    Built-in checkers: snapshot loadable (hint readable, metadata
    parses), ledger sanity (committed versions ≤ current, floors below
    last batch), no paused streams (a paused ingest job is *not ready*),
    no open circuit breaker, checkpoint freshness vs feed mtime (a feed
    that moved while the checkpoint did not means the job is stalled),
    and metrics-log writability. ``feed_dir``/``checkpoint_dir`` default
    to the newest config backup archived next to the table (see
    ``cli config-backup``); without either source the freshness check is
    skipped, not failed. ``extra_checks``: iterable of ``(name, fn)``
    where ``fn() -> (ok, detail)`` — the pluggable part.

    Returns ``{"healthy": bool, "checks": [{name, ok, detail}, ...]}``.
    """
    checks: list[dict] = []

    def add(name: str, ok: bool, detail: str) -> None:
        checks.append({"name": name, "ok": bool(ok), "detail": detail})

    # -- snapshot loadable ------------------------------------------------
    snap = None
    try:
        snap = cl.load_snapshot(table_root)
        if snap is None:
            add("snapshot", False, "no table at root (missing version hint)")
        else:
            add("snapshot", True, f"version {snap.version} loads")
    except Exception as exc:  # noqa: BLE001 — any parse/IO failure is the finding
        add("snapshot", False, f"snapshot unreadable: {type(exc).__name__}: {exc}")

    # -- ledger sanity ----------------------------------------------------
    if snap is not None:
        bad = [
            (k, v) for k, v in snap.committed_batches.items() if v > snap.version
        ]
        floors_bad = []
        last: dict[str, int] = {}
        for k in snap.committed_batches:
            p = cl.parse_batch_key(k)
            if p:
                last[p[0]] = max(last.get(p[0], -1), p[1])
        for s, fl in snap.ledger_floor.items():
            if s in last and fl >= last[s] and snap.committed_batches:
                floors_bad.append((s, fl))
        ok = not bad and not floors_bad
        add(
            "ledger",
            ok,
            "consistent"
            if ok
            else f"future versions {bad}, floor≥retained {floors_bad}",
        )

    # -- paused streams (readiness) --------------------------------------
    try:
        paused = [
            m[: -len(".pause")]
            for m in os.listdir(_control_dir(table_root))
            if m.endswith(".pause")
        ]
    except FileNotFoundError:
        paused = []
    add(
        "streams_running",
        not paused,
        "no pause markers" if not paused else f"paused: {paused}",
    )

    # -- circuit breaker --------------------------------------------------
    open_breakers = {
        s: d for s, d in breaker_states(table_root).items()
        if d.get("state") not in ("closed", None)
    }
    add(
        "circuit_breaker",
        not open_breakers,
        "all closed" if not open_breakers else f"not closed: {open_breakers}",
    )

    # -- checkpoint freshness vs feed ------------------------------------
    if feed_dir is None and checkpoint_dir is None:
        cfg = _latest_config_backup(table_root)
        if cfg:
            feed_dir = cfg.get("feed_dir")
            checkpoint_dir = cfg.get("checkpoint_dir")
    if feed_dir and checkpoint_dir:
        fm = _tree_mtime(feed_dir)
        cm = _tree_mtime(os.path.join(checkpoint_dir, "commits"))
        if cm is None:
            cm = _tree_mtime(checkpoint_dir)
        if fm is None:
            add("checkpoint_freshness", True, "feed empty/absent — nothing to lag")
        elif cm is None:
            add("checkpoint_freshness", False, "feed has data but no checkpoint")
        else:
            lag = fm - cm
            add(
                "checkpoint_freshness",
                lag <= freshness_s,
                f"feed is {max(0, int(lag))}s ahead of checkpoint"
                f" (threshold {int(freshness_s)}s)",
            )
    else:
        add(
            "checkpoint_freshness",
            True,
            "skipped: no feed/checkpoint dirs (pass flags or archive a config backup)",
        )

    # -- metrics-log writability -----------------------------------------
    mdir = os.path.join(table_root, "_metrics")
    probe = mdir if os.path.isdir(mdir) else table_root
    add(
        "metrics_writable",
        os.access(probe, os.W_OK),
        f"{probe} writable" if os.access(probe, os.W_OK) else f"{probe} not writable",
    )

    # -- pluggable extras -------------------------------------------------
    for name, fn in extra_checks:
        try:
            ok, detail = fn()
        except Exception as exc:  # noqa: BLE001 — a crashing checker is a failure
            ok, detail = False, f"checker raised: {type(exc).__name__}: {exc}"
        add(name, ok, detail)

    return {"healthy": all(c["ok"] for c in checks), "checks": checks}


def _latest_config_backup(table_root: str) -> dict | None:
    d = os.path.join(table_root, "_config")
    try:
        names = sorted(
            n for n in os.listdir(d)
            if n.startswith("backup-") and n.endswith(".json")
        )
    except FileNotFoundError:
        return None
    if not names:
        return None
    try:
        with open(os.path.join(d, names[-1])) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def _tree_mtime(path: str) -> float | None:
    """Newest DIRECTORY mtime under ``path``, or None when the tree
    holds no regular data files.

    Stat'ing directories instead of files keeps the probe O(dirs), not
    O(files) — a liveness check against a 10^10-event feed must not
    walk millions of parquet stats per poll (review r4 #8). Sound for
    the freshness question because both sides of it only ever GROW by
    file creation (feed batches, checkpoint commits), and creating a
    file bumps its parent directory's mtime; in-place appends (which
    would not) do not occur in either tree. File NAMES are still
    iterated (free in the dirent listing) to distinguish an empty tree.
    Hidden/underscore bookkeeping entries (_SUCCESS, .crc) don't count
    as data files."""
    if not os.path.isdir(path):
        return None
    newest = None
    has_files = False
    for dirpath, _dirs, files in os.walk(path):
        try:
            m = os.path.getmtime(dirpath)
        except OSError:
            continue
        newest = m if newest is None else max(newest, m)
        if not has_files:
            has_files = any(not n.startswith((".", "_")) for n in files)
    return newest if has_files else None


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

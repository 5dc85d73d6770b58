"""Reference-semantics oracle: the reference applies events one at a
time, in log order, through a single consumer
(``pkg/replicator/service.go:391-413``). This pandas reimplementation of
that loop is the ground truth the parallel Spark engine must match
row-for-row (sha256(content) per key — BASELINE.json input_hint)."""

from __future__ import annotations

import hashlib
import json


def sequential_apply(events) -> dict[tuple, dict]:
    """events: iterable of dicts with event_id/seq/op/key{repo,path,commit}/doc.
    Applies in seq order with exact event_id dedup; returns final state
    key-tuple -> payload dict."""
    seen = set()
    state: dict[tuple, dict] = {}
    for ev in sorted(events, key=lambda e: (e["seq"], e["event_id"])):
        if ev["event_id"] in seen:
            continue
        seen.add(ev["event_id"])
        k = (ev["key"]["repo"], ev["key"]["path"], ev["key"]["commit"])
        if ev["op"] == "delete":
            state.pop(k, None)
        else:
            doc = json.loads(ev["doc"]) if ev["doc"] else {}
            doc = {c: v for c, v in doc.items() if c not in ("repo", "path", "commit")}
            state[k] = doc
    return state


def content_sha(state: dict[tuple, dict]) -> dict[tuple, str]:
    return {
        k: hashlib.sha256((v.get("content") or "").encode()).hexdigest()
        for k, v in state.items()
    }

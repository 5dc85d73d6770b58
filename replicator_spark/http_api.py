"""Management HTTP server — the reference's API transport
(``pkg/api/server.go:170-227`` route mux, ``pkg/api/health.go:140-161``
health handler, ``pkg/api/streams.go`` stream actions,
``pkg/api/config.go`` config endpoints, ``server.go:391-429`` bearer
auth), rebuilt on the stdlib ``ThreadingHTTPServer`` over the engine's
existing driver-side surfaces: ``lifecycle.health`` (pluggable checker
battery), ``lifecycle.status``/``pause``/``resume``,
``metrics.to_prometheus_text``, and the CLI's ``JobConfig`` validation
+ hot-reload watcher.

Routes (reference parity, legacy aliases included):

==========================  =====================================================
``GET /``                   API info (``handleRoot``, server.go:267)
``GET /api[/...]``          endpoint documentation (``handleAPIInfo``)
``GET /health[/]``          full checker battery; 200 healthy / 503 unhealthy
``GET /health/live``        process liveness — always 200 (K8s livenessProbe)
``GET /health/ready``       readiness = the same battery (K8s readinessProbe)
``GET /metrics``            Prometheus text exposition
``GET [/api/v1]/streams``   stream list + pagination (?page=&limit=)
``GET .../streams/<name>``  one stream (404 unknown)
``POST .../streams/<name>/actions``  ``{"action": pause|resume|stop|start|restart}``
``GET [/api/v1]/config``    current job config JSON
``PUT [/api/v1]/config``    validate + atomically replace (watcher hot-reloads)
==========================  =====================================================

Divergences (documented): the reference's StreamManager ``start``/
``stop``/``restart`` actions drive goroutine lifecycles (and are partly
simulated upstream — streams.go:72 "Simulate starting"); here the
runtime unit is the Spark streaming job, so ``stop`` maps to a pause
marker with reason ``stop`` and ``start``/``restart`` map to resume —
honored at micro-batch bounds like every other lifecycle transition.
Auth skips exactly ``/health`` and ``/metrics`` (server.go:393-396).

This is a driver-side control plane: every handler is O(metadata) file
reads (snapshot hint, markers, breaker JSON), no Spark jobs — safe to
poll from an operator at 1 Hz against a table with millions of files.
"""

from __future__ import annotations

import json
import os
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from . import lifecycle

_ENDPOINTS = [
    "GET /", "GET /api", "GET /health", "GET /health/live",
    "GET /health/ready", "GET /metrics", "GET /streams",
    "GET /streams/<name>", "POST /streams/<name>/actions",
    "GET /config", "PUT /config",
]

_STREAM_RE = re.compile(r"^/(?:api/v1/)?streams(?:/([^/]+))?(?:/(actions|metrics))?/?$")
_CONFIG_RE = re.compile(r"^/(?:api/v1/)?config/?$")


class ManagementServer:
    """Serve the management API for one table on an ephemeral (or
    fixed) port.  ``start()`` returns the base URL; the server runs on
    daemon threads (one per request — ThreadingHTTPServer) and holds no
    Spark session."""

    def __init__(
        self,
        table_root: str,
        *,
        config_path: str | None = None,
        feed_dir: str | None = None,
        checkpoint_dir: str | None = None,
        freshness_s: float = 600.0,
        extra_checks: tuple = (),
        auth_tokens: tuple[str, ...] = (),
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self.table_root = table_root
        self.config_path = config_path
        self.feed_dir = feed_dir
        self.checkpoint_dir = checkpoint_dir
        self.freshness_s = freshness_s
        self.extra_checks = tuple(extra_checks)
        self.auth_tokens = tuple(auth_tokens)
        self._host, self._port = host, port
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- lifecycle --------------------------------------------------------

    def start(self) -> str:
        handler = _make_handler(self)
        self._httpd = ThreadingHTTPServer((self._host, self._port), handler)
        self._httpd.daemon_threads = True
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="mgmt-api", daemon=True
        )
        self._thread.start()
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    # -- data builders (shared with tests) --------------------------------

    def api_info(self) -> dict:
        return {
            "service": "replicator_spark",
            "table": self.table_root,
            "endpoints": _ENDPOINTS,
        }

    def health(self) -> dict:
        return lifecycle.health(
            self.table_root,
            feed_dir=self.feed_dir,
            checkpoint_dir=self.checkpoint_dir,
            freshness_s=self.freshness_s,
            extra_checks=self.extra_checks,
        )

    def stream_list(self, page: int = 0, limit: int = 0) -> dict:
        st = lifecycle.status(self.table_root)
        breakers = lifecycle.breaker_states(self.table_root)
        names = sorted(st.get("streams", {}))
        total = len(names)
        if limit > 0 and page > 0:  # streams.go:195-205 pagination law
            names = names[(page - 1) * limit : (page - 1) * limit + limit]
        streams = []
        for n in names:
            info = dict(st["streams"][n], name=n)
            if n in breakers:
                info["breaker"] = breakers[n]
            streams.append(info)
        return {
            "streams": streams,
            "total": total,
            "page": page,
            "limit": limit,
            "table_version": st.get("version"),
        }

    def stream_get(self, name: str) -> dict | None:
        st = lifecycle.status(self.table_root)
        if name not in st.get("streams", {}):
            return None
        info = dict(st["streams"][name], name=name)
        breaker = lifecycle.breaker_states(self.table_root).get(name)
        if breaker:
            info["breaker"] = breaker
        return info

    def stream_metrics(self, name: str) -> dict:
        """Per-stream counter totals from the metrics log (the
        reference's GET /streams/<id>/metrics,
        streams.go:386-390) — batches attributed by batch-key prefix."""
        from . import commitlog as cl
        from .metrics import _iter_rows

        totals: dict[str, float] = {}
        n = 0
        for row in _iter_rows(os.path.join(self.table_root, "_metrics")):
            p = cl.parse_batch_key(row.get("batch_key") or "")
            if (p[0] if p else row.get("batch_key")) != name:
                continue
            n += 1
            for k, v in row.items():
                # ts_ms is a wall-clock stamp, snapshot_version a table
                # pointer — summing either yields a meaningless
                # pseudo-counter next to the real ones
                if isinstance(v, (int, float)) and k not in (
                    "snapshot_version", "ts_ms"
                ):
                    totals[k] = totals.get(k, 0) + v
        return {"stream": name, "batches": n, "totals": totals}

    def stream_action(self, name: str, action: str) -> dict:
        # streams.go:277-291 action vocabulary; divergence documented in
        # the module docstring (Spark job ⇒ pause/resume semantics).
        if action == "pause":
            out = lifecycle.pause(self.table_root, name)
        elif action == "stop":
            out = lifecycle.pause(self.table_root, name, reason="stop")
        elif action in ("resume", "start", "restart"):
            out = lifecycle.resume(self.table_root, name)
        else:
            raise ValueError(f"unknown action {action!r}")
        return {"success": True, "action": action, "stream": name, **out}

    def config_get(self) -> dict | None:
        if not self.config_path or not os.path.exists(self.config_path):
            return None
        with open(self.config_path) as f:
            return json.load(f)

    def config_put(self, body: dict) -> list[str]:
        """Validate via the CLI's JobConfig law; on success replace the
        file atomically (the ``watch_config`` hot-reload picks it up at
        the next micro-batch).  Changes to the watcher's PINNED identity
        fields are rejected here too — the running job would refuse the
        reload anyway (cli.py run_streaming_watched), and accepting the
        write would leave a divergent on-disk config that silently takes
        effect (with a fresh batch-id sequence) at the next restart.
        Returns validation errors ([] = ok)."""
        from . import commitlog as cl
        from .cli import PINNED_IDENTITY_FIELDS, JobConfig

        cfg = JobConfig.from_dict(body)  # raises on unknown keys
        errs = cfg.validate()
        if errs or not self.config_path:
            return errs or ["server has no config_path configured"]
        current = self.config_get()
        if current is not None:
            # THE pinned set — shared with cli.run_streaming_watched so
            # this gate can't accept a change the watcher would reject
            pinned = PINNED_IDENTITY_FIELDS
            cur_cfg = JobConfig.from_dict(current)
            changed = [
                f for f in pinned
                if getattr(cfg, f) != getattr(cur_cfg, f)
            ]
            if changed:
                return [f"pinned identity fields changed: {changed}"]
        # unique-temp atomic publish (concurrent PUTs must never
        # interleave into the same temp file)
        cl._atomic_write(self.config_path, json.dumps(body, indent=2))
        return []


def _make_handler(srv: ManagementServer):
    class Handler(BaseHTTPRequestHandler):
        server_version = "replicator-spark-mgmt/1.0"

        def log_message(self, *a):  # tests are noisy enough
            pass

        # -- plumbing -----------------------------------------------------

        def _send(self, code: int, payload, content_type="application/json"):
            body = (
                payload.encode()
                if isinstance(payload, str)
                else json.dumps(payload, indent=2).encode()
            )
            self.send_response(code)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _error(self, code: int, msg: str):
            self._send(code, {"error": msg})

        def _authed(self) -> bool:
            # server.go:393-396 — auth skips exactly /health and /metrics
            if not srv.auth_tokens:
                return True
            path = self.path.split("?")[0]
            # include the trailing-slash aliases do_GET itself serves
            if path in ("/health", "/health/", "/metrics", "/metrics/"):
                return True
            hdr = self.headers.get("Authorization", "")
            if not hdr.startswith("Bearer "):
                return False
            return hdr[len("Bearer "):] in srv.auth_tokens

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        # -- verbs --------------------------------------------------------

        def do_GET(self):
            if not self._authed():
                return self._error(401, "unauthorized")
            path, _, query = self.path.partition("?")
            if path == "/" :
                return self._send(200, srv.api_info())
            if path == "/api" or path.startswith("/api/") and _STREAM_RE.match(path) is None and _CONFIG_RE.match(path) is None:
                return self._send(200, srv.api_info())
            if path in ("/health", "/health/"):
                h = srv.health()
                return self._send(200 if h["healthy"] else 503, h)
            if path == "/health/live":
                return self._send(200, {"status": "alive"})
            if path == "/health/ready":
                h = srv.health()
                return self._send(
                    200 if h["healthy"] else 503,
                    {"status": "ready" if h["healthy"] else "not ready", **h},
                )
            if path in ("/metrics", "/metrics/"):
                from .metrics import to_prometheus_text

                return self._send(
                    200,
                    to_prometheus_text(srv.table_root),
                    content_type="text/plain; version=0.0.4",
                )
            m = _CONFIG_RE.match(path)
            if m:
                cfg = srv.config_get()
                if cfg is None:
                    return self._error(404, "no config_path configured")
                return self._send(200, cfg)
            m = _STREAM_RE.match(path)
            if m:
                name, sub = m.group(1), m.group(2)
                if name is None:
                    params = dict(
                        kv.split("=", 1) for kv in query.split("&") if "=" in kv
                    )
                    try:
                        page = int(params.get("page", 0))
                        limit = int(params.get("limit", 0))
                    except ValueError:
                        return self._error(400, "page/limit must be integers")
                    return self._send(200, srv.stream_list(page, limit))
                info = srv.stream_get(name)
                if info is None:
                    return self._error(404, f"unknown stream {name!r}")
                if sub == "actions":
                    return self._error(405, "actions is POST-only")
                if sub == "metrics":
                    return self._send(200, srv.stream_metrics(name))
                return self._send(200, info)
            return self._error(404, "not found")

        def do_POST(self):
            if not self._authed():
                return self._error(401, "unauthorized")
            path = self.path.split("?")[0]
            m = _STREAM_RE.match(path)
            if m and m.group(2) == "actions" and m.group(1):
                if srv.stream_get(m.group(1)) is None:
                    # a typo'd name must not plant a phantom pause
                    # marker (it would flip /health/ready to 503)
                    return self._error(404, f"unknown stream {m.group(1)!r}")
                try:
                    body = self._body()
                except json.JSONDecodeError:
                    return self._error(400, "invalid JSON body")
                action = body.get("action")
                if not action:
                    return self._error(400, "action is required")
                try:
                    return self._send(200, srv.stream_action(m.group(1), action))
                except ValueError as e:
                    return self._error(400, str(e))
            return self._error(404, "not found")

        def do_PUT(self):
            if not self._authed():
                return self._error(401, "unauthorized")
            path = self.path.split("?")[0]
            if _CONFIG_RE.match(path):
                try:
                    body = self._body()
                except json.JSONDecodeError:
                    return self._error(400, "invalid JSON body")
                try:
                    errs = srv.config_put(body)
                except (ValueError, TypeError) as e:
                    return self._send(422, {"updated": False, "errors": [str(e)]})
                if errs:
                    return self._send(422, {"updated": False, "errors": errs})
                return self._send(200, {"updated": True})
            return self._error(404, "not found")

    return Handler


__all__ = ["ManagementServer"]

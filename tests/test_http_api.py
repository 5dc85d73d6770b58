"""Management HTTP server: route parity with pkg/api/server.go
(health/metrics/streams/config + legacy aliases), bearer auth with the
reference's /health + /metrics skip, stream actions over the pause
marker machinery, and config PUT validation.  All handlers are
driver-side metadata reads — no Spark job per request."""

import json
import urllib.error
import urllib.request

import pytest

from replicator_spark.feedgen import gen_changes, write_feed
from replicator_spark.http_api import ManagementServer
from replicator_spark.laketable import LakeTable
from replicator_spark.model import REPOS_SCHEMA
from replicator_spark.pipeline import replay_feed


def _req(url, method="GET", body=None, token=None):
    req = urllib.request.Request(url, method=method)
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    data = None
    if body is not None:
        data = json.dumps(body).encode()
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req, data=data, timeout=10) as r:
            return r.status, r.headers.get("Content-Type", ""), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type", ""), e.read()


def _j(resp):
    return json.loads(resp[2])


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("httpapi")
    feed, root = str(tmp / "feed"), str(tmp / "table")
    write_feed(gen_changes(spark, 800, n_repos=5, n_batches=2), feed)
    t = LakeTable(spark, root)
    t.create(REPOS_SCHEMA, num_buckets=4)
    replay_feed(spark, feed, t, mode="mor")
    cfg_path = str(tmp / "job.json")
    cfg = {
        "name": "httpjob", "feed_dir": feed, "table_root": root,
        "streaming": False, "mode": "mor",
    }
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    srv = ManagementServer(root, config_path=cfg_path, feed_dir=feed)
    base = srv.start()
    yield srv, base, root
    srv.stop()


def test_root_and_api_info(served):
    _, base, root = served
    for path in ("/", "/api", "/api/"):
        code, ctype, _ = _req(base + path)
        assert code == 200 and ctype.startswith("application/json")
    info = _j(_req(base + "/"))
    assert info["service"] == "replicator_spark" and info["table"] == root
    assert "GET /health" in info["endpoints"]


def test_health_live_ready(served):
    _, base, _ = served
    assert _req(base + "/health/live")[0] == 200
    code, _, _ = _req(base + "/health")
    assert code == 200  # fresh table, no paused streams, no breaker
    ready = _j(_req(base + "/health/ready"))
    assert ready["status"] == "ready"
    assert any(c["name"] == "snapshot" for c in ready["checks"])


def test_metrics_prometheus_text(served):
    _, base, _ = served
    code, ctype, body = _req(base + "/metrics")
    assert code == 200 and ctype.startswith("text/plain")
    assert b"replicator_" in body  # exposition lines present


def test_stream_list_detail_and_pagination(served):
    _, base, _ = served
    for prefix in ("", "/api/v1"):
        out = _j(_req(base + prefix + "/streams"))
        assert out["total"] >= 1
        names = [s["name"] for s in out["streams"]]
        assert "feed" in names
    page1 = _j(_req(base + "/streams?page=1&limit=1"))
    assert len(page1["streams"]) == 1 and page1["total"] >= 1
    detail = _j(_req(base + "/streams/feed"))
    assert detail["name"] == "feed" and detail["last_batch"] is not None
    assert _req(base + "/streams/nosuch")[0] == 404
    assert _req(base + "/streams?page=x&limit=1")[0] == 400


def test_stream_actions_pause_resume_cycle(served):
    srv, base, root = served
    from replicator_spark import lifecycle

    code, _, body = _req(
        base + "/streams/feed/actions", method="POST", body={"action": "pause"}
    )
    assert code == 200 and json.loads(body)["success"]
    assert lifecycle.is_paused(root, "feed")
    # paused stream → not ready (the reference's readiness contract)
    assert _req(base + "/health/ready")[0] == 503
    code, _, _ = _req(
        base + "/streams/feed/actions", method="POST", body={"action": "resume"}
    )
    assert code == 200 and not lifecycle.is_paused(root, "feed")
    assert _req(base + "/health/ready")[0] == 200
    # stop/start map to pause/resume markers (documented divergence)
    _req(base + "/streams/feed/actions", method="POST", body={"action": "stop"})
    assert lifecycle.is_paused(root, "feed")
    _req(base + "/streams/feed/actions", method="POST", body={"action": "start"})
    assert not lifecycle.is_paused(root, "feed")
    assert _req(
        base + "/streams/feed/actions", method="POST", body={"action": "zap"}
    )[0] == 400
    assert _req(
        base + "/streams/feed/actions", method="POST", body={}
    )[0] == 400
    # typo'd stream: 404, and no phantom pause marker planted
    assert _req(
        base + "/streams/fede/actions", method="POST", body={"action": "pause"}
    )[0] == 404
    assert not lifecycle.is_paused(root, "fede")
    assert _req(base + "/health/ready")[0] == 200


def test_stream_metrics_endpoint(served):
    _, base, _ = served
    m = _j(_req(base + "/streams/feed/metrics"))
    assert m["stream"] == "feed" and m["batches"] >= 2
    assert m["totals"]["applied"] > 0 and m["totals"]["received"] > 0
    # wall-clock stamps and snapshot pointers are not counters — summing
    # ts_ms would surface a ~1.7e12×batches pseudo-counter
    assert "ts_ms" not in m["totals"] and "snapshot_version" not in m["totals"]
    assert _req(base + "/streams/nosuch/metrics")[0] == 404


def test_config_get_put_validation(served):
    srv, base, _ = served
    cfg = _j(_req(base + "/config"))
    assert cfg["name"] == "httpjob"
    # legacy + versioned alias
    assert _j(_req(base + "/api/v1/config")) == cfg
    # invalid: streaming without checkpoint_dir → 422, file untouched
    bad = dict(cfg, streaming=True)
    code, _, body = _req(base + "/config", method="PUT", body=bad)
    assert code == 422 and not json.loads(body)["updated"]
    assert _j(_req(base + "/config"))["streaming"] is False
    # unknown key → 422 (JobConfig.from_dict raises)
    code, _, _ = _req(base + "/config", method="PUT", body=dict(cfg, nope=1))
    assert code == 422
    # valid update lands atomically
    good = dict(cfg, compact_after_deltas=5)
    code, _, _ = _req(base + "/config", method="PUT", body=good)
    assert code == 200
    assert _j(_req(base + "/config"))["compact_after_deltas"] == 5
    # pinned identity fields: the running watcher would refuse the
    # reload, so the PUT must refuse too (not leave a divergent file
    # that takes effect with fresh batch ids at next restart)
    pinned = dict(good, feed_dir=good["feed_dir"] + "_moved")
    code, _, body = _req(base + "/config", method="PUT", body=pinned)
    assert code == 422 and "pinned" in json.loads(body)["errors"][0]
    assert _j(_req(base + "/config"))["feed_dir"] == good["feed_dir"]


def test_bearer_auth_skips_health_and_metrics(spark, tmp_path):
    feed, root = str(tmp_path / "feed"), str(tmp_path / "table")
    write_feed(gen_changes(spark, 400, n_repos=3, n_batches=1), feed)
    t = LakeTable(spark, root)
    t.create(REPOS_SCHEMA, num_buckets=2)
    replay_feed(spark, feed, t, mode="mor")
    srv = ManagementServer(root, auth_tokens=("sekrit",))
    base = srv.start()
    try:
        # the reference skips auth for exactly /health and /metrics
        # (including the trailing-slash aliases the GET handler serves)
        assert _req(base + "/health")[0] in (200, 503)
        assert _req(base + "/metrics")[0] == 200
        assert _req(base + "/health/")[0] in (200, 503)
        assert _req(base + "/metrics/")[0] == 200
        assert _req(base + "/streams")[0] == 401
        assert _req(base + "/")[0] == 401
        assert _req(base + "/health/ready")[0] == 401  # not in skip list
        assert _req(base + "/streams", token="wrong")[0] == 401
        assert _req(base + "/streams", token="sekrit")[0] == 200
        code, _, _ = _req(
            base + "/streams/feed/actions", method="POST",
            body={"action": "pause"},
        )
        assert code == 401  # POST without token
        code, _, _ = _req(
            base + "/streams/feed/actions", method="POST",
            body={"action": "pause"}, token="sekrit",
        )
        assert code == 200
    finally:
        srv.stop()


def test_cli_serve_subprocess(served):
    """`cli serve` runs the server as its own process (the reference's
    deployment shape: API server beside the stream runner) and exits
    cleanly on SIGTERM."""
    import signal
    import subprocess
    import sys as _sys

    _, _, root = served
    proc = subprocess.Popen(
        [_sys.executable, "-m", "replicator_spark.cli", "serve",
         "--table-root", root, "--port", "0"],
        stdout=subprocess.PIPE, text=True, cwd="/root/repo",
    )
    try:
        line = proc.stdout.readline()
        base = json.loads(line)["serving"]
        assert _req(base + "/health/live")[0] == 200
        assert _j(_req(base + "/streams"))["total"] >= 1
    finally:
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=10) == 0


def test_run_with_serve_port_exposes_api_during_job(spark, tmp_path):
    """`run` with serve_port starts the management API beside the job
    (the reference's API-server-plus-runner process shape) — liveness
    answers before the JVM finishes spinning up, and the server is torn
    down when the job exits."""
    import subprocess
    import sys as _sys

    feed = str(tmp_path / "feed")
    write_feed(gen_changes(spark, 3000, n_repos=6, n_batches=3), feed)
    cfg = {
        "name": "servejob", "feed_dir": feed,
        "table_root": str(tmp_path / "table"),
        "streaming": False, "mode": "mor", "num_buckets": 4,
        "serve_port": 0,
    }
    cfg_path = str(tmp_path / "job.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    proc = subprocess.Popen(
        [_sys.executable, "-m", "replicator_spark.cli", "run",
         "--config", cfg_path],
        stdout=subprocess.PIPE, text=True, cwd="/root/repo",
    )
    try:
        base = json.loads(proc.stdout.readline())["serving"]
        # probe while the job is still inside JVM startup / replay
        assert _req(base + "/health/live")[0] == 200
        assert _req(base + "/streams")[0] == 200  # pre-create: empty list
        out, _ = proc.communicate(timeout=300)
        assert proc.returncode == 0
        result = json.loads(out.strip().splitlines()[-1])
        assert result["live_rows"] > 0
        # server torn down with the job
        with pytest.raises(Exception):
            _req(base + "/health/live")
    finally:
        if proc.poll() is None:
            proc.kill()


def test_404_and_method_guards(served):
    _, base, _ = served
    assert _req(base + "/nope")[0] == 404
    assert _req(base + "/streams/feed/actions")[0] == 405  # GET on actions
    assert _req(base + "/streams", method="POST", body={})[0] == 404
    code, _, _ = _req(base + "/config", method="PUT", body=None)
    assert code == 422  # empty body → name required

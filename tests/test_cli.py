"""CLI entry point: config validation flags + an end-to-end run."""

import json

from replicator_spark import cli
from replicator_spark.feedgen import gen_changes, write_feed


def _cfg(tmp_path, **over):
    d = {
        "name": "t",
        "feed_dir": str(tmp_path / "feed"),
        "table_root": str(tmp_path / "table"),
        "checkpoint_dir": str(tmp_path / "ckpt"),
        "streaming": False,
        "mode": "mor",
        "num_buckets": 4,
    }
    d.update(over)
    p = tmp_path / "job.json"
    p.write_text(json.dumps(d))
    return str(p)


def test_validate_ok(tmp_path, capsys):
    assert cli.main(["validate", "--config", _cfg(tmp_path)]) == 0
    assert "config valid" in capsys.readouterr().out


def test_validate_catches_errors(tmp_path, capsys):
    p = _cfg(tmp_path, mode="upsert", streaming=True, checkpoint_dir=None)
    assert cli.main(["validate", "--config", p]) == 1
    err = capsys.readouterr().err
    assert "mode must be" in err and "checkpoint_dir" in err


def test_unknown_key_rejected(tmp_path):
    import pytest

    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"name": "x", "feed_dir": "f", "table_root": "t", "oops": 1}))
    with pytest.raises(ValueError, match="unknown config keys"):
        cli.main(["validate", "--config", str(p)])


def test_show_config(tmp_path, capsys):
    assert cli.main(["show-config", "--config", _cfg(tmp_path)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["mode"] == "mor" and out["num_buckets"] == 4


def test_run_batch_job(spark, tmp_path, capsys):
    cfg = _cfg(tmp_path, transform_rules=[
        {"name": "noop", "actions": [{"type": "pass"}]},
    ])
    write_feed(gen_changes(spark, 800, n_repos=5, n_batches=2), str(tmp_path / "feed"))
    assert cli.main(["run", "--config", cfg]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["live_rows"] > 0 and out["version"] == 2


def test_prometheus_text_format(spark, tmp_path):
    """Counters render in Prometheus exposition format and add up."""
    from replicator_spark.feedgen import gen_changes, write_feed
    from replicator_spark.laketable import LakeTable
    from replicator_spark.metrics import to_prometheus_text
    from replicator_spark.model import REPOS_SCHEMA
    from replicator_spark.pipeline import replay_feed

    feed, root = str(tmp_path / "feed"), str(tmp_path / "table")
    write_feed(gen_changes(spark, 800, n_batches=2), feed)
    t = LakeTable(spark, root)
    t.create(REPOS_SCHEMA, num_buckets=4)
    res = replay_feed(spark, feed, t, mode="mor")
    text = to_prometheus_text(root)
    assert "# TYPE replicator_received_records_total counter" in text
    received = sum(r.received for r in res)
    assert f"replicator_received_records_total {received}" in text
    assert f"replicator_batches_total {len(res)}" in text


def test_pause_resume_roundtrip_final_state_intact(spark, tmp_path):
    """Lifecycle round-trip (pkg/api/streams.go analogue): pause stops a
    replay mid-feed, resume + rerun continues from the ledger, and the
    final state equals an uninterrupted replay."""
    import json as _json

    from replicator_spark.cli import main as cli_main
    from replicator_spark.feedgen import gen_changes, write_feed
    from replicator_spark.laketable import LakeTable
    from replicator_spark.model import REPOS_SCHEMA
    from replicator_spark.pipeline import replay_feed

    feed = str(tmp_path / "feed")
    write_feed(gen_changes(spark, 2000, n_repos=6, n_batches=4), feed)

    # reference run: uninterrupted
    ref = LakeTable(spark, str(tmp_path / "ref"))
    ref.create(REPOS_SCHEMA, num_buckets=4)
    replay_feed(spark, feed, ref, mode="mor", write_metrics=False)
    want = ref.read().count()

    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(REPOS_SCHEMA, num_buckets=4)
    # apply 2 of 4 batches, then pause via the CLI
    replay_feed(spark, feed, t, batches=[0, 1], mode="mor", write_metrics=False)
    assert cli_main(["pause", "--table-root", t.root, "--stream", "feed"]) == 0

    # paused: a full replay applies NOTHING further
    res = replay_feed(spark, feed, t, mode="mor", write_metrics=False)
    assert res == []  # stopped before the first batch
    assert len(t.committed_batches()) == 2

    # status reflects the pause
    from replicator_spark.lifecycle import status

    st = status(t.root)
    assert st["streams"]["feed"]["state"] == "paused"
    assert st["streams"]["feed"]["last_batch"] == 1

    # resume: rerun completes; batches 0-1 replay as no-ops
    assert cli_main(["resume", "--table-root", t.root, "--stream", "feed"]) == 0
    res = replay_feed(spark, feed, t, mode="mor", write_metrics=False)
    assert [r.merge.replayed for r in res] == [True, True, False, False]
    assert t.read().count() == want

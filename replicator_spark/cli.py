"""spark-submit entry point — the analogue of the reference's
``cmd/replicator/main.go`` (flags, config load/validate, service start).

A job spec (JSON or YAML-subset) plays the role of the reference's
stream config (``pkg/config/config.go:93-104``): source feed, target
table, transform rules, mode, tuning. ``--validate`` and
``--show-config`` mirror the reference's flags (``main.go:22-101``).

Usage::

    spark-submit --py-files replicator_spark.zip -m replicator_spark.cli \\
        run --config job.json
    python -m replicator_spark.cli validate --config job.json
"""

from __future__ import annotations

import argparse
import json
import sys
from dataclasses import dataclass, field


@dataclass
class JobConfig:
    name: str
    feed_dir: str
    table_root: str
    checkpoint_dir: str | None = None
    mode: str = "mor"  # cow | mor
    streaming: bool = True
    num_buckets: int = 32
    files_per_bucket: int | str | None = "auto"
    compact_after_deltas: int = 8
    max_files_per_trigger: int | None = None
    transform_rules: list[dict] = field(default_factory=list)
    enabled: bool = True

    @staticmethod
    def from_dict(d: dict) -> "JobConfig":
        known = {f for f in JobConfig.__dataclass_fields__}
        unknown = set(d) - known
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return JobConfig(**d)

    def validate(self) -> list[str]:
        errs = []
        if not self.name:
            errs.append("name is required")
        if self.mode not in ("cow", "mor"):
            errs.append(f"mode must be cow|mor, got {self.mode}")
        if self.streaming and not self.checkpoint_dir:
            errs.append("streaming jobs require checkpoint_dir")
        if not self.feed_dir or not self.table_root:
            errs.append("feed_dir and table_root are required")
        return errs


def load_config(path: str) -> JobConfig:
    with open(path) as f:
        return JobConfig.from_dict(json.load(f))


def _build_engine(cfg: JobConfig):
    if not cfg.transform_rules:
        return None
    from .model import KEY_COLS
    from .transform import Action, Condition, Rule, TransformEngine

    rules = []
    for rd in cfg.transform_rules:
        rules.append(
            Rule(
                name=rd["name"],
                priority=rd.get("priority", 0),
                enabled=rd.get("enabled", True),
                conditions=[Condition(**c) for c in rd.get("conditions", [])],
                actions=[Action(a["type"], a.get("spec", {})) for a in rd.get("actions", [])],
                error_policy=rd.get("error_policy", "fail_fast"),
                validate=Condition(**rd["validate"]) if rd.get("validate") else None,
            )
        )
    return TransformEngine(rules, protected=("event_id", "seq", "op", *KEY_COLS))


def cmd_run(cfg: JobConfig) -> int:
    from .laketable import LakeTable
    from .model import REPOS_SCHEMA
    from .pipeline import replay_feed
    from .session import get_spark
    from .streaming import run_stream_to_completion

    spark = get_spark(cfg.name)
    table = LakeTable(spark, cfg.table_root)
    if not table.exists():
        table.create(REPOS_SCHEMA, num_buckets=cfg.num_buckets)
    engine = _build_engine(cfg)
    if cfg.streaming:
        run_stream_to_completion(
            spark,
            cfg.feed_dir,
            table,
            cfg.checkpoint_dir,
            mode=cfg.mode,
            files_per_bucket=cfg.files_per_bucket,
            max_files_per_trigger=cfg.max_files_per_trigger,
            stream_name=cfg.name,
        )
    else:
        replay_feed(
            spark,
            cfg.feed_dir,
            table,
            mode=cfg.mode,
            files_per_bucket=cfg.files_per_bucket,
            compact_after_deltas=cfg.compact_after_deltas,
            stream_name=cfg.name,  # namespace the ledger per stream
        )
    n = table.read().count()
    print(json.dumps({"job": cfg.name, "live_rows": n, "version": table._snap().version}))
    return 0


def cmd_lifecycle(cmd: str, table_root: str, stream: str | None) -> int:
    """pause / resume / status — the reference's per-stream lifecycle
    API (``pkg/api/streams.go``; states ``pkg/models/models.go:78-105``)
    as CLI subcommands over the marker + snapshot-log state."""
    from . import lifecycle

    if cmd == "status":
        print(json.dumps(lifecycle.status(table_root), indent=2))
        return 0
    if not stream:
        print("error: --stream is required for pause/resume", file=sys.stderr)
        return 1
    out = lifecycle.pause(table_root, stream) if cmd == "pause" else lifecycle.resume(
        table_root, stream
    )
    print(json.dumps(out))
    return 0


def cmd_metrics(table_root: str) -> int:
    """Print cumulative counters in Prometheus exposition format — the
    reference's ``/metrics`` endpoint (``pkg/api/metrics.go``) as a CLI."""
    from .metrics import to_prometheus_text

    print(to_prometheus_text(table_root), end="")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="replicator_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    for c in ("run", "validate", "show-config"):
        sp = sub.add_parser(c)
        sp.add_argument("--config", required=True)
    mp = sub.add_parser("metrics")
    mp.add_argument("--table-root", required=True)
    for c in ("pause", "resume", "status"):
        lp = sub.add_parser(c)
        lp.add_argument("--table-root", required=True)
        lp.add_argument("--stream", default=None)
    args = p.parse_args(argv)

    if args.cmd == "metrics":
        return cmd_metrics(args.table_root)
    if args.cmd in ("pause", "resume", "status"):
        return cmd_lifecycle(args.cmd, args.table_root, args.stream)

    cfg = load_config(args.config)
    errs = cfg.validate()
    if args.cmd == "validate":
        if errs:
            print("\n".join(f"error: {e}" for e in errs), file=sys.stderr)
            return 1
        print("config valid")
        return 0
    if args.cmd == "show-config":
        print(json.dumps(cfg.__dict__, indent=2))
        return 0
    if errs:
        print("\n".join(f"error: {e}" for e in errs), file=sys.stderr)
        return 1
    return cmd_run(cfg)


if __name__ == "__main__":
    sys.exit(main())

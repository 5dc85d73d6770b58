"""QoS envelope: retry-with-backoff + circuit breaker (the reference's
declared-only ``QualityOfService`` block, ``pkg/models/types.go:110-134``,
made real around the micro-batch apply)."""

import pytest

from replicator_spark.qos import (
    CircuitBreaker,
    CircuitBreakerConfig,
    CircuitOpen,
    QoS,
    RetryPolicy,
    call_with_qos,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_retry_backoff_then_success():
    calls = {"n": 0}
    delays = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    out = call_with_qos(
        flaky,
        retry=RetryPolicy(max_retries=5, initial_delay_s=1.0, backoff_factor=2.0),
        sleep=delays.append,
    )
    assert out == "ok" and calls["n"] == 3
    assert delays == [1.0, 2.0]  # exponential


def test_retry_respects_retryable_errors_and_max():
    rp = RetryPolicy(max_retries=2, retryable_errors=("Timeout",))

    def always_fatal():
        raise ValueError("schema mismatch")

    with pytest.raises(ValueError):
        call_with_qos(always_fatal, retry=rp, sleep=lambda s: None)

    calls = {"n": 0}

    def always_timeout():
        calls["n"] += 1
        raise RuntimeError("Timeout connecting")

    with pytest.raises(RuntimeError):
        call_with_qos(always_timeout, retry=rp, sleep=lambda s: None)
    assert calls["n"] == 3  # initial + 2 retries


def test_breaker_opens_then_half_opens_then_closes():
    clock = FakeClock()
    br = CircuitBreaker(
        CircuitBreakerConfig(failure_threshold=3, recovery_timeout_s=60), clock=clock
    )
    for _ in range(3):
        assert br.allows()
        br.record_failure()
    assert br.state == "open" and not br.allows()
    clock.t = 61
    assert br.allows() and br.state == "half_open"
    br.record_success()
    assert br.state == "closed" and br.allows()


def test_breaker_half_open_failure_reopens():
    clock = FakeClock()
    br = CircuitBreaker(
        CircuitBreakerConfig(failure_threshold=1, recovery_timeout_s=10), clock=clock
    )
    br.record_failure()
    assert br.state == "open"
    clock.t = 11
    assert br.allows()
    br.record_failure()  # probe failed
    assert br.state == "open" and not br.allows()
    # and the recovery clock restarted
    clock.t = 20
    assert not br.allows()
    clock.t = 22
    assert br.allows()


def test_breaker_half_open_limits_probes():
    clock = FakeClock()
    br = CircuitBreaker(
        CircuitBreakerConfig(
            failure_threshold=1, recovery_timeout_s=1, half_open_requests=1
        ),
        clock=clock,
    )
    br.record_failure()
    clock.t = 2
    assert br.allows()
    br.half_open_inflight += 1  # what call_with_qos does on admit
    assert not br.allows()  # second concurrent probe rejected


def test_call_with_qos_raises_circuit_open_when_not_waiting():
    br = CircuitBreaker(CircuitBreakerConfig(failure_threshold=1))
    with pytest.raises(ZeroDivisionError):
        call_with_qos(lambda: 1 / 0, breaker=br, sleep=lambda s: None)
    with pytest.raises(CircuitOpen):
        call_with_qos(lambda: "ok", breaker=br, wait_when_open=False)


def test_call_with_qos_waits_for_recovery_and_succeeds():
    clock = FakeClock()
    br = CircuitBreaker(
        CircuitBreakerConfig(failure_threshold=1, recovery_timeout_s=5), clock=clock
    )
    br.record_failure()

    def advance(s):
        clock.t += s

    out = call_with_qos(lambda: "recovered", breaker=br, sleep=advance)
    assert out == "recovered" and br.state == "closed"


def test_qos_from_dict_reference_vocabulary():
    q = QoS.from_dict(
        {
            "retry_policy": {"max_retries": 7, "initial_delay": 0.1,
                             "backoff_factor": 3.0,
                             "retryable_errors": ["Timeout"]},
            "circuit_breaker": {"failure_threshold": 2,
                                "recovery_timeout": 9.0,
                                "half_open_requests": 2},
        }
    )
    assert q.retry.max_retries == 7 and q.retry.backoff_factor == 3.0
    assert q.breaker.config.failure_threshold == 2
    assert q.breaker.config.recovery_timeout_s == 9.0
    assert QoS.from_dict(None) is None
    assert QoS.from_dict({}) is None


def test_replay_feed_retry_is_exactly_once(spark, tmp_path):
    """A batch that fails mid-apply and is retried lands exactly once:
    abort-before-commit + ledger idempotence under the QoS envelope."""
    from replicator_spark.laketable import LakeTable
    from replicator_spark.model import REPOS_SCHEMA
    from replicator_spark.pipeline import replay_feed

    from .test_incremental_read import _ordered_feed

    feed = _ordered_feed(spark, tmp_path, n=800)
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(REPOS_SCHEMA, num_buckets=4)

    # sabotage the first attempt of batch 1: monkeypatch merge to fail
    # once before anything is committed (the abort-uncommitted case)
    orig_merge = LakeTable.merge
    fails = {"left": 1}

    def failing_pre(self, batch, batch_key, **kw):
        if batch_key.endswith("-1") and fails["left"]:
            fails["left"] = 0
            raise RuntimeError("transient sink outage")
        return orig_merge(self, batch, batch_key, **kw)

    LakeTable.merge = failing_pre
    try:
        res = replay_feed(
            spark, feed, t, mode="mor", write_metrics=False,
            qos=QoS(retry=RetryPolicy(max_retries=2, initial_delay_s=0.0)),
        )
    finally:
        LakeTable.merge = orig_merge
    assert len(res) == 4 and not any(r.merge.replayed for r in res)
    # exactly-once: final state identical to a clean replay
    t2 = LakeTable(spark, str(tmp_path / "t2"))
    t2.create(REPOS_SCHEMA, num_buckets=4)
    replay_feed(spark, feed, t2, mode="mor", write_metrics=False)
    a = t.read().orderBy("repo", "path", "commit")
    b = t2.read().orderBy("repo", "path", "commit")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_from_dict_empty_retry_policy_means_defaults():
    q = QoS.from_dict({"retry_policy": {}})
    assert q.retry is not None and q.retry.max_retries == 3
    assert q.breaker is None  # absent key disables that half
    q2 = QoS.from_dict({"circuit_breaker": {}})
    assert q2.breaker is not None and q2.retry is None


def test_keyboard_interrupt_is_not_retried():
    calls = {"n": 0}

    def interrupted():
        calls["n"] += 1
        raise KeyboardInterrupt

    br = CircuitBreaker(CircuitBreakerConfig(failure_threshold=1))
    with pytest.raises(KeyboardInterrupt):
        call_with_qos(interrupted, retry=RetryPolicy(max_retries=5),
                      breaker=br, sleep=lambda s: None)
    assert calls["n"] == 1  # no retry
    assert br.state == "closed"  # and not counted as a sink failure


def test_abort_check_breaks_open_wait():
    clock = FakeClock()
    br = CircuitBreaker(
        CircuitBreakerConfig(failure_threshold=1, recovery_timeout_s=600),
        clock=clock,
    )
    br.record_failure()
    polls = {"n": 0}

    def paused():
        polls["n"] += 1
        return polls["n"] >= 3  # pause marker appears on the 3rd poll

    with pytest.raises(CircuitOpen):
        call_with_qos(lambda: "ok", breaker=br, abort_check=paused,
                      sleep=lambda s: None)
    assert polls["n"] == 3


def test_half_open_requires_n_probe_successes():
    """ADVICE r03: half_open_requests = number of successful probes
    required to close, not merely a concurrency cap."""
    clock = FakeClock()
    br = CircuitBreaker(
        CircuitBreakerConfig(
            failure_threshold=1, recovery_timeout_s=1, half_open_requests=3
        ),
        clock=clock,
    )
    br.record_failure()
    clock.t = 2
    for i in range(2):
        assert br.allows()
        br.half_open_inflight += 1
        br.record_success()
        assert br.state == "half_open", f"closed after only {i + 1} probes"
    assert br.allows()
    br.half_open_inflight += 1
    br.record_success()
    assert br.state == "closed"


def test_no_double_delay_when_breaker_just_opened():
    """ADVICE r03: a failure that opens the breaker must not ALSO pay
    the retry backoff sleep — the open-circuit wait already delays."""
    clock = FakeClock()
    br = CircuitBreaker(
        CircuitBreakerConfig(failure_threshold=1, recovery_timeout_s=5), clock=clock
    )
    sleeps = []

    def advance(s):
        sleeps.append(s)
        clock.t += s

    calls = {"n": 0}

    def once_bad():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("boom")
        return "ok"

    out = call_with_qos(
        once_bad,
        retry=RetryPolicy(max_retries=2, initial_delay_s=100.0),
        breaker=br,
        sleep=advance,
    )
    assert out == "ok"
    # only the open-circuit poll sleeps (≤1s each) — never the 100s backoff
    assert all(s <= 1.0 for s in sleeps), sleeps
    assert sum(sleeps) >= 5.0  # the recovery wait did happen


def test_breaker_listener_sees_every_transition():
    clock = FakeClock()
    seen = []
    br = CircuitBreaker(
        CircuitBreakerConfig(
            failure_threshold=1, recovery_timeout_s=1, half_open_requests=1
        ),
        clock=clock,
        listener=lambda b: seen.append(b.state),
    )
    br.record_failure()          # closed -> open
    clock.t = 2
    assert br.allows()           # open -> half_open
    br.half_open_inflight += 1
    br.record_failure()          # half_open -> open
    clock.t = 4
    assert br.allows()
    br.half_open_inflight += 1
    br.record_success()          # half_open -> closed
    assert seen == ["open", "half_open", "open", "half_open", "closed"]


def test_breaker_listener_errors_never_break_apply():
    def bad_listener(b):
        raise RuntimeError("observability down")

    br = CircuitBreaker(
        CircuitBreakerConfig(failure_threshold=1), listener=bad_listener
    )
    br.record_failure()  # must not raise
    assert br.state == "open"


def test_await_stream_pause_initiated_circuit_open_is_clean_stop(tmp_path):
    """ADVICE r03: pausing a stream while its breaker is in the
    open-circuit wait fails the StreamingQuery with CircuitOpen;
    await_stream must swallow that (the operator asked for a pause) but
    re-raise any other failure, and re-raise CircuitOpen when NOT
    paused."""
    import pytest
    from pyspark.errors import StreamingQueryException

    from replicator_spark import lifecycle
    from replicator_spark.streaming import await_stream

    root = str(tmp_path / "t")

    class FakeQ:
        def __init__(self, msg):
            self.msg = msg

        def awaitTermination(self):
            raise StreamingQueryException(
                self.msg, errorClass="STREAM_FAILED", messageParameters={}
            )

    msg = "Query terminated: CircuitOpen: circuit open since 12.0"
    lifecycle.pause(root, "s1")
    await_stream(FakeQ(msg), root, "s1")  # clean stop, no raise

    lifecycle.resume(root, "s1")
    with pytest.raises(StreamingQueryException):
        await_stream(FakeQ(msg), root, "s1")  # not paused -> real failure

    lifecycle.pause(root, "s1")
    with pytest.raises(StreamingQueryException):
        await_stream(FakeQ("Query terminated: OutOfMemoryError"), root, "s1")


def test_bind_breaker_observability_chains_custom_listener(tmp_path):
    """Review r4 second pass #6/#7: rebinding for a new (table, stream)
    must retarget OUR writer without dropping a caller's custom hook,
    and reuse across streams must not write the first stream's path."""
    from replicator_spark import lifecycle
    from replicator_spark.streaming import bind_breaker_observability

    seen = []
    br = CircuitBreaker(
        CircuitBreakerConfig(failure_threshold=1),
        listener=lambda b: seen.append(b.state),
    )
    r1, r2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    bind_breaker_observability(br, r1, "s1")
    br.record_failure()  # -> open: custom hook AND marker both fire
    assert seen == ["open"]
    assert lifecycle.breaker_states(r1)["s1"]["state"] == "open"

    # rebind to a second table/stream: marker path moves, custom hook
    # survives exactly once (no double-chaining)
    bind_breaker_observability(br, r2, "s2")
    assert lifecycle.breaker_states(r2)["s2"]["state"] == "open"  # startup write
    br.state = "half_open"
    br.record_success()  # -> closed
    assert seen == ["open", "closed"]  # chained once, not twice
    assert lifecycle.breaker_states(r2)["s2"]["state"] == "closed"
    assert lifecycle.breaker_states(r1)["s1"]["state"] == "open"  # untouched


def test_resume_if_reason_spares_operator_pause(tmp_path):
    from replicator_spark import lifecycle

    root = str(tmp_path / "t")
    lifecycle.pause(root, "s", reason="_config_reload")
    assert lifecycle.resume_if_reason(root, "s", "_config_reload")
    assert not lifecycle.is_paused(root, "s")
    lifecycle.pause(root, "s", reason="operator maintenance")
    assert not lifecycle.resume_if_reason(root, "s", "_config_reload")
    assert lifecycle.is_paused(root, "s")  # operator's marker reinstated
    # idempotent: a second attempt still declines and leaves it in place
    assert not lifecycle.resume_if_reason(root, "s", "_config_reload")
    assert lifecycle.is_paused(root, "s")

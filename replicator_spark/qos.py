"""Quality-of-service wrapper around micro-batch application: retry
with exponential backoff + a three-state circuit breaker.

The reference DECLARES this whole block and never implements it:
``RetryPolicy{MaxRetries, InitialDelay, MaxDelay, BackoffFactor,
RetryableErrors}`` and ``CircuitBreakerConfig{Enabled,
FailureThreshold, RecoveryTimeout, HalfOpenRequests}`` inside
``QualityOfService`` (``pkg/models/types.go:110-134``) are config
structs no code consults. Here they are real, wrapped around the one
operation that can fail — applying a micro-batch to the sink.

Safety: retrying ``apply_batch`` is idempotent by construction — a
failed merge aborts before its snapshot commit (nothing is visible),
and a retry of an already-committed batch key is a ledger no-op — so
at-least-once retry composes with the exactly-once ledger to stay
exactly-once.

Breaker semantics (classic three-state): CLOSED counts consecutive
failures; at ``failure_threshold`` it OPENS and ``call`` BLOCKS (the
micro-batch pattern's backpressure — the stream waits rather than
dropping events, unlike the reference's drop-on-full-channel,
``pkg/streams/mysql_stream.go:424-438``); after ``recovery_timeout_s``
it HALF-OPENS and admits ``half_open_requests`` probes — success
closes it, failure re-opens.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class RetryPolicy:
    """``pkg/models/types.go:111-117`` made real. ``retryable_errors``:
    substrings matched against the exception text; empty = everything
    retryable (the reference's list is free-form strings too)."""

    max_retries: int = 3
    initial_delay_s: float = 0.5
    max_delay_s: float = 30.0
    backoff_factor: float = 2.0
    retryable_errors: tuple[str, ...] = ()

    def is_retryable(self, exc: BaseException) -> bool:
        if not self.retryable_errors:
            return True
        text = f"{type(exc).__name__}: {exc}"
        return any(s in text for s in self.retryable_errors)

    def delay(self, attempt: int) -> float:
        return min(
            self.max_delay_s, self.initial_delay_s * self.backoff_factor**attempt
        )


class CircuitOpen(RuntimeError):
    """Raised by ``CircuitBreaker.call`` when the circuit is open and
    ``wait_when_open=False``."""


@dataclass
class CircuitBreakerConfig:
    """``pkg/models/types.go:119-125`` made real."""

    enabled: bool = True
    failure_threshold: int = 5
    recovery_timeout_s: float = 60.0
    half_open_requests: int = 1


@dataclass
class CircuitBreaker:
    config: CircuitBreakerConfig = field(default_factory=CircuitBreakerConfig)
    clock: object = time.monotonic  # injectable for tests
    state: str = "closed"  # closed | open | half_open
    consecutive_failures: int = 0
    opened_at: float | None = None
    half_open_inflight: int = 0
    half_open_successes: int = 0
    # state-transition hook: called as listener(breaker) after every
    # state change — used to persist breaker state for the health
    # surface (streaming.py writes _control/<stream>.breaker.json).
    # Listener errors never break the apply path.
    listener: object = None

    def _set_state(self, new: str) -> None:
        if new == self.state:
            return
        self.state = new
        if self.listener is not None:
            try:
                self.listener(self)
            except Exception:  # noqa: BLE001 — observability must not fail apply
                pass

    def _maybe_half_open(self) -> None:
        if (
            self.state == "open"
            and self.clock() - self.opened_at >= self.config.recovery_timeout_s
        ):
            self.half_open_inflight = 0
            self.half_open_successes = 0
            self._set_state("half_open")

    def allows(self) -> bool:
        if not self.config.enabled:
            return True
        self._maybe_half_open()
        if self.state == "closed":
            return True
        if self.state == "half_open":
            return self.half_open_inflight < self.config.half_open_requests
        return False

    def record_success(self) -> None:
        self.consecutive_failures = 0
        if self.state == "half_open":
            # ADVICE r03: half_open_requests means "this many successful
            # probes close the circuit", not just a concurrency cap
            self.half_open_inflight = max(0, self.half_open_inflight - 1)
            self.half_open_successes += 1
            if self.half_open_successes < self.config.half_open_requests:
                return
        self.opened_at = None
        self._set_state("closed")

    def record_failure(self) -> None:
        if not self.config.enabled:
            return
        self.consecutive_failures += 1
        if self.state == "half_open":
            self.half_open_inflight = max(0, self.half_open_inflight - 1)
        if (
            self.state == "half_open"
            or self.consecutive_failures >= self.config.failure_threshold
        ):
            self.opened_at = self.clock()
            self.half_open_successes = 0
            self._set_state("open")


def call_with_qos(
    fn,
    *,
    retry: RetryPolicy | None = None,
    breaker: CircuitBreaker | None = None,
    wait_when_open: bool = True,
    sleep=time.sleep,
    abort_check=None,
):
    """Run ``fn()`` under the QoS envelope.

    Per attempt: consult the breaker (open → block until half-open, or
    raise ``CircuitOpen`` with ``wait_when_open=False``), run, record
    the outcome, retry retryable failures up to ``max_retries`` with
    exponential backoff. The final failure re-raises the original
    exception. Only ``Exception`` enters the retry/breaker machinery —
    KeyboardInterrupt/SystemExit propagate immediately. ``abort_check``
    (no-arg callable → bool) is polled during the open-circuit wait so
    a lifecycle pause / query stop isn't blocked for the whole recovery
    envelope; True aborts the wait with ``CircuitOpen``."""
    retry = retry or RetryPolicy(max_retries=0)
    attempt = 0
    while True:
        if breaker is not None:
            while not breaker.allows():
                if not wait_when_open or (abort_check is not None and abort_check()):
                    raise CircuitOpen(
                        f"circuit open since {breaker.opened_at}; "
                        f"{breaker.consecutive_failures} consecutive failures"
                    )
                sleep(min(1.0, breaker.config.recovery_timeout_s / 10 or 0.1))
            if breaker.state == "half_open":
                breaker.half_open_inflight += 1
        try:
            out = fn()
        except Exception as exc:  # recorded, then policy decides
            if breaker is not None:
                breaker.record_failure()
            if attempt < retry.max_retries and retry.is_retryable(exc):
                # ADVICE r03: if this failure just opened the breaker,
                # the allows() loop above already enforces the recovery
                # wait — the backoff sleep on top would double the delay
                if breaker is None or breaker.state != "open":
                    sleep(retry.delay(attempt))
                attempt += 1
                continue
            raise
        else:
            if breaker is not None:
                breaker.record_success()
            return out


@dataclass
class QoS:
    """Bundle passed to replay_feed / run_stream. ``from_dict`` accepts
    the reference's JSON vocabulary (``QualityOfService`` —
    ``pkg/models/types.go:127-134``) with durations in seconds."""

    retry: RetryPolicy | None = None
    breaker: CircuitBreaker | None = None
    wait_when_open: bool = True

    @staticmethod
    def from_dict(d: dict | None) -> "QoS | None":
        if not d:
            return None
        # an explicit empty {} means "defaults", not "disabled" — only
        # an ABSENT key disables that half
        rp = d.get("retry_policy")
        cb = d.get("circuit_breaker")
        retry = (
            RetryPolicy(
                max_retries=int(rp.get("max_retries", 3)),
                initial_delay_s=float(rp.get("initial_delay", 0.5)),
                max_delay_s=float(rp.get("max_delay", 30.0)),
                backoff_factor=float(rp.get("backoff_factor", 2.0)),
                retryable_errors=tuple(rp.get("retryable_errors", ())),
            )
            if rp is not None
            else None
        )
        breaker = (
            CircuitBreaker(
                CircuitBreakerConfig(
                    enabled=bool(cb.get("enabled", True)),
                    failure_threshold=int(cb.get("failure_threshold", 5)),
                    recovery_timeout_s=float(cb.get("recovery_timeout", 60.0)),
                    half_open_requests=int(cb.get("half_open_requests", 1)),
                )
            )
            if cb is not None
            else None
        )
        return QoS(retry=retry, breaker=breaker)

    def run(self, fn, abort_check=None):
        return call_with_qos(
            fn,
            retry=self.retry,
            breaker=self.breaker,
            wait_when_open=self.wait_when_open,
            abort_check=abort_check,
        )

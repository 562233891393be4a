"""Rate-limited external-enrichment stage (the last un-recast reference
behavior): the reference's throttled 3-try authority lookup
(``processors/oclc_update/record_update.py:777-809`` — try, sleep,
retry, give up and log) and its per-run connection setup
(``oclc_connector.py:8-34``, reference S5), recast as a Ray Data
ACTOR-POOL stage:

* the service client is built once per actor in ``__init__`` (the
  reference opens its connection once per run — here once per pool
  actor);
* each lookup passes a per-actor TOKEN BUCKET, so aggregate cluster
  throughput is ``concurrency × rate_per_sec`` — the knob a real
  external API's quota maps onto;
* failures retry up to ``max_retries`` total attempts with linear
  backoff (the reference sleeps between its 3 tries), then the row is
  DEAD-LETTER routed: it keeps flowing with ``enrich_status='failed'``
  and a null enrichment, never silently dropped (reference S7's
  bad-records discipline applied to the enrichment path).

The per-row loop inside ``__call__`` is inherent to a per-record
external lookup (I/O bound, like the reference); throughput is governed
by the actor pool size × rate limit, not the loop. The sandbox has no
network, so the default service is :class:`FixtureEnrichService` — a
deterministic stand-in whose behavior is keyed by the portable md5
convention (``md5_number_lower`` in DuckDB), so the driver oracle can
mirror results exactly; a real deployment passes its own
``service_factory``.
"""

from __future__ import annotations

import hashlib
import time

import pyarrow as pa
import pyarrow.compute as pc


class TransientLookupError(RuntimeError):
    """Service hiccup — retrying may succeed (HTTP 5xx / timeout)."""


class PermanentLookupError(RuntimeError):
    """Key the service can never resolve (reference: a 404 authority)."""


def md5_number(key: str) -> int:
    """The portable md5 convention shared with the DuckDB oracles
    (``md5_number_lower(key)``): little-endian int of digest bytes
    8:16 — same rule as dsir_weights / dedup_simhash."""
    return int.from_bytes(
        hashlib.md5(key.encode("utf-8")).digest()[8:16], "little")


class FixtureEnrichService:
    """Deterministic fixture 'service' (no network in the sandbox):

    * ``md5_number(key) % fail_mod == 0`` → :class:`PermanentLookupError`
      on EVERY attempt (the row dead-letters after ``max_retries``);
    * else ``md5_number(key) % transient_mod == 0`` →
      :class:`TransientLookupError` on the FIRST attempt only
      (exercises the retry path; succeeds on attempt 2);
    * success returns ``auth-{md5_number(key) % 100000}``.

    Per-key attempt counts are recorded for the retry pytest."""

    def __init__(self, fail_mod: int = 17, transient_mod: int = 5):
        self.fail_mod = fail_mod
        self.transient_mod = transient_mod
        self.attempts: dict[str, int] = {}

    def lookup(self, key: str) -> str:
        n = md5_number(key)
        seen = self.attempts.get(key, 0)
        self.attempts[key] = seen + 1
        if self.fail_mod and n % self.fail_mod == 0:
            raise PermanentLookupError(key)
        if self.transient_mod and n % self.transient_mod == 0 and seen == 0:
            raise TransientLookupError(key)
        return f"auth-{n % 100000}"


class TokenBucket:
    """Classic token bucket: ``rate_per_sec`` refill, ``burst`` cap.
    ``time_fn`` / ``sleep_fn`` are injectable so tests run on a fake
    clock (no real sleeping in CI)."""

    def __init__(self, rate_per_sec: float, burst: float = 1.0,
                 time_fn=time.monotonic, sleep_fn=time.sleep):
        self.rate = float(rate_per_sec)
        self.burst = float(burst)
        self.time_fn = time_fn
        self.sleep_fn = sleep_fn
        self.tokens = float(burst)
        self.last = time_fn()

    #: refill rounding slack: without it, tokens can land at 1-2e-16 and
    #: the computed sleep (2e-17 s) no longer advances the clock at all —
    #: an infinite zero-effect sleep loop (found by the fake-clock test)
    _EPS = 1e-9

    def acquire(self) -> None:
        while True:
            now = self.time_fn()
            self.tokens = min(self.burst,
                              self.tokens + (now - self.last) * self.rate)
            self.last = now
            if self.tokens >= 1.0 - self._EPS:
                self.tokens = max(0.0, self.tokens - 1.0)
                return
            self.sleep_fn((1.0 - self.tokens) / self.rate)


class EnrichStage:
    """``map_batches(EnrichStage, fn_constructor_kwargs=..., concurrency=N,
    batch_format="pyarrow")`` — the async-enrichment shape: stateful
    setup per ACTOR, per-row external lookups with rate limit + bounded
    retries + dead-letter routing per BATCH.

    Appends three columns: ``{out_col}`` (string, null on failure),
    ``enrich_status`` ('ok' | 'failed'), ``enrich_attempts`` (int32 —
    total lookup attempts for the row; the reference logs the same)."""

    def __init__(self, service_factory=None, key_col: str = "doc_id",
                 out_col: str = "authority", rate_per_sec: float | None = None,
                 burst: float = 1.0, max_retries: int = 3,
                 backoff_s: float = 0.0, time_fn=time.monotonic,
                 sleep_fn=time.sleep):
        self.service = (service_factory or FixtureEnrichService)()
        self.key_col = key_col
        self.out_col = out_col
        self.max_retries = int(max_retries)
        self.backoff_s = float(backoff_s)
        self.sleep_fn = sleep_fn
        self.bucket = (TokenBucket(rate_per_sec, burst, time_fn, sleep_fn)
                       if rate_per_sec else None)

    def __call__(self, t: pa.Table) -> pa.Table:
        keys = pc.cast(t[self.key_col], pa.string()).to_pylist()
        out: list[str | None] = []
        status: list[str] = []
        attempts: list[int] = []
        for k in keys:
            val = None
            st = "failed"
            n = 0
            if k is None:
                # a null key can never resolve and service.lookup would
                # crash the task (code-review r5) — dead-letter it
                # in-band like any exhausted-retries failure, spending
                # zero service budget
                out.append(None)
                status.append("failed")
                attempts.append(0)
                continue
            while n < self.max_retries:
                n += 1
                if self.bucket is not None:
                    self.bucket.acquire()
                try:
                    val = self.service.lookup(k)
                    st = "ok"
                    break
                except (TransientLookupError, PermanentLookupError):
                    # the reference cannot distinguish the two either: it
                    # retries any failure up to its try budget, then
                    # routes the record to the bad-records log
                    if n < self.max_retries and self.backoff_s:
                        self.sleep_fn(self.backoff_s * n)
            out.append(val)
            status.append(st)
            attempts.append(n)
        return (t.append_column(self.out_col, pa.array(out, pa.string()))
                 .append_column("enrich_status",
                                pa.array(status, pa.string()))
                 .append_column("enrich_attempts",
                                pa.array(attempts, pa.int32())))

"""Custom stateful streaming operator: cross-micro-batch URL dedup.

A continuously crawled pages stream re-delivers urls (recrawls, mirror
hosts).  Downstream KG extraction must process each url once.  Built with
``applyInPandasWithState`` (the Spark-native custom-stateful-operator
surface, SURVEY §2.7): state is a per-group set of seen url hashes, keyed
by a url-hash shard so state is distributed and bounded per group.

Timeout: processing-time GroupStateTimeout clears idle shards (a real
deployment would use a TTL sized to the recrawl horizon).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.errors import PySparkRuntimeError
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "url string, warc_ts timestamp, lang string, text string"
# ``ver`` is a deliberate STATE-SCHEMA BREAK vs the round-5 v2 layout
# (bare ``array<long>``): Structured Streaming rejects a checkpoint whose
# state schema does not match the operator's, so a pre-v3 checkpoint now
# fails LOUDLY at restart instead of silently re-emitting every
# previously-seen url while pinning unmatchable hashes in state forever
# (ADVICE r5).  The in-band ``ver`` value additionally guards any future
# same-schema semantic change.
STATE_SCHEMA = "ver int, seen array<long>"
STATE_FORMAT_VERSION = 3

N_SHARDS = 32


def _make_dedup_fn(
    ttl_ms: int | None,
) -> Callable[..., Iterator[pd.DataFrame]]:
    """Build the per-shard dedup function.  ``ttl_ms`` is the recrawl
    horizon: with a ProcessingTimeTimeout configured, a shard whose urls
    all go unseen for ``ttl_ms`` evicts its state entirely (a
    re-delivered url afterwards re-emits exactly once — by design: past
    the recrawl horizon the page content is considered fresh).  ``None``
    = NoTimeout mode (availableNow catch-up runs)."""

    def _dedup_fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Python side is set-membership only: the url hash arrives as the
        JVM-computed ``url_h`` column (xxhash64, whole-stage codegen), so
        no per-row Python hashing happens in the hot path."""
        if state.hasTimedOut:
            # shard idle past the recrawl horizon: drop its seen-set
            state.remove()
            return
        if state.exists:
            ver, hashes = state.get
            if ver != STATE_FORMAT_VERSION:
                raise ValueError(
                    f"dedup state format {ver} != "
                    f"{STATE_FORMAT_VERSION}; restart from a fresh "
                    "checkpoint directory"
                )
            seen = set(hashes)
        else:
            seen = set()
        for pdf in pdfs:
            h = pdf["url_h"]
            fresh = ~h.isin(seen) & ~h.duplicated()
            seen.update(h[fresh])
            out = pdf.loc[fresh, ["url", "warc_ts", "lang", "text"]]
            if len(out):
                yield out
        state.update((STATE_FORMAT_VERSION, list(seen)))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    return _dedup_fn


# module-level NoTimeout instance (importable for unit tests, and keeps
# the serialized closure stable across runs)
_dedup_fn = _make_dedup_fn(None)


def dedup_pages_stream(
    pages_stream: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """Streaming pages -> first-seen-only pages (exactly-once per url per
    state lifetime).  ``url_h = xxhash64(url)`` is computed once JVM-side
    and reused for both the state shard key and the dedup membership key
    (same hash → a url always lands on the shard that owns its state).

    ``ttl_ms=None`` (default) runs NoTimeout: a ProcessingTimeTimeout
    keeps availableNow batch-catchup runs alive forever (timeouts keep
    scheduling empty micro-batches).  A real 24/7 deployment passes
    ``ttl_ms`` sized to the recrawl horizon so shard state is bounded:
    idle shards evict, and a url re-delivered after eviction re-emits
    exactly once (fresh-content semantics past the horizon)."""
    sharded = pages_stream.withColumn(
        "url_h", F.xxhash64("url")
    ).withColumn(
        "shard", F.pmod(F.col("url_h"), F.lit(N_SHARDS)).cast("int")
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _dedup_fn if ttl_ms is None else _make_dedup_fn(ttl_ms),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Custom stateful operator #2: event-time session windows per user
# ---------------------------------------------------------------------------

SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, closed boolean"
)
SESSION_STATE_SCHEMA = "start long, last long, n long"

SESSION_GAP_MS = 30 * 60 * 1000


def _session_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Session assembly with a gap timeout: events extend the open session
    while they arrive within SESSION_GAP_MS of its end; a larger gap (or a
    state timeout) closes it and emits the finished session — the
    applyInPandasWithState twin of the batch ``sessionize_users`` query."""
    user = key[0]
    out = []
    if state.hasTimedOut:
        start, last, n = state.get
        out.append((user, start, last, n, True))
        state.remove()
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_start", "session_end", "n_events",
                     "closed"],
        ).assign(
            session_start=lambda d: pd.to_datetime(d.session_start, unit="ms"),
            session_end=lambda d: pd.to_datetime(d.session_end, unit="ms"),
        )
        return

    start, last, n = state.get if state.exists else (None, None, 0)
    ts_all = [
        (pdf["ts"].astype("int64") // 1_000_000) for pdf in pdfs if len(pdf)
    ]
    if not ts_all:
        # nothing but an (already handled) timeout tick: keep state as-is
        if start is not None:
            state.update((start, last, n))
            try:
                state.setTimeoutDuration(SESSION_GAP_MS)
            except PySparkRuntimeError:
                pass  # NoTimeout mode (availableNow catch-up runs)
        return
    ts = pd.concat(ts_all).sort_values()
    # Late events BELOW the open session merge backward only while they
    # are within the gap of session_start; anything older (no watermark
    # bounds lateness here) would otherwise pull start back unboundedly,
    # diverging from the batch sessionize twin, which gap-splits on the
    # globally sorted stream.  Older events accumulate in their own
    # gap-split "late chain"; its final segment may still merge if later
    # in-gap events extend the session start down to within the gap.
    lstart = llast = None
    ln = 0
    for t in ts:
        t = int(t)
        if start is None:
            start, last, n = t, t, 1
        elif t < start:
            if start - t <= SESSION_GAP_MS:
                # in-gap late event: extend the session backward
                start, n = t, n + 1
            elif lstart is None:
                lstart, llast, ln = t, t, 1
            elif t - llast <= SESSION_GAP_MS:
                llast, ln = t, ln + 1
            else:
                out.append((user, lstart, llast, ln, True))
                lstart, llast, ln = t, t, 1
        elif t - last <= SESSION_GAP_MS:
            last, n = max(last, t), n + 1
        else:
            # forward gap-split closes the CURRENT session — the late
            # chain (always temporally below the initial session, since
            # ts is sorted) must be resolved against it NOW: after the
            # reset, `start` names a different session and a deferred
            # chain merge would compare against the wrong one
            if lstart is not None:
                if start - llast <= SESSION_GAP_MS:
                    start, n = lstart, n + ln
                else:
                    out.append((user, lstart, llast, ln, True))
                lstart, llast, ln = None, None, 0
            out.append((user, start, last, n, True))
            start, last, n = t, t, 1
    if lstart is not None:
        if start - llast <= SESSION_GAP_MS:
            # backward extensions brought the open session within the
            # gap of the late chain's tail: they are one session
            start, n = lstart, n + ln
        else:
            out.append((user, lstart, llast, ln, True))
    state.update((start, last, n))
    try:
        # the specific error Spark raises when the query was configured
        # with NoTimeout — a genuine state-API failure still surfaces
        # (ADVICE r5: the bare except swallowed both)
        state.setTimeoutDuration(SESSION_GAP_MS)
    except PySparkRuntimeError:
        pass  # NoTimeout mode (availableNow catch-up runs)
    if out:
        yield pd.DataFrame(
            out,
            columns=["user_id", "session_start", "session_end", "n_events",
                     "closed"],
        ).assign(
            session_start=lambda d: pd.to_datetime(d.session_start, unit="ms"),
            session_end=lambda d: pd.to_datetime(d.session_end, unit="ms"),
        )


def sessionize_events_stream(
    events_stream: DataFrame, idle_timeout: bool = True
) -> DataFrame:
    """Streaming events -> closed sessions per user (30-minute gap), state
    keyed by user_id.  ``idle_timeout=True`` closes idle users' open
    sessions via ProcessingTimeTimeout (the 24/7 deployment mode);
    ``False`` closes sessions only on gap-exceeding events, which lets
    availableNow batch-catchup runs terminate (same caveat as
    :func:`dedup_pages_stream`)."""
    return events_stream.select("user_id", "ts").groupBy(
        "user_id"
    ).applyInPandasWithState(
        _session_fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout
        else GroupStateTimeout.NoTimeout,
    )

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

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "url string, warc_ts timestamp, lang string, text string"
STATE_SCHEMA = "seen array<long>"

N_SHARDS = 32


def _dedup_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        h = pdf["url"].map(hash_url)
        fresh = ~h.isin(seen) & ~h.duplicated()
        seen.update(h[fresh])
        out = pdf.loc[fresh, ["url", "warc_ts", "lang", "text"]]
        if len(out):
            yield out
    state.update((list(seen),))


def hash_url(url: str) -> int:
    # stable 63-bit hash (python hash() is salted per process)
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest(), "big"
    ) >> 1


def dedup_pages_stream(pages_stream: DataFrame) -> DataFrame:
    """Streaming pages -> first-seen-only pages (exactly-once per url per
    state lifetime)."""
    sharded = pages_stream.withColumn(
        "shard", F.pmod(F.xxhash64("url"), F.lit(N_SHARDS)).cast("int")
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        # NoTimeout: a ProcessingTimeTimeout keeps availableNow batch-
        # catchup runs alive forever (timeouts keep scheduling empty
        # micro-batches).  A real 24/7 deployment bounds state with a
        # ProcessingTimeTimeout sized to the recrawl horizon instead.
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

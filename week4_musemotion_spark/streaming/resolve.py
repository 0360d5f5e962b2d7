"""Streaming entity resolution: fuzzy-match an arriving record
stream against a static registry, in-flight.

The batch operator (operators/fuzzy.py) blocks on deletion-
neighborhood keys; the streaming form reuses the SAME key expression
on both sides, so a micro-batch only ever joins against the registry
rows sharing a variant hash — a stream-static equi-join, which
Structured Streaming executes as an ordinary per-batch join with the
static side reused (broadcast when it fits).  No stream state is
needed: each record resolves independently.

This is the ingestion-time face of the curation pipeline: records
land, resolve to canonical registry ids within edit distance k, and
flow on with their match — the reference's upsert-by-key load
(load_musemotion_to_db.py:96-143) generalized to dirty keys.

Scale shape: registry-side variant keys are computed once per plan
(static side); the stream side emits ≤ 1+len (k=1) keys per record;
the join is keyed and the levenshtein verify touches candidates
only.  A matched pair can share several variant keys, so the raw
join emits duplicates; collapsing them with ``dropDuplicates`` on
the STREAM would be a stateful operator with unbounded cross-batch
state — instead :func:`resolve_with_sink` dedups per micro-batch
inside ``foreachBatch``, where the frame is a plain bounded
DataFrame and the dedup is stateless.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from week4_musemotion_spark.operators.fuzzy import _exploded_keys


def resolve_stream(
    stream: DataFrame,
    registry: DataFrame,
    stream_col: str,
    registry_col: str,
    k: int = 1,
    broadcast_registry: bool = True,
) -> DataFrame:
    """Each streaming record joined to every registry row within edit
    distance ``k`` (records with no match drop out — union a
    left-anti pass downstream for the unmatched flow).

    Output: stream columns + registry columns + ``dist``.  May emit
    the same (record, registry row) pair more than once when they
    share several variant keys — see :func:`resolve_with_sink`.
    """
    sk = _exploded_keys(stream, stream_col, k)
    reg = _exploded_keys(registry, registry_col, k)
    if broadcast_registry:
        reg = F.broadcast(reg)
    joined = sk.join(reg, "_k").drop("_k")
    return joined.withColumn(
        "dist", F.levenshtein(F.col(stream_col), F.col(registry_col))
    ).filter(F.col("dist") <= k)


def resolve_with_sink(
    stream: DataFrame,
    registry: DataFrame,
    stream_col: str,
    registry_col: str,
    sink: Callable[[DataFrame, int], None],
    k: int = 1,
    dedup_on: "list[str] | None" = None,
) -> StreamingQuery:
    """Run :func:`resolve_stream` with exactly-one-row-per-match
    delivery: the multi-variant duplicates are collapsed INSIDE each
    micro-batch (``foreachBatch`` hands a bounded, non-streaming
    frame, so ``dropDuplicates`` there is stateless), then handed to
    ``sink(batch_df, batch_id)``.
    """
    keys = dedup_on or list(stream.columns) + [registry_col]
    matched = resolve_stream(stream, registry, stream_col, registry_col, k)

    def _emit(batch_df: DataFrame, batch_id: int) -> None:
        sink(batch_df.dropDuplicates(keys), batch_id)

    return matched.writeStream.foreachBatch(_emit).trigger(availableNow=True).start()

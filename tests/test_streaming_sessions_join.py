"""Streaming session windows and stream-stream interval join must
equal the identical batch computation over the same files."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

EVENTS = f"{SF_SMOKE}/events.parquet"


def test_session_windows_match_batch(spark):
    from week4_musemotion_spark.streaming.sessions import (
        run_sessions_to_memory_sink,
        session_event_counts,
    )

    run_sessions_to_memory_sink(spark, EVENTS, table_name="t_stream_sessions")
    stream = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in spark.table("t_stream_sessions").collect()
    }

    from week4_musemotion_spark.sources.tables import load_table

    batch_df = session_event_counts(load_table(spark, SF_SMOKE, "events"))
    batch = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in batch_df.collect()
    }
    assert stream == batch
    assert len(stream) > 10
    # gap semantics: a session's span is (n_events - 1) gaps at most
    # 30 min each, and end = last_event + gap
    for (_, start, end), n in stream.items():
        span_s = (end - start).total_seconds()
        assert span_s >= 30 * 60  # end extends one gap past the last event
        assert span_s <= (n - 1) * 30 * 60 + 30 * 60 + 1


def test_session_windows_agree_with_batch_sessionize(spark):
    """The native session_window must produce the same (count, user)
    multiset as the lag()-based batch sessionization at the same gap."""
    from week4_musemotion_spark.queries import REGISTRY

    batch = sorted(
        (r.user_id, r.n_events)
        for r in REGISTRY["q_sessionize"].builder(spark, SF_SMOKE).collect()
    )
    from week4_musemotion_spark.sources.tables import load_table
    from week4_musemotion_spark.streaming.sessions import session_event_counts

    native = sorted(
        (r.user_id, r.n_events)
        for r in session_event_counts(load_table(spark, SF_SMOKE, "events")).collect()
    )
    assert batch == native


def test_stream_stream_join_matches_batch(spark):
    from week4_musemotion_spark.streaming.joins import (
        purchases_with_recent_views,
        run_join_to_memory_sink,
    )

    run_join_to_memory_sink(spark, EVENTS, table_name="t_stream_attrib")
    stream = {
        (r.purchase_id, r.view_id) for r in spark.table("t_stream_attrib").collect()
    }

    from week4_musemotion_spark.sources.tables import load_table

    batch_df = purchases_with_recent_views(load_table(spark, SF_SMOKE, "events"))
    batch = {(r.purchase_id, r.view_id) for r in batch_df.collect()}
    assert stream == batch
    assert stream  # the interval must actually match some pairs

    # every matched pair respects the interval bound
    from week4_musemotion_spark.functions.eventtime import epoch_micros

    ev = load_table(spark, SF_SMOKE, "events")
    e = ev.select("event_id", epoch_micros(ev).alias("tsu"))
    ts = {r.event_id: r.tsu for r in e.collect()}
    for pid, vid in stream:
        assert 0 <= ts[pid] - ts[vid] <= 10 * 60 * 1_000_000

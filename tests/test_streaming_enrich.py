"""Stream-static join: the streamed result must equal the batch join."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_stream_static_enrichment_equals_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from week4_musemotion_spark.sources.tables import load_table
    from week4_musemotion_spark.streaming.enrich import enriched_stream, user_profiles

    out = enriched_stream(spark, f"{SF_SMOKE}/events.parquet", SF_SMOKE)
    q = (
        out.writeStream.format("memory")
        .queryName("enriched")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.event_id: (r.lifetime_events, r.lifetime_value_cents, r.value_cents)
        for r in spark.sql("SELECT * FROM enriched").collect()
    }

    e = load_table(spark, SF_SMOKE, "events")
    expect = {
        r.event_id: (r.lifetime_events, r.lifetime_value_cents, r.value_cents)
        for r in e.join(user_profiles(spark, SF_SMOKE), "user_id")
        .select(
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("value_cents"),
            "lifetime_events",
            "lifetime_value_cents",
        )
        .collect()
    }
    assert got == expect
    # every event found its profile (profiles are built from the same table)
    assert all(le is not None for (le, _, _) in got.values())

"""The reference's own SQL corpus, runnable on this engine.

``musemotion-queries.sql`` (reference, 115 lines) is the declared
query surface.  This module carries its SELECT-family queries with
only dialect fixes (reference musemotion-queries.sql:21-113 →
Spark SQL):

- ``YEAR(CURDATE())``       → ``year(current_date())``
- ``CAST(x AS SIGNED)``     → ``CAST(x AS INT)``
- ``odometer`` (the SQL file's alternate naming generation, SURVEY.md
  §1.1) → ``electric_range`` (the Python-pipeline naming this engine
  standardizes on)

DML/DDL statements (INSERT/UPDATE/DELETE/CREATE, reference
:1-18,56-66) are not re-issued as SQL against immutable views — their
semantics live in operators.upsert / q_update_projection /
q_delete_filter (SURVEY.md §2.9).

``run_corpus`` registers a cleaned MuseMotion table and a utilities
dimension as temp views and yields each query's DataFrame — the
lifecycle of §3.2 (SQL text → Catalyst) end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Dialect-fixed SELECT corpus, keyed by the section comments of the
#: reference file (musemotion-queries.sql:21-113).
MUSEMOTION_SQL: dict[str, str] = {
    # :21-23 basic preview
    "select_limit": """
        SELECT vin, city, year, make, model, vehicle_type, eligibility,
               electric_range, vehicle_id, utility
        FROM musemotion LIMIT 10
    """,
    # :26-30 filter + multi-key sort
    "filter_sort": """
        SELECT vin, city, year, make, model FROM musemotion
        WHERE year IS NOT NULL
        ORDER BY year DESC, city ASC LIMIT 100
    """,
    # :33-38 derived vehicle_age
    "vehicle_age": """
        SELECT vin, make, model, year,
               (year(current_date()) - CAST(year AS INT)) AS vehicle_age
        FROM musemotion WHERE year IS NOT NULL
        ORDER BY vehicle_age ASC LIMIT 50
    """,
    # :41-45 count by make, top 20
    "count_by_make": """
        SELECT make, count(*) AS cnt FROM musemotion
        GROUP BY make ORDER BY cnt DESC LIMIT 20
    """,
    # :48-52 multi-agg + HAVING (odometer → electric_range)
    "having_avg_range": """
        SELECT make, count(*) AS cnt,
               avg(CAST(electric_range AS DECIMAL)) AS avg_range
        FROM musemotion GROUP BY make
        HAVING count(*) > 10 ORDER BY avg_range DESC
    """,
    # :59-60 point lookup
    "point_lookup": """
        SELECT * FROM musemotion WHERE vin = '5YJ3E1EB4L' LIMIT 1
    """,
    # :69-74 scalar subquery
    "above_avg_range": """
        SELECT vin, make, model, electric_range FROM musemotion
        WHERE CAST(electric_range AS DECIMAL) >
              (SELECT avg(CAST(electric_range AS DECIMAL)) FROM musemotion
               WHERE electric_range IS NOT NULL)
        ORDER BY electric_range DESC LIMIT 50
    """,
    # :77-88 CTE top-k join
    "cte_top_makes": """
        WITH top_makes AS (
            SELECT make, count(*) AS cnt FROM musemotion
            GROUP BY make ORDER BY cnt DESC LIMIT 5
        )
        SELECT m.vin, m.make, m.model, m.year, t.cnt
        FROM musemotion m JOIN top_makes t ON m.make = t.make
        ORDER BY t.cnt DESC, m.year DESC LIMIT 200
    """,
    # :97-101 inner join with utilities (tie-break on vin added: the
    # reference's bare LIMIT returns an engine-chosen subset; a total
    # order keeps runs and tests deterministic)
    "inner_join_utilities": """
        SELECT v.vin, v.city, u.utility_name, u.region
        FROM musemotion v INNER JOIN utilities u ON v.utility = u.utility_name
        ORDER BY v.vin, u.utility_name
        LIMIT 50
    """,
    # :103-108 left join (vin tie-break for the same reason — year
    # alone is non-unique, so the 100-row subset was plan-dependent)
    "left_join_utilities": """
        SELECT v.vin, v.year, u.utility_name, u.region
        FROM musemotion v LEFT JOIN utilities u ON v.utility = u.utility_name
        ORDER BY v.year DESC, v.vin, u.utility_name
        LIMIT 100
    """,
    # :110-113 right join
    "right_join_utilities": """
        SELECT u.utility_id, u.utility_name, v.vin
        FROM musemotion v RIGHT JOIN utilities u ON v.utility = u.utility_name
    """,
}


def build_utilities_dim(clean: DataFrame) -> DataFrame:
    """Synthesize the ``utilities`` dimension (reference
    musemotion-queries.sql:91-95: utility_id, utility_name UNIQUE,
    region) from the fact table's distinct utility strings.

    Only a deterministic subset of names is included (FIXTURES.md A3:
    some fact rows must have no match, so the outer joins are
    non-trivial); region derives from a stable hash.
    """
    names = (
        clean.select(F.col("utility").alias("utility_name"))
        .filter(F.col("utility").isNotNull())
        .distinct()
        .filter(F.length("utility_name") % 3 != 0)  # deterministic ~2/3 subset
    )
    w = Window.orderBy("utility_name")
    return names.select(
        F.row_number().over(w).alias("utility_id"),
        "utility_name",
        F.concat(F.lit("region-"), (F.crc32(F.col("utility_name")) % 4).cast("string")).alias("region"),
    )


def run_corpus(
    spark: SparkSession, clean: DataFrame, utilities: DataFrame | None = None
) -> Iterator[tuple[str, DataFrame]]:
    """Register views and run every corpus query through spark.sql."""
    clean.createOrReplaceTempView("musemotion")
    (utilities if utilities is not None else build_utilities_dim(clean)).createOrReplaceTempView(
        "utilities"
    )
    for name, sql in MUSEMOTION_SQL.items():
        yield name, spark.sql(sql)

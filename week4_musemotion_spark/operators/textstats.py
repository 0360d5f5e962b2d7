"""Text-analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All per-row expression work (split / array lambdas / regexp) — no
shuffles, no Python in the row path; at 100 TB these run at scan
speed inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from week4_musemotion_spark.functions.hashing import stable_hash64
from week4_musemotion_spark.functions.text import tokens

#: Marker stopwords per language for the n-gram/stopword-hit
#: language-ID heuristic.  Order defines the deterministic tie-break.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "es": ("el", "los", "las", "y", "que", "una"),
    "zh": ("的", "是", "了", "在", "和", "有"),
}

#: Stopword list for the quality score (English analytics-corpus mix).
QUALITY_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

#: BPE-ish token pattern: alpha runs, digit runs, or single symbols.
BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def quality_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Length / token / stopword-ratio quality features + score.

    Ratios are emitted as exact ten-thousandths (BIGINT): the
    length-damped quality score ``min(1, n/200) · (1 − stop/n)``
    scaled ×10⁴ reduces to ``50·min(n,200)·(n−stop) / n`` — pure
    integer arithmetic, reproducible across engines (see
    functions.exact).

    ``keep_cols`` passes additional input columns through the same
    single projection — card/report queries that need e.g.
    ``source``/``lang`` alongside the features stay one scan instead
    of joining the features back to the corpus on ``id_col`` (the
    join-back degrades to a corpus self-shuffle at scale)."""
    from week4_musemotion_spark.functions.exact import int_div_round, ratio_e4

    toks = tokens(F.col(text_col))
    n_tokens = F.size(toks).cast("long")
    n_uniq = F.size(F.array_distinct(toks)).cast("long")
    stop_cnt = F.size(F.filter(toks, lambda t: t.isin(*QUALITY_STOPWORDS))).cast("long")
    damp = F.least(n_tokens, F.lit(200).cast("long"))
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.length(text_col).cast("long").alias("n_chars_txt"),
        n_tokens.alias("n_tokens"),
        n_uniq.alias("n_uniq_tokens"),
        ratio_e4(stop_cnt, n_tokens).alias("stop_ratio_e4"),
        int_div_round(50 * damp * (n_tokens - stop_cnt), n_tokens).alias("quality_e4"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language ID with deterministic tie-break.

    Scores each language by distinct marker-word hits; ties resolve
    in LANG_MARKERS order; all-zero scores → 'und'.
    """
    uniq = F.array_distinct(tokens(F.col(text_col)))
    scores = {
        lang: F.size(F.array_intersect(uniq, F.array(*[F.lit(m) for m in markers]))).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = F.greatest(*scores.values())
    pred = F.when(best == 0, F.lit("und"))
    for i, lang in enumerate(langs[:-1]):
        rest = [scores[l] for l in langs[i + 1 :]]
        cond = scores[lang] >= (F.greatest(*rest) if len(rest) > 1 else rest[0])
        pred = pred.when(cond, F.lit(lang))
    pred = pred.otherwise(F.lit(langs[-1]))
    return df.select(
        F.col(id_col),
        F.col("lang").alias("declared_lang"),
        pred.alias("lang_pred"),
        best.alias("marker_hits"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace and BPE-ish regex token counts + chars/token
    (exact ten-thousandths, BIGINT — see functions.exact)."""
    from week4_musemotion_spark.functions.exact import ratio_e4

    ws = F.size(tokens(F.col(text_col))).cast("long")
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0)).cast("long")
    return df.select(
        F.col(id_col),
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        ratio_e4(F.col("n_chars").cast("long"), ws).alias("chars_per_token_e4"),
    )


def fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 5
) -> DataFrame:
    """Document fingerprints: full-content hash + min-shingle-hash
    (winnowing-style rolling fingerprint over word n-grams).

    The min-hash runs as explode → hash once per shingle → min
    aggregate (one shuffle); documents shorter than ``n`` tokens get
    a NULL fingerprint via the left join back to the corpus."""
    from week4_musemotion_spark.operators.dedup import shingle_strings

    fp = (
        shingle_strings(df, text_col, id_col, n)
        .groupBy("_id")
        .agg(F.min(stable_hash64(F.col("s"))).alias("shingle_fingerprint"))
    )
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .join(fp.withColumnRenamed("_id", id_col), id_col, "left")
        .select(id_col, "content_hash", "shingle_fingerprint")
    )

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through Spark as ``binary`` columns with a
typed metadata struct alongside — the engine never interprets bytes
JVM-side; decode / feature-extraction runs in Arrow-batched Pandas
iterators (``mapInPandas``), the idiomatic slow-path for per-row
Python at scale (one Python roundtrip per ~10k-row Arrow batch, not
per row).

The actual codec step is STUBBED here (no image/audio libraries in
this environment): :func:`decode_media` raises NotImplementedError
unless a real decoder is importable, and :func:`extract_media_meta`
uses a deterministic fake "decode" (md5-derived dimensions) so the
distributed plumbing — schema, batching, partitioning — is real and
testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema of the metadata extractor.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("format", T.StringType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Materialize an opaque binary payload column (here: utf-8 bytes
    of the text — stands in for image/audio bytes) plus source id."""
    return df.select(F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload"))


def decode_media(payload: bytes):  # pragma: no cover - requires optional dep
    """Real decoder gate: uses Pillow when present, else explains.

    STUB: the execution environment has no imaging libraries; the
    Spark-side contract (binary in, array/struct out) is what matters.
    """
    try:
        import io

        from PIL import Image  # type: ignore[import-not-found]
    except ImportError as e:
        raise NotImplementedError(
            "media decoding requires an imaging library (e.g. Pillow), "
            "not available in this environment; see extract_media_meta "
            "for the deterministic stub used in tests"
        ) from e
    return Image.open(io.BytesIO(payload))


def _fake_dims(payload: bytes) -> tuple[int, int, str]:
    """Deterministic fake decode: md5-derived dimensions.

    Mirrors functions.hashing.stable_hash64 (md5-prefix 60-bit int) so
    a SQL oracle can replay it exactly.
    """
    h = int(hashlib.md5(b"dim:" + payload).hexdigest()[:15], 16)
    width = 64 + h % 960
    height = 64 + (h // 960) % 960
    fmt = "png" if h % 2 == 0 else "jpeg"
    return width, height, fmt


def extract_media_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata extraction over a binary column.

    ``mapInPandas``: each task pulls Arrow batches, runs vectorized
    Python once per batch, and emits the typed metadata schema.  The
    decode call is the deterministic stub (see module docstring)."""
    binary = attach_binary(df, id_col=id_col) if "payload" not in df.columns else df

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_dims(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "format": [d[2] for d in dims],
                }
            )

    return binary.mapInPandas(_extract, schema=MEDIA_META_SCHEMA)

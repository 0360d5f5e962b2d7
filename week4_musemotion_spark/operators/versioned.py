"""Versioned parquet snapshots with time travel.

The reference's loaders overwrite their SQL tables in place
(pipeline.py:166 ``if_exists='replace'``) — one bad run destroys the
previous state.  Table formats solve this with versioned snapshots;
this is the same idea on plain parquet: every write lands in a fresh
``v_<n>`` directory, readers resolve ``latest`` (or any retained
version — time travel), and old versions remain until an explicit
``vacuum``.  Writers never mutate a committed version, so readers
are isolated from concurrent writes for free.

Commit protocol: the version directory is only visible to
``list_versions`` once parquet's ``_SUCCESS`` marker exists — a
crashed half-write leaves a directory without the marker, which every
reader skips and the next ``write_version`` cleans up.  Local-FS
implementation; on an object store this is the table-format commit
layer (Delta/Iceberg), which this module is a conscious stand-in
for — the API (write/read/list/vacuum) maps 1:1.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

_VERSION_RE = re.compile(r"^v_(\d{5})$")


def _committed(base: str) -> list[int]:
    if not os.path.isdir(base):
        return []
    out = []
    for name in os.listdir(base):
        m = _VERSION_RE.match(name)
        if m and os.path.exists(os.path.join(base, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def list_versions(base: str) -> list[int]:
    """Committed version numbers, ascending."""
    return _committed(base)


def write_version(df: DataFrame, base: str) -> int:
    """Write ``df`` as the next snapshot version; returns its number.

    Uncommitted leftovers from crashed writes (no ``_SUCCESS``) are
    removed first so version numbers never collide with garbage.
    """
    os.makedirs(base, exist_ok=True)
    committed = set(_committed(base))
    for name in list(os.listdir(base)):
        m = _VERSION_RE.match(name)
        if m and int(m.group(1)) not in committed:
            shutil.rmtree(os.path.join(base, name))
    n = (max(committed) + 1) if committed else 1
    df.write.parquet(os.path.join(base, f"v_{n:05d}"))
    return n


def read_version(spark: SparkSession, base: str, version: int | None = None) -> DataFrame:
    """Read a committed snapshot (default: latest). Raises on an
    unknown/uncommitted version instead of silently reading garbage."""
    committed = _committed(base)
    if not committed:
        raise FileNotFoundError(f"no committed versions under {base}")
    if version is None:
        version = committed[-1]
    if version not in committed:
        raise FileNotFoundError(f"version {version} not committed under {base} (have {committed})")
    return spark.read.parquet(os.path.join(base, f"v_{version:05d}"))


def vacuum(base: str, keep_last: int = 2) -> list[int]:
    """Remove all but the newest ``keep_last`` committed versions;
    returns the removed version numbers.  Never removes the latest
    version regardless of ``keep_last``."""
    committed = _committed(base)
    keep = max(1, keep_last)
    doomed = committed[:-keep] if len(committed) > keep else []
    for n in doomed:
        shutil.rmtree(os.path.join(base, f"v_{n:05d}"))
    return doomed

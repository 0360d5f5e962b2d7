"""Cloud object-store sources (SURVEY.md §2.1 S3).

The reference's Azure path downloads every blob through the driver
(pipeline.py:126-150: list container → per-blob HTTPS stream →
pandas concat — the single-node wall).  On Spark the same data is a
path: executors read blob ranges in parallel through the Hadoop
filesystem connector, and the "download + merge" loop disappears into
a glob scan.

This module only builds paths and session configuration — no network
code to maintain, nothing to mock.  Credentials resolve from the
environment/conf (never hardcode; the reference keeps a connection
string in config.toml, which is exactly what not to do at scale).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def abfss_path(container: str, account: str, relative: str = "") -> str:
    """ABFSS URI for an Azure Data Lake Gen2 container path."""
    rel = relative.lstrip("/")
    return f"abfss://{container}@{account}.dfs.core.windows.net/{rel}"


def s3a_path(bucket: str, relative: str = "") -> str:
    return f"s3a://{bucket}/{relative.lstrip('/')}"


def configure_azure_key(spark: SparkSession, account: str, key: str) -> None:
    """Account-key auth for ABFSS (test/dev; production uses OAuth /
    managed identity via the equivalent ``fs.azure.account.oauth*``
    settings)."""
    spark.conf.set(f"fs.azure.account.key.{account}.dfs.core.windows.net", key)


def configure_s3_keys(spark: SparkSession, access_key: str, secret_key: str) -> None:
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("fs.s3a.access.key", access_key)
    hconf.set("fs.s3a.secret.key", secret_key)

"""Shared read helpers.

``read_parquet_clean`` is the repo-wide parquet entry point for the
driver-table pipelines: pandas-written parquet carries a ``pandas``
schema-metadata blob whose presence makes ``hash(pa.Schema)`` raise
(pyarrow 16), which silently defeats Ray's schema deduplication in
every downstream shuffle/join ("Failed to hash the schemas"
warnings). Stripping metadata is a zero-copy, metadata-only rewrite
per batch.
"""

from __future__ import annotations

import ray.data


def read_parquet_clean(path: str, columns=None, **kwargs) -> ray.data.Dataset:
    return ray.data.read_parquet(path, columns=columns, **kwargs).map_batches(
        lambda t: t.replace_schema_metadata(None), batch_format="pyarrow"
    )

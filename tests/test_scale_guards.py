"""Source-level scale guards (VERDICT r3 "Next round" #1 and #3).

Two anti-patterns regressed silently in earlier rounds, so they are now
pinned by grep-tests over the package source:

1. Hardcoded ``num_partitions=<int>`` on Dataset joins caps shuffle
   parallelism at a literal regardless of cluster size — every join
   width must come from ``io_utils.join_partitions()`` (cpus-aware).
2. Raw ``ray.data.read_parquet`` on pandas-written driver tables leaves
   the ``pandas`` schema-metadata blob in place, which makes
   ``hash(pa.Schema)`` raise and silently disables Ray's schema dedup
   in every downstream shuffle ("Failed to hash the schemas") — all
   driver-table reads must go through ``io_utils.read_parquet_clean``
   or strip metadata inline.
"""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "lucene_solr_ray"

# Sites allowed to keep a literal width / raw read, with why.
NUM_PARTITIONS_ALLOWED_FILES = {
    # index partition counts (a persisted index parameter, not a join
    # shuffle width) and the build pipeline (already cpus-derived).
    "pipelines/build.py",
    "pipelines/split.py",
    "functions/fulltext.py",  # docs_index(num_partitions=8): cache-keyed index param
}

RAW_READ_PARQUET_ALLOWED = {
    # (file, substring that must appear on the line)
    ("io_utils.py", "return ray.data.read_parquet"),          # the wrapper itself
    ("functions/fulltext.py", 'columns=["term", "cf"]'),      # engine-written parquet (no pandas metadata)
    ("functions/fulltext.py", 'columns=["term", "df"]'),
}


def _py_sources():
    for p in sorted(PKG.rglob("*.py")):
        yield p.relative_to(PKG).as_posix(), p.read_text()


def test_no_literal_join_widths():
    pat = re.compile(r"num_partitions\s*=\s*\d")
    offenders = []
    for rel, src in _py_sources():
        if rel in NUM_PARTITIONS_ALLOWED_FILES:
            continue
        for i, line in enumerate(src.splitlines(), 1):
            if "``" in line or line.lstrip().startswith("#"):
                continue  # docstring/comment mention
            if pat.search(line):
                offenders.append(f"{rel}:{i}: {line.strip()}")
    assert not offenders, (
        "hardcoded shuffle widths (use io_utils.join_partitions()):\n" + "\n".join(offenders)
    )


def test_no_raw_read_parquet():
    offenders = []
    for rel, src in _py_sources():
        lines = src.splitlines()
        for i, line in enumerate(lines, 1):
            if "ray.data.read_parquet(" not in line or line.lstrip().startswith("#"):
                continue
            # the inline-strip helpers chain .map_batches(strip) on the
            # following two lines; accept if the marker appears nearby
            window = "\n".join(lines[i - 1 : i + 2])
            if any(rel == f and marker in window for f, marker in RAW_READ_PARQUET_ALLOWED):
                continue
            offenders.append(f"{rel}:{i}: {line.strip()}")
    assert not offenders, (
        "raw ray.data.read_parquet (use io_utils.read_parquet_clean):\n" + "\n".join(offenders)
    )

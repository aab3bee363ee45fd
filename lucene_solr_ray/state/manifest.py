"""Commit points: ``manifest_N.json`` — the segments_N analogue.

Reference: [U] lucene/core/.../index/SegmentInfos.java + the two-phase
commit in IndexWriter.commit() ([U] .../index/IndexWriter.java): write
everything, fsync, then atomically publish the new generation. A crash
before publish leaves the previous generation authoritative.

The manifest carries per-segment lineage + metrics — the checkpoint /
resume unit mandated by BASELINE.json:14. Resume = diff the plan's
bucket list against segments present in the manifest (or complete on
disk) and rebuild only the missing ones (pipelines/build.py).
"""

from __future__ import annotations

import json
import os
import re

_GEN_RE = re.compile(r"^manifest_(\d+)\.json$")


def manifest_path(index_dir: str, generation: int) -> str:
    return os.path.join(index_dir, f"manifest_{generation}.json")


def latest_generation(index_dir: str) -> int | None:
    gens = []
    if os.path.isdir(index_dir):
        for name in os.listdir(index_dir):
            m = _GEN_RE.match(name)
            if m:
                gens.append(int(m.group(1)))
    return max(gens) if gens else None


def load_manifest(index_dir: str, generation: int | None = None) -> dict:
    if generation is None:
        generation = latest_generation(index_dir)
        if generation is None:
            raise FileNotFoundError(f"no manifest in {index_dir}")
    with open(manifest_path(index_dir, generation)) as fh:
        m = json.load(fh)
    m["generation"] = generation
    return m


def commit_manifest(index_dir: str, manifest: dict) -> int:
    """Two-phase publish: tmp write + fsync + atomic rename. Returns the
    new generation number."""
    os.makedirs(index_dir, exist_ok=True)
    prev = latest_generation(index_dir)
    gen = 0 if prev is None else prev + 1
    manifest = dict(manifest, generation=gen)
    tmp = manifest_path(index_dir, gen) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, manifest_path(index_dir, gen))
    return gen

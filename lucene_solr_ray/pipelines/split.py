"""SPLITSHARD — double the index's term-hash partition count in place
([U] solr/core/.../cloud/api/collections/SplitShardCmd.java; the Solr
collections-API op that splits a shard so a hot collection can spread
over more nodes).

This engine partitions postings by ``crc32(term) % P``. Doubling P has
a local-split property: a term in partition ``p`` under mod-P hashing
lands in ``p`` or ``p + P`` under mod-2P — never anywhere else. So the
split needs NO postings shuffle at all: every segment splits into two
segments by filtering its (sorted) term dict, each filtered stream
feeding ``write_segment_grouped`` directly; term order, docid order,
norms, positions, per-term stats all carry through untouched. Stored
fields (global docid order), tombstones and purged tables are
partition-independent and simply carry forward in the new manifest
generation. Ray runs one task per (segment, half) — embarrassingly
parallel, memory bounded by one term's postings.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

from lucene_solr_ray.state.manifest import commit_manifest, load_manifest


def _split_halves(index_dir: str, partition: int, seg: dict, new_parts: tuple[int, int],
                  codec_name: str) -> list[dict]:
    """Split one segment's terms between the two mod-2P partitions;
    returns the new manifest segment records (empty halves dropped)."""
    from lucene_solr_ray.codec.packedints import decode_all
    from lucene_solr_ray.pipelines.build import segment_dir, stable_term_hash
    from lucene_solr_ray.segment import SegmentReader, write_segment_grouped

    reader = SegmentReader(segment_dir(index_dir, partition, seg["name"]))
    p2 = 2 * (max(new_parts) - min(new_parts))  # == 2P
    dest = stable_term_hash(reader.terms) % p2
    out = []
    for new_p in new_parts:
        keep = np.flatnonzero(dest == new_p)
        if len(keep) == 0:
            continue

        def groups(idx=keep):
            for i in idx:
                d, t, m = reader.postings(int(i))
                if reader.has_positions:
                    yield (reader.terms[i], d, t, m,
                           decode_all(reader.read_pos_blob(int(i))))
                else:
                    yield reader.terms[i], d, t, m

        name = f"{seg['name']}-sp{new_p:04d}"
        t0 = time.perf_counter()
        meta = write_segment_grouped(
            segment_dir(index_dir, new_p, name), groups(),
            codec_name=codec_name,
            lineage={"split_from": [seg["name"]], "from_partition": partition},
        )
        out.append({
            "partition": new_p,
            "name": name,
            "n_terms": meta["n_terms"],
            "n_postings": meta["n_postings"],
            "sum_tf": meta["sum_tf"],
            "postings_bytes": meta["postings_bytes"],
            "postings_crc32": meta["postings_crc32"],
            "docid_min": meta["docid_min"],
            "docid_max": meta["docid_max"],
            "wall_s": time.perf_counter() - t0,
        })
    reader.close()
    return out


def split_partitions(index_dir: str, generation: int | None = None) -> dict:
    """Double num_partitions P -> 2P; commit a new manifest generation.
    Global stats (n_docs, sum_dl, deletes/purged) are invariant: the
    split moves postings between partition directories, it never drops
    or duplicates one. Returns the new manifest."""
    import ray.data

    manifest = load_manifest(index_dir, generation)
    if manifest.get("term_vectors"):
        # stored TVs are doc-keyed files inside term-partition segment
        # dirs; re-homing them needs a doc-side plan — fail loud rather
        # than silently dropping them
        raise NotImplementedError("split with stored term vectors not supported")
    p = int(manifest["num_partitions"])
    codec_name = manifest["codec"]
    work = pa.table({
        "partition": pa.array([s["partition"] for s in manifest["segments"]], pa.int32()),
        "name": pa.array([s["name"] for s in manifest["segments"]]),
    })
    seg_by_key = {(s["partition"], s["name"]): s for s in manifest["segments"]}

    rec_schema = pa.schema([
        ("partition", pa.int64()), ("name", pa.string()),
        ("n_terms", pa.int64()), ("n_postings", pa.int64()),
        ("sum_tf", pa.int64()), ("postings_bytes", pa.int64()),
        ("postings_crc32", pa.int64()), ("docid_min", pa.int64()),
        ("docid_max", pa.int64()), ("wall_s", pa.float64()),
    ])

    def do_split(batch: pa.Table) -> pa.Table:
        rows = []
        for row in batch.to_pylist():
            seg = seg_by_key[(row["partition"], row["name"])]
            old_p = int(row["partition"])
            rows.extend(_split_halves(index_dir, old_p, seg,
                                      (old_p, old_p + p), codec_name))
        return pa.Table.from_pylist(rows, schema=rec_schema)

    recs = (
        ray.data.from_arrow(work)
        .repartition(max(len(seg_by_key), 1))
        .map_batches(do_split, batch_format="pyarrow")
        .to_pandas()
    )  # output-sized: one row per new segment
    new_segments = recs.to_dict("records")
    # sanity: the split conserves every posting
    assert sum(s["sum_tf"] for s in new_segments) == sum(
        s["sum_tf"] for s in manifest["segments"]), "split lost postings"
    new_manifest = dict(manifest)
    new_manifest.pop("generation", None)
    new_manifest["num_partitions"] = 2 * p
    new_manifest["segments"] = sorted(
        ({k: (int(v) if isinstance(v, (np.integer,)) else v) for k, v in s.items()}
         for s in new_segments),
        key=lambda s: (s["partition"], s["name"]))
    gen = commit_manifest(index_dir, new_manifest)
    new_manifest["generation"] = gen
    return new_manifest

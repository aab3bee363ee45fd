"""Whole-index validator — the CheckIndex CLI analogue
([U] lucene/core/.../index/CheckIndex.java; FIXTURES.md §6.4).

Validates, for the latest (or given) manifest generation:
- every listed segment is complete on disk, crc32/byte counts match,
  per-term df == decoded postings length, cf == sum tf, docids strictly
  increasing, terms sorted;
- per-partition: every term's docid ranges are disjoint + ascending
  across the partition's segments (the TermCursor concat precondition);
- global: sum of segment sum_tf == manifest sum_dl; all docids within
  [0, n_docs); docs.parquet covers docids 0..n_docs-1 exactly once and
  its dl/norm columns agree with codec/norms re-encoding.

Usage: python tools/check_index.py <index_dir> [generation]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_solr_ray.codec.norms import encode_dl
from lucene_solr_ray.pipelines.build import SEGMENTS_DIRNAME
from lucene_solr_ray.segment import SegmentReader, check_segment
from lucene_solr_ray.state.manifest import load_manifest


def check_index(index_dir: str, generation: int | None = None) -> list[str]:
    problems: list[str] = []
    manifest = load_manifest(index_dir, generation)
    n_docs = manifest["n_docs"]

    by_partition: dict[int, list[dict]] = {}
    total_sum_tf = 0
    for seg in manifest["segments"]:
        seg_dir = os.path.join(
            index_dir, SEGMENTS_DIRNAME, f"p{seg['partition']:04d}", seg["name"]
        )
        probs = check_segment(seg_dir)
        problems.extend(f"{seg['name']}: {p}" for p in probs)
        if seg["docid_max"] >= n_docs or (seg["docid_min"] < 0 and seg["n_postings"] > 0):
            problems.append(f"{seg['name']}: docid range outside [0, {n_docs})")
        total_sum_tf += seg["sum_tf"]
        by_partition.setdefault(seg["partition"], []).append(seg)

    if total_sum_tf != manifest["sum_dl"]:
        problems.append(f"sum_tf total {total_sum_tf} != manifest sum_dl {manifest['sum_dl']}")

    # per-partition: per-term docid ranges disjoint + ascending across
    # segments; positional segments: per-term positions count == cf
    # (the .pos <-> .doc cross-check of CheckIndex.testPostings)
    check_positions = bool(manifest.get("positions"))
    for partition, segs in sorted(by_partition.items()):
        segs = sorted(segs, key=lambda s: (s["docid_min"], s["name"]))
        readers = [
            SegmentReader(os.path.join(index_dir, SEGMENTS_DIRNAME, f"p{partition:04d}", s["name"]))
            for s in segs
        ]
        term_last: dict[str, int] = {}
        for r in readers:
            if check_positions and not r.has_positions:
                problems.append(
                    f"p{partition}: segment {os.path.basename(r.seg_dir)} lacks "
                    "positions but manifest says positions=True"
                )
            for i in range(len(r.terms)):
                t = str(r.terms[i])
                d, tfs, _ = r.postings(i)
                if t in term_last and d[0] <= term_last[t]:
                    problems.append(
                        f"p{partition}: term {t!r} docid ranges overlap across segments"
                    )
                term_last[t] = int(d[-1])
                if check_positions and r.has_positions:
                    from lucene_solr_ray.codec.packedints import decode_all

                    try:
                        pos = decode_all(r.read_pos_blob(i))
                    except Exception as e:  # truncated / corrupt .pos data
                        problems.append(f"p{partition}: term {t!r} positions undecodable: {e}")
                        continue
                    if len(pos) != int(tfs.sum()):
                        problems.append(
                            f"p{partition}: term {t!r} positions count {len(pos)} "
                            f"!= sum(tf) {int(tfs.sum())}"
                        )
                    elif len(pos) and (pos.min() < 0 or pos.max() > 65535):
                        problems.append(f"p{partition}: term {t!r} position out of range")
            r.close()

    # tombstones (.liv analogue) + purged set: every docid in
    # [0, n_docs), unique, the two sets disjoint, and n_docs_purged ==
    # len(purged set) (the set union makes re-deletes count once)
    from lucene_solr_ray.pipelines.deletes import load_deletes, load_purged

    deleted = load_deletes(index_dir, manifest)
    if deleted is not None and len(deleted):
        if deleted.min() < 0 or deleted.max() >= n_docs:
            problems.append("tombstoned docid outside [0, n_docs)")
        if len(np.unique(deleted)) != len(deleted):
            problems.append("duplicate docids in tombstone set")
    purged = load_purged(index_dir, manifest)
    if purged is not None and len(purged):
        if purged.min() < 0 or purged.max() >= n_docs:
            problems.append("purged docid outside [0, n_docs)")
        if len(np.unique(purged)) != len(purged):
            problems.append("duplicate docids in purged set")
        if deleted is not None and len(np.intersect1d(deleted, purged)):
            problems.append("tombstone set intersects purged set")
    if int(manifest.get("n_docs_purged", 0)) != (0 if purged is None else len(purged)):
        problems.append("n_docs_purged != len(purged set)")
    if int(manifest.get("n_docs_purged", 0)) > n_docs:
        problems.append("n_docs_purged exceeds n_docs")

    # docs.parquet coverage + dl/norm consistency
    docs_dir = os.path.join(index_dir, "docs")
    docs = None
    if os.path.isdir(docs_dir):
        import pyarrow.dataset as pads

        docs = pads.dataset(docs_dir, format="parquet").to_table(columns=["docid", "dl", "norm"])
        docids = np.sort(docs.column("docid").to_numpy())
        if len(docids) != n_docs:
            problems.append(f"docs.parquet rows {len(docids)} != n_docs {n_docs}")
        elif not np.array_equal(docids, np.arange(n_docs)):
            problems.append("docs.parquet docids are not exactly 0..n_docs-1")
        dl = docs.column("dl").to_numpy()
        norm = docs.column("norm").to_numpy()
        if not np.array_equal(encode_dl(dl), norm.astype(np.uint8)):
            problems.append("docs.parquet norm column != byte4(dl)")
        # sum_dl counts live postings only: purged docs keep their
        # docs.parquet rows but their postings (and dl contribution)
        # were dropped at expunge time
        live_dl = dl[np.argsort(docs.column("docid").to_numpy())]
        if purged is not None and len(purged):
            mask = np.ones(n_docs, dtype=bool)
            mask[purged] = False
            live_sum = int(live_dl[mask].sum()) if len(live_dl) == n_docs else int(dl.sum())
        else:
            live_sum = int(dl.sum())
        if live_sum != manifest["sum_dl"]:
            problems.append(f"docs live dl sum {live_sum} != manifest sum_dl")
    elif not os.path.exists(os.path.join(index_dir, "..", "..", "fields.json")):
        # a secondary field of a multi-field index shares the primary's
        # stored docs (store_docs=False) — missing docs/ is by design
        problems.append("docs/ directory missing")

    # stored term vectors (CheckIndex.testTermVectors analogue): per-row
    # tf == len(positions) == len(starts) == len(ends); start < end per
    # occurrence; positions ascending within a (doc, term) row; per-doc
    # sum(tf) == dl (vectors store the same stop-filtered chain output
    # the norms count); offsets inside the NFC text bounds
    if manifest.get("term_vectors"):
        tvs_dir = os.path.join(index_dir, "tvs")
        if not os.path.isdir(tvs_dir):
            problems.append("manifest says term_vectors=True but tvs/ missing")
        elif docs is not None and len(docs) == n_docs:
            import pyarrow.compute as pc
            import pyarrow.dataset as pads

            tv = pads.dataset(tvs_dir, format="parquet").to_table()
            tf = tv.column("tf").to_numpy()
            for col in ("positions", "starts", "ends"):
                lens = pc.list_value_length(tv.column(col)).to_numpy()
                if not np.array_equal(lens, tf):
                    problems.append(f"tvs: len({col}) != tf on some rows")
            st = pc.list_flatten(tv.column("starts")).to_numpy()
            en = pc.list_flatten(tv.column("ends")).to_numpy()
            if len(st) and not (st < en).all():
                problems.append("tvs: start >= end on some occurrence")
            pos = pc.list_flatten(tv.column("positions")).to_numpy()
            if len(pos):
                # row bounds from the ACTUAL list lengths (tf may be the
                # corrupt column under test)
                row_end = np.cumsum(pc.list_value_length(tv.column("positions")).to_numpy())
                interior = np.ones(len(pos), dtype=bool)
                interior[np.concatenate([[0], row_end[:-1]])] = False
                if not (np.diff(pos, prepend=pos[:1])[interior] > 0).all():
                    problems.append("tvs: positions not ascending within a row")
            tv_doc = tv.column("docid").to_numpy()
            order = np.argsort(tv_doc, kind="stable")
            uniq, start_idx = np.unique(tv_doc[order], return_index=True)
            per_doc_tf = np.add.reduceat(tf[order], start_idx) if len(tf) else np.empty(0, np.int64)
            dl_by_docid = np.zeros(n_docs, dtype=np.int64)
            dl_by_docid[docs.column("docid").to_numpy()] = docs.column("dl").to_numpy()
            if (uniq >= n_docs).any() or (uniq < 0).any():
                problems.append("tvs: docid outside [0, n_docs)")
            elif not np.array_equal(per_doc_tf, dl_by_docid[uniq]):
                problems.append("tvs: per-doc sum(tf) != dl")
            covered = np.zeros(n_docs, dtype=bool)
            covered[uniq[(uniq >= 0) & (uniq < n_docs)]] = True
            if (dl_by_docid[~covered] > 0).any():
                problems.append("tvs: docs with dl > 0 missing from term vectors")
    return problems


def main() -> int:
    index_dir = sys.argv[1]
    generation = int(sys.argv[2]) if len(sys.argv) > 2 else None
    fields_json = os.path.join(index_dir, "fields.json")
    if os.path.exists(fields_json):
        # multi-field index: every field sub-index passes CheckIndex,
        # plus the cross-field invariant (equal n_docs — aligned docids)
        import json

        with open(fields_json) as fh:
            fields = json.load(fh)["fields"]
        rc = 0
        n_by_field = {}
        for name in fields:
            sub = os.path.join(index_dir, "fields", name)
            problems = check_index(sub, generation)
            man = load_manifest(sub, generation)
            n_by_field[name] = man["n_docs"]
            print(f"field {name!r} gen={man['generation']}: "
                  f"{man['n_docs']} docs, {len(man['segments'])} segments")
            for p in problems:
                print("PROBLEM:", p)
                rc = 1
        if len(set(n_by_field.values())) > 1:
            print(f"PROBLEM: field sub-indexes disagree on n_docs {n_by_field}")
            rc = 1
        print("OK: no problems found" if rc == 0 else "FAILED")
        return rc
    problems = check_index(index_dir, generation)
    manifest = load_manifest(index_dir, generation)
    print(
        f"index {index_dir} gen={manifest['generation']}: "
        f"{manifest['n_docs']} docs, {len(manifest['segments'])} segments"
    )
    if problems:
        for p in problems:
            print("PROBLEM:", p)
        return 1
    print("OK: no problems found")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

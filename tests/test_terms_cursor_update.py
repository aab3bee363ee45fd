"""TermsComponent, cursorMark paging, nested JSON facets, atomic
update + RealTimeGet — new round-3 coverage over the sf0.001 tables.
Each has a DuckDB oracle in __ray_entry__.py; these tests pin the
engine-side semantics that license those oracles."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    return ray_session


def _duck(sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con.execute(sql).fetchall()


def test_terms_enum_matches_corpus_df():
    from lucene_solr_ray.functions.fulltext import terms_enum

    got = terms_enum(SF, "s", limit=20).to_pylist()
    assert len(got) > 0
    want = _duck(
        "WITH t AS (SELECT doc_id, unnest(list_distinct(list_filter("
        "regexp_split_to_array(text, '\\s+'), x -> x LIKE 's%'))) AS term FROM documents) "
        "SELECT term, COUNT(*) FROM t GROUP BY term ORDER BY term LIMIT 20"
    )
    # the engine's terms dict is stop-filtered; no stopword starts with
    # 's' in the 33-word set, so the plain split is the same set
    assert [(r["term"], r["df"]) for r in got] == [(t, int(d)) for t, d in want]


def test_terms_enum_prefix_miss_is_empty():
    from lucene_solr_ray.functions.fulltext import terms_enum

    assert terms_enum(SF, "zzznope", limit=5).num_rows == 0


def test_cursor_mark_pages_equal_global_sort():
    """Stateless page-at-a-time cursors reconstruct the global order with
    no duplicates and no gaps (the cursorMark contract)."""
    from lucene_solr_ray.functions.relational import cursor_mark_pages

    got = cursor_mark_pages(SF, page_size=40, n_pages=3).to_pylist()
    want = _duck(
        "SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 120"
    )
    assert [(r["doc_id"], r["n_chars"]) for r in got] == [(int(a), int(b)) for a, b in want]
    assert [(r["page"], r["page_rank"]) for r in got] == [
        (i // 40, i % 40) for i in range(len(got))
    ]


def test_facet_nested_buckets():
    from lucene_solr_ray.functions.relational import facet_nested

    got = facet_nested(SF, top_langs=3, top_sources=2).to_pylist()
    assert 0 < len(got) <= 6
    # lang buckets ordered by count desc; sub buckets by sub-count desc
    lang_counts = [r["lang_count"] for r in got]
    assert lang_counts == sorted(lang_counts, reverse=True)
    for r in got:
        assert r["sub_count"] <= r["lang_count"]
    # cross-check one bucket against SQL
    top = got[0]
    want = _duck(
        f"SELECT COUNT(*), SUM(n_chars) FROM documents WHERE lang = '{top['lang']}' "
        f"AND source = '{top['source']}'"
    )[0]
    assert (top["sub_count"], top["sub_sum_chars"]) == (int(want[0]), int(want[1]))


def test_atomic_update_rtg_roundtrip():
    """Update = tombstone + append; the new version is searchable (term
    present only in new text), RTG returns the new stored fields, and the
    old version no longer matches queries (checked inside the op)."""
    from lucene_solr_ray.functions.fulltext import atomic_update_rtg

    ids = [3, 77]
    got = atomic_update_rtg(SF, ids).to_pylist()
    want = _duck(
        f"SELECT doc_id, text || ' zzzupdated' FROM documents "
        f"WHERE doc_id IN ({','.join(map(str, ids))}) ORDER BY doc_id"
    )
    assert [(r["doc_id"], r["text"]) for r in got] == [(int(a), b) for a, b in want]


def test_append_carries_tombstones(tmp_path):
    """build_index(append=True) must carry deletes forward — an atomic
    update would otherwise resurrect the old version (round-3 fix)."""
    import pyarrow as pa
    import ray.data

    from lucene_solr_ray.pipelines.build import build_index
    from lucene_solr_ray.pipelines.deletes import delete_docs, load_deletes
    from lucene_solr_ray.pipelines.search import IndexSearcher
    from lucene_solr_ray.state.manifest import load_manifest

    def rows(conv, words, ts_base):
        return pa.table(
            {
                "conv_id": pa.array([conv] * len(words)),
                "turn_idx": pa.array(np.arange(len(words), dtype=np.int32)),
                "role": pa.array(["user"] * len(words)),
                "text": pa.array(words),
                "tool": pa.array([""] * len(words)),
                "ts": pa.array(
                    np.datetime64("2026-01-01", "us")
                    + np.arange(ts_base, ts_base + len(words)).astype("timedelta64[s]").astype("timedelta64[us]")
                ),
            }
        )

    idx = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(rows("c0", ["alpha beta", "beta gamma"], 0)),
                idx, num_partitions=2, salt=1)
    delete_docs(idx, [0])
    build_index(ray.data.from_arrow(rows("c1", ["alpha delta"], 10)),
                idx, num_partitions=2, salt=1, append=True)
    m = load_manifest(idx)
    assert m.get("deletes_file"), "append dropped the tombstone table"
    assert load_deletes(idx, m).tolist() == [0]
    s = IndexSearcher(idx)
    d, _ = s.search(["alpha"], k=10, mode="or")
    assert d.tolist() == [2], "tombstoned doc 0 must stay dead after append"

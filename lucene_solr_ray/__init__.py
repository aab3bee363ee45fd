"""lucene_solr_ray — a from-scratch, Ray-Data-native inverted-index build +
BM25 query engine with the query/data-processing capabilities of
apache/lucene-solr (reference: branch_8_11; see /root/repo/SURVEY.md).

Layout
------
- ``analysis``        canonical StandardAnalyzer-equivalent chain (SURVEY §2.2)
- ``codec``           byte4 norms + FOR128/varint postings codecs (SURVEY §2.3)
- ``similarity``      Lucene-8.x Okapi BM25 (LUCENE-8563 form) (SURVEY §2.6)
- ``segment``         segment writer/reader (terms dict + postings + meta)
- ``state.manifest``  commit points / checkpoint + lineage (SURVEY §2.3, §4)
- ``pipelines.build`` Ray Data index-build pipeline (SURVEY §3 Trace A)
- ``pipelines.search``query engine: WAND / leapfrog / top-k (SURVEY §3 Trace B)
- ``pipelines.merge`` TieredMergePolicy-style planner + k-way merger (§2.4)
- ``fixtures``        deterministic transcript + query-set generators (FIXTURES.md)
- ``oracle``          brute-force BM25 oracle (the Lucene stand-in)
- ``functions``       relational / text / dedup / ANN operators (SURVEY §2.7-2.10)

No module in this package calls ``ray.init()``; sessions are owned by
bench.py / test fixtures / the driver.
"""

__version__ = "0.1.0"

import os

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def t1_corpus(tmp_path_factory):
    """t1 smoke corpus (FIXTURES.md §1): 50 convs, seed 42, 2 files."""
    from lucene_solr_ray.fixtures import write_transcripts

    path = str(tmp_path_factory.mktemp("corpus") / "t1")
    write_transcripts(path, n_convs=50, seed=42, num_files=2)
    return path


@pytest.fixture(scope="session")
def t1_table(t1_corpus):
    import pyarrow.dataset as pads

    return pads.dataset(t1_corpus, format="parquet").to_table()


@pytest.fixture(scope="session")
def t1_oracle(t1_table):
    from lucene_solr_ray.oracle import Oracle

    return Oracle(t1_table)


@pytest.fixture(scope="session")
def t1_queries(t1_table):
    from lucene_solr_ray.fixtures import gen_query_set

    return gen_query_set(t1_table.column("text").to_pylist(), seed=43)


@pytest.fixture(scope="session")
def t1_index(ray_session, t1_corpus, tmp_path_factory):
    """Built t1 index: salted + multi-partition to exercise the full path."""
    from lucene_solr_ray.pipelines.build import build_index

    index_dir = str(tmp_path_factory.mktemp("index") / "t1")
    manifest = build_index(t1_corpus, index_dir, num_partitions=8, salt=2, store_positions=True)
    return index_dir, manifest

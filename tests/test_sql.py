"""SqlStream mini-planner: every supported SQL shape is compared against
DuckDB running the IDENTICAL string on the same parquet."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("orders", "customer", "part", "nation", "region"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.sql(sql).df()


def _ray(sql: str) -> pd.DataFrame:
    from lucene_solr_ray.functions.sql import execute

    return execute(SF, sql).to_pandas()


def _check(sql: str):
    got = _ray(sql).reset_index(drop=True)
    exp = _duck(sql).reset_index(drop=True)
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if not list(got.columns) == list(exp.columns):
        raise AssertionError(f"schema {list(got.columns)} != {list(exp.columns)}")
    g = got.sort_values(list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice >= 200000",
        "SELECT o_orderkey AS k, o_orderstatus AS st FROM orders WHERE o_orderstatus = 'F'",
        "SELECT COUNT(*) AS n FROM orders",
        "SELECT COUNT(*) AS n, SUM(o_custkey) AS s FROM orders WHERE o_custkey < 50",
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus",
        "SELECT c_mktsegment, MIN(c_custkey) AS lo, MAX(c_custkey) AS hi "
        "FROM customer GROUP BY c_mktsegment",
        "SELECT p_brand, COUNT(*) AS n FROM part WHERE p_size >= 10 AND p_size <= 30 "
        "GROUP BY p_brand",
        "SELECT o_orderkey FROM orders WHERE o_orderstatus != 'O' ORDER BY o_orderkey LIMIT 7",
    ],
)
def test_sql_shapes_match_duckdb(ray_session, sql):
    _check(sql)


@pytest.mark.parametrize(
    "sql",
    [
        # inner join, WHERE pushed below the exchange on both sides
        "SELECT c.c_mktsegment AS seg, COUNT(*) AS n FROM orders o "
        "INNER JOIN customer c ON o.o_custkey = c.c_custkey "
        "WHERE o.o_totalprice >= 100000 AND c.c_custkey < 120 GROUP BY c.c_mktsegment",
        # ON written right-side-first; SUM over the join
        "SELECT c.c_mktsegment AS seg, SUM(o.o_orderkey) AS s FROM orders o "
        "INNER JOIN customer c ON c.c_custkey = o.o_custkey GROUP BY c.c_mktsegment",
        # join without aggregates: projected row output
        "SELECT o.o_orderkey AS ok, c.c_mktsegment AS seg FROM orders o "
        "INNER JOIN customer c ON o.o_custkey = c.c_custkey "
        "WHERE c.c_custkey = 7 ORDER BY ok",
        # LEFT OUTER: unmatched left rows survive; COUNT(col) skips nulls
        "SELECT c.c_mktsegment AS seg, COUNT(*) AS n_rows, COUNT(o.o_orderkey) AS n_orders "
        "FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey "
        "GROUP BY c.c_mktsegment",
        # LEFT OUTER with a nullable-side WHERE: stays post-join (outer semantics)
        "SELECT c.c_custkey AS ck, COUNT(o.o_orderkey) AS n FROM customer c "
        "LEFT JOIN orders o ON c.c_custkey = o.o_custkey "
        "WHERE o.o_totalprice >= 100000 GROUP BY c.c_custkey",
        # HAVING on an aggregate expression and on an alias
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus "
        "HAVING COUNT(*) > 100",
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus HAVING n > 100",
        # HAVING over a join
        "SELECT c.c_mktsegment AS seg, COUNT(*) AS n FROM orders o "
        "INNER JOIN customer c ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_mktsegment HAVING COUNT(*) > 10 AND MIN(o.o_orderkey) >= 1",
        # HAVING on an aggregate absent from SELECT (hidden agg, dropped)
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus "
        "HAVING SUM(o_custkey) > 10000",
        # DISTINCT (single + multi column)
        "SELECT DISTINCT o_orderstatus FROM orders ORDER BY o_orderstatus",
        "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders "
        "ORDER BY o_orderstatus, o_orderpriority",
    ],
)
def test_sql_join_having_distinct_match_duckdb(ray_session, sql):
    _check(sql)


@pytest.mark.parametrize(
    "sql",
    [
        # bare (unqualified) column refs in a join query must fail loudly
        "SELECT c_mktsegment, COUNT(*) AS n FROM orders o "
        "INNER JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY c_mktsegment",
        # HAVING without aggregates
        "SELECT o_orderkey FROM orders HAVING o_orderkey > 5",
        # non-equi join condition
        "SELECT o.o_orderkey AS k FROM orders o INNER JOIN customer c "
        "ON o.o_custkey < c.c_custkey",
        # HAVING on an alias that is not a SELECT aggregate alias
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus "
        "HAVING foo > 5",
    ],
)
def test_sql_join_having_unsupported_raises(ray_session, sql):
    from lucene_solr_ray.functions.sql import execute, parse_select

    with pytest.raises(ValueError):
        parse_select(sql)
        execute(SF, sql)  # HAVING resolution errors surface at execute()


def test_sql_order_desc_limit(ray_session):
    sql = "SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey DESC LIMIT 5"
    got = _ray(sql)
    exp = _duck(sql)
    # ordered comparison — ORDER BY must be preserved through LIMIT
    assert got["o_orderkey"].tolist() == exp["o_orderkey"].tolist()


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT * FROM orders",                                 # star unsupported
        "SELECT o_orderkey FROM orders JOIN customer ON 1=1",   # join unsupported
        "SELECT MEDIAN(o_totalprice) AS m FROM orders",         # median unsupported
        "SELECT o_orderkey, COUNT(*) FROM orders",              # non-grouped col
        "SELECT o_orderkey FROM orders GROUP BY o_orderkey",    # group w/o agg
        "DELETE FROM orders",                                   # not a select
    ],
)
def test_sql_unsupported_raises(sql):
    from lucene_solr_ray.functions.sql import parse_select

    with pytest.raises(ValueError):
        parse_select(sql)


@pytest.mark.parametrize(
    "sql",
    [
        # left-deep 3-way inner chain with pushdown on two tables
        "SELECT n.n_name AS nation, COUNT(*) AS cnt FROM orders o "
        "INNER JOIN customer c ON o.o_custkey = c.c_custkey "
        "INNER JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE o.o_totalprice >= 100000 AND n.n_regionkey = 1 GROUP BY n.n_name",
        # 4-way: region on top, ON written new-side-first once
        "SELECT r.r_name AS region, COUNT(*) AS cnt FROM orders o "
        "INNER JOIN customer c ON c.c_custkey = o.o_custkey "
        "INNER JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "INNER JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name",
        # LEFT join in the middle of a chain: nullable-side WHERE stays post-join
        "SELECT c.c_custkey AS ck, COUNT(o.o_orderkey) AS n FROM customer c "
        "LEFT JOIN orders o ON c.c_custkey = o.o_custkey "
        "INNER JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE o.o_totalprice >= 100000 GROUP BY c.c_custkey",
        # projection-only 3-way
        "SELECT o.o_orderkey AS ok, n.n_name AS nation FROM orders o "
        "INNER JOIN customer c ON o.o_custkey = c.c_custkey "
        "INNER JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE c.c_custkey = 7 ORDER BY ok",
    ],
)
def test_sql_multi_join_matches_duckdb(ray_session, sql):
    _check(sql)


@pytest.mark.parametrize(
    "sql",
    [
        # ON referencing a not-yet-joined alias (not left-deep)
        "SELECT o.o_orderkey AS k FROM orders o "
        "INNER JOIN customer c ON n.n_nationkey = c.c_nationkey "
        "INNER JOIN nation n ON c.c_nationkey = n.n_nationkey",
        # duplicate alias
        "SELECT o.o_orderkey AS k FROM orders o "
        "INNER JOIN customer o ON o.o_custkey = o.c_custkey",
        # cross join (no ON) is unsupported
        "SELECT o.o_orderkey AS k FROM orders o, customer c",
    ],
)
def test_sql_multi_join_unsupported_raises(ray_session, sql):
    from lucene_solr_ray.functions.sql import parse_select

    with pytest.raises(ValueError):
        parse_select(sql)


@pytest.mark.parametrize(
    "sql",
    [
        # IN over strings, LIKE with leading wildcard
        "SELECT c_custkey, c_mktsegment FROM customer "
        "WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE') AND c_name LIKE '%1'",
        # IN over numbers
        "SELECT o_orderkey FROM orders WHERE o_custkey IN (1, 2, 3, 5, 8, 13)",
        # LIKE with mid-pattern % and _
        "SELECT c_custkey FROM customer WHERE c_name LIKE 'Customer#00000000_'",
        # UNION ALL, trailing ORDER BY applies to the union
        "SELECT o_orderkey AS id, o_custkey AS k FROM orders WHERE o_orderstatus = 'P' "
        "UNION ALL SELECT c_custkey AS id, c_nationkey AS k FROM customer "
        "WHERE c_nationkey <= 3 ORDER BY id, k",
        # three-branch union
        "SELECT n_nationkey AS k FROM nation UNION ALL "
        "SELECT r_regionkey AS k FROM region UNION ALL "
        "SELECT c_nationkey AS k FROM customer WHERE c_custkey <= 5",
        # COUNT(DISTINCT) alongside plain aggregates, grouped
        "SELECT o_orderstatus, COUNT(DISTINCT o_orderpriority) AS n_prio, "
        "COUNT(*) AS n, MAX(o_custkey) AS mx FROM orders GROUP BY o_orderstatus",
        # COUNT(DISTINCT) alone, grouped
        "SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nat "
        "FROM customer GROUP BY c_mktsegment",
        # global COUNT(DISTINCT) + plain aggregate (single-row merge)
        "SELECT COUNT(DISTINCT o_orderpriority) AS n_prio, COUNT(*) AS n FROM orders",
    ],
)
def test_sql_in_like_union_count_distinct(ray_session, sql):
    _check(sql)


@pytest.mark.parametrize(
    "sql",
    [
        # ORDER BY inside a non-final union branch
        "SELECT o_orderkey AS id FROM orders ORDER BY id "
        "UNION ALL SELECT c_custkey AS id FROM customer",
        # mismatched output column names across branches
        "SELECT o_orderkey AS a FROM orders UNION ALL SELECT c_custkey AS b FROM customer",
        # DISTINCT on a non-count aggregate
        "SELECT SUM(DISTINCT o_custkey) AS s FROM orders",
        # COUNT(DISTINCT *) is meaningless
        "SELECT COUNT(DISTINCT *) AS n FROM orders",
        # COUNT(DISTINCT) in HAVING
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus "
        "HAVING COUNT(DISTINCT o_orderpriority) > 1",
    ],
)
def test_sql_union_distinct_unsupported_raises(ray_session, sql):
    from lucene_solr_ray.functions.sql import execute

    with pytest.raises(ValueError):
        execute(SF, sql)


@pytest.mark.parametrize(
    "sql",
    [
        # AVG grouped (int column: exact sum/count partials, one IEEE division)
        "SELECT o_orderstatus, AVG(o_custkey) AS avg_ck, COUNT(*) AS n "
        "FROM orders GROUP BY o_orderstatus",
        # global AVG (single-row merge path)
        "SELECT AVG(o_orderkey) AS a, COUNT(*) AS n FROM orders",
        # AVG in HAVING only (hidden aggregate computed then dropped)
        "SELECT o_orderstatus, COUNT(*) AS n FROM orders "
        "GROUP BY o_orderstatus HAVING AVG(o_custkey) > 40",
        # AVG under a join
        "SELECT c.c_mktsegment AS seg, AVG(o.o_orderkey) AS avg_ok FROM orders o "
        "INNER JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY c.c_mktsegment",
    ],
)
def test_sql_avg_matches_duckdb(ray_session, sql):
    _check(sql)


@pytest.mark.parametrize(
    "sql",
    [
        # OR at top level
        "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'P' OR o_custkey < 5",
        # NOT over a paren group (Kleene semantics)
        "SELECT o_orderkey FROM orders WHERE NOT (o_orderstatus = 'O' OR o_custkey < 50)",
        # nested parens, mixed AND/OR precedence
        "SELECT o_orderkey FROM orders WHERE (o_orderstatus = 'F' AND o_custkey < 50) "
        "OR (o_orderstatus = 'P' AND NOT o_custkey >= 80)",
        # NOT IN-ish via NOT (col IN ...)
        "SELECT c_custkey FROM customer WHERE NOT c_mktsegment IN ('BUILDING', 'MACHINERY')",
        # OR in a join query: single-sided disjunction still pushes below
        # the exchange; cross-side disjunction evaluates post-join
        "SELECT o.o_orderkey AS ok, c.c_custkey AS ck FROM orders o "
        "INNER JOIN customer c ON o.o_custkey = c.c_custkey "
        "WHERE (o.o_orderstatus = 'P' OR o.o_totalprice >= 400000) "
        "AND (c.c_mktsegment = 'BUILDING' OR o.o_custkey < 10)",
    ],
)
def test_sql_or_not_matches_duckdb(ray_session, sql):
    _check(sql)


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT o_orderkey, o_orderkey % 7 AS b7 FROM orders WHERE o_custkey < 20",
        "SELECT o_orderkey, (o_custkey * 3 + 1) - o_orderkey % 5 AS x FROM orders "
        "WHERE o_custkey < 20 ORDER BY o_orderkey",
        "SELECT c_custkey * 2 AS dbl, c_nationkey FROM customer WHERE c_custkey <= 10",
    ],
)
def test_sql_scalar_expr_matches_duckdb(ray_session, sql):
    _check(sql)


@pytest.mark.parametrize(
    "sql",
    [
        # scalar expr without alias
        "SELECT o_orderkey % 7 FROM orders",
        # scalar expr mixed with aggregates
        "SELECT o_orderkey % 7 AS b, COUNT(*) AS n FROM orders GROUP BY b",
        # division is refused (DuckDB '/' returns DOUBLE)
        "SELECT o_orderkey / 2 AS h FROM orders",
        # AVG over a floating column is order-dependent
        "SELECT AVG(o_totalprice) AS a FROM orders",
    ],
)
def test_sql_new_unsupported_raises(ray_session, sql):
    import ray as _ray
    from lucene_solr_ray.functions.sql import execute

    with pytest.raises((ValueError, Exception)):
        ds = execute(SF, sql)
        ds.materialize()


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT o_orderkey FROM orders WHERE o_totalprice BETWEEN 200000 AND 250000",
        # BETWEEN nested in a boolean tree with its own ANDs around it
        "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F' "
        "AND (o_custkey BETWEEN 10 AND 40 OR o_custkey BETWEEN 100 AND 120)",
        "SELECT o_orderkey FROM orders WHERE NOT o_custkey BETWEEN 5 AND 140",
        # IS NULL on left-join misses (anti-join shape) + IS NOT NULL
        "SELECT o.o_orderkey AS ok FROM orders o "
        "LEFT OUTER JOIN customer c ON o.o_orderkey = c.c_custkey "
        "WHERE c.c_mktsegment IS NULL",
        "SELECT o.o_orderkey AS ok, c.c_mktsegment AS seg FROM orders o "
        "LEFT OUTER JOIN customer c ON o.o_orderkey = c.c_custkey "
        "WHERE c.c_mktsegment IS NOT NULL",
    ],
)
def test_sql_between_is_null_matches_duckdb(ray_session, sql):
    _check(sql)


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT o_orderstatus, SUM(o_custkey) * 2 - COUNT(*) AS xval, "
        "MAX(o_orderkey) % 97 AS mk FROM orders GROUP BY o_orderstatus",
        # global (single-row) aggregate expression
        "SELECT SUM(o_custkey) - MIN(o_custkey) AS spread FROM orders",
        # shared leaves across expressions + HAVING alongside
        "SELECT o_orderstatus, (MAX(o_orderkey) - MIN(o_orderkey)) + COUNT(*) AS rng, "
        "COUNT(*) AS n FROM orders GROUP BY o_orderstatus HAVING COUNT(*) > 100",
        # under a join with qualified args
        "SELECT c.c_mktsegment AS seg, SUM(o.o_orderkey) % 1000 AS sm FROM orders o "
        "INNER JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY c.c_mktsegment",
    ],
)
def test_sql_agg_expr_matches_duckdb(ray_session, sql):
    _check(sql)


@pytest.mark.parametrize(
    "sql",
    [
        # mixing agg and bare-column leaves in one expression
        "SELECT o_orderstatus, SUM(o_custkey) - o_orderkey AS x FROM orders "
        "GROUP BY o_orderstatus",
        # AVG inside a scalar expression (DOUBLE, breaks int contract)
        "SELECT AVG(o_custkey) * 2 AS a FROM orders",
    ],
)
def test_sql_agg_expr_unsupported_raises(ray_session, sql):
    from lucene_solr_ray.functions.sql import parse_select

    with pytest.raises(ValueError):
        parse_select(sql)

"""DuckDB SQL oracle generators for the SCORED full-text entries.

BM25 (Lucene 8.x form) is SQL-expressible on this corpus because
(a) whitespace split + stop filter == the analysis chain here (proved by
the boolean ft_* oracles), (b) DuckDB's FLOAT is IEEE float32, so the
engine's pinned float-narrowing order (FIXTURES.md §3, similarity.py) can
be replicated literally: every float32 narrowing becomes
``CAST(<double expr> AS FLOAT)``, and the float32 left-to-right score
accumulation becomes a nested CAST fold (exact: a float64 sum of two
float32 values is exact, so one CAST = one IEEE float32 rounding — the
same operation numpy's ``(a + b).astype(float32)`` performs), and
(c) byte4 norm quantisation (codec/norms.py) is "greatest representable
value <= dl", a 252-entry VALUES lookup generated from the SAME
DECODED_TABLE the engine scores with.

The driver-facing outputs are RANK-ONLY (query_id, rank, doc_id): float
scores never enter the hash. Rank equality still requires the replicated
float32 scores to order identically, which they do bit-for-bit except
for a theoretical last-ulp ln() divergence between libm and DuckDB —
tests/test_ft_oracle_sql.py measures the inter-rank score gaps and
asserts they exceed that bound by orders of magnitude.

Shared-constant discipline: STOPWORDS / DECODED_TABLE / K1 / B are
imported from the engine modules, so engine and oracle cannot drift.
"""

from __future__ import annotations

from lucene_solr_ray.analysis import STOPWORDS
from lucene_solr_ray.codec.norms import DECODED_TABLE
from lucene_solr_ray.similarity import B, K1

_STOP = "[" + ", ".join(f"'{w}'" for w in sorted(STOPWORDS)) + "]"
# distinct byte4-representable doc lengths; decode(encode(dl)) ==
# greatest representable value <= dl (encode truncates to 4 sig bits)
_REPS = ", ".join(f"({int(v)})" for v in sorted({int(v) for v in DECODED_TABLE}))


def _esc(t: str) -> str:
    return t.replace("'", "''")


def prelude_ctes(k1: float = K1, b: float = B) -> str:
    """Shared CTEs: stop-filtered tokens, dl, corpus stats, per-doc BM25
    denominator (k1*(1-b+b*dl'/avgdl), float64, dl' byte4-quantised).
    ``k1``/``b`` default to the engine constants; the tuned-BM25 oracle
    passes its own pair."""
    return (
        "toks AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] ELSE "
        "list_filter(regexp_split_to_array(trim(text), '\\s+'), "
        f"x -> NOT list_contains({_STOP}, x)) END AS tk FROM documents), "
        f"reps(v) AS (VALUES {_REPS}), "
        "dltab AS (SELECT doc_id, len(tk) AS dl FROM toks), "
        "stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, "
        "CAST(SUM(dl) AS DOUBLE) AS sum_dl FROM dltab), "
        # numpy op order pinned: K1 * ((1-B) + (B*dl')/avgdl)
        f"denom AS (SELECT d.doc_id, {k1!r}*(({1.0 - b!r}) + "
        f"({b!r}*CAST((SELECT MAX(v) FROM reps WHERE v <= d.dl) AS DOUBLE))"
        "/(stats.sum_dl/stats.n)) AS dn FROM dltab d, stats)"
    )


def tf_cte(name: str, term: str) -> str:
    return (f"{name} AS (SELECT doc_id, "
            f"len(list_filter(tk, x -> x = '{_esc(term)}')) AS tf FROM toks)")


def w_cte(name: str, tf_name: str) -> str:
    """float32 term weight = float32(ln(1 + (N - df + 0.5)/(df + 0.5)))."""
    return (
        f"{name} AS (SELECT CAST(ln(1.0 + ((stats.n - d.df) + 0.5)/(d.df + 0.5)) AS FLOAT) AS w "
        f"FROM (SELECT CAST(COUNT(CASE WHEN tf > 0 THEN 1 END) AS DOUBLE) AS df FROM {tf_name}) d, stats)"
    )


def score_expr(tf_alias: str, w_name: str) -> str:
    """float32 s(t,d) = float32(w64 * tf/(tf + denom)); absent term -> exact 0
    (adding float32 0.0 is the identity, matching the engine's dense path)."""
    return (
        f"CASE WHEN {tf_alias}.tf > 0 THEN "
        f"CAST(CAST((SELECT w FROM {w_name}) AS DOUBLE) * "
        f"(CAST({tf_alias}.tf AS DOUBLE)/(CAST({tf_alias}.tf AS DOUBLE) + denom.dn)) AS FLOAT) "
        "ELSE CAST(0.0 AS FLOAT) END"
    )


def fold_f32(exprs: list[str]) -> str:
    """Left-to-right float32 accumulation (FIXTURES §3 pinned order)."""
    acc = exprs[0]
    for e in exprs[1:]:
        acc = f"CAST(CAST({acc} AS DOUBLE) + CAST({e} AS DOUBLE) AS FLOAT)"
    return acc


def bm25_topk_sql(queries: list[tuple[str, list[str], str]], k: int = 10,
                  k1: float = K1, b: float = B) -> str:
    """Oracle for fulltext.bm25_topk -> (query_id, rank, doc_id). Pass
    k1/b to replicate a tuned BM25Similarity(k1, b) — the constants are
    imported from the engine class by the entry so they cannot drift."""
    from lucene_solr_ray.oracle import analyze_query_terms

    ctes = [prelude_ctes(k1=k1, b=b)]
    selects = []
    for qi, (qid, raw_terms, mode) in enumerate(queries):
        terms = analyze_query_terms(raw_terms)  # distinct, ascending UTF-8
        tf_names, w_names = [], []
        for ti, t in enumerate(terms):
            tf_n, w_n = f"tf_q{qi}_{ti}", f"w_q{qi}_{ti}"
            ctes.append(tf_cte(tf_n, t))
            ctes.append(w_cte(w_n, tf_n))
            tf_names.append(tf_n)
            w_names.append(w_n)
        aliases = [f"t{ti}" for ti in range(len(terms))]
        joins = f"{tf_names[0]} {aliases[0]}"
        for tf_n, a in zip(tf_names[1:], aliases[1:]):
            joins += f" JOIN {tf_n} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
        joins += f" JOIN denom ON denom.doc_id = {aliases[0]}.doc_id"
        fold = fold_f32([score_expr(a, w_n) for a, w_n in zip(aliases, w_names)])
        glue = " AND " if mode == "and" else " OR "
        cond = glue.join(f"{a}.tf > 0" for a in aliases)
        selects.append(
            f"SELECT '{_esc(qid)}' AS query_id, rank, doc_id FROM ("
            "SELECT doc_id, "
            "CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
            f"FROM (SELECT {aliases[0]}.doc_id AS doc_id, {fold} AS score "
            f"FROM {joins} WHERE {cond}) sub"
            f") ranked WHERE rank < {int(k)}"
        )
    return ("WITH " + ", ".join(ctes) + " "
            + " UNION ALL ".join(f"({s})" for s in selects)
            + " ORDER BY query_id, rank")


def axiomatic_topk_sql(queries: list[tuple[str, list[str], str]], k: int = 10) -> str:
    """Oracle for fulltext.bm25_topk(similarity='ax_f2exp') — Lucene's
    AxiomaticF2EXP (similarity.AxiomaticF2EXP; same float64 tree, s/k
    constants imported so they can't drift):

        w(t)     = float32( ((N+1)/df)^k )
        denom(d) = s + (s*dl')/avgdl
        s(t,d)   = float32( w64 * tf/(tf + denom) )

    then the pinned float32 left-to-right fold and rank-only output."""
    from lucene_solr_ray.oracle import analyze_query_terms
    from lucene_solr_ray.similarity import AxiomaticF2EXP

    s_c, k_c = AxiomaticF2EXP.S, AxiomaticF2EXP.K
    ctes = [prelude_ctes()]
    # numpy op order pinned: S + (S*dl')/avgdl
    ctes.append(
        f"axdenom AS (SELECT d.doc_id, {s_c!r} + "
        f"({s_c!r}*CAST((SELECT MAX(v) FROM reps WHERE v <= d.dl) AS DOUBLE))"
        "/(stats.sum_dl/stats.n) AS dn FROM dltab d, stats)"
    )
    selects = []
    for qi, (qid, raw_terms, mode) in enumerate(queries):
        terms = analyze_query_terms(raw_terms)
        tf_names, w_names = [], []
        for ti, t in enumerate(terms):
            tf_n, w_n = f"atf_q{qi}_{ti}", f"aw_q{qi}_{ti}"
            ctes.append(tf_cte(tf_n, t))
            ctes.append(
                f"{w_n} AS (SELECT CAST(pow((stats.n + 1.0)/d.df, {k_c!r}) AS FLOAT) AS w "
                f"FROM (SELECT CAST(COUNT(CASE WHEN tf > 0 THEN 1 END) AS DOUBLE) AS df "
                f"FROM {tf_n}) d, stats)"
            )
            tf_names.append(tf_n)
            w_names.append(w_n)
        aliases = [f"t{ti}" for ti in range(len(terms))]
        joins = f"{tf_names[0]} {aliases[0]}"
        for tf_n, a in zip(tf_names[1:], aliases[1:]):
            joins += f" JOIN {tf_n} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
        joins += f" JOIN axdenom ON axdenom.doc_id = {aliases[0]}.doc_id"
        parts = []
        for a, w_n in zip(aliases, w_names):
            parts.append(
                f"CASE WHEN {a}.tf > 0 THEN "
                f"CAST(CAST((SELECT w FROM {w_n}) AS DOUBLE) * "
                f"(CAST({a}.tf AS DOUBLE)/(CAST({a}.tf AS DOUBLE) + axdenom.dn)) AS FLOAT) "
                "ELSE CAST(0.0 AS FLOAT) END"
            )
        fold = fold_f32(parts)
        glue = " AND " if mode == "and" else " OR "
        cond = glue.join(f"{a}.tf > 0" for a in aliases)
        selects.append(
            f"SELECT '{_esc(qid)}' AS query_id, rank, doc_id FROM ("
            "SELECT doc_id, "
            "CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
            f"FROM (SELECT {aliases[0]}.doc_id AS doc_id, {fold} AS score "
            f"FROM {joins} WHERE {cond}) sub"
            f") ranked WHERE rank < {int(k)}"
        )
    return ("WITH " + ", ".join(ctes) + " "
            + " UNION ALL ".join(f"({s})" for s in selects)
            + " ORDER BY query_id, rank")


def lmdirichlet_topk_sql(queries: list[tuple[str, list[str], str]], k: int = 10) -> str:
    """Oracle for fulltext.bm25_topk(similarity='lmdirichlet') — the
    Lucene 8 LMDirichlet model (similarity.LMDirichlet, mu/p constants
    imported so they can't drift):

        s64(t,d) = ln(1 + tf/(mu*p)) + ln(mu/(dl'+mu)),  p=(cf+1)/(sum_dl+1)
        s(t,d)   = float32(max(s64, 0))

    then the same float32 left-to-right fold and rank-only output as the
    BM25 oracle."""
    from lucene_solr_ray.oracle import analyze_query_terms
    from lucene_solr_ray.similarity import LMDirichlet

    mu = LMDirichlet.MU
    ctes = [prelude_ctes()]
    # per-doc ln(mu/(dl'+mu)), dl' byte4-quantised exactly like the engine norm
    ctes.append(
        f"lmden AS (SELECT d.doc_id, ln({mu!r}/("
        "CAST((SELECT MAX(v) FROM reps WHERE v <= d.dl) AS DOUBLE)"
        f" + {mu!r})) AS dn FROM dltab d)"
    )
    selects = []
    for qi, (qid, raw_terms, mode) in enumerate(queries):
        terms = analyze_query_terms(raw_terms)
        tf_names, p_names = [], []
        for ti, t in enumerate(terms):
            tf_n, p_n = f"ltf_q{qi}_{ti}", f"lp_q{qi}_{ti}"
            ctes.append(tf_cte(tf_n, t))
            # float64 collection probability p = (cf+1)/(sum_dl+1)
            ctes.append(
                f"{p_n} AS (SELECT (CAST(SUM(tf) AS DOUBLE) + 1.0)/(stats.sum_dl + 1.0) AS p "
                f"FROM {tf_n}, stats GROUP BY stats.sum_dl)"
            )
            tf_names.append(tf_n)
            p_names.append(p_n)
        aliases = [f"t{ti}" for ti in range(len(terms))]
        joins = f"{tf_names[0]} {aliases[0]}"
        for tf_n, a in zip(tf_names[1:], aliases[1:]):
            joins += f" JOIN {tf_n} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
        joins += f" JOIN lmden ON lmden.doc_id = {aliases[0]}.doc_id"
        parts = []
        for a, p_n in zip(aliases, p_names):
            parts.append(
                f"CASE WHEN {a}.tf > 0 THEN "
                f"CAST(GREATEST(ln(1.0 + CAST({a}.tf AS DOUBLE)/({mu!r}*(SELECT p FROM {p_n})))"
                " + lmden.dn, 0.0) AS FLOAT) "
                "ELSE CAST(0.0 AS FLOAT) END"
            )
        fold = fold_f32(parts)
        glue = " AND " if mode == "and" else " OR "
        cond = glue.join(f"{a}.tf > 0" for a in aliases)
        selects.append(
            f"SELECT '{_esc(qid)}' AS query_id, rank, doc_id FROM ("
            "SELECT doc_id, "
            "CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
            f"FROM (SELECT {aliases[0]}.doc_id AS doc_id, {fold} AS score "
            f"FROM {joins} WHERE {cond}) sub"
            f") ranked WHERE rank < {int(k)}"
        )
    return ("WITH " + ", ".join(ctes) + " "
            + " UNION ALL ".join(f"({s})" for s in selects)
            + " ORDER BY query_id, rank")


def dfr_gl2_topk_sql(queries: list[tuple[str, list[str], str]], k: int = 10) -> str:
    """Oracle for fulltext.bm25_topk(similarity='dfr_gl2') — the GL2
    geometric DFR model (similarity.DFRGL2, c imported so it can't
    drift):

        lambda = cf/(N + cf),  tfn = tf * log2(1 + c*avgdl/dl')
        s(t,d) = float32(max(0, (log2(1/(1+lambda))
                              + tfn*log2((1+lambda)/lambda)) / (1+tfn)))

    then the same float32 fold and rank-only output as the BM25 oracle.
    log2 is the one non-IEEE-pinned op (libm vs DuckDB last-ulp) — the
    pytest gap bound covers it."""
    from lucene_solr_ray.oracle import analyze_query_terms
    from lucene_solr_ray.similarity import DFRGL2

    c = DFRGL2.C
    ctes = [prelude_ctes()]
    # per-doc tfn multiplier log2(1 + c*avgdl/dl'), dl' byte4-quantised
    ctes.append(
        "glden AS (SELECT d.doc_id, log2(1.0 + "
        f"{c!r}*(stats.sum_dl/stats.n)/"
        "GREATEST(CAST((SELECT MAX(v) FROM reps WHERE v <= d.dl) AS DOUBLE), 1.0)"
        ") AS h2 FROM dltab d, stats)"
    )
    selects = []
    for qi, (qid, raw_terms, mode) in enumerate(queries):
        terms = analyze_query_terms(raw_terms)
        tf_names, l_names = [], []
        for ti, t in enumerate(terms):
            tf_n, l_n = f"gtf_q{qi}_{ti}", f"gl_q{qi}_{ti}"
            ctes.append(tf_cte(tf_n, t))
            ctes.append(
                f"{l_n} AS (SELECT CAST(SUM(tf) AS DOUBLE)/"
                f"(stats.n + CAST(SUM(tf) AS DOUBLE)) AS lam "
                f"FROM {tf_n}, stats GROUP BY stats.n)"
            )
            tf_names.append(tf_n)
            l_names.append(l_n)
        aliases = [f"t{ti}" for ti in range(len(terms))]
        joins = f"{tf_names[0]} {aliases[0]}"
        for tf_n, a in zip(tf_names[1:], aliases[1:]):
            joins += f" JOIN {tf_n} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
        joins += f" JOIN glden ON glden.doc_id = {aliases[0]}.doc_id"
        parts = []
        for a, l_n in zip(aliases, l_names):
            lam = f"(SELECT lam FROM {l_n})"
            tfn = f"(CAST({a}.tf AS DOUBLE) * glden.h2)"
            parts.append(
                f"CASE WHEN {a}.tf > 0 THEN "
                f"CAST(GREATEST((log2(1.0/(1.0 + {lam})) + {tfn}*log2((1.0 + {lam})/{lam}))"
                f"/(1.0 + {tfn}), 0.0) AS FLOAT) "
                "ELSE CAST(0.0 AS FLOAT) END"
            )
        fold = fold_f32(parts)
        glue = " AND " if mode == "and" else " OR "
        cond = glue.join(f"{a}.tf > 0" for a in aliases)
        selects.append(
            f"SELECT '{_esc(qid)}' AS query_id, rank, doc_id FROM ("
            "SELECT doc_id, "
            "CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
            f"FROM (SELECT {aliases[0]}.doc_id AS doc_id, {fold} AS score "
            f"FROM {joins} WHERE {cond}) sub"
            f") ranked WHERE rank < {int(k)}"
        )
    return ("WITH " + ", ".join(ctes) + " "
            + " UNION ALL ".join(f"({s})" for s in selects)
            + " ORDER BY query_id, rank")


def dfr_ine_topk_sql(queries: list[tuple[str, list[str], str]], k: int = 10) -> str:
    """Oracle for fulltext.bm25_topk(similarity='dfr_ine_l2') — the
    IneL2 DFR model: ne = N*(1-((N-1)/N)^cf), w = f32(log2((N+1)/(ne+0.5))),
    s = f32(w64 * tfn/(tfn+1)) with the H2 tfn. pow/log2 are the
    non-IEEE-pinned ops; the pytest gap bound covers them."""
    from lucene_solr_ray.oracle import analyze_query_terms

    ctes = [prelude_ctes()]
    ctes.append(
        "ineden AS (SELECT d.doc_id, log2(1.0 + (stats.sum_dl/stats.n)/"
        "GREATEST(CAST((SELECT MAX(v) FROM reps WHERE v <= d.dl) AS DOUBLE), 1.0)"
        ") AS h2 FROM dltab d, stats)"
    )
    selects = []
    for qi, (qid, raw_terms, mode) in enumerate(queries):
        terms = analyze_query_terms(raw_terms)
        tf_names, w_names = [], []
        for ti, t in enumerate(terms):
            tf_n, w_n = f"itf_q{qi}_{ti}", f"iw_q{qi}_{ti}"
            ctes.append(tf_cte(tf_n, t))
            ctes.append(
                f"{w_n} AS (SELECT CAST(log2((stats.n + 1.0)/"
                "(stats.n * (1.0 - pow((stats.n - 1.0)/stats.n, "
                f"CAST(SUM(tf) AS DOUBLE))) + 0.5)) AS FLOAT) AS w "
                f"FROM {tf_n}, stats GROUP BY stats.n)"
            )
            tf_names.append(tf_n)
            w_names.append(w_n)
        aliases = [f"t{ti}" for ti in range(len(terms))]
        joins = f"{tf_names[0]} {aliases[0]}"
        for tf_n, a in zip(tf_names[1:], aliases[1:]):
            joins += f" JOIN {tf_n} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
        joins += f" JOIN ineden ON ineden.doc_id = {aliases[0]}.doc_id"
        parts = []
        for a, w_n in zip(aliases, w_names):
            tfn = f"(CAST({a}.tf AS DOUBLE) * ineden.h2)"
            parts.append(
                f"CASE WHEN {a}.tf > 0 THEN "
                f"CAST(CAST((SELECT w FROM {w_n}) AS DOUBLE) * ({tfn}/({tfn} + 1.0)) AS FLOAT) "
                "ELSE CAST(0.0 AS FLOAT) END"
            )
        fold = fold_f32(parts)
        glue = " AND " if mode == "and" else " OR "
        cond = glue.join(f"{a}.tf > 0" for a in aliases)
        selects.append(
            f"SELECT '{_esc(qid)}' AS query_id, rank, doc_id FROM ("
            "SELECT doc_id, "
            "CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
            f"FROM (SELECT {aliases[0]}.doc_id AS doc_id, {fold} AS score "
            f"FROM {joins} WHERE {cond}) sub"
            f") ranked WHERE rank < {int(k)}"
        )
    return ("WITH " + ", ".join(ctes) + " "
            + " UNION ALL ".join(f"({s})" for s in selects)
            + " ORDER BY query_id, rank")


def ib_spl_topk_sql(queries: list[tuple[str, list[str], str]], k: int = 10) -> str:
    """Oracle for fulltext.bm25_topk(similarity='ib_spl') — the IB
    smoothed-power-law model (similarity.IBSmoothedPowerLaw):

        lam = (df+1)/(N+1),  tfn = tf * log2(1 + avgdl/dl')
        s(t,d) = float32(max(0, -ln((lam^(tfn/(tfn+1)) - 1)/(lam - 1))))

    pow/ln/log2 are the non-IEEE-pinned ops — the pytest gap bound
    covers them."""
    from lucene_solr_ray.oracle import analyze_query_terms

    ctes = [prelude_ctes()]
    ctes.append(
        "splden AS (SELECT d.doc_id, log2(1.0 + (stats.sum_dl/stats.n)/"
        "GREATEST(CAST((SELECT MAX(v) FROM reps WHERE v <= d.dl) AS DOUBLE), 1.0)"
        ") AS h2 FROM dltab d, stats)"
    )
    selects = []
    for qi, (qid, raw_terms, mode) in enumerate(queries):
        terms = analyze_query_terms(raw_terms)
        tf_names, l_names = [], []
        for ti, t in enumerate(terms):
            tf_n, l_n = f"stf_q{qi}_{ti}", f"sl_q{qi}_{ti}"
            ctes.append(tf_cte(tf_n, t))
            ctes.append(
                f"{l_n} AS (SELECT (CAST(COUNT(CASE WHEN tf > 0 THEN 1 END) AS DOUBLE) + 1.0)"
                f"/(stats.n + 1.0) AS lam FROM {tf_n}, stats GROUP BY stats.n)"
            )
            tf_names.append(tf_n)
            l_names.append(l_n)
        aliases = [f"t{ti}" for ti in range(len(terms))]
        joins = f"{tf_names[0]} {aliases[0]}"
        for tf_n, a in zip(tf_names[1:], aliases[1:]):
            joins += f" JOIN {tf_n} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
        joins += f" JOIN splden ON splden.doc_id = {aliases[0]}.doc_id"
        parts = []
        for a, l_n in zip(aliases, l_names):
            lam = f"(SELECT lam FROM {l_n})"
            tfn = f"(CAST({a}.tf AS DOUBLE) * splden.h2)"
            parts.append(
                f"CASE WHEN {a}.tf > 0 THEN "
                f"CAST(GREATEST(-ln((pow({lam}, {tfn}/({tfn} + 1.0)) - 1.0)/({lam} - 1.0)), 0.0) AS FLOAT) "
                "ELSE CAST(0.0 AS FLOAT) END"
            )
        fold = fold_f32(parts)
        glue = " AND " if mode == "and" else " OR "
        cond = glue.join(f"{a}.tf > 0" for a in aliases)
        selects.append(
            f"SELECT '{_esc(qid)}' AS query_id, rank, doc_id FROM ("
            "SELECT doc_id, "
            "CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
            f"FROM (SELECT {aliases[0]}.doc_id AS doc_id, {fold} AS score "
            f"FROM {joins} WHERE {cond}) sub"
            f") ranked WHERE rank < {int(k)}"
        )
    return ("WITH " + ", ".join(ctes) + " "
            + " UNION ALL ".join(f"({s})" for s in selects)
            + " ORDER BY query_id, rank")


def dfi_topk_sql(queries: list[tuple[str, list[str], str]], k: int = 10) -> str:
    """Oracle for fulltext.bm25_topk(similarity='dfi_chi2') — Lucene's
    DFISimilarity with the ChiSquared independence measure
    (similarity.DFIChiSquared; same float64 expression tree):

        e        = p * dl',  p = (cf+1)/(sum_dl+1)
        s64(t,d) = 0 when tf <= e, else log2((tf-e)*(tf-e)/e + 1)
        s(t,d)   = float32(s64)

    then the float32 left-to-right fold and rank-only output as the
    other scored oracles."""
    from lucene_solr_ray.oracle import analyze_query_terms

    ctes = [prelude_ctes()]
    # per-doc decoded float64 dl' (byte4-quantised like the engine norm)
    ctes.append(
        "dfidl AS (SELECT d.doc_id, "
        "CAST((SELECT MAX(v) FROM reps WHERE v <= d.dl) AS DOUBLE) AS dlp FROM dltab d)"
    )
    selects = []
    for qi, (qid, raw_terms, mode) in enumerate(queries):
        terms = analyze_query_terms(raw_terms)
        tf_names, p_names = [], []
        for ti, t in enumerate(terms):
            tf_n, p_n = f"dtf_q{qi}_{ti}", f"dp_q{qi}_{ti}"
            ctes.append(tf_cte(tf_n, t))
            ctes.append(
                f"{p_n} AS (SELECT (CAST(SUM(tf) AS DOUBLE) + 1.0)/(stats.sum_dl + 1.0) AS p "
                f"FROM {tf_n}, stats GROUP BY stats.sum_dl)"
            )
            tf_names.append(tf_n)
            p_names.append(p_n)
        aliases = [f"t{ti}" for ti in range(len(terms))]
        joins = f"{tf_names[0]} {aliases[0]}"
        for tf_n, a in zip(tf_names[1:], aliases[1:]):
            joins += f" JOIN {tf_n} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
        joins += f" JOIN dfidl ON dfidl.doc_id = {aliases[0]}.doc_id"
        parts = []
        for a, p_n in zip(aliases, p_names):
            e = f"((SELECT p FROM {p_n}) * dfidl.dlp)"
            tfd = f"CAST({a}.tf AS DOUBLE)"
            parts.append(
                f"CASE WHEN {a}.tf > 0 AND {tfd} > {e} THEN "
                f"CAST(log2(({tfd} - {e}) * ({tfd} - {e}) / {e} + 1.0) AS FLOAT) "
                "ELSE CAST(0.0 AS FLOAT) END"
            )
        fold = fold_f32(parts)
        glue = " AND " if mode == "and" else " OR "
        cond = glue.join(f"{a}.tf > 0" for a in aliases)
        selects.append(
            f"SELECT '{_esc(qid)}' AS query_id, rank, doc_id FROM ("
            "SELECT doc_id, "
            "CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
            f"FROM (SELECT {aliases[0]}.doc_id AS doc_id, {fold} AS score "
            f"FROM {joins} WHERE {cond}) sub"
            f") ranked WHERE rank < {int(k)}"
        )
    return ("WITH " + ", ".join(ctes) + " "
            + " UNION ALL ".join(f"({s})" for s in selects)
            + " ORDER BY query_id, rank")


def rerank_topk_sql(main_terms: list[str], rerank_terms: list[str],
                    weight: float, top_n: int, k: int) -> str:
    """Oracle for fulltext.rerank_topk ([U] solr/core/.../search/
    ReRankQParserPlugin.java): combined = float32(float64(main_f32) +
    weight * float64(sec_f32)), sec = 0 for top-N docs the rerank query
    misses (LEFT JOIN) — the exact op order the engine pins."""
    from lucene_solr_ray.oracle import analyze_query_terms

    ctes = [prelude_ctes()]

    def build(tag: str, terms: list[str]) -> tuple[str, str]:
        tf_names, w_names = [], []
        for ti, t in enumerate(terms):
            tf_n, w_n = f"tf_{tag}{ti}", f"w_{tag}{ti}"
            ctes.append(tf_cte(tf_n, t))
            ctes.append(w_cte(w_n, tf_n))
            tf_names.append(tf_n)
            w_names.append(w_n)
        aliases = [f"{tag}a{ti}" for ti in range(len(terms))]
        joins = f"{tf_names[0]} {aliases[0]}"
        for tf_n, a in zip(tf_names[1:], aliases[1:]):
            joins += f" JOIN {tf_n} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
        joins += f" JOIN denom ON denom.doc_id = {aliases[0]}.doc_id"
        fold = fold_f32([score_expr(a, w_n) for a, w_n in zip(aliases, w_names)])
        cond = " OR ".join(f"{a}.tf > 0" for a in aliases)
        return (f"SELECT {aliases[0]}.doc_id AS doc_id, {fold} AS score "
                f"FROM {joins} WHERE {cond}"), fold

    main_sel, _ = build("m", analyze_query_terms(main_terms))
    sec_sel, _ = build("s", analyze_query_terms(rerank_terms))
    ctes.append(f"mainq AS (SELECT doc_id, score FROM ({main_sel}) "
                f"ORDER BY score DESC, doc_id LIMIT {int(top_n)})")
    ctes.append(f"secq AS ({sec_sel})")
    combined = (f"CAST(CAST(m.score AS DOUBLE) + {float(weight)!r} * "
                "CAST(COALESCE(s.score, CAST(0.0 AS FLOAT)) AS DOUBLE) AS FLOAT)")
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT rank, doc_id FROM (SELECT m.doc_id AS doc_id, "
        f"CAST(ROW_NUMBER() OVER (ORDER BY {combined} DESC, m.doc_id) - 1 AS BIGINT) AS rank "
        "FROM mainq m LEFT JOIN secq s ON m.doc_id = s.doc_id) ranked "
        f"WHERE rank < {int(k)} ORDER BY rank"
    )


def common_terms_topk_sql(terms: list[str], max_df_frac: float, k: int) -> str:
    """Oracle for fulltext.common_terms_topk: the rare/common split
    (df <= max_df_frac * N) is computed dynamically in SQL, so engine
    and oracle classify from the same corpus. Match condition: any rare
    term present; if NO term is rare, plain OR. Score: ordinary BM25
    fold over ALL terms."""
    from lucene_solr_ray.oracle import analyze_query_terms

    qterms = analyze_query_terms(terms)
    ctes = [prelude_ctes()]
    tf_names, w_names, rare_names = [], [], []
    for ti, t in enumerate(qterms):
        tf_n, w_n, r_n = f"tf_c{ti}", f"w_c{ti}", f"rare_c{ti}"
        ctes.append(tf_cte(tf_n, t))
        ctes.append(w_cte(w_n, tf_n))
        ctes.append(
            f"{r_n} AS (SELECT (SELECT CAST(COUNT(CASE WHEN tf > 0 THEN 1 END) AS DOUBLE) "
            f"FROM {tf_n}) <= {float(max_df_frac)!r} * stats.n AS r FROM stats)")
        tf_names.append(tf_n)
        w_names.append(w_n)
        rare_names.append(r_n)
    aliases = [f"ca{ti}" for ti in range(len(qterms))]
    joins = f"{tf_names[0]} {aliases[0]}"
    for tf_n, a in zip(tf_names[1:], aliases[1:]):
        joins += f" JOIN {tf_n} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
    joins += f" JOIN denom ON denom.doc_id = {aliases[0]}.doc_id"
    fold = fold_f32([score_expr(a, w_n) for a, w_n in zip(aliases, w_names)])
    rare_hit = " OR ".join(
        f"((SELECT r FROM {r_n}) AND {a}.tf > 0)"
        for r_n, a in zip(rare_names, aliases))
    any_rare = " OR ".join(f"(SELECT r FROM {r_n})" for r_n in rare_names)
    any_tf = " OR ".join(f"{a}.tf > 0" for a in aliases)
    cond = f"({rare_hit}) OR (NOT ({any_rare}) AND ({any_tf}))"
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT rank, doc_id FROM (SELECT doc_id, "
        "CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
        f"FROM (SELECT {aliases[0]}.doc_id AS doc_id, {fold} AS score "
        f"FROM {joins} WHERE {cond}) sub) ranked "
        f"WHERE rank < {int(k)} ORDER BY rank"
    )


def phrase_topk_sql(phrase: list[str], k: int = 10) -> str:
    """Oracle for fulltext.phrase_topk: tf = non-overlapping adjacent
    occurrence count (StopFilter position gaps == textual adjacency on
    this corpus), weight = float32(sum of member idfs in phrase order)."""
    pat = "\\b" + "\\s+".join(_esc(t) for t in phrase) + "\\b"
    ctes = [prelude_ctes()]
    tf_names = []
    for ti, t in enumerate(phrase):
        tf_n = f"tf_p{ti}"
        ctes.append(tf_cte(tf_n, t))
        tf_names.append(tf_n)
    # idf sum in PHRASE order (search_phrase sums over qterms as given)
    idf_terms = []
    for tf_n in tf_names:
        idf_terms.append(
            f"(SELECT ln(1.0 + ((stats.n - d.df) + 0.5)/(d.df + 0.5)) "
            f"FROM (SELECT CAST(COUNT(CASE WHEN tf > 0 THEN 1 END) AS DOUBLE) AS df FROM {tf_n}) d, stats)"
        )
    w = "CAST(" + " + ".join(idf_terms) + " AS FLOAT)"
    ctes.append(f"wp AS (SELECT {w} AS w)")
    ctes.append(
        "ptf AS (SELECT doc_id, CAST(len(regexp_extract_all(text, "
        f"'{pat}')) AS BIGINT) AS tf FROM documents)"
    )
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT rank, doc_id FROM ("
        "SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
        "FROM (SELECT p.doc_id, "
        "CAST(CAST((SELECT w FROM wp) AS DOUBLE) * "
        "(CAST(p.tf AS DOUBLE)/(CAST(p.tf AS DOUBLE) + denom.dn)) AS FLOAT) AS score "
        "FROM ptf p JOIN denom ON denom.doc_id = p.doc_id WHERE p.tf > 0) s"
        f") WHERE rank < {int(k)} ORDER BY rank"
    )


def clause_order_topk_sql(terms: list[str], k: int = 10, offset: int = 0) -> str:
    """Oracle for the /select scored page (solrapi via search_clauses):
    OR match over single-term SHOULD clauses, float32 score fold in
    CLAUSE INPUT ORDER (search_clauses pins accumulation to clause order,
    unlike search()'s analyzed ascending order) -> (rank, doc_id) rows
    [offset, offset+k)."""
    ctes = [prelude_ctes()]
    tf_names, w_names = [], []
    for ti, t in enumerate(terms):
        tf_n, w_n = f"tf_s{ti}", f"w_s{ti}"
        ctes.append(tf_cte(tf_n, t))
        ctes.append(w_cte(w_n, tf_n))
        tf_names.append(tf_n)
        w_names.append(w_n)
    aliases = [f"t{ti}" for ti in range(len(terms))]
    joins = f"{tf_names[0]} {aliases[0]}"
    for tf_n, a in zip(tf_names[1:], aliases[1:]):
        joins += f" JOIN {tf_n} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
    joins += f" JOIN denom ON denom.doc_id = {aliases[0]}.doc_id"
    fold = fold_f32([score_expr(a, w_n) for a, w_n in zip(aliases, w_names)])
    cond = " OR ".join(f"{a}.tf > 0" for a in aliases)
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT rank, doc_id FROM ("
        "SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
        f"FROM (SELECT {aliases[0]}.doc_id AS doc_id, {fold} AS score "
        f"FROM {joins} WHERE {cond}) sub"
        f") ranked WHERE rank >= {int(offset)} AND rank < {int(offset) + int(k)} ORDER BY rank"
    )


def synonym_topk_sql(terms: list[str], k: int = 10) -> str:
    """Oracle for fulltext.synonym_topk — SynonymQuery scoring: one
    pseudo-term with df = max over member docFreqs and per-doc
    tf = sum of member tfs; score = float32(w64 * tf/(tf + denom)),
    a single rounding exactly as the engine's one score_term call."""
    from lucene_solr_ray.oracle import analyze_query_terms

    ts = analyze_query_terms(terms)
    ctes = [prelude_ctes()]
    tf_names = []
    for ti, t in enumerate(ts):
        tf_n = f"tf_y{ti}"
        ctes.append(tf_cte(tf_n, t))
        tf_names.append(tf_n)
    aliases = [f"t{ti}" for ti in range(len(ts))]
    joins = f"{tf_names[0]} {aliases[0]}"
    for tf_n, a in zip(tf_names[1:], aliases[1:]):
        joins += f" JOIN {tf_n} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
    joins += f" JOIN denom ON denom.doc_id = {aliases[0]}.doc_id"
    dfs = " , ".join(
        f"(SELECT CAST(COUNT(CASE WHEN tf > 0 THEN 1 END) AS DOUBLE) FROM {n})"
        for n in tf_names)
    ctes.append(
        "w_syn AS (SELECT CAST(ln(1.0 + ((stats.n - d.df) + 0.5)/(d.df + 0.5)) AS FLOAT) AS w "
        f"FROM (SELECT GREATEST({dfs}) AS df) d, stats)"
    )
    tf_sum = " + ".join(f"{a}.tf" for a in aliases)
    cond = " OR ".join(f"{a}.tf > 0" for a in aliases)
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT rank, doc_id FROM ("
        "SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
        f"FROM (SELECT {aliases[0]}.doc_id AS doc_id, "
        "CAST(CAST((SELECT w FROM w_syn) AS DOUBLE) * "
        f"(CAST({tf_sum} AS DOUBLE)/(CAST({tf_sum} AS DOUBLE) + denom.dn)) AS FLOAT) AS score "
        f"FROM {joins} WHERE {cond}) sub"
        f") ranked WHERE rank < {int(k)} ORDER BY rank"
    )


def elevation_topk_sql(terms: list[str], elevated: list[int],
                       excluded: list[int], k: int = 10) -> str:
    """Oracle for fulltext.elevation_topk: BM25 ranking limited to
    k' = k + |elevated| + |excluded| (the engine's retrieval depth),
    elevated/excluded ids dropped from it, elevated ids prepended in
    config order, cut to k -> (rank, doc_id, elevated)."""
    from lucene_solr_ray.oracle import analyze_query_terms

    ts = analyze_query_terms(terms)
    k_prime = int(k) + len(elevated) + len(excluded)
    ctes = [prelude_ctes()]
    tf_names, w_names = [], []
    for ti, t in enumerate(ts):
        tf_n, w_n = f"tf_e{ti}", f"w_e{ti}"
        ctes.append(tf_cte(tf_n, t))
        ctes.append(w_cte(w_n, tf_n))
        tf_names.append(tf_n)
        w_names.append(w_n)
    aliases = [f"t{ti}" for ti in range(len(ts))]
    joins = f"{tf_names[0]} {aliases[0]}"
    for tf_n, a in zip(tf_names[1:], aliases[1:]):
        joins += f" JOIN {tf_n} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
    joins += f" JOIN denom ON denom.doc_id = {aliases[0]}.doc_id"
    fold = fold_f32([score_expr(a, w_n) for a, w_n in zip(aliases, w_names)])
    cond = " OR ".join(f"{a}.tf > 0" for a in aliases)
    elev_vals = ", ".join(f"({int(d)}, {i})" for i, d in enumerate(elevated))
    drop_ids = sorted({int(d) for d in list(elevated) + list(excluded)})
    drop = ", ".join(str(d) for d in drop_ids) or "NULL"
    ctes.append(
        "ranked AS (SELECT doc_id, "
        "CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS r "
        f"FROM (SELECT {aliases[0]}.doc_id AS doc_id, {fold} AS score "
        f"FROM {joins} WHERE {cond}) sub QUALIFY r < {k_prime})"
    )
    ctes.append(f"elev(doc_id, e_ord) AS (VALUES {elev_vals})")
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT rank, doc_id, elevated FROM ("
        "SELECT CAST(ROW_NUMBER() OVER (ORDER BY grp, ord) - 1 AS BIGINT) AS rank, "
        "doc_id, elevated FROM ("
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, 0 AS grp, "
        "CAST(e_ord AS BIGINT) AS ord, CAST(1 AS BIGINT) AS elevated FROM elev "
        "UNION ALL "
        "SELECT doc_id, 1, r, CAST(0 AS BIGINT) FROM ranked "
        f"WHERE doc_id NOT IN ({drop})) u) f "
        f"WHERE rank < {int(k)} ORDER BY rank"
    )


def word_break_sql(term: str, min_break_length: int = 2, k: int = 10) -> str:
    """Oracle for fulltext.word_break_suggest: the dictionary is the
    stop-filtered token vocabulary with doc frequencies; every split of
    ``term`` whose halves are both dictionary terms, ranked by
    (max(df) desc, split position asc)."""
    t = _esc(term)
    lo, hi = int(min_break_length), len(term) - int(min_break_length)
    return (
        "WITH " + prelude_ctes() + ", "
        "dict AS (SELECT tok AS term, COUNT(DISTINCT doc_id) AS df FROM "
        "(SELECT doc_id, unnest(tk) AS tok FROM toks) GROUP BY tok), "
        f"splits AS (SELECT CAST(i AS BIGINT) AS i, substr('{t}', 1, CAST(i AS INT)) AS l, "
        f"substr('{t}', CAST(i AS INT) + 1) AS r FROM generate_series({lo}, {hi}) g(i)) "
        "SELECT CAST(ROW_NUMBER() OVER (ORDER BY greatest(dl.df, dr.df) DESC, s.i) - 1 AS BIGINT) "
        "AS sugg_rank, s.i AS split_pos, s.l AS left_term, s.r AS right_term, "
        "CAST(dl.df AS BIGINT) AS df_left, CAST(dr.df AS BIGINT) AS df_right "
        "FROM splits s JOIN dict dl ON dl.term = s.l JOIN dict dr ON dr.term = s.r "
        f"ORDER BY sugg_rank LIMIT {int(k)}"
    )


def dismax_topk_sql(terms: list[str], tie_breaker: float, k: int = 10) -> str:
    """Oracle for fulltext.dismax_topk: float32 per-clause scores (missing
    clause -> exact 0), score = float32(max64 + tie*(sum64 - max64)) with
    the float64 sum taken in ascending term order (dismax_combine)."""
    from lucene_solr_ray.oracle import analyze_query_terms

    ts = analyze_query_terms(terms)
    ctes = [prelude_ctes()]
    aliases = []
    parts = []
    for ti, t in enumerate(ts):
        tf_n, w_n, a = f"tf_d{ti}", f"w_d{ti}", f"t{ti}"
        ctes.append(tf_cte(tf_n, t))
        ctes.append(w_cte(w_n, tf_n))
        aliases.append((tf_n, a))
        parts.append(score_expr(a, w_n))
    joins = f"{aliases[0][0]} {aliases[0][1]}"
    for tf_n, a in aliases[1:]:
        joins += f" JOIN {tf_n} {a} ON {aliases[0][1]}.doc_id = {a}.doc_id"
    joins += f" JOIN denom ON denom.doc_id = {aliases[0][1]}.doc_id"
    cond = " OR ".join(f"{a}.tf > 0" for _, a in aliases)
    mx = "GREATEST(" + ", ".join(f"s{i}" for i in range(len(ts))) + ")"
    total = " + ".join(f"CAST(s{i} AS DOUBLE)" for i in range(len(ts)))
    part_cols = ", ".join(f"{p} AS s{i}" for i, p in enumerate(parts))
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT rank, doc_id FROM ("
        "SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
        "FROM (SELECT doc_id, "
        f"CAST(CAST({mx} AS DOUBLE) + {tie_breaker!r}*(({total}) - CAST({mx} AS DOUBLE)) AS FLOAT) AS score "
        f"FROM (SELECT {aliases[0][1]}.doc_id AS doc_id, {part_cols} "
        f"FROM {joins} WHERE {cond}) p) s"
        f") WHERE rank < {int(k)} ORDER BY rank"
    )


def more_like_this_sql(doc_id: int, max_terms: int = 8, k: int = 10) -> str:
    """Oracle for fulltext.more_like_this_topk: top tf*idf terms of the
    source doc (ties -> larger term, heapq.nlargest tuple order) -> BM25
    OR query. Term set is data-dependent, so the float32 accumulation is
    a list_reduce fold over per-term scores in ascending term order."""
    return (
        "WITH " + prelude_ctes() + ", "
        f"src AS (SELECT unnest(tk) AS term FROM toks WHERE doc_id = {int(doc_id)}), "
        "srctf AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS f FROM src GROUP BY term), "
        "alldf AS (SELECT x AS term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df "
        "FROM (SELECT doc_id, unnest(tk) AS x FROM toks) GROUP BY x), "
        "sel AS (SELECT term FROM ("
        "SELECT s.term, s.f * ln(1.0 + ((stats.n - a.df) + 0.5)/(a.df + 0.5)) AS tfidf "
        "FROM srctf s JOIN alldf a ON s.term = a.term, stats WHERE a.df > 0"
        f") ORDER BY tfidf DESC, term DESC LIMIT {int(max_terms)}), "
        "selw AS (SELECT a.term, CAST(ln(1.0 + ((stats.n - a.df) + 0.5)/(a.df + 0.5)) AS FLOAT) AS w "
        "FROM alldf a JOIN sel USING (term), stats), "
        "seltf AS (SELECT t.doc_id, s.term, len(list_filter(t.tk, x -> x = s.term)) AS tf "
        "FROM toks t, sel s), "
        "scores AS (SELECT st.doc_id, st.term, "
        "CAST(CAST(w.w AS DOUBLE) * (CAST(st.tf AS DOUBLE)/(CAST(st.tf AS DOUBLE) + denom.dn)) AS FLOAT) AS s "
        "FROM seltf st JOIN selw w ON st.term = w.term "
        "JOIN denom ON denom.doc_id = st.doc_id WHERE st.tf > 0), "
        "folded AS (SELECT doc_id, list_reduce(list(s ORDER BY term), "
        "(a, b) -> CAST(CAST(a AS DOUBLE) + CAST(b AS DOUBLE) AS FLOAT)) AS score "
        "FROM scores GROUP BY doc_id) "
        "SELECT rank, doc_id FROM ("
        "SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
        f"FROM folded) WHERE rank < {int(k)} ORDER BY rank"
    )


def ltr_bm25_rescore_sql(terms: list[str], n_candidates: int = 100, k: int = 20) -> str:
    """Oracle for ltr.bm25_rescore: BM25 OR top-N first pass, milli-floored
    base score + integer features (whitespace tf of terms[0], lang=='en'),
    reranked by (blend desc, doc_id asc) to top-k."""
    from lucene_solr_ray.oracle import analyze_query_terms

    ts = analyze_query_terms(terms)
    ctes = [prelude_ctes()]
    aliases, folds = [], []
    for ti, t in enumerate(ts):
        tf_n, w_n, a = f"tf_l{ti}", f"w_l{ti}", f"t{ti}"
        ctes.append(tf_cte(tf_n, t))
        ctes.append(w_cte(w_n, tf_n))
        aliases.append((tf_n, a))
        folds.append(score_expr(a, w_n))
    joins = f"{aliases[0][0]} {aliases[0][1]}"
    for tf_n, a in aliases[1:]:
        joins += f" JOIN {tf_n} {a} ON {aliases[0][1]}.doc_id = {a}.doc_id"
    joins += f" JOIN denom ON denom.doc_id = {aliases[0][1]}.doc_id"
    cond = " OR ".join(f"{a}.tf > 0" for _, a in aliases)
    fold = fold_f32(folds)
    term0 = _esc(terms[0])
    return (
        "WITH " + ", ".join(ctes) + ", "
        f"firstpass AS (SELECT doc_id, score FROM ("
        "SELECT doc_id, score, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn "
        f"FROM (SELECT {aliases[0][1]}.doc_id AS doc_id, {fold} AS score "
        f"FROM {joins} WHERE {cond}) s0) s1 WHERE rn <= {int(n_candidates)}), "
        "feats AS (SELECT f.doc_id, "
        "CAST(FLOOR(CAST(f.score AS DOUBLE)*1000 + 0.5) AS BIGINT) "
        f"+ 10*len(list_filter(regexp_split_to_array(d.text, '\\s+'), x -> x = '{term0}')) "
        "+ 5*(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END) AS blend "
        "FROM firstpass f JOIN documents d ON f.doc_id = d.doc_id) "
        "SELECT CAST(ROW_NUMBER() OVER (ORDER BY blend DESC, doc_id) - 1 AS BIGINT) AS rank, "
        "doc_id, CAST(blend AS BIGINT) AS ltr_score FROM feats "
        f"ORDER BY blend DESC, doc_id LIMIT {int(k)}"
    )


def tv_component_sql(query_term: str, max_docs: int = 20) -> str:
    """Oracle for fulltext.tv_component: re-derives every stored-TV field
    from the text. Positions = whitespace ordinal - 1 (every token,
    stopwords included, consumes one position — the StopFilter gap rule);
    char offsets = running sum of len+1 (single-space corpus, pure ASCII
    so byte == codepoint); stopwords are position-consuming but emit no
    vector entry; df is the global analyzed document frequency."""
    split = "regexp_split_to_array(text, '\\s+')"
    return (
        f"WITH m AS (SELECT doc_id FROM documents WHERE list_contains({split}, '{_esc(query_term)}') "
        f"ORDER BY doc_id LIMIT {max_docs}), "
        f"docs AS (SELECT d.doc_id, {split} AS a FROM documents d JOIN m USING (doc_id)), "
        "tok AS (SELECT doc_id, i, list_extract(a, i) AS t FROM docs, "
        "UNNEST(range(1, len(a)+1)) AS u(i)), "
        "off AS (SELECT doc_id, i, t, SUM(len(t)+1) OVER (PARTITION BY doc_id ORDER BY i "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - (len(t)+1) AS st FROM tok), "
        f"kept AS (SELECT doc_id, t AS term, i-1 AS pos, st, st + len(t) AS en FROM off "
        f"WHERE NOT list_contains({_STOP}, t)), "
        "dfs AS (SELECT t AS term, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, unnest("
        f"list_filter({split}, x -> NOT list_contains({_STOP}, x))) AS t FROM documents) GROUP BY 1) "
        "SELECT k.doc_id, k.term, CAST(COUNT(*) AS BIGINT) AS tf, CAST(ANY_VALUE(dfs.df) AS BIGINT) AS df, "
        "CAST(MIN(k.pos) AS BIGINT) AS first_pos, CAST(MIN(k.st) AS BIGINT) AS first_start, "
        "CAST(MIN(k.en) AS BIGINT) AS first_end "
        "FROM kept k JOIN dfs USING (term) GROUP BY k.doc_id, k.term ORDER BY k.doc_id, k.term"
    )


def unified_highlight_sql(raw_terms: list[str], k_docs: int = 10,
                          window: int = 16, n_passages: int = 2) -> str:
    """Oracle for fulltext.unified_highlight_topk: BM25 top-k (the same
    float32-replicating CTEs as bm25_topk_sql, OR mode) -> fixed
    ``window``-position passage grid over those docs -> per-passage
    score = SUM over query-term occurrences of micro-nat idf (exact
    int64). Char offsets replicate the tokenizer on the single-space
    corpus: start(i) = prefix token lengths + i-1 separators."""
    from lucene_solr_ray.oracle import analyze_query_terms

    terms = analyze_query_terms(raw_terms)
    ctes = [prelude_ctes()]
    tf_names, w_names = [], []
    for ti, t in enumerate(terms):
        tf_n, w_n = f"uh_tf{ti}", f"uh_w{ti}"
        ctes.append(tf_cte(tf_n, t))
        ctes.append(w_cte(w_n, tf_n))
        tf_names.append(tf_n)
        w_names.append(w_n)
    aliases = [f"t{ti}" for ti in range(len(terms))]
    joins = f"{tf_names[0]} {aliases[0]}"
    for tf_n, a in zip(tf_names[1:], aliases[1:]):
        joins += f" JOIN {tf_n} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
    joins += f" JOIN denom ON denom.doc_id = {aliases[0]}.doc_id"
    fold = fold_f32([score_expr(a, w_n) for a, w_n in zip(aliases, w_names)])
    cond = " OR ".join(f"{a}.tf > 0" for a in aliases)
    ctes.append(
        "uh_hits AS (SELECT doc_id FROM ("
        "SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS rank "
        f"FROM (SELECT {aliases[0]}.doc_id AS doc_id, {fold} AS score "
        f"FROM {joins} WHERE {cond}) sub) ranked WHERE rank < {int(k_docs)})"
    )
    # micro-nat idf per term (float64 ln, floored — no float32 narrowing)
    idf_cases = []
    for ti, (t, tf_n) in enumerate(zip(terms, tf_names)):
        ctes.append(
            f"uh_idf{ti} AS (SELECT CAST(FLOOR(ln(1.0 + ((stats.n - d.df) + 0.5)/(d.df + 0.5))"
            " * 1000000.0 + 0.5) AS BIGINT) AS m "
            f"FROM (SELECT CAST(COUNT(CASE WHEN tf > 0 THEN 1 END) AS DOUBLE) AS df FROM {tf_n}) d, stats)"
        )
        idf_cases.append(f"WHEN '{_esc(t)}' THEN (SELECT m FROM uh_idf{ti})")
    # raw (unfiltered) tokens carry the positions; offsets by prefix sums
    ctes.append(
        "uh_tok AS (SELECT d.doc_id, t.i, list_extract(d.a, t.i) AS w, "
        "CAST(COALESCE(SUM(len(list_extract(d.a, t.i)) + 1) OVER ("
        "PARTITION BY d.doc_id ORDER BY t.i ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st "
        "FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS a "
        "FROM documents WHERE doc_id IN (SELECT doc_id FROM uh_hits) AND trim(text) <> '') d, "
        "UNNEST(range(1, len(d.a) + 1)) AS t(i))"
    )
    term_set = "[" + ", ".join(f"'{_esc(t)}'" for t in terms) + "]"
    ctes.append(
        "uh_occ AS (SELECT doc_id, "
        f"CAST((i - 1) // {int(window)} AS BIGINT) AS win, "
        f"CASE w {' '.join(idf_cases)} END AS m, st, st + len(w) AS en "
        f"FROM uh_tok WHERE list_contains({term_set}, w))"
    )
    ctes.append(
        "uh_pass AS (SELECT doc_id, win, CAST(SUM(m) AS BIGINT) AS score_micro, "
        "CAST(COUNT(*) AS BIGINT) AS n_hits, CAST(MIN(st) AS BIGINT) AS first_start, "
        "CAST(MAX(en) AS BIGINT) AS last_end FROM uh_occ GROUP BY 1, 2)"
    )
    return ("WITH " + ", ".join(ctes) + " "
            "SELECT doc_id, win, score_micro, n_hits, first_start, last_end FROM ("
            "SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score_micro DESC, win) AS rn "
            f"FROM uh_pass) WHERE rn <= {int(n_passages)} "
            "ORDER BY doc_id, score_micro DESC, win")


def feature_boost_sql(raw_terms: list[str], field: str = "n_chars",
                      weight: float = 1.5, pivot: float = 300.0, k: int = 10,
                      func: str = "satu") -> str:
    """Oracle for fulltext.feature_boost_topk: the BM25 fold plus one
    trailing float32 FeatureField clause — satu CAST(w*(v/(v+pivot)) AS
    FLOAT), log CAST(w*LN(pivot+v) AS FLOAT), sigm (exponent 2)
    CAST(w*((v*v)/((v*v)+pivot^2)) AS FLOAT) — same f64 op order as the
    engine."""
    from lucene_solr_ray.oracle import analyze_query_terms

    terms = analyze_query_terms(raw_terms)
    ctes = [prelude_ctes()]
    tf_names, w_names = [], []
    for ti, t in enumerate(terms):
        tf_n, w_n = f"fb_tf{ti}", f"fb_w{ti}"
        ctes.append(tf_cte(tf_n, t))
        ctes.append(w_cte(w_n, tf_n))
        tf_names.append(tf_n)
        w_names.append(w_n)
    aliases = [f"t{ti}" for ti in range(len(terms))]
    joins = f"{tf_names[0]} {aliases[0]}"
    for tf_n, a in zip(tf_names[1:], aliases[1:]):
        joins += f" JOIN {tf_n} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
    joins += f" JOIN denom ON denom.doc_id = {aliases[0]}.doc_id"
    joins += f" JOIN documents dv ON dv.doc_id = {aliases[0]}.doc_id"
    vexpr = f"CAST(dv.{field} AS DOUBLE)"
    if func == "satu":
        sat = f"CAST({weight!r} * ({vexpr}/({vexpr} + {pivot!r})) AS FLOAT)"
    elif func == "log":
        sat = f"CAST({weight!r} * LN({pivot!r} + {vexpr}) AS FLOAT)"
    elif func == "sigm":
        p2 = float(pivot) * float(pivot)
        sat = (f"CAST({weight!r} * (({vexpr}*{vexpr})"
               f"/(({vexpr}*{vexpr}) + {p2!r})) AS FLOAT)")
    else:
        raise ValueError(f"unknown FeatureField function {func!r}")
    fold = fold_f32([score_expr(a, w_n) for a, w_n in zip(aliases, w_names)] + [sat])
    cond = " OR ".join(f"{a}.tf > 0" for a in aliases)
    return ("WITH " + ", ".join(ctes) + " "
            "SELECT 'fb-1' AS query_id, rank, doc_id FROM ("
            "SELECT doc_id, "
            "CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
            f"FROM (SELECT {aliases[0]}.doc_id AS doc_id, {fold} AS score "
            f"FROM {joins} WHERE {cond}) sub"
            f") ranked WHERE rank < {int(k)} ORDER BY rank")


def diversified_sql(raw_terms: list[str], key: str = "source",
                    max_per_key: int = 2, k: int = 10) -> str:
    """Oracle for fulltext.diversified_topk: the BM25 float32 fold, a
    per-key ROW_NUMBER cap in (score desc, doc_id) order, then the
    global rank over surviving rows."""
    from lucene_solr_ray.oracle import analyze_query_terms

    terms = analyze_query_terms(raw_terms)
    ctes = [prelude_ctes()]
    tf_names, w_names = [], []
    for ti, t in enumerate(terms):
        tf_n, w_n = f"dv_tf{ti}", f"dv_w{ti}"
        ctes.append(tf_cte(tf_n, t))
        ctes.append(w_cte(w_n, tf_n))
        tf_names.append(tf_n)
        w_names.append(w_n)
    aliases = [f"t{ti}" for ti in range(len(terms))]
    joins = f"{tf_names[0]} {aliases[0]}"
    for tf_n, a in zip(tf_names[1:], aliases[1:]):
        joins += f" JOIN {tf_n} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
    joins += f" JOIN denom ON denom.doc_id = {aliases[0]}.doc_id"
    joins += f" JOIN documents dv ON dv.doc_id = {aliases[0]}.doc_id"
    fold = fold_f32([score_expr(a, w_n) for a, w_n in zip(aliases, w_names)])
    cond = " OR ".join(f"{a}.tf > 0" for a in aliases)
    return ("WITH " + ", ".join(ctes) + ", "
            f"scored AS (SELECT {aliases[0]}.doc_id AS doc_id, dv.{key} AS kv, "
            f"{fold} AS score FROM {joins} WHERE {cond}), "
            "capped AS (SELECT doc_id, score, "
            "ROW_NUMBER() OVER (PARTITION BY kv ORDER BY score DESC, doc_id) AS occ "
            "FROM scored) "
            "SELECT 'dv-1' AS query_id, rank, doc_id FROM ("
            "SELECT doc_id, "
            "CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
            f"FROM capped WHERE occ <= {int(max_per_key)}"
            f") ranked WHERE rank < {int(k)} ORDER BY rank")


def boost_query_sql(raw_terms: list[str], field: str = "n_chars",
                    pivot: float = 300.0, k: int = 10) -> str:
    """Oracle for fulltext.boost_query_topk: the BM25 float32 fold
    MULTIPLIED (float64 product, float32 narrow) by the float32
    saturation boost — the exact op order the engine pins."""
    from lucene_solr_ray.oracle import analyze_query_terms

    terms = analyze_query_terms(raw_terms)
    ctes = [prelude_ctes()]
    tf_names, w_names = [], []
    for ti, t in enumerate(terms):
        tf_n, w_n = f"bq_tf{ti}", f"bq_w{ti}"
        ctes.append(tf_cte(tf_n, t))
        ctes.append(w_cte(w_n, tf_n))
        tf_names.append(tf_n)
        w_names.append(w_n)
    aliases = [f"t{ti}" for ti in range(len(terms))]
    joins = f"{tf_names[0]} {aliases[0]}"
    for tf_n, a in zip(tf_names[1:], aliases[1:]):
        joins += f" JOIN {tf_n} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
    joins += f" JOIN denom ON denom.doc_id = {aliases[0]}.doc_id"
    joins += f" JOIN documents dv ON dv.doc_id = {aliases[0]}.doc_id"
    boost = (f"CAST(CAST(dv.{field} AS DOUBLE)"
             f"/(CAST(dv.{field} AS DOUBLE) + {pivot!r}) AS FLOAT)")
    fold = fold_f32([score_expr(a, w_n) for a, w_n in zip(aliases, w_names)])
    final = f"CAST(CAST({fold} AS DOUBLE) * CAST({boost} AS DOUBLE) AS FLOAT)"
    cond = " OR ".join(f"{a}.tf > 0" for a in aliases)
    return ("WITH " + ", ".join(ctes) + " "
            "SELECT 'bq-1' AS query_id, rank, doc_id FROM ("
            "SELECT doc_id, "
            "CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
            f"FROM (SELECT {aliases[0]}.doc_id AS doc_id, {final} AS score "
            f"FROM {joins} WHERE {cond}) sub"
            f") ranked WHERE rank < {int(k)} ORDER BY rank")


def hybrid_rrf_sql(terms=("merge", "vector"), anchor_vec: int = 0,
                   n_each: int = 50, rrf_k: int = 60, k: int = 10) -> str:
    """Oracle for fulltext.hybrid_rrf_topk — the BM25 float32-fold
    ranking and the cosine ranking (ann-entry convention) each cut to
    n_each, fused with the exact-integer RRF combine."""
    from lucene_solr_ray.oracle import analyze_query_terms

    ts = analyze_query_terms(list(terms))
    ctes = [prelude_ctes()]
    tf_names, w_names = [], []
    for ti, t in enumerate(ts):
        tf_n, w_n = f"hy_tf{ti}", f"hy_w{ti}"
        ctes.append(tf_cte(tf_n, t))
        ctes.append(w_cte(w_n, tf_n))
        tf_names.append(tf_n)
        w_names.append(w_n)
    aliases = [f"t{ti}" for ti in range(len(ts))]
    joins = f"{tf_names[0]} {aliases[0]}"
    for tf_n, a in zip(tf_names[1:], aliases[1:]):
        joins += f" JOIN {tf_n} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
    joins += f" JOIN denom ON denom.doc_id = {aliases[0]}.doc_id"
    fold = fold_f32([score_expr(a, w_n) for a, w_n in zip(aliases, w_names)])
    cond = " OR ".join(f"{a}.tf > 0" for a in aliases)
    sparse = (
        f"sparse AS (SELECT doc_id, CAST(ROW_NUMBER() OVER "
        "(ORDER BY score DESC, doc_id) AS BIGINT) AS r FROM ("
        f"SELECT {aliases[0]}.doc_id AS doc_id, {fold} AS score FROM {joins} "
        f"WHERE {cond}) s ORDER BY r LIMIT {int(n_each)})"
    )
    dense = (
        "dense AS (SELECT neighbor_id AS doc_id, CAST(rn AS BIGINT) AS r FROM ("
        "SELECT b.vec_id AS neighbor_id, ROW_NUMBER() OVER (ORDER BY "
        "list_cosine_similarity(q.qe, b.embedding) DESC, b.vec_id) AS rn "
        f"FROM (SELECT embedding AS qe FROM embeddings WHERE vec_id = {int(anchor_vec)}) q, "
        f"embeddings b WHERE b.vec_id != {int(anchor_vec)}) d WHERE rn <= {int(n_each)})"
    )
    return (
        "WITH " + ", ".join(ctes) + ", " + sparse + ", " + dense + " "
        "SELECT CAST(ROW_NUMBER() OVER (ORDER BY rrf_micro DESC, doc_id) - 1 AS BIGINT) AS rank, "
        "doc_id, rrf_micro FROM ("
        "SELECT COALESCE(sparse.doc_id, dense.doc_id) AS doc_id, "
        f"COALESCE(1000000 // ({int(rrf_k)} + sparse.r), 0) "
        f"+ COALESCE(1000000 // ({int(rrf_k)} + dense.r), 0) AS rrf_micro "
        "FROM sparse FULL OUTER JOIN dense ON sparse.doc_id = dense.doc_id) f "
        f"ORDER BY rrf_micro DESC, doc_id LIMIT {int(k)}"
    )


def req_opt_excl_sql(must: str, other: str, mode: str, qid: str,
                     k: int = 10) -> str:
    """Oracle for fulltext.req_opt_topk (mode='opt': MUST + SHOULD, the
    two-term float32 fold restricted to the required match set) and
    fulltext.req_excl_topk (mode='excl': MUST + MUST_NOT, the
    single-term fold minus the excluded match set)."""
    from lucene_solr_ray.oracle import analyze_query_terms

    m = analyze_query_terms([must])[0]
    o = analyze_query_terms([other])[0]
    ctes = [prelude_ctes(), tf_cte("ro_tm", m), tf_cte("ro_to", o)]
    ctes.append(w_cte("ro_wm", "ro_tm"))
    if mode == "opt":
        ctes.append(w_cte("ro_wo", "ro_to"))
        fold = fold_f32([score_expr("tm", "ro_wm"), score_expr("to_", "ro_wo")])
        cond = "tm.tf > 0"
    else:
        fold = score_expr("tm", "ro_wm")
        cond = "tm.tf > 0 AND to_.tf = 0"
    return ("WITH " + ", ".join(ctes) + " "
            f"SELECT '{qid}' AS query_id, rank, doc_id FROM ("
            "SELECT doc_id, "
            "CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
            f"FROM (SELECT tm.doc_id AS doc_id, {fold} AS score "
            "FROM ro_tm tm JOIN ro_to to_ ON tm.doc_id = to_.doc_id "
            "JOIN denom ON denom.doc_id = tm.doc_id "
            f"WHERE {cond}) sub"
            f") ranked WHERE rank < {int(k)} ORDER BY rank")


def function_values_sql(term: str = "merge", k: int = 20) -> str:
    """Oracle for fulltext.function_values — tf/df over the stop-filtered
    split, idf quantized to micro-units with the same FLOOR(+0.5), and
    norm_dl = greatest byte4-representable value <= dl (the same
    DECODED_TABLE-generated reps list the scoring oracles use)."""
    t = _esc(term)
    return (
        "WITH toks AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] ELSE "
        "list_filter(regexp_split_to_array(trim(text), '\\s+'), "
        f"x -> NOT list_contains({_STOP}, x)) END AS tk FROM documents), "
        f"reps(v) AS (VALUES {_REPS}), "
        f"f AS (SELECT doc_id, len(list_filter(tk, x -> x = '{t}')) AS tf, "
        "len(tk) AS dl FROM toks), "
        "s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, "
        "CAST(COUNT(CASE WHEN tf > 0 THEN 1 END) AS DOUBLE) AS df FROM f) "
        "SELECT doc_id, CAST(tf AS BIGINT) AS tf, CAST(s.df AS BIGINT) AS df, "
        "CAST(FLOOR(ln(1.0 + ((s.n - s.df) + 0.5)/(s.df + 0.5)) * 1000000 + 0.5) AS BIGINT) AS idf_micro, "
        "CAST((SELECT MAX(v) FROM reps WHERE v <= f.dl) AS BIGINT) AS norm_dl "
        f"FROM f, s WHERE tf > 0 ORDER BY doc_id LIMIT {int(k)}"
    )


def boosting_demote_sql(raw_terms: list[str], demote_term: str = "vector",
                        demote_factor: float = 0.5, k: int = 10) -> str:
    """Oracle for fulltext.boosting_demote_topk: the BM25 float32 fold
    multiplied (float64 product, float32 narrow) by a float32 constant
    factor when the doc matches the demote term, by 1.0 otherwise —
    the exact op order the engine pins."""
    from lucene_solr_ray.oracle import analyze_query_terms

    import numpy as np

    terms = analyze_query_terms(raw_terms)
    dterm = analyze_query_terms([demote_term])[0]
    f32 = float(np.float32(demote_factor))
    ctes = [prelude_ctes()]
    tf_names, w_names = [], []
    for ti, t in enumerate(terms):
        tf_n, w_n = f"bd_tf{ti}", f"bd_w{ti}"
        ctes.append(tf_cte(tf_n, t))
        ctes.append(w_cte(w_n, tf_n))
        tf_names.append(tf_n)
        w_names.append(w_n)
    ctes.append(tf_cte("bd_dm", dterm))
    aliases = [f"t{ti}" for ti in range(len(terms))]
    joins = f"{tf_names[0]} {aliases[0]}"
    for tf_n, a in zip(tf_names[1:], aliases[1:]):
        joins += f" JOIN {tf_n} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
    joins += f" JOIN denom ON denom.doc_id = {aliases[0]}.doc_id"
    joins += f" JOIN bd_dm dm ON dm.doc_id = {aliases[0]}.doc_id"
    boost = (f"CASE WHEN dm.tf > 0 THEN CAST({f32!r} AS FLOAT) "
             "ELSE CAST(1.0 AS FLOAT) END")
    fold = fold_f32([score_expr(a, w_n) for a, w_n in zip(aliases, w_names)])
    final = f"CAST(CAST({fold} AS DOUBLE) * CAST({boost} AS DOUBLE) AS FLOAT)"
    cond = " OR ".join(f"{a}.tf > 0" for a in aliases)
    return ("WITH " + ", ".join(ctes) + " "
            "SELECT 'bd-1' AS query_id, rank, doc_id FROM ("
            "SELECT doc_id, "
            "CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
            f"FROM (SELECT {aliases[0]}.doc_id AS doc_id, {final} AS score "
            f"FROM {joins} WHERE {cond}) sub"
            f") ranked WHERE rank < {int(k)} ORDER BY rank")


def intervals_containing_sql(term_a: str, term_b: str, small: str,
                             max_width: int = 8) -> str:
    """Oracle for fulltext.intervals_containing_retrieve — an independent
    SQL construction of the minimal-interval semantic: candidate
    intervals pair each a-position with its nearest b on either side
    (correlated min/max), dominated candidates are anti-joined away,
    survivors must fit max_width and contain a c-position. Token
    position = whitespace ordinal (the StopFilter-gap invariant)."""
    pos = ("pos AS (SELECT doc_id, i - 1 AS p, list_extract(a, i) AS w FROM "
           "(SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS a "
           "FROM documents WHERE trim(text) <> '') d, "
           "UNNEST(range(1, len(a) + 1)) AS t(i))")
    return (
        f"WITH {pos}, "
        f"pa_ AS (SELECT doc_id, p FROM pos WHERE w = '{_esc(term_a)}'), "
        f"pb_ AS (SELECT doc_id, p FROM pos WHERE w = '{_esc(term_b)}'), "
        f"pc_ AS (SELECT doc_id, p FROM pos WHERE w = '{_esc(small)}'), "
        "cand AS ("
        "  SELECT DISTINCT a.doc_id, LEAST(a.p, b.p) AS lo, GREATEST(a.p, b.p) AS hi "
        "  FROM pa_ a JOIN pb_ b ON b.doc_id = a.doc_id "
        "  WHERE b.p = (SELECT MIN(p) FROM pb_ x WHERE x.doc_id = a.doc_id AND x.p >= a.p) "
        "     OR b.p = (SELECT MAX(p) FROM pb_ x WHERE x.doc_id = a.doc_id AND x.p < a.p)), "
        "minimal AS (SELECT c.* FROM cand c WHERE NOT EXISTS ("
        "  SELECT 1 FROM cand c2 WHERE c2.doc_id = c.doc_id "
        "  AND c2.lo >= c.lo AND c2.hi <= c.hi AND (c2.lo <> c.lo OR c2.hi <> c.hi))) "
        "SELECT DISTINCT m.doc_id AS doc_id FROM minimal m JOIN pc_ c ON c.doc_id = m.doc_id "
        f"WHERE m.hi - m.lo <= {int(max_width)} AND c.p BETWEEN m.lo AND m.hi "
        "ORDER BY m.doc_id"
    )


def combined_field_sql(terms, k: int = 10) -> str:
    """Oracle for fulltext.combined_field_topk (BM25F over text+source,
    [U] lucene/sandbox/.../search/CombinedFieldQuery.java) — same float
    tree: ctf = tf_text + (source = t), cdl' = byte4(dl)+1,
    avg = (sum_dl + N)/N, denom = k1*((1-b) + (b*cdl')/avg),
    w = float32(ln(1 + (N - df_c + 0.5)/(df_c + 0.5))) with df_c the
    UNION doc freq, float32 fold in ascending term order, rank-only."""
    ctes = [prelude_ctes()]
    ctes.append(
        f"cfdenom AS (SELECT d.doc_id, {K1!r}*(({1.0 - B!r}) + "
        f"({B!r}*(CAST((SELECT MAX(v) FROM reps WHERE v <= d.dl) AS DOUBLE) + 1.0))"
        "/((stats.sum_dl + stats.n)/stats.n)) AS dn FROM dltab d, stats)"
    )
    tnames, wnames = [], []
    for ti, t in enumerate(sorted(set(terms))):
        tf_n, ctf_n, w_n = f"cft_{ti}", f"cctf_{ti}", f"cfw_{ti}"
        ctes.append(tf_cte(tf_n, t))
        ctes.append(
            f"{ctf_n} AS (SELECT f.doc_id, f.tf + CAST(s.source = '{_esc(t)}' AS BIGINT) AS ctf "
            f"FROM {tf_n} f JOIN documents s USING (doc_id))"
        )
        ctes.append(
            f"{w_n} AS (SELECT CAST(ln(1.0 + ((stats.n - d.df) + 0.5)/(d.df + 0.5)) AS FLOAT) AS w "
            f"FROM (SELECT CAST(COUNT(CASE WHEN ctf > 0 THEN 1 END) AS DOUBLE) AS df "
            f"FROM {ctf_n}) d, stats)"
        )
        tnames.append(ctf_n)
        wnames.append(w_n)
    aliases = [f"c{ti}" for ti in range(len(tnames))]
    joins = f"{tnames[0]} {aliases[0]}"
    for tn, a in zip(tnames[1:], aliases[1:]):
        joins += f" JOIN {tn} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
    joins += f" JOIN cfdenom ON cfdenom.doc_id = {aliases[0]}.doc_id"
    parts = []
    for a, w_n in zip(aliases, wnames):
        parts.append(
            f"CASE WHEN {a}.ctf > 0 THEN "
            f"CAST(CAST((SELECT w FROM {w_n}) AS DOUBLE) * "
            f"(CAST({a}.ctf AS DOUBLE)/(CAST({a}.ctf AS DOUBLE) + cfdenom.dn)) AS FLOAT) "
            "ELSE CAST(0.0 AS FLOAT) END"
        )
    fold = fold_f32(parts)
    cond = " OR ".join(f"{a}.ctf > 0" for a in aliases)
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT rank, doc_id FROM ("
        "SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
        f"FROM (SELECT {aliases[0]}.doc_id AS doc_id, {fold} AS score "
        f"FROM {joins} WHERE {cond}) sub) ranked "
        f"WHERE rank < {int(k)} ORDER BY rank"
    )


def edismax_pf2_sql(terms: list[str], k: int = 10) -> str:
    """Oracle for fulltext.edismax_pf2_topk — main ascending-term BM25
    float32 fold plus per-bigram phrase scores added in query order,
    each addition one float32 narrowing; a non-matching bigram adds
    float32 0.0 (exact identity, same as the engine skipping the doc).
    Bigram tf = non-overlapping adjacent regexp count (== phrase_freq on
    this corpus, proven by ft_phrase_docs/phrase_topk), bigram weight
    = f32(idf(t1) + idf(t2)) in phrase order."""
    from lucene_solr_ray.analysis import tokenize
    from lucene_solr_ray.oracle import analyze_query_terms

    ts = analyze_query_terms(terms)
    # pf2 bigrams over the ORDER-PRESERVING analyzed query sequence —
    # the same list the engine zips (ADVICE r3: raw terms diverge from
    # the indexed vocabulary on uppercase/stopword inputs)
    seq = [w for t in terms for w in tokenize(t)]
    ctes = [prelude_ctes()]
    tf_of, w_of = {}, {}
    for ti, t in enumerate(ts):
        tf_n, w_n = f"tf_e{ti}", f"w_e{ti}"
        ctes.append(tf_cte(tf_n, t))
        ctes.append(w_cte(w_n, tf_n))
        tf_of[t], w_of[t] = tf_n, w_n
    aliases = {t: f"t{ti}" for ti, t in enumerate(ts)}
    al = [aliases[t] for t in ts]
    joins = f"{tf_of[ts[0]]} {al[0]}"
    for t in ts[1:]:
        joins += f" JOIN {tf_of[t]} {aliases[t]} ON {al[0]}.doc_id = {aliases[t]}.doc_id"
    joins += f" JOIN denom ON denom.doc_id = {al[0]}.doc_id"
    main_fold = fold_f32([score_expr(aliases[t], w_of[t]) for t in ts])
    cond = " OR ".join(f"{a}.tf > 0" for a in al)

    # per-bigram phrase tf + weight CTEs (bigrams over the analyzed
    # query sequence, the engine's pf2 construction)
    bigram_exprs = []
    for bi, (t1, t2) in enumerate(zip(seq[:-1], seq[1:])):
        pat = f"\\b{_esc(t1)}\\s+{_esc(t2)}\\b"
        ptf = f"ptf_e{bi}"
        ctes.append(
            f"{ptf} AS (SELECT doc_id, CAST(len(regexp_extract_all(text, "
            f"'{pat}')) AS BIGINT) AS tf FROM documents)"
        )
        idfs = []
        for t in (t1, t2):
            idfs.append(
                f"(SELECT ln(1.0 + ((stats.n - d.df) + 0.5)/(d.df + 0.5)) "
                f"FROM (SELECT CAST(COUNT(CASE WHEN tf > 0 THEN 1 END) AS DOUBLE) AS df "
                f"FROM {tf_of[t]}) d, stats)"
            )
        wp = f"wp_e{bi}"
        ctes.append(f"{wp} AS (SELECT CAST({' + '.join(idfs)} AS FLOAT) AS w)")
        bigram_exprs.append(
            f"CASE WHEN p{bi}.tf > 0 THEN "
            f"CAST(CAST((SELECT w FROM {wp}) AS DOUBLE) * "
            f"(CAST(p{bi}.tf AS DOUBLE)/(CAST(p{bi}.tf AS DOUBLE) + denom.dn)) AS FLOAT) "
            "ELSE CAST(0.0 AS FLOAT) END"
        )
        joins += f" LEFT JOIN ptf_e{bi} p{bi} ON p{bi}.doc_id = {al[0]}.doc_id"
    fold = fold_f32([main_fold] + bigram_exprs)
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT rank, doc_id FROM ("
        "SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
        f"FROM (SELECT {al[0]}.doc_id AS doc_id, {fold} AS score "
        f"FROM {joins} WHERE {cond}) sub) ranked "
        f"WHERE rank < {int(k)} ORDER BY rank"
    )


def fuzzy_like_this_sql(words, max_edits: int = 1, max_num_terms: int = 6,
                        k: int = 10) -> str:
    """Oracle for fulltext.fuzzy_like_this_topk — variant selection via
    DuckDB levenshtein over the stop-filtered vocabulary (dist = LEAST
    over the query words, ranked dist asc / df desc / term asc, LIMIT
    max_num_terms), then the MLT-shaped data-dependent BM25 fold:
    per-term float32 scores list_reduce-folded in ascending term order
    (one float32 narrowing per addition, the engine's pinned order)."""
    dist = "LEAST(" + ", ".join(
        f"levenshtein(term, '{_esc(w)}')" for w in words) + ")"
    return (
        "WITH " + prelude_ctes() + ", "
        "alldf AS (SELECT x AS term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df "
        "FROM (SELECT doc_id, unnest(tk) AS x FROM toks) GROUP BY x), "
        f"sel AS (SELECT term FROM (SELECT term, df, {dist} AS dist FROM alldf) "
        f"WHERE dist <= {int(max_edits)} "
        f"ORDER BY dist, df DESC, term LIMIT {int(max_num_terms)}), "
        "selw AS (SELECT a.term, CAST(ln(1.0 + ((stats.n - a.df) + 0.5)/(a.df + 0.5)) AS FLOAT) AS w "
        "FROM alldf a JOIN sel USING (term), stats), "
        "seltf AS (SELECT t.doc_id, s.term, len(list_filter(t.tk, x -> x = s.term)) AS tf "
        "FROM toks t, sel s), "
        "scores AS (SELECT st.doc_id, st.term, "
        "CAST(CAST(w.w AS DOUBLE) * (CAST(st.tf AS DOUBLE)/(CAST(st.tf AS DOUBLE) + denom.dn)) AS FLOAT) AS s "
        "FROM seltf st JOIN selw w ON st.term = w.term "
        "JOIN denom ON denom.doc_id = st.doc_id WHERE st.tf > 0), "
        "folded AS (SELECT doc_id, list_reduce(list(s ORDER BY term), "
        "(a, b) -> CAST(CAST(a AS DOUBLE) + CAST(b AS DOUBLE) AS FLOAT)) AS score "
        "FROM scores GROUP BY doc_id) "
        "SELECT rank, doc_id FROM ("
        "SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
        f"FROM folded) WHERE rank < {int(k)} ORDER BY rank"
    )


def feature_log_sql(terms: list[str], n_candidates: int = 20) -> str:
    """Oracle for ltr.feature_log: BM25 OR top-N firstpass (rank order)
    joined to the integer feature columns — whitespace tf of terms[0],
    whitespace token count, stored n_chars, lang=='en'."""
    from lucene_solr_ray.oracle import analyze_query_terms

    ts = analyze_query_terms(terms)
    ctes = [prelude_ctes()]
    aliases, folds = [], []
    for ti, t in enumerate(ts):
        tf_n, w_n, a = f"tf_g{ti}", f"w_g{ti}", f"g{ti}"
        ctes.append(tf_cte(tf_n, t))
        ctes.append(w_cte(w_n, tf_n))
        aliases.append((tf_n, a))
        folds.append(score_expr(a, w_n))
    joins = f"{aliases[0][0]} {aliases[0][1]}"
    for tf_n, a in aliases[1:]:
        joins += f" JOIN {tf_n} {a} ON {aliases[0][1]}.doc_id = {a}.doc_id"
    joins += f" JOIN denom ON denom.doc_id = {aliases[0][1]}.doc_id"
    cond = " OR ".join(f"{a}.tf > 0" for _, a in aliases)
    fold = fold_f32(folds)
    # the engine analyzes its term list up front (ADVICE r3), so the
    # tf feature's term is the FIRST ANALYZED term, not the raw one
    term0 = _esc(ts[0])
    return (
        "WITH " + ", ".join(ctes) + ", "
        "firstpass AS (SELECT doc_id, rank FROM ("
        "SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
        f"FROM (SELECT {aliases[0][1]}.doc_id AS doc_id, {fold} AS score "
        f"FROM {joins} WHERE {cond}) s0) s1 WHERE rank < {int(n_candidates)}) "
        "SELECT f.rank, f.doc_id, "
        f"CAST(len(list_filter(regexp_split_to_array(d.text, '\\s+'), x -> x = '{term0}')) AS BIGINT) AS tf_term, "
        "CAST(len(regexp_split_to_array(d.text, '\\s+')) AS BIGINT) AS n_tokens, "
        "CAST(d.n_chars AS BIGINT) AS n_chars, "
        "CAST(d.lang = 'en' AS BIGINT) AS is_en "
        "FROM firstpass f JOIN documents d USING (doc_id) ORDER BY f.rank"
    )


def sweetspot_topk_sql(queries: list[tuple[str, list[str], str]], k: int = 10) -> str:
    """Oracle for fulltext.bm25_topk(similarity='sweetspot') — classic
    tf-idf with the SweetSpot plateau length norm (similarity.SweetSpot,
    constants imported): w = f32(1 + ln((N+1)/(df+1))), norm(dl') = 1 on
    [min, max] else 1/sqrt(steep*(|dl'-min|+|dl'-max|-(max-min))+1),
    s = f32((w64 * sqrt(tf)) * norm), float32 fold, rank-only."""
    from lucene_solr_ray.oracle import analyze_query_terms
    from lucene_solr_ray.similarity import SweetSpot

    mn, mx, st = SweetSpot.LN_MIN, SweetSpot.LN_MAX, SweetSpot.STEEP
    ctes = [prelude_ctes()]
    ctes.append(
        "ssnorm AS (SELECT doc_id, CASE WHEN dlp >= "
        f"{mn!r} AND dlp <= {mx!r} THEN 1.0 ELSE "
        f"1.0/sqrt({st!r}*(abs(dlp - {mn!r}) + abs(dlp - {mx!r}) - {mx - mn!r}) + 1.0) END AS nm "
        "FROM (SELECT doc_id, CAST((SELECT MAX(v) FROM reps WHERE v <= d0.dl) AS DOUBLE) AS dlp "
        "FROM dltab d0) d)"
    )
    selects = []
    for qi, (qid, raw_terms, mode) in enumerate(queries):
        terms = analyze_query_terms(raw_terms)
        tf_names, w_names = [], []
        for ti, t in enumerate(terms):
            tf_n, w_n = f"stf_q{qi}_{ti}", f"sw_q{qi}_{ti}"
            ctes.append(tf_cte(tf_n, t))
            ctes.append(
                f"{w_n} AS (SELECT CAST(1.0 + ln((stats.n + 1.0)/(d.df + 1.0)) AS FLOAT) AS w "
                f"FROM (SELECT CAST(COUNT(CASE WHEN tf > 0 THEN 1 END) AS DOUBLE) AS df "
                f"FROM {tf_n}) d, stats)"
            )
            tf_names.append(tf_n)
            w_names.append(w_n)
        aliases = [f"t{ti}" for ti in range(len(terms))]
        joins = f"{tf_names[0]} {aliases[0]}"
        for tf_n, a in zip(tf_names[1:], aliases[1:]):
            joins += f" JOIN {tf_n} {a} ON {aliases[0]}.doc_id = {a}.doc_id"
        joins += f" JOIN ssnorm ON ssnorm.doc_id = {aliases[0]}.doc_id"
        parts = []
        for a, w_n in zip(aliases, w_names):
            parts.append(
                f"CASE WHEN {a}.tf > 0 THEN "
                f"CAST(CAST((SELECT w FROM {w_n}) AS DOUBLE) * "
                f"sqrt(CAST({a}.tf AS DOUBLE)) * ssnorm.nm AS FLOAT) "
                "ELSE CAST(0.0 AS FLOAT) END"
            )
        fold = fold_f32(parts)
        glue = " AND " if mode == "and" else " OR "
        cond = glue.join(f"{a}.tf > 0" for a in aliases)
        selects.append(
            f"SELECT '{_esc(qid)}' AS query_id, rank, doc_id FROM ("
            "SELECT doc_id, "
            "CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
            f"FROM (SELECT {aliases[0]}.doc_id AS doc_id, {fold} AS score "
            f"FROM {joins} WHERE {cond}) sub"
            f") ranked WHERE rank < {int(k)}"
        )
    return ("WITH " + ", ".join(ctes) + " "
            + " UNION ALL ".join(f"({s})" for s in selects)
            + " ORDER BY query_id, rank")


def freshness_boost_sql(raw_terms: list[str], m: float = 1e-6, a: float = 1.0,
                        b: float = 1.0, k: int = 10) -> str:
    """Oracle for fulltext.freshness_boost_topk — BM25 float32 fold times
    the float32 recip boost (float64 product, float32 narrow); x = whole
    ms from ts (= 2026-01-01 + doc_id seconds, the adapter contract) to
    the pinned NOW (2026-01-02), so x = (86400 - doc_id) * 1000 exact."""
    from lucene_solr_ray.oracle import analyze_query_terms

    terms = analyze_query_terms(raw_terms)
    ctes = [prelude_ctes()]
    tf_names, w_names = [], []
    for ti, t in enumerate(terms):
        tf_n, w_n = f"fr_tf{ti}", f"fr_w{ti}"
        ctes.append(tf_cte(tf_n, t))
        ctes.append(w_cte(w_n, tf_n))
        tf_names.append(tf_n)
        w_names.append(w_n)
    aliases = [f"t{ti}" for ti in range(len(terms))]
    joins = f"{tf_names[0]} {aliases[0]}"
    for tf_n, al in zip(tf_names[1:], aliases[1:]):
        joins += f" JOIN {tf_n} {al} ON {aliases[0]}.doc_id = {al}.doc_id"
    joins += f" JOIN denom ON denom.doc_id = {aliases[0]}.doc_id"
    x = f"CAST((86400 - {aliases[0]}.doc_id) * 1000 AS DOUBLE)"
    boost = f"CAST({a!r}/({m!r}*{x} + {b!r}) AS FLOAT)"
    fold = fold_f32([score_expr(al, w_n) for al, w_n in zip(aliases, w_names)])
    final = f"CAST(CAST({fold} AS DOUBLE) * CAST({boost} AS DOUBLE) AS FLOAT)"
    cond = " OR ".join(f"{al}.tf > 0" for al in aliases)
    return ("WITH " + ", ".join(ctes) + " "
            "SELECT rank, doc_id FROM ("
            "SELECT doc_id, "
            "CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
            f"FROM (SELECT {aliases[0]}.doc_id AS doc_id, {final} AS score "
            f"FROM {joins} WHERE {cond}) sub"
            f") ranked WHERE rank < {int(k)} ORDER BY rank")


def multifield_dismax_sql(queries=None, n_title: int = 6, k: int = 10,
                          combine: str = "dismax", boosts: dict | None = None,
                          tie_breaker: float = 0.0) -> str:
    """Oracle for fulltext.multifield_dismax_topk -> (query_id, rank,
    doc_id). Two derived fields from the SAME token slice the engine
    indexes: title = stop-filtered first ``n_title`` whitespace tokens
    (the standard chain on this corpus), body = the remaining tokens
    verbatim (whitespace chain). Each field gets its OWN dl/N/sum_dl/
    denominator CTEs and per-term df/w CTEs — per-field BM25 statistics
    replicated literally — and the per-doc DisMax combine is
    GREATEST(score_t, score_b) over the two float32 fold results (exact:
    both operands are FLOAT, max introduces no rounding)."""
    from lucene_solr_ray.analysis import tokenize, whitespace_tokenize
    from lucene_solr_ray.functions.fulltext import (
        FT_MULTIFIELD_QUERIES, N_TITLE_TOKENS)

    queries = queries or FT_MULTIFIELD_QUERIES
    n_title = n_title or N_TITLE_TOKENS

    def sorted_terms(raws, chain):
        out = set()
        for r in raws:
            out.update(chain(r))
        return sorted(out, key=lambda t: t.encode("utf-8"))

    ctes = [
        "toks0 AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] ELSE "
        "regexp_split_to_array(trim(text), '\\s+') END AS tk0 FROM documents)",
        f"ttoks AS (SELECT doc_id, list_filter(tk0[1:{n_title}], "
        f"x -> NOT list_contains({_STOP}, x)) AS tk FROM toks0)",
        f"btoks AS (SELECT doc_id, CASE WHEN len(tk0) > {n_title} THEN "
        f"tk0[{n_title + 1}:len(tk0)] ELSE [] END AS tk FROM toks0)",
        f"reps(v) AS (VALUES {_REPS})",
    ]
    for f, src in (("t", "ttoks"), ("b", "btoks")):
        ctes.append(f"dltab_{f} AS (SELECT doc_id, len(tk) AS dl FROM {src})")
        ctes.append(
            f"stats_{f} AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, "
            f"CAST(SUM(dl) AS DOUBLE) AS sum_dl FROM dltab_{f})")
        ctes.append(
            f"denom_{f} AS (SELECT d.doc_id, {K1!r}*(({1.0 - B!r}) + "
            f"({B!r}*CAST((SELECT MAX(v) FROM reps WHERE v <= d.dl) AS DOUBLE))"
            f"/(s.sum_dl/s.n)) AS dn FROM dltab_{f} d, stats_{f} s)")

    def field_tf_cte(name: str, src: str, term: str) -> str:
        return (f"{name} AS (SELECT doc_id, "
                f"len(list_filter(tk, x -> x = '{_esc(term)}')) AS tf FROM {src})")

    def field_w_cte(name: str, tf_name: str, f: str) -> str:
        return (
            f"{name} AS (SELECT CAST(ln(1.0 + ((s.n - d.df) + 0.5)/(d.df + 0.5)) AS FLOAT) AS w "
            f"FROM (SELECT CAST(COUNT(CASE WHEN tf > 0 THEN 1 END) AS DOUBLE) AS df "
            f"FROM {tf_name}) d, stats_{f} s)")

    def field_score(alias: str, w_name: str, f: str) -> str:
        return (
            f"CASE WHEN {alias}.tf > 0 THEN "
            f"CAST(CAST((SELECT w FROM {w_name}) AS DOUBLE) * "
            f"(CAST({alias}.tf AS DOUBLE)/(CAST({alias}.tf AS DOUBLE) + dn_{f}.dn)) AS FLOAT) "
            "ELSE CAST(0.0 AS FLOAT) END")

    selects = []
    for qi, (qid, t_raw, b_raw) in enumerate(queries):
        parts = []  # (field, terms)
        parts.append(("t", "ttoks", sorted_terms(t_raw, tokenize)))
        parts.append(("b", "btoks", sorted_terms(b_raw, whitespace_tokenize)))
        aliases, match_conds, field_folds = [], [], {}
        for f, src, terms in parts:
            exprs = []
            for ti, term in enumerate(terms):
                tf_n, w_n = f"tf_{f}_q{qi}_{ti}", f"w_{f}_q{qi}_{ti}"
                ctes.append(field_tf_cte(tf_n, src, term))
                ctes.append(field_w_cte(w_n, tf_n, f))
                a = f"{f}{ti}_q{qi}"
                aliases.append((tf_n, a))
                exprs.append(field_score(a, w_n, f))
                match_conds.append(f"{a}.tf > 0")
            field_folds[f] = fold_f32(exprs) if exprs else "CAST(0.0 AS FLOAT)"
        joins = f"{aliases[0][0]} {aliases[0][1]}" if aliases else "dltab_t a0"
        anchor = aliases[0][1] if aliases else "a0"
        for tf_n, a in aliases[1:]:
            joins += f" JOIN {tf_n} {a} ON {anchor}.doc_id = {a}.doc_id"
        joins += f" JOIN denom_t dn_t ON dn_t.doc_id = {anchor}.doc_id"
        joins += f" JOIN denom_b dn_b ON dn_b.doc_id = {anchor}.doc_id"
        if boosts:
            # qf boost: f32(boost64 * fold64) per field, same op as the
            # engine's vector scaling
            for f in list(field_folds):
                b = boosts.get({"t": "title", "b": "body"}[f], 1.0)
                if b != 1.0:
                    field_folds[f] = (
                        f"CAST({b!r} * CAST({field_folds[f]} AS DOUBLE) AS FLOAT)")
        if combine == "sum":
            # BooleanQuery SHOULD across fields: f32 fold in schema order
            score = fold_f32([field_folds["t"], field_folds["b"]])
        elif tie_breaker:
            # DisjunctionMaxQuery tie: f32(max64 + tie*(total64 - max64)),
            # the engine's exact float64 op tree (two-field total is one
            # f64 add — exact)
            st, sb = field_folds["t"], field_folds["b"]
            score = (
                f"CAST(CAST(GREATEST({st}, {sb}) AS DOUBLE) + {tie_breaker!r}*"
                f"((CAST({st} AS DOUBLE) + CAST({sb} AS DOUBLE)) - "
                f"CAST(GREATEST({st}, {sb}) AS DOUBLE)) AS FLOAT)")
        else:
            score = f"GREATEST({field_folds['t']}, {field_folds['b']})"
        cond = " OR ".join(match_conds) if match_conds else "FALSE"
        selects.append(
            f"SELECT '{_esc(qid)}' AS query_id, rank, doc_id FROM ("
            "SELECT doc_id, "
            "CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
            f"FROM (SELECT {anchor}.doc_id AS doc_id, {score} AS score "
            f"FROM {joins} WHERE {cond}) sub"
            f") ranked WHERE rank < {int(k)}"
        )
    return ("WITH " + ", ".join(ctes) + " "
            + " UNION ALL ".join(f"({s})" for s in selects)
            + " ORDER BY query_id, rank")


def multifield_title_phrase_sql(phrase=("spark", "table"), n_title: int = 6,
                                k: int = 10) -> str:
    """Oracle for fulltext.multifield_title_phrase_topk: phrase tf =
    non-overlapping adjacent occurrences within the derived title slice
    (StopFilter position gaps == textual adjacency, the proven corpus
    convention), scored with the TITLE FIELD's own dl/df/denominator
    CTEs; weight = float32 sum of member idfs in phrase order."""
    pat = "\\b" + "\\s+".join(_esc(t) for t in phrase) + "\\b"
    ctes = [
        "toks0 AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] ELSE "
        "regexp_split_to_array(trim(text), '\\s+') END AS tk0 FROM documents)",
        f"ttoks AS (SELECT doc_id, list_filter(tk0[1:{n_title}], "
        f"x -> NOT list_contains({_STOP}, x)) AS tk FROM toks0)",
        f"tstr AS (SELECT doc_id, array_to_string(tk0[1:{n_title}], ' ') AS ts "
        "FROM toks0)",
        f"reps(v) AS (VALUES {_REPS})",
        "dltab_t AS (SELECT doc_id, len(tk) AS dl FROM ttoks)",
        "stats_t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, "
        "CAST(SUM(dl) AS DOUBLE) AS sum_dl FROM dltab_t)",
        f"denom_t AS (SELECT d.doc_id, {K1!r}*(({1.0 - B!r}) + "
        f"({B!r}*CAST((SELECT MAX(v) FROM reps WHERE v <= d.dl) AS DOUBLE))"
        "/(s.sum_dl/s.n)) AS dn FROM dltab_t d, stats_t s)",
    ]
    tf_names = []
    for ti, t in enumerate(phrase):
        tf_n = f"tf_tp{ti}"
        ctes.append(f"{tf_n} AS (SELECT doc_id, "
                    f"len(list_filter(tk, x -> x = '{_esc(t)}')) AS tf FROM ttoks)")
        tf_names.append(tf_n)
    idf_terms = []
    for tf_n in tf_names:
        idf_terms.append(
            f"(SELECT ln(1.0 + ((s.n - d.df) + 0.5)/(d.df + 0.5)) "
            f"FROM (SELECT CAST(COUNT(CASE WHEN tf > 0 THEN 1 END) AS DOUBLE) AS df "
            f"FROM {tf_n}) d, stats_t s)")
    w = "CAST(" + " + ".join(idf_terms) + " AS FLOAT)"
    ctes.append(f"wp AS (SELECT {w} AS w)")
    ctes.append(
        "ptf AS (SELECT doc_id, CAST(len(regexp_extract_all(ts, "
        f"'{pat}')) AS BIGINT) AS tf FROM tstr)")
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT rank, doc_id FROM ("
        "SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) - 1 AS BIGINT) AS rank "
        "FROM (SELECT p.doc_id, "
        "CAST(CAST((SELECT w FROM wp) AS DOUBLE) * "
        "(CAST(p.tf AS DOUBLE)/(CAST(p.tf AS DOUBLE) + dn.dn)) AS FLOAT) AS score "
        "FROM ptf p JOIN denom_t dn ON dn.doc_id = p.doc_id WHERE p.tf > 0) s"
        f") WHERE rank < {int(k)} ORDER BY rank"
    )

"""DuckDB SQL oracle generators for the data-pipeline entries (the
dedup / fingerprint / sketch / multimodal / classify family) — the
companion of ft_oracle.py for non-search operators.

Exactness arguments, per oracle:
- multimodal_fake_decode: md5-hex arithmetic — integers end to end.
- highlight_snippets: the first text-level regex match lies in the first
  whitespace word containing any match (the pattern cannot span spaces),
  so the word-level SQL reproduces the engine's offset scan exactly.
- stemmed_term_counts: the corpus vocabulary is CLOSED (31 words + a few
  punctuation variants across all sf dirs), so the term->stem map is a
  generated VALUES table from the engine's Porter stemmer — which is
  itself pytest-validated against the published Porter vectors (the LTR
  "oracle generated from the model" pattern).  The tokenizer chain
  (TOKEN_RE + len<=255 + underscore + lower + stop) is replicated
  literally in SQL.
- rolling_fingerprint: Karp-Rabin mod 2^61-1 is integer arithmetic;
  DuckDB HUGEINT list_reduce replicates it exactly.  The engine hashes
  UTF-8 BYTES while SQL uses codepoints — identical because the corpus
  is pure ASCII (asserted in tests/test_data_oracle_sql.py).
- simhash: md5_number_upper(t) == int.from_bytes(md5(t)[:8], 'little')
  (DuckDB's md5_number halves are little-endian), and the pigeonhole
  band search is COMPLETE for hamming <= k, so the engine's banded
  output equals the exact all-pairs SQL.
- hll_distinct: the estimator is integerized (see sketches.py) — the
  register harmonic sum is computed as an exact HUGEINT (sum of
  2^(64-reg)), and the bias constant as a rational; only the
  linear-counting branch keeps one float ln(), whose result is floored
  at milli precision with a measured distance-to-boundary bound.
"""

from __future__ import annotations

from lucene_solr_ray.analysis import STOPWORDS

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in sorted(STOPWORDS)) + "]"

_MERSENNE61 = (1 << 61) - 1

# the analysis.TOKEN_RE pattern with the quote SQL-escaped ('' inside SQL)
_TOKEN_SQL = r"\w+(?:[.'']\w+)*"


def multimodal_fake_decode_sql() -> str:
    """Oracle for multimodal.fake_decode (deterministic fake decoder:
    width/height from md5-hex prefixes, byte length, constant channels)."""
    return (
        "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
        "md5(text) AS digest, "
        "CAST(CAST(concat('0x', substr(md5(text), 1, 4)) AS INT) % 1920 + 1 AS BIGINT) AS width, "
        "CAST(CAST(concat('0x', substr(md5(text), 5, 4)) AS INT) % 1080 + 1 AS BIGINT) AS height, "
        "CAST(3 AS BIGINT) AS channels FROM documents ORDER BY doc_id"
    )


def highlight_sql(terms: list[str], window_tokens: int = 5) -> str:
    """Oracle for monitor.highlight: first word containing a
    \\b-bounded case-insensitive match of any analyzed term, +/-
    ``window_tokens`` single-space-split words of context, match word
    wrapped in <em>..</em>."""
    from lucene_solr_ray.analysis import tokenize

    analyzed = set()
    for t in terms:
        analyzed.update(tokenize(t))
    alt = "|".join(sorted(analyzed))
    w = int(window_tokens)
    return (
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
        "hit AS (SELECT doc_id, ws, list_min(list_filter(range(1, len(ws)+1), "
        f"i -> regexp_matches(ws[i], '(?i)\\b({alt})\\b'))) AS idx FROM w), "
        f"m AS (SELECT doc_id, ws, idx, GREATEST(1, idx-{w}) AS lo, "
        f"LEAST(len(ws), idx+{w}) AS hi FROM hit WHERE idx IS NOT NULL) "
        "SELECT doc_id, array_to_string(list_transform(range(lo, hi+1), "
        "j -> CASE WHEN j = idx THEN '<em>' || ws[j] || '</em>' ELSE ws[j] END), ' ') AS snippet "
        "FROM m ORDER BY doc_id"
    )


def chunk_documents_sql(chunk_tokens: int = 64, overlap: int = 16) -> str:
    """Oracle for curation.chunk_documents: window starts are the
    multiples of stride up to the smallest K with K*stride + chunk >= n
    (a doc shorter than one window yields exactly one chunk; empty docs
    none) — pure integer arithmetic on the whitespace token count."""
    ck, st = int(chunk_tokens), int(chunk_tokens) - int(overlap)
    return (
        "WITH toks AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] ELSE "
        "regexp_split_to_array(trim(text), '\\s+') END AS a FROM documents), "
        f"k AS (SELECT doc_id, a, CAST(len(a) AS BIGINT) AS n, "
        f"CAST(CASE WHEN len(a) <= {ck} THEN 0 "
        f"ELSE ceil((len(a) - {ck}) / {st}.0) END AS BIGINT) AS kmax "
        "FROM toks WHERE len(a) > 0), "
        "c AS (SELECT doc_id, unnest(range(0, kmax + 1)) AS i, a, n FROM k) "
        f"SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx, "
        f"CAST(i * {st} AS BIGINT) AS start_tok, "
        f"CAST(least(n - i * {st}, {ck}) AS BIGINT) AS n_tok, "
        f"array_to_string(a[i*{st}+1 : least(i*{st}+{ck}, n)], ' ') AS chunk_text "
        "FROM c ORDER BY doc_id, chunk_idx"
    )


def boilerplate_strip_sql(line_tokens: int = 8, min_df: int = 2) -> str:
    """Oracle for curation.boilerplate_strip — frequent-line removal:
    hot = lines whose distinct-doc frequency reaches min_df; every
    occurrence dropped, text rebuilt from surviving segments in order.
    The engine's md5-64 hot-line hashes are collision-safe at gate
    cardinalities (<=1e5 distinct lines vs 2^64); the SQL side compares
    line STRINGS, so any collision would surface as a gate mismatch."""
    lt = int(line_tokens)
    return (
        "WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), "
        "x -> x != '') AS tk FROM documents), "
        f"segs AS (SELECT doc_id, unnest(range(0, CAST(ceil(len(tk)/{lt}.0) AS BIGINT))) AS i, "
        "tk FROM toks), "
        f"lines AS (SELECT doc_id, i, array_to_string(tk[i*{lt}+1 : "
        f"least((i+1)*{lt}, CAST(len(tk) AS BIGINT))], ' ') AS line FROM segs), "
        "hot AS (SELECT line FROM (SELECT line, COUNT(DISTINCT doc_id) AS df "
        f"FROM lines GROUP BY line) WHERE df >= {int(min_df)}), "
        "agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines, "
        "CAST(COUNT(*) FILTER (line IN (SELECT line FROM hot)) AS BIGINT) AS n_dropped, "
        "COALESCE(string_agg(line, ' ' ORDER BY i) "
        "FILTER (line NOT IN (SELECT line FROM hot)), '') AS clean_text "
        "FROM lines GROUP BY doc_id) "
        "SELECT d.doc_id, COALESCE(a.n_lines, 0) AS n_lines, "
        "COALESCE(a.n_dropped, 0) AS n_dropped, "
        "COALESCE(a.clean_text, '') AS clean_text "
        "FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id"
    )


def phonetic_term_groups_sql(k: int = 50) -> str:
    """Oracle for textstats.phonetic_term_groups: American Soundex
    written directly in SQL over the stop-filtered whitespace vocabulary
    — per-char consonant classes, h/w dropped before the adjacent-equal
    collapse (transparent), vowel markers dropped after it (adjacency
    breakers), first letter verbatim + 3 zero-padded digits.  Verified
    against the canonical Soundex vectors in tests/test_analysis.py so
    engine and SQL can't drift independently."""
    return (
        "WITH toks AS (SELECT unnest(list_filter("
        "regexp_split_to_array(text, '\\s+'), "
        f"x -> x != '' AND NOT list_contains({_STOP_SQL}, x))) AS term FROM documents), "
        "tf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS tf_sum FROM toks GROUP BY term), "
        "cs AS (SELECT term, tf_sum, list_transform(regexp_split_to_array(term, ''), c -> CASE "
        "WHEN c IN ('b','f','p','v') THEN '1' "
        "WHEN c IN ('c','g','j','k','q','s','x','z') THEN '2' "
        "WHEN c IN ('d','t') THEN '3' WHEN c = 'l' THEN '4' "
        "WHEN c IN ('m','n') THEN '5' WHEN c = 'r' THEN '6' "
        "WHEN c IN ('h','w') THEN '' ELSE 'v' END) AS codes FROM tf), "
        "s1 AS (SELECT term, tf_sum, codes, list_filter(codes, c -> c <> '') AS l1 FROM cs), "
        "s2 AS (SELECT term, tf_sum, codes, "
        "list_filter(l1, (c, i) -> i = 1 OR c <> l1[i-1]) AS l2 FROM s1), "
        # initial h/w emitted no code, so there is nothing to drop (Wright->W623)
        "s2b AS (SELECT term, tf_sum, CASE WHEN codes[1] = '' THEN l2 ELSE l2[2:] END AS tl FROM s2), "
        "s3 AS (SELECT tf_sum, upper(term[1]) || substr(COALESCE("
        "array_to_string(list_filter(tl, c -> c <> 'v'), ''), '') || '000', 1, 3) "
        "AS code FROM s2b) "
        "SELECT code, CAST(COUNT(*) AS BIGINT) AS n_terms, "
        "CAST(SUM(tf_sum) AS BIGINT) AS total_tf "
        f"FROM s3 GROUP BY code ORDER BY total_tf DESC, code LIMIT {int(k)}"
    )


def refined_phonetic_groups_sql(k: int = 50) -> str:
    """Oracle for textstats.phonetic_term_groups(encoder='refined'):
    commons-codec RefinedSoundex written directly in SQL — 10-class
    per-char codes (vowels KEPT as '0'), only consecutive equal codes
    collapse, no h/w transparency, no length cap; first letter verbatim
    + every collapsed code. Independent formulation (list ops) of the
    same published mapping table the engine uses."""
    # a..z -> 01360240043788015936020505 (commons-codec US_ENGLISH)
    cases = " ".join(
        f"WHEN c = '{chr(ord('a') + i)}' THEN '{code}'"
        for i, code in enumerate("01360240043788015936020505")
    )
    return (
        "WITH toks AS (SELECT unnest(list_filter("
        "regexp_split_to_array(text, '\\s+'), "
        f"x -> x != '' AND NOT list_contains({_STOP_SQL}, x))) AS term FROM documents), "
        "tf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS tf_sum FROM toks GROUP BY term), "
        "cs AS (SELECT term, tf_sum, list_transform(regexp_split_to_array(term, ''), "
        f"c -> CASE {cases} ELSE '0' END) AS codes FROM tf), "
        "s2 AS (SELECT term, tf_sum, "
        "list_filter(codes, (c, i) -> i = 1 OR c <> codes[i-1]) AS collapsed FROM cs), "
        "s3 AS (SELECT tf_sum, upper(term[1]) || array_to_string(collapsed, '') AS code FROM s2) "
        "SELECT code, CAST(COUNT(*) AS BIGINT) AS n_terms, "
        "CAST(SUM(tf_sum) AS BIGINT) AS total_tf "
        f"FROM s3 GROUP BY code ORDER BY total_tf DESC, code LIMIT {int(k)}"
    )


def stemmed_term_counts_sql(overrides: dict[str, str] | None = None) -> str:
    """Oracle for textstats.stemmed_term_counts (and, with ``overrides``,
    stemmer_override_counts — dictionary-pinned stems bypass Porter).
    The term->stem VALUES map is generated from the engine's porter_stem
    over the union of the distinct analyzed tokens of every testdata sf
    dir (closed vocabulary, deterministic at generation time)."""
    import duckdb

    from lucene_solr_ray.analysis import porter_stem

    ov = overrides or {}
    con = duckdb.connect()
    vocab: set[str] = set()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        rows = con.sql(
            "SELECT DISTINCT lower(tok) FROM ("
            f"SELECT unnest(regexp_extract_all(text, '{_TOKEN_SQL}')) AS tok "
            f"FROM read_parquet('/root/testdata/{sf}/documents.parquet')) "
            "WHERE length(tok) <= 255 AND trim(tok, '_') != ''"
        ).fetchall()
        vocab.update(r[0] for r in rows)
    con.close()
    vocab -= STOPWORDS
    vals = ", ".join(
        "('{}', '{}')".format(
            wd.replace("'", "''"),
            (ov.get(wd) or porter_stem(wd)).replace("'", "''"))
        for wd in sorted(vocab)
    )
    return (
        "WITH toks AS (SELECT lower(tok) AS tok FROM ("
        f"SELECT unnest(regexp_extract_all(text, '{_TOKEN_SQL}')) AS tok FROM documents) "
        "WHERE length(tok) <= 255 AND trim(tok, '_') != ''), "
        f"stems(tok, stem) AS (VALUES {vals}) "
        "SELECT s.stem AS term, CAST(COUNT(*) AS BIGINT) AS n FROM toks t "
        f"JOIN stems s ON t.tok = s.tok WHERE NOT list_contains({_STOP_SQL}, t.tok) "
        "GROUP BY s.stem ORDER BY term"
    )


def german_stem_counts_sql(k: int = 20) -> str:
    """Oracle for textstats.german_stem_counts — the same deterministic
    inflection (first 'a' -> 'ä' + ending by pos % 4 at (doc_id+pos)%5
    positions) rebuilt in SQL, and a form->stem VALUES map generated
    from the engine's german_light_stem over the CLOSED derived
    vocabulary (every corpus token plus its four inflected forms)."""
    import duckdb

    from lucene_solr_ray.analysis import german_light_stem
    from lucene_solr_ray.functions.textstats import GERMAN_ENDINGS

    con = duckdb.connect()
    vocab: set[str] = set()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        rows = con.sql(
            "SELECT DISTINCT tok FROM (SELECT unnest("
            "regexp_split_to_array(trim(text), '\\s+')) AS tok "
            f"FROM read_parquet('/root/testdata/{sf}/documents.parquet') "
            "WHERE trim(text) <> '')"
        ).fetchall()
        vocab.update(r[0] for r in rows)
    con.close()
    forms: set[str] = set(vocab)
    for v in vocab:
        uml = v.replace("a", "ä", 1)
        for e in GERMAN_ENDINGS:
            forms.add(uml + e)
    vals = ", ".join(
        "('{}', '{}')".format(f.replace("'", "''"),
                              german_light_stem(f).replace("'", "''"))
        for f in sorted(forms))
    endings_sql = "[" + ", ".join(f"'{e}'" for e in GERMAN_ENDINGS) + "]"
    return (
        "WITH toks AS (SELECT doc_id, unnest(l) AS term, "
        "CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS pos "
        "FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS l "
        "FROM documents WHERE lang = 'de' AND trim(text) <> '')), "
        "infl AS (SELECT CASE WHEN (doc_id + pos) % 5 = 0 THEN "
        f"regexp_replace(term, 'a', 'ä') || list_extract({endings_sql}, CAST(pos % 4 AS BIGINT) + 1) "
        "ELSE term END AS form FROM toks), "
        f"stems(form, stem) AS (VALUES {vals}) "
        "SELECT s.stem AS stem, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM infl i JOIN stems s ON i.form = s.form "
        f"GROUP BY s.stem ORDER BY n DESC, stem LIMIT {int(k)}"
    )


def rolling_fingerprint_sql(window: int = 8, base: int = 257) -> str:
    """Oracle for textstats.rolling_fingerprint: Karp-Rabin polynomial
    hashes mod 2^61-1 as exact HUGEINT folds over codepoints (== UTF-8
    bytes on this ASCII corpus)."""
    p = _MERSENNE61

    def fold(char_range: str) -> str:
        return (
            "list_reduce(list_prepend(CAST(0 AS HUGEINT), "
            f"list_transform({char_range}, c_i -> CAST(unicode(text[c_i]) AS HUGEINT))), "
            f"(acc, ch) -> (acc * {base} + ch) % {p})"
        )

    full = fold("range(1, length(text)+1)")
    win = fold(f"range(j, j+{window})")
    return (
        f"WITH f AS (SELECT doc_id AS fdoc, {full} AS fp, length(text) AS n FROM documents) "
        "SELECT fdoc AS doc_id, CAST(fp AS BIGINT) AS fingerprint, "
        f"CAST(CASE WHEN n < {window} THEN fp ELSE "
        f"(SELECT list_min(list_transform(range(1, n-{window}+2), j -> {win}))) "
        "END AS BIGINT) AS min_window_hash "
        "FROM f JOIN documents d ON f.fdoc = d.doc_id ORDER BY doc_id"
    )


def keyword_repeat_sql(surface_q: str = "value", stem_q: str = "valu") -> str:
    """Oracle for textstats.keyword_repeat_docs — the emitted token set
    per doc is (analyzed tokens UNION their Porter stems); stem map via
    the generated closed-vocabulary VALUES convention."""
    import duckdb

    from lucene_solr_ray.analysis import porter_stem

    con = duckdb.connect()
    vocab: set[str] = set()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        rows = con.sql(
            "SELECT DISTINCT lower(tok) FROM ("
            f"SELECT unnest(regexp_extract_all(text, '{_TOKEN_SQL}')) AS tok "
            f"FROM read_parquet('/root/testdata/{sf}/documents.parquet')) "
            "WHERE length(tok) <= 255 AND trim(tok, '_') != ''"
        ).fetchall()
        vocab.update(r[0] for r in rows)
    con.close()
    vocab -= STOPWORDS
    vals = ", ".join(
        "('{}', '{}')".format(w.replace("'", "''"),
                              porter_stem(w).replace("'", "''"))
        for w in sorted(vocab))
    sq = surface_q.replace("'", "''")
    tq = stem_q.replace("'", "''")
    return (
        "WITH toks AS (SELECT doc_id, lower(tok) AS x FROM ("
        f"SELECT doc_id, unnest(regexp_extract_all(text, '{_TOKEN_SQL}')) AS tok FROM documents) "
        "WHERE length(tok) <= 255 AND trim(tok, '_') != ''), "
        f"stems(tok, stem) AS (VALUES {vals}), "
        "m AS (SELECT t.doc_id, t.x, s.stem FROM toks t "
        f"JOIN stems s ON t.x = s.tok WHERE NOT list_contains({_STOP_SQL}, t.x)) "
        f"SELECT 'surface' AS query_kind, doc_id FROM m WHERE x = '{sq}' GROUP BY doc_id "
        f"UNION ALL SELECT 'stem', doc_id FROM m WHERE x = '{tq}' OR stem = '{tq}' GROUP BY doc_id "
        "ORDER BY query_kind DESC, doc_id"
    )


def unigram_segment_sql(max_piece_len: int = 4, top_k: int = 64,
                        k_out: int = 30) -> str:
    """Oracle for textstats.unigram_segment_counts — the distributed
    corpus word histogram rebuilt in SQL, joined to a (word, piece,
    times) VALUES map generated from the engine's exact-int Viterbi over
    the CLOSED corpus word vocabulary (the stemmer-map convention; the
    Viterbi semantics themselves are pinned by gold pytests)."""
    import duckdb
    from collections import Counter

    import numpy as _np
    import pandas as _pd

    from lucene_solr_ray.functions.textstats import (
        _unigram_vocab, unigram_viterbi)

    # piece statistics derive from the DISTINCT word set (weight 1), so
    # the piece table — and every word's segmentation — is invariant to
    # corpus scale. The word SET itself must agree across sf dirs (the
    # generator draws from one fixed word list); asserted below.
    word_sets = {}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        rows = con.sql(
            "SELECT DISTINCT unnest(regexp_split_to_array(trim(text), '\\s+')) "
            f"FROM read_parquet('/root/testdata/{sf}/documents.parquet') "
            "WHERE trim(text) <> ''"
        ).fetchall()
        con.close()
        word_sets[sf] = {r[0] for r in rows}
    assert word_sets["sf0.001"] == word_sets["sf0.01"] == word_sets["sf0.1"], \
        "unigram oracle requires an sf-invariant word set"
    words = sorted(word_sets["sf0.01"])
    wc = _pd.DataFrame({"term": words, "n": [1] * len(words)})
    vocab = _unigram_vocab(wc, max_piece_len, top_k)
    total = sum(vocab.values())

    def L(x):
        return int(_np.floor(_np.log(_np.float64(x)) * 1e6 + 0.5))

    lt = L(total)
    logp = {p: L(c) - lt for p, c in vocab.items()}
    merged = {w: tuple(unigram_viterbi(str(w), logp, max_piece_len))
              for w in words}
    vals = []
    for w, pieces in sorted(merged.items()):
        for piece, times in sorted(Counter(pieces).items()):
            vals.append("('{}', '{}', {})".format(
                w.replace("'", "''"), piece.replace("'", "''"), times))
    return (
        "WITH wc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM ("
        "SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok "
        "FROM documents WHERE trim(text) <> '') GROUP BY tok), "
        f"seg(tok, piece, times) AS (VALUES {', '.join(vals)}) "
        "SELECT piece, CAST(SUM(wc.n * seg.times) AS BIGINT) AS n_uses "
        "FROM wc JOIN seg USING (tok) GROUP BY piece "
        f"ORDER BY n_uses DESC, piece LIMIT {int(k_out)}"
    )


def bpe_encode_sql(n_merges: int = 10, k_out: int = 30) -> str:
    """Oracle for textstats.bpe_encode_counts — merge rules trained on
    the sf-invariant DISTINCT word set (asserted), encode map generated
    from the engine's bpe_apply, usage counts corpus-weighted in SQL."""
    from collections import Counter

    import duckdb

    from lucene_solr_ray.functions.textstats import (
        bpe_apply, bpe_merges_from_counts)

    word_sets = {}
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        con = duckdb.connect()
        rows = con.sql(
            "SELECT DISTINCT unnest(regexp_split_to_array(trim(text), '\\s+')) "
            f"FROM read_parquet('/root/testdata/{sf}/documents.parquet') "
            "WHERE trim(text) <> ''"
        ).fetchall()
        con.close()
        word_sets[sf] = {r[0] for r in rows}
    assert word_sets["sf0.001"] == word_sets["sf0.01"] == word_sets["sf0.1"], \
        "bpe_encode oracle requires an sf-invariant word set"
    words = sorted(word_sets["sf0.01"])
    merges = bpe_merges_from_counts({w: 1 for w in words}, n_merges)
    vals = []
    for w in words:
        for piece, times in sorted(Counter(bpe_apply(w, merges)).items()):
            vals.append("('{}', '{}', {})".format(
                w.replace("'", "''"), piece.replace("'", "''"), times))
    return (
        "WITH wc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM ("
        "SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok "
        "FROM documents WHERE trim(text) <> '') GROUP BY tok), "
        f"enc(tok, piece, times) AS (VALUES {', '.join(vals)}) "
        "SELECT piece, CAST(SUM(wc.n * enc.times) AS BIGINT) AS n_uses "
        "FROM wc JOIN enc USING (tok) GROUP BY piece "
        f"ORDER BY n_uses DESC, piece LIMIT {int(k_out)}"
    )


def winnowing_sql(window: int = 8, guarantee: int = 4, base: int = 257) -> str:
    """Oracle for textstats.winnowing_fingerprints — the same Karp-Rabin
    k-gram hashes (HUGEINT folds) with the winnowing min-per-guarantee-
    window selection, emitted as the per-doc DISTINCT value set."""
    p = _MERSENNE61

    def fold(char_range: str) -> str:
        return (
            "list_reduce(list_prepend(CAST(0 AS HUGEINT), "
            f"list_transform({char_range}, c_i -> CAST(unicode(text[c_i]) AS HUGEINT))), "
            f"(acc, ch) -> (acc * {base} + ch) % {p})"
        )

    full = fold("range(1, length(text)+1)")
    win = fold(f"range(j, j+{window})")
    g = int(guarantee)
    return (
        "WITH h AS (SELECT doc_id, CASE "
        f"WHEN length(text) < {window} THEN [{full}] "
        f"ELSE list_transform(range(1, length(text)-{window}+2), j -> {win}) END AS hs "
        "FROM documents WHERE length(text) > 0), "
        "sel AS (SELECT doc_id, CASE "
        f"WHEN len(hs) <= {g} THEN [list_min(hs)] "
        f"ELSE list_transform(range(1, len(hs)-{g}+2), j -> list_min(list_slice(hs, j, j+{g}-1))) "
        "END AS fps FROM h) "
        "SELECT DISTINCT doc_id, CAST(unnest(fps) AS BIGINT) AS fp FROM sel "
        "ORDER BY doc_id, fp"
    )


def _mulmod64_sql(a: str, b_const: int) -> str:
    """(a * b) mod 2^64 for HUGEINT expressions: 32-bit split so every
    product stays inside HUGEINT."""
    m64 = (1 << 64) - 1
    m32 = (1 << 32) - 1
    return (
        f"((({a}) & {m32}) * {b_const} + "
        f"((((({a}) >> 32) & {m32}) * ({b_const & m32}) & {m32}) << 32)) & {m64}"
    )


def _splitmix64_sql(x: str) -> tuple[list[str], str]:
    """splitmix64 as chained lateral column aliases (DuckDB allows a
    SELECT item to reference earlier aliases) — returns (alias defs,
    final alias name).  Mirrors sketches._hll_registers bit for bit."""
    m64 = (1 << 64) - 1
    defs = [
        f"(({x}) + 11400714819323198485) & {m64} AS z0",
        f"({_mulmod64_sql('xor(z0, z0 >> 30)', 0xBF58476D1CE4E5B9)}) AS z1",
        f"({_mulmod64_sql('xor(z1, z1 >> 27)', 0x94D049BB133111EB)}) AS z2",
        "xor(z2, z2 >> 31) AS z",
    ]
    return defs, "z"


def hll_distinct_sql(column: str = "user_id", table: str = "events",
                     p: int = 12) -> str:
    """Oracle for sketches.hll_distinct: registers via splitmix64
    (replicated with exact HUGEINT arithmetic), harmonic sum as the exact
    integer sum(2^(64-reg)), bias constant as a rational -> the raw-range
    estimate is bit-exact; the linear-counting branch keeps one ln()
    (floor(x+0.5)-pinned, boundary distance measured in tests)."""
    m = 1 << p
    alpha_num = 7213 * m
    alpha_den = 10 * (1000 * m + 1079)
    mix_defs, z = _splitmix64_sql(f"CAST({column} AS HUGEINT)")
    # leading-zeros probe, identical to the engine's shift cascade:
    # rank starts at 1; for shift in (32,16,8,4,2,1): if probe < 2^(64-shift)
    # then rank += shift, probe <<= shift (mod 2^64)
    m64 = (1 << 64) - 1
    rank_defs = [f"({z} << {p}) & {m64} AS p0", "1 AS r0"]
    prev_p, prev_r = "p0", "r0"
    for si, shift in enumerate((32, 16, 8, 4, 2, 1)):
        thr = 1 << (64 - shift)
        rank_defs.append(
            f"CASE WHEN {prev_p} < {thr} THEN ({prev_p} << {shift}) & {m64} "
            f"ELSE {prev_p} END AS p{si+1}"
        )
        rank_defs.append(
            f"CASE WHEN {prev_p} < {thr} THEN {prev_r} + {shift} ELSE {prev_r} END AS r{si+1}"
        )
        prev_p, prev_r = f"p{si+1}", f"r{si+1}"
    all_defs = ", ".join(mix_defs + rank_defs)
    return (
        f"WITH mixed AS (SELECT {all_defs} FROM {table}), "
        f"ranked AS (SELECT {z} >> {64 - p} AS idx, "
        f"LEAST({prev_r}, {64 - p + 1}) AS rank FROM mixed), "
        "regs AS (SELECT idx, MAX(rank) AS reg FROM ranked GROUP BY idx), "
        "s AS (SELECT SUM(CAST(1 AS HUGEINT) << (64 - reg)) "
        f"+ ({m} - COUNT(*)) * (CAST(1 AS HUGEINT) << 64) AS s64, "
        f"{m} - COUNT(*) AS zeros FROM regs), "
        f"est AS (SELECT (({alpha_num} * CAST({m} AS HUGEINT) * {m} * "
        f"(CAST(1 AS HUGEINT) << 64) * 2) // ({alpha_den} * s64) + 1) // 2 AS raw, "
        "zeros FROM s) "
        "SELECT CAST(CASE WHEN raw * 2 <= " + str(5 * m) + " AND zeros > 0 "
        f"THEN FLOOR({m} * ln({m} / CAST(zeros AS DOUBLE)) + 0.5) "
        "ELSE raw END AS BIGINT) AS approx_distinct FROM est"
    )


def tdigest_quantiles_sql(qs=(0.5, 0.9, 0.99), column: str = "value",
                          table: str = "events") -> str:
    """Oracle for sketches.tdigest_quantiles IN ITS EXACT REGIME
    (max_centroids >= every batch size -> singleton centroids): midpoint
    interpolation over the sorted raw values with the engine's pinned
    float op order (sketches._quantile_milli), milli-floored."""
    q_rows = ", ".join(f"({int(round(q * 1000))}, CAST({q!r} AS DOUBLE))" for q in qs)
    return (
        f"WITH v AS (SELECT {column} AS x, "
        f"ROW_NUMBER() OVER (ORDER BY {column}) AS j FROM {table}), "
        f"n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {table}), "
        f"qq(q_milli, q) AS (VALUES {q_rows}), "
        "t AS (SELECT q_milli, q * n AS target, n FROM qq, n), "
        # np.searchsorted(cum, target, 'right') with cum_j = j - 0.5:
        # i = floor(target + 0.5) + 1 clamped to [2, n]; x1 = (i-1) - 0.5
        "pick AS (SELECT q_milli, target, "
        "GREATEST(2, LEAST(n, CAST(FLOOR(target + 0.5) AS BIGINT) + 1)) AS i, n FROM t) "
        "SELECT q_milli, CAST(FLOOR((CASE "
        "WHEN target <= 0.5 THEN (SELECT x FROM v WHERE j = 1) "
        "WHEN target >= n - 0.5 THEN (SELECT x FROM v WHERE j = n) "
        "ELSE (SELECT lo.x + (hi.x - lo.x) * ((target - (pick.i - 1.5)) / 1.0) "
        "FROM v lo, v hi WHERE lo.j = pick.i - 1 AND hi.j = pick.i) "
        "END) * 1000.0 + 0.5) AS BIGINT) AS value_milli "
        "FROM pick ORDER BY q_milli"
    )


def nb_classify_sql() -> str:
    """Oracle for classify.nb_classify: the multinomial NB model (alpha=1,
    lang classes, whitespace tokens) retrained inside SQL with exact
    integer counts; only ln() and the score sums are float.  The
    engine/SQL float sums may differ in the last ~1e-13 while the measured
    min class margin is 3.4e-4 (tests/test_data_oracle_sql.py), so the
    argmax label — the only hashed output — cannot flip.  Ties (empty
    docs with equal class priors) are exact on both sides and break to
    the lexicographically smallest class, matching np.argmax."""
    return (
        "WITH toks AS (SELECT doc_id, unnest(list_filter("
        "regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term FROM documents), "
        "cls AS (SELECT lang AS c, CAST(COUNT(*) AS DOUBLE) AS docs "
        "FROM documents GROUP BY lang), "
        "tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents), "
        "tc AS (SELECT d.lang AS c, t.term, CAST(COUNT(*) AS DOUBLE) AS cnt "
        "FROM toks t JOIN documents d USING (doc_id) GROUP BY 1, 2), "
        "vocab AS (SELECT DISTINCT term FROM toks), "
        "vs AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM vocab), "
        "ctot AS (SELECT c, SUM(cnt) AS ct FROM tc GROUP BY c), "
        "logcond AS (SELECT cl.c, vb.term, "
        "ln((COALESCE(tc.cnt, 0) + 1.0) / (ctot.ct + vs.v)) AS lc "
        "FROM (SELECT c FROM cls) cl CROSS JOIN vocab vb "
        "LEFT JOIN tc ON tc.c = cl.c AND tc.term = vb.term "
        "JOIN ctot ON ctot.c = cl.c, vs), "
        "scores AS (SELECT t.doc_id, lc.c, SUM(lc.lc) AS s FROM toks t "
        "JOIN logcond lc ON lc.term = t.term GROUP BY 1, 2), "
        "allsc AS (SELECT d.doc_id, cl.c, ln(cl.docs / tot.n) + COALESCE(s.s, 0) AS score "
        "FROM documents d CROSS JOIN cls cl "
        "LEFT JOIN scores s ON s.doc_id = d.doc_id AND s.c = cl.c, tot) "
        "SELECT doc_id, c AS predicted FROM (SELECT doc_id, c, "
        "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, c) AS rn FROM allsc) "
        "WHERE rn = 1 ORDER BY doc_id"
    )


def simhash_pairs_sql(max_hamming: int = 3) -> str:
    """EXACT oracle for dedup.simhash_near_pairs: the pigeonhole band
    search is complete for hamming <= k, so the engine's output equals
    the exact all-pairs Hamming filter.  SimHash is replicated bit by
    bit: feature = md5_number_upper(term) (little-endian 8-byte md5 ==
    the engine's int.from_bytes(digest[:8], 'little')), weight = tf over
    whitespace tokens, bit set when the tf-weighted +/-1 vote is > 0."""
    return (
        "WITH toks AS (SELECT doc_id, unnest(list_filter("
        "regexp_split_to_array(text, '\\s+'), x -> x != '')) AS term FROM documents), "
        "tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS f "
        "FROM toks GROUP BY doc_id, term), "
        "votes AS (SELECT doc_id, i, SUM(CASE WHEN "
        "(md5_number_upper(term) >> i) & 1 = 1 THEN f ELSE -f END) AS score "
        "FROM tf, range(0, 64) AS r(i) GROUP BY doc_id, i), "
        "sims AS (SELECT d.doc_id, COALESCE(v.sim, CAST(0 AS UBIGINT)) AS sim FROM documents d "
        "LEFT JOIN (SELECT doc_id, SUM(CASE WHEN score > 0 THEN "
        "CAST(1 AS UBIGINT) << i ELSE CAST(0 AS UBIGINT) END) AS sim "
        "FROM votes GROUP BY doc_id) v ON d.doc_id = v.doc_id) "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming "
        "FROM sims a JOIN sims b ON a.doc_id < b.doc_id "
        f"WHERE bit_count(xor(a.sim, b.sim)) <= {int(max_hamming)} "
        "ORDER BY doc_a, doc_b"
    )


def decontaminate_sql(ngram: int = 5, bench_mod: int = 37) -> str:
    """Oracle for curation.decontaminate_ngram: the benchmark set and the
    distinct-gram semantics are replicated literally (doc_id % mod picks
    the same eval docs; DISTINCT per-doc grams; membership = IN)."""
    parts = "||' '||".join(f"list_extract(a,i+{j})" if j else "list_extract(a,i)"
                           for j in range(ngram))
    return (
        "WITH docs AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS a FROM documents), "
        f"g AS (SELECT DISTINCT doc_id, {parts} AS g "
        f"FROM docs, UNNEST(range(1, len(a)-{ngram-2})) AS t(i) WHERE len(a) >= {ngram}), "
        f"bench AS (SELECT DISTINCT g FROM g WHERE doc_id % {bench_mod} = 0), "
        f"hits AS (SELECT doc_id, COUNT(*) AS n FROM g WHERE doc_id % {bench_mod} != 0 "
        "AND g IN (SELECT g FROM bench) GROUP BY 1) "
        "SELECT d.doc_id, CAST(COALESCE(n,0) AS BIGINT) AS n_contaminated, "
        "CAST(COALESCE(n,0) > 0 AS BIGINT) AS contaminated "
        f"FROM (SELECT doc_id FROM documents WHERE doc_id % {bench_mod} != 0) d "
        "LEFT JOIN hits USING (doc_id) ORDER BY doc_id"
    )


def repetition_sql() -> str:
    """Oracle for curation.repetition_signals (exact integer counters)."""
    return (
        "WITH docs AS (SELECT doc_id, regexp_split_to_array(text,'\\s+') AS a FROM documents), "
        "tok AS (SELECT doc_id, t FROM docs, UNNEST(a) AS u(t)), "
        "uc AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1,2), "
        "uni AS (SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_distinct, MAX(c) AS mx FROM uc GROUP BY 1), "
        "big AS (SELECT doc_id, list_extract(a,i)||' '||list_extract(a,i+1) AS g FROM docs, "
        "UNNEST(range(1,len(a))) AS t(i) WHERE len(a)>=2), "
        "bc AS (SELECT doc_id, g, COUNT(*) AS c FROM big GROUP BY 1,2), "
        "bi AS (SELECT doc_id, SUM(c) AS nb, MAX(c) AS mb FROM bc GROUP BY 1) "
        "SELECT d.doc_id, CAST(COALESCE(n_tokens,0) AS BIGINT) AS n_tokens, "
        "CAST(COALESCE(n_distinct,0) AS BIGINT) AS n_distinct_tokens, "
        "CAST(COALESCE(mx,0) AS BIGINT) AS max_unigram_count, "
        "CAST(COALESCE(nb,0) AS BIGINT) AS n_bigrams, CAST(COALESCE(mb,0) AS BIGINT) AS max_bigram_count "
        "FROM documents d LEFT JOIN uni USING(doc_id) LEFT JOIN bi USING(doc_id) ORDER BY doc_id"
    )


def pii_scan_sql() -> str:
    """Oracle for curation.pii_scan: derives the identical augmented text
    and replicates the engine's SEQUENTIAL redaction (each pattern's
    count/replace runs on the previous pattern's redacted output).
    Patterns are the RE2-compatible curation.PII_PATTERNS."""
    from lucene_solr_ray.functions.curation import PII_PATTERNS
    e, i, p = PII_PATTERNS["email"], PII_PATTERNS["ipv4"], PII_PATTERNS["phone"]
    return (
        "WITH aug AS (SELECT doc_id, text || ' contact u' || doc_id || '@example.org ip 10.0.' || (doc_id % 256) "
        "|| '.' || (doc_id % 100) || ' tel 555-' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-' "
        "|| CAST(doc_id % 9000 + 1000 AS VARCHAR) AS s FROM documents), "
        f"r1 AS (SELECT doc_id, s, len(regexp_extract_all(s, '{e}')) AS n_email, "
        f"regexp_replace(s, '{e}', '<EMAIL>', 'g') AS s1 FROM aug), "
        f"r2 AS (SELECT doc_id, n_email, len(regexp_extract_all(s1, '{i}')) AS n_ipv4, "
        f"regexp_replace(s1, '{i}', '<IPV4>', 'g') AS s2 FROM r1), "
        f"r3 AS (SELECT doc_id, n_email, n_ipv4, len(regexp_extract_all(s2, '{p}')) AS n_phone, "
        f"regexp_replace(s2, '{p}', '<PHONE>', 'g') AS s3 FROM r2) "
        "SELECT doc_id, CAST(n_email AS BIGINT) AS n_email, CAST(n_ipv4 AS BIGINT) AS n_ipv4, "
        "CAST(n_phone AS BIGINT) AS n_phone, CAST(length(s3) AS BIGINT) AS redacted_len "
        "FROM r3 ORDER BY doc_id"
    )


def _kmeans_cte_chain(k: int, iters: int) -> str:
    """Shared CTE prefix for the k-means oracles: iterations unrolled,
    ending with the ``fin`` (doc_id, cid, dist) assignment CTE (no final
    SELECT). Exact because the engine is integer-only — distances are
    int64 squared euclidean (values < 2^53, so DuckDB's DOUBLE
    list_inner_product is exact) and centroid updates are the
    round-half-up integer mean (2*S + n) // (2*n) in both systems; ties
    break to the lowest cid via the window ORDER BY."""
    from lucene_solr_ray.functions.classify import CLUSTER_VOCAB
    d = len(CLUSTER_VOCAB)
    fexpr = "[" + ", ".join(f"len(list_filter(sp, x -> x = '{w}'))" for w in CLUSTER_VOCAB) + "]"

    def dist(fa: str, ca: str) -> str:
        return (f"list_inner_product({fa}::DOUBLE[], {fa}::DOUBLE[]) "
                f"- 2*list_inner_product({fa}::DOUBLE[], {ca}::DOUBLE[]) "
                f"+ list_inner_product({ca}::DOUBLE[], {ca}::DOUBLE[])")

    sql = (
        "WITH docs AS (SELECT doc_id, regexp_split_to_array(text,'\\s+') AS sp FROM documents), "
        f"feat AS (SELECT doc_id, {fexpr}::BIGINT[] AS f FROM docs), "
        "cent0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS cid, f AS c "
        f"FROM (SELECT doc_id, f FROM feat ORDER BY doc_id LIMIT {k})), "
    )
    prev = "cent0"
    for it in range(1, iters + 1):
        sql += (
            f"a{it} AS (SELECT doc_id, f, cid FROM ("
            f"SELECT feat.doc_id, feat.f, {prev}.cid, "
            f"ROW_NUMBER() OVER (PARTITION BY feat.doc_id ORDER BY {dist('feat.f', prev + '.c')}, {prev}.cid) AS rn "
            f"FROM feat, {prev}) WHERE rn = 1), "
            f"s{it} AS (SELECT cid, i, SUM(f[i]) AS s, COUNT(*) AS n "
            f"FROM a{it}, UNNEST(range(1, {d + 1})) AS t(i) GROUP BY cid, i), "
            f"n{it} AS (SELECT cid, list((2*s + n) // (2*n) ORDER BY i) AS c FROM s{it} GROUP BY cid), "
            f"cent{it} AS (SELECT p.cid, COALESCE(nn.c, p.c) AS c FROM {prev} p LEFT JOIN n{it} nn USING (cid)), "
        )
        prev = f"cent{it}"
    sql += (
        "fin AS (SELECT doc_id, f, cid, dist FROM ("
        f"SELECT feat.doc_id, feat.f, {prev}.cid, {dist('feat.f', prev + '.c')} AS dist, "
        f"ROW_NUMBER() OVER (PARTITION BY feat.doc_id ORDER BY {dist('feat.f', prev + '.c')}, {prev}.cid) AS rn "
        f"FROM feat, {prev}) WHERE rn = 1) "
    )
    return sql


def cluster_kmeans_sql(k: int = 8, iters: int = 5) -> str:
    """Oracle for classify.cluster_kmeans_docs (see _kmeans_cte_chain)."""
    return (_kmeans_cte_chain(k, iters)
            + "SELECT doc_id, cid AS cluster_id, CAST(dist AS BIGINT) AS dist_sq "
              "FROM fin ORDER BY doc_id")


def cluster_labels_sql(k: int = 8, iters: int = 5, top_n: int = 3) -> str:
    """Oracle for classify.cluster_labels: per final cluster, the top_n
    vocabulary terms by exact-integer lift
    (tf_in_cluster * 1_000_000) // tf_corpus, ties -> term asc."""
    from lucene_solr_ray.functions.classify import CLUSTER_VOCAB
    d = len(CLUSTER_VOCAB)
    vocab_vals = ", ".join(f"({i + 1}, '{w}')" for i, w in enumerate(CLUSTER_VOCAB))
    return (
        _kmeans_cte_chain(k, iters)
        + f", tc AS (SELECT cid, i, SUM(f[i]) AS tf FROM fin, "
          f"UNNEST(range(1, {d + 1})) AS t(i) GROUP BY cid, i), "
          "ta AS (SELECT i, SUM(tf) AS tf_all FROM tc GROUP BY i), "
          f"vocab(i, term) AS (VALUES {vocab_vals}), "
          "scored AS (SELECT tc.cid, v.term, "
          "CAST((tc.tf * 1000000) // ta.tf_all AS BIGINT) AS lift_milli "
          "FROM tc JOIN ta USING (i) JOIN vocab v USING (i) "
          "WHERE ta.tf_all > 0 AND tc.tf > 0), "
          "ranked AS (SELECT cid, term, lift_milli, "
          "ROW_NUMBER() OVER (PARTITION BY cid ORDER BY lift_milli DESC, term) AS r FROM scored) "
          "SELECT CAST(cid AS BIGINT) AS cluster_id, CAST(r - 1 AS BIGINT) AS label_rank, "
          f"term, lift_milli FROM ranked WHERE r <= {int(top_n)} "
          "ORDER BY cluster_id, label_rank"
    )


def dup_gram_exposure_sql(ngram: int = 8) -> str:
    """Oracle for curation.dup_gram_exposure. The engine groups md5-64
    gram hashes; the oracle groups the gram strings themselves — the
    collision-free reference a 64-bit hash collision would fail against."""
    parts = "||' '||".join(f"list_extract(a,i+{j})" if j else "list_extract(a,i)"
                           for j in range(ngram))
    return (
        "WITH docs AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] ELSE "
        "regexp_split_to_array(trim(text), '\\s+') END AS a FROM documents), "
        f"g AS (SELECT DISTINCT doc_id, {parts} AS g "
        f"FROM docs, UNNEST(range(1, len(a)-{ngram - 2})) AS t(i) WHERE len(a) >= {ngram}), "
        "cnt AS (SELECT g, COUNT(*) AS n FROM g GROUP BY 1) "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, "
        "CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams, "
        "CAST(MAX(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_flag "
        "FROM g JOIN cnt USING (g) GROUP BY doc_id ORDER BY doc_id"
    )


def exact_substring_remove_sql(ngram: int = 8) -> str:
    """Oracle for curation.exact_substring_remove. The engine marks
    token coverage from md5-64 hashes of the grams; the oracle works on
    the gram STRINGS (collision-free reference): a token at position i
    is removed when any cross-doc-duplicated gram starts in
    [i-ngram+1, i]."""
    parts = "||' '||".join(f"list_extract(a,i+{j})" if j else "list_extract(a,i)"
                           for j in range(ngram))
    return (
        "WITH docs AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] ELSE "
        "regexp_split_to_array(trim(text), '\\s+') END AS a FROM documents), "
        "pos AS (SELECT doc_id, CAST(i AS BIGINT) AS i, list_extract(a, i) AS tok "
        "FROM docs, UNNEST(range(1, len(a) + 1)) AS t(i)), "
        f"g AS (SELECT doc_id, CAST(i AS BIGINT) AS i, {parts} AS g "
        f"FROM docs, UNNEST(range(1, len(a)-{ngram - 2})) AS t(i) WHERE len(a) >= {ngram}), "
        "dup AS (SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS nd FROM g GROUP BY 1) "
        "WHERE nd >= 2), "
        "dstart AS (SELECT DISTINCT doc_id, i FROM g JOIN dup USING (g)), "
        "cov AS (SELECT p.doc_id, p.i, p.tok, "
        "MAX(CASE WHEN d.i IS NOT NULL THEN 1 ELSE 0 END) AS c "
        "FROM pos p LEFT JOIN dstart d ON d.doc_id = p.doc_id "
        f"AND d.i BETWEEN p.i - {ngram - 1} AND p.i GROUP BY p.doc_id, p.i, p.tok) "
        "SELECT dd.doc_id, CAST(COALESCE(COUNT(cov.i), 0) AS BIGINT) AS n_tokens, "
        "CAST(COALESCE(SUM(cov.c), 0) AS BIGINT) AS n_removed, "
        "COALESCE(string_agg(CASE WHEN cov.c = 0 THEN cov.tok END, ' ' ORDER BY cov.i), '') "
        "AS clean_text "
        "FROM documents dd LEFT JOIN cov ON cov.doc_id = dd.doc_id "
        "GROUP BY dd.doc_id ORDER BY dd.doc_id"
    )


def gopher_quality_sql(stops: tuple = ("the", "be", "to", "of", "and",
                                       "that", "have", "with")) -> str:
    """Oracle for curation.gopher_quality_flags — integer rule replicas
    (cross-multiplied bounds instead of float means)."""
    stop_sql = "[" + ", ".join(f"'{w}'" for w in stops) + "]"
    return (
        "WITH docs AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] ELSE "
        "regexp_split_to_array(trim(text), '\\s+') END AS a FROM documents), "
        "sig AS (SELECT doc_id, CAST(len(a) AS BIGINT) AS n_words, "
        "CAST(COALESCE(list_sum(list_transform(a, x -> len(x))), 0) AS BIGINT) AS sum_word_len, "
        "CAST(len(list_filter(a, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words, "
        f"CAST(len(list_filter({stop_sql}, s -> list_contains(a, s))) AS BIGINT) AS n_req_stopwords "
        "FROM docs) "
        "SELECT doc_id, n_words, sum_word_len, n_alpha_words, n_req_stopwords, "
        "CAST(CASE WHEN n_words BETWEEN 50 AND 100000 "
        "AND 3*n_words <= sum_word_len AND sum_word_len <= 10*n_words "
        "AND 10*n_alpha_words >= 8*n_words AND n_req_stopwords >= 2 "
        "THEN 1 ELSE 0 END AS BIGINT) AS pass_flag "
        "FROM sig ORDER BY doc_id"
    )


def score_nodes_sql(segment: str = "BUILDING") -> str:
    """Oracle for graph.score_nodes — tf-idf node scoring with the
    micro-nat integer idf convention (FLOOR(ln(numDocs/(df+1))*1e6+0.5))."""
    idf = "CAST(FLOOR(LN(nd.n/(dfq.df + 1.0))*1000000 + 0.5) AS BIGINT)"
    return (
        "WITH fg AS (SELECT l_suppkey AS node, CAST(COUNT(*) AS BIGINT) AS n_edges "
        "FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM orders "
        "JOIN customer ON o_custkey = c_custkey "
        f"WHERE c_mktsegment = '{segment}') GROUP BY 1), "
        "dfq AS (SELECT l_suppkey AS node, CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS df "
        "FROM lineitem GROUP BY 1), "
        "nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM orders) "
        f"SELECT fg.node, fg.n_edges, dfq.df, {idf} AS idf_micro, "
        f"fg.n_edges * {idf} AS score_micro "
        "FROM fg JOIN dfq USING (node), nd "
        "ORDER BY score_micro DESC, node"
    )


def line_dedup_sql(line_tokens: int = 8) -> str:
    """Oracle for curation.line_dedup_first: non-overlapping
    ``line_tokens``-token segments, keeper = MIN(doc_id) per line."""
    return (
        "WITH docs AS (SELECT doc_id, CASE WHEN trim(text) = '' THEN [] ELSE "
        "regexp_split_to_array(trim(text), '\\s+') END AS a FROM documents), "
        "ln AS (SELECT DISTINCT doc_id, "
        f"array_to_string(list_slice(a, i, i + {line_tokens - 1}), ' ') AS l "
        f"FROM docs, UNNEST(range(1, len(a) + 1, {line_tokens})) AS t(i)), "
        "keeper AS (SELECT l, MIN(doc_id) AS keep_doc FROM ln GROUP BY 1) "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines, "
        "CAST(SUM(CASE WHEN doc_id = keep_doc THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_kept "
        "FROM ln JOIN keeper USING (l) GROUP BY doc_id ORDER BY doc_id"
    )


def ann_pq_sql(k: int = 10, n_queries: int = 5, n_sub: int = 8,
               n_codes: int = 32, dims: int = 64, scale: int = 10_000) -> str:
    """Oracle for ann.ann_pq_topk — the full PQ pipeline (quantize ->
    sampled codebook -> argmin encode -> ADC scan) in exact int64
    arithmetic; floats quantize as FLOOR(CAST(x AS DOUBLE)*scale + 0.5)
    on both sides, so the comparison is bit-free."""
    dsub = dims // n_sub
    return (
        "WITH ev AS (SELECT vec_id, i, CAST(FLOOR(CAST(list_extract(embedding, i) AS DOUBLE) "
        f"* {scale} + 0.5) AS BIGINT) AS v "
        f"FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)), "
        f"sub AS (SELECT vec_id, CAST((i - 1) // {dsub} AS BIGINT) AS s, "
        f"(i - 1) % {dsub} AS j, v FROM ev), "
        f"cbidx AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code "
        f"FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {n_codes})), "
        "cb AS (SELECT c.code, s.s, s.j, s.v FROM cbidx c JOIN sub s USING (vec_id)), "
        "dist AS (SELECT a.vec_id, a.s, b.code, SUM((a.v - b.v) * (a.v - b.v)) AS d "
        "FROM sub a JOIN cb b ON a.s = b.s AND a.j = b.j GROUP BY 1, 2, 3), "
        "enc AS (SELECT vec_id, s, code FROM dist "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, code) = 1), "
        f"qv AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {n_queries}), "
        "qlut AS (SELECT q.vec_id AS query_id, b.s, b.code, "
        "SUM((s2.v - b.v) * (s2.v - b.v)) AS d "
        "FROM qv q JOIN sub s2 USING (vec_id) JOIN cb b ON s2.s = b.s AND s2.j = b.j "
        "GROUP BY 1, 2, 3), "
        "adc AS (SELECT l.query_id, e.vec_id AS neighbor_id, SUM(l.d) AS adist "
        "FROM enc e JOIN qlut l ON e.s = l.s AND e.code = l.code "
        "WHERE e.vec_id <> l.query_id GROUP BY 1, 2), "
        "r AS (SELECT query_id, neighbor_id, adist, "
        "ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) - 1 AS rnk "
        "FROM adc) "
        "SELECT query_id, CAST(rnk AS BIGINT) AS rank, neighbor_id, "
        f"CAST(adist AS BIGINT) AS adist FROM r WHERE rnk < {k} ORDER BY query_id, rank"
    )


def dsir_select_sql(target_source: str = "src0", n_buckets: int = 2048,
                    k: int = 200) -> str:
    """Oracle for curation.dsir_select_topk. Bigram buckets via
    md5_number_upper % n_buckets (== the engine's md5-upper64 little-
    endian convention, proven by the simhash/mix oracles); per-bucket
    log-ratios quantize to micro-nat int64 BEFORE the per-doc SUM, so
    the document weights are exact integers on both sides."""
    return (
        "WITH docs AS (SELECT doc_id, source, "
        "CASE WHEN trim(text) = '' THEN [] ELSE regexp_split_to_array(trim(text), '\\s+') END AS a "
        "FROM documents), "
        "b AS (SELECT doc_id, source, "
        f"CAST(md5_number_upper(list_extract(a, i) || ' ' || list_extract(a, i + 1)) "
        f"% {n_buckets} AS BIGINT) AS bkt "
        "FROM docs, UNNEST(range(1, len(a))) AS t(i)), "
        f"tc AS (SELECT bkt, COUNT(*) AS c FROM b WHERE source = '{target_source}' GROUP BY 1), "
        "rc AS (SELECT bkt, COUNT(*) AS c FROM b GROUP BY 1), "
        f"tot AS (SELECT (SELECT COUNT(*) FROM b WHERE source = '{target_source}') AS t_tot, "
        "(SELECT COUNT(*) FROM b) AS r_tot), "
        "lr AS (SELECT r.bkt, CAST(FLOOR((ln((COALESCE(t.c, 0) + 1.0)"
        f"/(tot.t_tot + {float(n_buckets)!r})) - ln((r.c + 1.0)/(tot.r_tot + {float(n_buckets)!r})))"
        " * 1000000.0 + 0.5) AS BIGINT) AS lri "
        "FROM rc r LEFT JOIN tc t USING (bkt), tot), "
        "w AS (SELECT d.doc_id, COALESCE(SUM(lr.lri), 0) AS w_micro "
        f"FROM docs d LEFT JOIN b ON b.doc_id = d.doc_id LEFT JOIN lr ON b.bkt = lr.bkt "
        f"WHERE d.source <> '{target_source}' GROUP BY 1) "
        "SELECT CAST(rnk AS BIGINT) AS rank, doc_id, CAST(w_micro AS BIGINT) AS w_micro "
        "FROM (SELECT doc_id, w_micro, ROW_NUMBER() OVER (ORDER BY w_micro DESC, doc_id) - 1 AS rnk "
        f"FROM w) WHERE rnk < {int(k)} ORDER BY rank"
    )


def lm_quality_sql(lm_source: str = "src0", n_buckets: int = 4096,
                   head_micro: int = 7_500_000, tail_micro: int = 8_500_000) -> str:
    """Oracle for curation.lm_quality_scores: hashed-unigram negative
    log-probs quantized to micro-nats before the per-doc SUM — exact
    int64 on both sides; integer-division per-token banding."""
    return (
        "WITH docs AS (SELECT doc_id, source, "
        "CASE WHEN trim(text) = '' THEN [] ELSE regexp_split_to_array(trim(text), '\\s+') END AS a "
        "FROM documents), "
        "w AS (SELECT doc_id, source, "
        f"CAST(md5_number_upper(list_extract(a, i)) % {n_buckets} AS BIGINT) AS bkt "
        "FROM docs, UNNEST(range(1, len(a) + 1)) AS t(i)), "
        f"cnt AS (SELECT bkt, COUNT(*) AS c FROM w WHERE source = '{lm_source}' GROUP BY 1), "
        f"tot AS (SELECT COUNT(*) AS t FROM w WHERE source = '{lm_source}'), "
        "nlp AS (SELECT b.bkt, CAST(FLOOR(-ln((COALESCE(cnt.c, 0) + 1.0)"
        f"/(tot.t + {float(n_buckets)!r})) * 1000000.0 + 0.5) AS BIGINT) AS nlp "
        "FROM (SELECT DISTINCT bkt FROM w) b LEFT JOIN cnt USING (bkt), tot), "
        "ce AS (SELECT d.doc_id, COUNT(w.bkt) AS n_tok, "
        "COALESCE(SUM(nlp.nlp), 0) AS ce_micro "
        "FROM docs d LEFT JOIN w ON w.doc_id = d.doc_id "
        "LEFT JOIN nlp ON w.bkt = nlp.bkt GROUP BY 1) "
        "SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, "
        "CAST(ce_micro AS BIGINT) AS ce_micro, "
        "CAST(CASE WHEN n_tok = 0 THEN 0 "
        f"WHEN ce_micro // n_tok <= {head_micro} THEN 0 "
        f"WHEN ce_micro // n_tok <= {tail_micro} THEN 1 ELSE 2 END AS BIGINT) AS band "
        "FROM ce ORDER BY doc_id"
    )


def clean_corpus_sql(n_buckets: int = 8, min_tokens: int = 20,
                     top_frac_pct: int = 30) -> str:
    """Oracle for curation.clean_corpus_export: same pinned filter order
    (quality rule in exact ints, then exact-dedup keep MIN(doc_id) per
    md5(text) among survivors), counted per doc_id % n_buckets."""
    return (
        "WITH d AS (SELECT doc_id, text, "
        "CASE WHEN trim(text) = '' THEN [] ELSE regexp_split_to_array(trim(text), '\\s+') END AS a "
        "FROM documents), "
        "tfc AS (SELECT doc_id, MAX(c) AS top FROM "
        "(SELECT doc_id, COUNT(*) AS c FROM d, UNNEST(a) AS t(w) GROUP BY doc_id, w) "
        "GROUP BY doc_id), "
        "q AS (SELECT d.doc_id, md5(d.text) AS sig FROM d JOIN tfc USING (doc_id) "
        f"WHERE len(d.a) >= {min_tokens} AND tfc.top * 100 <= len(d.a) * {top_frac_pct}), "
        "k AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY sig), "
        f"per AS (SELECT doc_id % {n_buckets} AS b, COUNT(*) AS n FROM k GROUP BY 1) "
        "SELECT CAST(r.range AS BIGINT) AS bucket, CAST(COALESCE(per.n, 0) AS BIGINT) AS n_docs "
        f"FROM range(0, {n_buckets}) r LEFT JOIN per ON per.b = r.range ORDER BY bucket"
    )

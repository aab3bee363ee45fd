"""Text-analysis operators for training-data pipelines over ``documents``:
token counting, quality signals, language-ID heuristic, fingerprints.

Reference anchors: Solr's SignatureUpdateProcessor MD5Signature /
TextProfileSignature ([U] solr/core/.../update/processor/
SignatureUpdateProcessorFactory.java) for fingerprints; the langid URP
([U] solr/contrib/langid/) for language identification. Outputs are
exact integers/strings so the DuckDB oracles hash identically.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from lucene_solr_ray.io_utils import pool_size, read_parquet_clean

_WS = re.compile(r"\s+")
_TOKEN_OR_PUNCT = re.compile(r"[a-z0-9]+|[^a-z0-9\s]")

# classic English stopword list (shared with the analyzer) — used as the
# "englishness" signal by the language-ID heuristic
from lucene_solr_ray.analysis import STOPWORDS


def _read_docs(sf_dir: str) -> ray.data.Dataset:
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def token_count(sf_dir: str) -> ray.data.Dataset:
    """Whitespace token count per doc (the byte-cheap token estimator)."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n = np.fromiter((len(_WS.split(s.strip())) if s and s.strip() else 0 for s in texts),
                        dtype=np.int64, count=len(texts))
        return pa.table({"doc_id": t.column("doc_id"), "n_tokens": pa.array(n)})

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def bpe_ish_count(sf_dir: str) -> ray.data.Dataset:
    """BPE-ish token-count estimate: word runs + individual punctuation
    marks (the regex pre-tokenizer shape used by byte-pair encoders)."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n = np.fromiter((len(_TOKEN_OR_PUNCT.findall(s.lower())) if s else 0 for s in texts),
                        dtype=np.int64, count=len(texts))
        return pa.table({"doc_id": t.column("doc_id"), "n_bpe_tokens": pa.array(n)})

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def ngram_diversity(sf_dir: str, n: int = 3) -> pa.Table:
    """Per-source n-gram diversity — distinct n-grams over total n-grams
    (micro-units, truncating div): the corpus-level repetitiveness /
    self-similarity signal LLM curation pipelines track per domain
    (Gopher's repetition family lifted from doc level to source level).

    Scale shape: gram rows pre-dedup map-side per batch, ONE
    (source, gram) hash groupby dedups globally (the wide step), then a
    source-domain-sized count; totals are per-batch integer partials +
    one tiny groupby. Gram identity is the exact token string — a
    hash-bucketed variant would shrink shuffle bytes at 100 TB, at the
    cost of collision risk in the distinct count."""
    from ray.data.aggregate import Count, Sum

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["text", "source"])

    def gram_rows(t: pa.Table) -> pa.Table:
        seen: set = set()
        for src, s in zip(t.column("source").to_pylist(),
                          t.column("text").to_pylist()):
            toks = _WS.split(s.strip()) if s and s.strip() else []
            for i in range(len(toks) - n + 1):
                seen.add((src, " ".join(toks[i:i + n])))
        srcs = [p[0] for p in seen]
        return pa.table({"source": pa.array(srcs, pa.string()),
                         "gram": pa.array([p[1] for p in seen], pa.string())})

    def total_partials(t: pa.Table) -> pa.Table:
        tot: dict = {}
        for src, s in zip(t.column("source").to_pylist(),
                          t.column("text").to_pylist()):
            toks = _WS.split(s.strip()) if s and s.strip() else []
            tot[src] = tot.get(src, 0) + max(0, len(toks) - n + 1)
        return pa.table({"source": pa.array(list(tot), pa.string()),
                         "n_total": pa.array(list(tot.values()), pa.int64())})

    distinct = (
        ds.map_batches(gram_rows, batch_format="pyarrow")
        .groupby(["source", "gram"]).count()
        .groupby("source").aggregate(Count(alias_name="n_distinct"))
        .to_pandas().set_index("source")
    )
    totals = (
        ds.map_batches(total_partials, batch_format="pyarrow")
        .groupby("source").aggregate(Sum("n_total", alias_name="n_total"))
        .to_pandas().set_index("source")
    )
    out = distinct.join(totals, how="inner").sort_index()
    nd = out["n_distinct"].to_numpy().astype(np.int64)
    nt = out["n_total"].to_numpy().astype(np.int64)
    return pa.table({
        "source": pa.array(out.index.astype(str), pa.string()),
        "n_distinct": pa.array(nd, pa.int64()),
        "n_total": pa.array(nt, pa.int64()),
        "diversity_micro": pa.array(nd * 1_000_000 // nt, pa.int64()),
    })


def token_fertility(sf_dir: str) -> pa.Table:
    """Per-language tokenizer fertility — subword tokens (the BPE-ish
    regex pre-tokenizer) per whitespace word, micro-units: the standard
    "how many pieces does this tokenizer cut a word of language X into"
    diagnostic for multilingual training mixes. One stateless pass of
    integer partials, one lang-domain groupby."""
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        agg: dict = {}
        for lang, s in zip(t.column("lang").to_pylist(),
                           t.column("text").to_pylist()):
            w = len(_WS.split(s.strip())) if s and s.strip() else 0
            bpe = len(_TOKEN_OR_PUNCT.findall(s.lower())) if s else 0
            cw, cb = agg.get(lang, (0, 0))
            agg[lang] = (cw + w, cb + bpe)
        return pa.table({
            "lang": pa.array(list(agg), pa.string()),
            "n_words": pa.array([v[0] for v in agg.values()], pa.int64()),
            "n_subwords": pa.array([v[1] for v in agg.values()], pa.int64()),
        })

    out = (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text", "lang"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_words", alias_name="n_words"),
                   Sum("n_subwords", alias_name="n_subwords"))
        .to_pandas().sort_values("lang")
    )
    nw = out["n_words"].to_numpy().astype(np.int64)
    nb = out["n_subwords"].to_numpy().astype(np.int64)
    fert = np.where(nw > 0, nb * 1_000_000 // np.maximum(nw, 1), 0)
    return pa.table({
        "lang": pa.array(out["lang"].astype(str), pa.string()),
        "n_words": pa.array(nw, pa.int64()),
        "n_subwords": pa.array(nb, pa.int64()),
        "fertility_micro": pa.array(fert.astype(np.int64), pa.int64()),
    })


def quality_signals(sf_dir: str) -> ray.data.Dataset:
    """Per-doc quality counters (length / stopword-ratio numerators kept
    as exact integers; ratios are the caller's division)."""
    stop = STOPWORDS

    class Quality:
        def __init__(self):
            self.ws = _WS

        def __call__(self, t: pa.Table) -> pa.Table:
            texts = t.column("text").to_pylist()
            n_tok = np.zeros(len(texts), dtype=np.int64)
            n_stop = np.zeros(len(texts), dtype=np.int64)
            n_chars = np.zeros(len(texts), dtype=np.int64)
            for i, s in enumerate(texts):
                if not s:
                    continue
                toks = self.ws.split(s.strip()) if s.strip() else []
                n_tok[i] = len(toks)
                n_stop[i] = sum(1 for w in toks if w in stop)
                n_chars[i] = len(s)
            return pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "n_tokens": pa.array(n_tok),
                    "n_stopwords": pa.array(n_stop),
                    "n_chars": pa.array(n_chars),
                }
            )

    return _read_docs(sf_dir).map_batches(Quality, batch_format="pyarrow", concurrency=pool_size()).sort("doc_id")


def lang_id(sf_dir: str, en_threshold_pct: int = 20) -> ray.data.Dataset:
    """Language-ID heuristic: label 'en' when stopword tokens make up at
    least ``en_threshold_pct`` percent of tokens (integer comparison so
    the SQL oracle is exact); 'und' for empty docs."""
    stop = STOPWORDS

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        labels = []
        for s in texts:
            toks = _WS.split(s.strip()) if s and s.strip() else []
            if not toks:
                labels.append("und")
                continue
            n_stop = sum(1 for w in toks if w in stop)
            labels.append("en" if n_stop * 100 >= en_threshold_pct * len(toks) else "other")
        return pa.table({"doc_id": t.column("doc_id"), "pred_lang": pa.array(labels, type=pa.string())})

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def md5_fingerprint(sf_dir: str) -> ray.data.Dataset:
    """Exact content signature — MD5Signature analogue."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        sigs = [hashlib.md5(s.lower().encode("utf-8")).hexdigest() if s is not None else None
                for s in texts]
        return pa.table({"doc_id": t.column("doc_id"), "sig": pa.array(sigs, type=pa.string())})

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


_MERSENNE61 = (1 << 61) - 1


def _mulmod_bytes_pows(b: np.ndarray, pows: np.ndarray) -> np.ndarray:
    """(b * pows) mod 2^61-1, vectorized, overflow-safe: b < 2^8,
    pows < 2^61 (split pows into 31-bit halves; fold the *2^31 shift
    through the Mersenne prime — same trick as dedup._MinHasher)."""
    p = np.uint64(_MERSENNE61)
    lo = pows & np.uint64((1 << 31) - 1)
    hi = pows >> np.uint64(31)  # < 2^30
    v = b * hi  # < 2^38
    folded = ((v >> np.uint64(30)) + ((v & np.uint64((1 << 30) - 1)) << np.uint64(31))) % p
    return (b * lo + folded) % p  # b*lo < 2^39, folded < 2^61 -> sum < 2^62


def _summod(terms: np.ndarray, axis=None) -> np.ndarray:
    """sum(terms) mod 2^61-1 for terms < 2^61 without overflow: split
    each term at bit 32; partial sums stay < 2^64 for n < 2^32."""
    p = np.uint64(_MERSENNE61)
    lo = (terms & np.uint64((1 << 32) - 1)).sum(axis=axis)
    hi = (terms >> np.uint64(32)).sum(axis=axis)  # each < 2^29
    # hi * 2^32 mod p, hi < 2^49: 2^61 == 1 (mod p), split at bit 29
    folded = ((hi >> np.uint64(29)) + ((hi & np.uint64((1 << 29) - 1)) << np.uint64(32))) % p
    return (folded + lo % p) % p


def rolling_fingerprint(sf_dir: str, window: int = 8, base: int = 257,
                        mod: int = (1 << 61) - 1) -> ray.data.Dataset:
    """Karp-Rabin document fingerprinting: full-doc Rabin polynomial hash
    (``fingerprint``, discriminative per distinct text) plus the minimum
    rolling window hash (``min_window_hash``, the winnowing-style blocking
    key for near-dup candidate grouping). Vectorized: per-doc byte arrays
    hit numpy modmul kernels (no per-byte Python loop); windows go through
    a sliding_window_view matmul-style reduction. SQL oracle:
    data_oracle.rolling_fingerprint_sql (corpus is pure ASCII, so DuckDB
    codepoints == UTF-8 bytes — measured in tests)."""
    assert mod == _MERSENNE61, "vectorized path is specialized to the Mersenne prime"

    class Rolling:
        def __init__(self):
            # powers of base mod p, highest degree first, grown on demand
            self._pow_cache = np.array([1], dtype=np.uint64)
            self.win_pows = self._pows(window)[::-1].copy()  # base^{window-1}..base^0

        def _pows(self, n: int) -> np.ndarray:
            while len(self._pow_cache) < n:
                nxt = int(self._pow_cache[-1]) * base % mod
                self._pow_cache = np.append(self._pow_cache, np.uint64(nxt))
            return self._pow_cache[:n]

        def __call__(self, t: pa.Table) -> pa.Table:
            texts = t.column("text").to_pylist()
            full = np.zeros(len(texts), dtype=np.int64)
            winmin = np.zeros(len(texts), dtype=np.int64)
            for i, s in enumerate(texts):
                b = np.frombuffer((s or "").encode("utf-8"), dtype=np.uint8).astype(np.uint64)
                n = len(b)
                if n == 0:
                    continue
                full[i] = int(_summod(_mulmod_bytes_pows(b, self._pows(n)[::-1])))
                if n < window:
                    winmin[i] = full[i]
                    continue
                wins = np.lib.stride_tricks.sliding_window_view(b, window)
                terms = _mulmod_bytes_pows(wins, self.win_pows[None, :])
                winmin[i] = int(_summod(terms, axis=1).min())
            return pa.table({"doc_id": t.column("doc_id"),
                             "fingerprint": pa.array(full),
                             "min_window_hash": pa.array(winmin)})


    return _read_docs(sf_dir).map_batches(
        Rolling, batch_format="pyarrow", concurrency=pool_size()
    ).sort("doc_id")


def stemmed_term_counts(sf_dir: str) -> ray.data.Dataset:
    """Porter-stemmed term histogram over documents (the EnglishAnalyzer
    chain inside map_batches; [U] lucene/analysis/common/.../en/
    PorterStemFilter.java). No SQL oracle (DuckDB's fts/stem extension
    is unavailable offline) — the stemmer itself is pytest-validated
    against the published Porter vectors."""
    from ray.data.aggregate import Count

    from lucene_solr_ray.analysis import english_tokenize

    def explode(t: pa.Table) -> pa.Table:
        terms = []
        for s in t.column("text").to_pylist():
            terms.extend(english_tokenize(s or ""))
        return pa.table({"term": pa.array(terms, pa.string())})

    return (
        _read_docs(sf_dir)
        .map_batches(explode, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Count(alias_name="n"))
        .sort("term")
    )


def phonetic_term_groups(sf_dir: str, k: int = 50,
                         encoder: str = "soundex") -> ray.data.Dataset:
    """PhoneticFilter vocabulary grouping ([U] lucene/analysis/
    phonetic/.../PhoneticFilter.java with the commons-codec Soundex or
    RefinedSoundex encoder): each phonetic code's distinct-term count
    and total term frequency, top-k by total_tf (ties -> code asc).
    Scale shape: per-batch Counter partials (vocab-bounded rows, never
    corpus-sized token rows) -> groupby-term Sum -> vocab-sized code
    map -> groupby-code combine; both shuffles move vocabulary-sized
    data only."""
    from ray.data.aggregate import Count, Sum

    from lucene_solr_ray.analysis import refined_soundex, soundex, tokenize

    enc = {"soundex": soundex, "refined": refined_soundex}[encoder]

    def term_partials(t: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter()
        for s in t.column("text").to_pylist():
            c.update(tokenize(s or ""))
        return pa.table({"term": pa.array(list(c.keys()), pa.string()),
                         "tf": pa.array(list(c.values()), pa.int64())})

    def to_codes(t: pa.Table) -> pa.Table:
        return pa.table({
            "code": pa.array([enc(x) for x in t.column("term").to_pylist()],
                             pa.string()),
            "tf_sum": t.column("tf_sum"),
        })

    return (
        _read_docs(sf_dir)
        .map_batches(term_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("tf", alias_name="tf_sum"))
        .map_batches(to_codes, batch_format="pyarrow")
        .groupby("code")
        .aggregate(Count(alias_name="n_terms"), Sum("tf_sum", alias_name="total_tf"))
        .sort(["total_tf", "code"], descending=[True, False])
        .limit(k)
    )


def lang_dispatch_token_counts(sf_dir: str) -> ray.data.Dataset:
    """Per-language analyzer dispatch (langid URP -> analyzer routing,
    [U] solr/contrib/langid + lucene/analysis/{kuromoji,nori,smartcn}
    stand-ins): each doc's ``lang`` column picks its chain — CJK bigram
    for zh/ja/ko, the canonical standard chain otherwise — and the entry
    reports (doc_id, analyzer, n_tokens).

    Oracle note: this corpus's zh/ja/ko rows contain no CJK codepoints,
    so the CJK chain degenerates to the standard chain on them and the
    SQL oracle is the stopword-filtered whitespace count for every row
    (the dispatch itself IS exercised — the analyzer column proves the
    routing, and tests feed real CJK text through the same path)."""
    from lucene_solr_ray.analysis import CJK_LANGS, analyzer_for_lang, analyze_texts

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "lang", "text"])

    def fn(t: pa.Table) -> pa.Table:
        langs = t.column("lang").to_pylist()
        texts = t.column("text").to_pylist()
        n = len(texts)
        out = np.zeros(n, np.int64)
        cjk_rows = [i for i, lg in enumerate(langs) if lg in CJK_LANGS]
        std_rows = [i for i, lg in enumerate(langs) if lg not in CJK_LANGS]
        if std_rows:  # vectorized standard chain for the bulk
            _, _, dl = analyze_texts([texts[i] for i in std_rows])
            out[std_rows] = dl
        for i in cjk_rows:  # CJK rows only walk the bigram chain
            out[i] = len(analyzer_for_lang(langs[i])(texts[i]))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "analyzer": pa.array(
                ["ja_morph" if lg == "ja" else
                 "zh_dict" if lg == "zh" else
                 "ko_morph" if lg == "ko" else
                 "cjk" if lg in CJK_LANGS else "standard" for lg in langs],
                pa.string()),
            "n_tokens": pa.array(out),
        })

    return ds.map_batches(fn, batch_format="pyarrow").sort("doc_id")


# Gold sentences for the ja morphology gate entry: each doc_id is
# deterministically assigned one sentence; the engine segments it with
# the real lattice at runtime while the SQL oracle carries the
# HAND-SPECIFIED segmentation (token count + head token) — the same
# gold table tests/test_analysis.py pins — so a lattice regression
# breaks the driver gate, not just pytest.
JA_GOLD = [
    ("私は東京大学で自然言語処理を研究する", 8, "私"),
    ("今日は良い天気です", 4, "今日"),
    ("形態素解析の検索索引", 4, "形態素"),
    ("彼女はカタカナのテキストを読む", 4, "彼女"),
    ("東京で寿司を食べる", 3, "東京"),
    ("鰯を食べる", 2, "鰯"),
    ("日本語の勉強をします", 3, "日本語"),
    ("駅から大学まで電車で行きます", 5, "駅"),
    ("BM25で日本語を検索する", 4, "bm25"),
]


def ja_morphology_tokens(sf_dir: str) -> ray.data.Dataset:
    """Dictionary-lattice Japanese segmentation as a gate-checked
    operator: doc_id % len(JA_GOLD) picks a sentence, the engine runs
    japanese_tokenize on it, and reports (doc_id, n_tokens, head)."""
    from lucene_solr_ray.analysis import japanese_tokenize

    seg = [japanese_tokenize(s) for s, _, _ in JA_GOLD]
    n_tok = np.array([len(t) for t in seg], np.int64)
    heads = np.array([t[0] if t else "" for t in seg], object)

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def fn(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy().astype(np.int64)
        idx = d % len(JA_GOLD)
        return pa.table({
            "doc_id": pa.array(d),
            "n_tokens": pa.array(n_tok[idx]),
            "head": pa.array(heads[idx], pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow").sort("doc_id")


# Gold sentences for the ko morphology gate entry, same pattern as
# JA_GOLD: the engine lattice-segments at runtime; the oracle carries the
# HAND-SPECIFIED token count + head token.
KO_GOLD = [
    ("나는 학교에서 한국어를 공부한다", 4, "나"),
    ("오늘은 날씨가 좋다", 3, "오늘"),
    ("자연어처리를 연구합니다", 3, "자연어"),   # decompound via lexicon parts
    ("나는 서울에서 친구와 영화를 감상한다", 5, "나"),
    ("한국 대학교 학생입니다", 3, "한국"),
    ("BM25로 한국어를 검색한다", 3, "bm25"),    # mixed script
    ("비빔밥을 먹다", 4, "비"),                 # unknown -> single-char fallback
    ("정보 검색 기술을 개발한다", 4, "정보"),
    ("그녀는 도서관에서 책을 읽다", 4, "그녀"),
]


def ko_morphology_tokens(sf_dir: str) -> ray.data.Dataset:
    """Dictionary-lattice Korean segmentation (nori mechanism: josa/eomi
    stop-tag filtering + lexicon-granularity decompounding) as a
    gate-checked operator: doc_id % len(KO_GOLD) picks a sentence, the
    engine runs korean_tokenize on it, and reports (doc_id, n_tokens,
    head)."""
    from lucene_solr_ray.analysis import korean_tokenize

    seg = [korean_tokenize(s) for s, _, _ in KO_GOLD]
    n_tok = np.array([len(t) for t in seg], np.int64)
    heads = np.array([t[0] if t else "" for t in seg], object)

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def fn(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy().astype(np.int64)
        idx = d % len(KO_GOLD)
        return pa.table({
            "doc_id": pa.array(d),
            "n_tokens": pa.array(n_tok[idx]),
            "head": pa.array(heads[idx], pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow").sort("doc_id")


def ko_morphology_sql() -> str:
    whens_n = " ".join(
        f"WHEN {i} THEN {n}" for i, (_, n, _) in enumerate(KO_GOLD))
    whens_h = " ".join(
        f"WHEN {i} THEN '{h}'" for i, (_, _, h) in enumerate(KO_GOLD))
    return (
        f"SELECT doc_id, CAST(CASE doc_id % {len(KO_GOLD)} {whens_n} END AS BIGINT) "
        f"AS n_tokens, CASE doc_id % {len(KO_GOLD)} {whens_h} END AS head "
        "FROM documents ORDER BY doc_id"
    )


def ja_morphology_sql() -> str:
    whens_n = " ".join(
        f"WHEN {i} THEN {n}" for i, (_, n, _) in enumerate(JA_GOLD))
    whens_h = " ".join(
        f"WHEN {i} THEN '{h}'" for i, (_, _, h) in enumerate(JA_GOLD))
    return (
        f"SELECT doc_id, CAST(CASE doc_id % {len(JA_GOLD)} {whens_n} END AS BIGINT) "
        f"AS n_tokens, CASE doc_id % {len(JA_GOLD)} {whens_h} END AS head "
        "FROM documents ORDER BY doc_id"
    )


# ICU folding gold pairs (raw -> hand-specified fold), same gate pattern
# as JA_GOLD: the engine folds at runtime, the oracle carries the gold.
ICU_GOLD = [
    ("Ｃａｆé", "cafe"),       # full-width + acute
    ("ﬁle", "file"),           # fi ligature
    ("ＮＡÏＶＥ", "naive"),    # full-width + diaeresis
    ("Ｓｔｒａßｅ", "strasse"),  # sharp s case-folds to ss
    ("①", "1"),                # circled digit
    ("Ǌegoš", "njegos"),       # digraph + caron
    ("Ångström", "angstrom"),  # combining marks stripped under NFD
    ("Ⅻ", "xii"),              # roman numeral
]


def icu_folding_tokens(sf_dir: str) -> ray.data.Dataset:
    """ICUFoldingFilter as a gate-checked operator: doc_id % len(ICU_GOLD)
    picks a raw form, the engine runs the real NFKC+casefold+mark-strip
    chain at runtime, the SQL oracle carries the hand-written folds."""
    from lucene_solr_ray.analysis import icu_fold

    folded = np.array([icu_fold(raw) for raw, _ in ICU_GOLD], object)

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def fn(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy().astype(np.int64)
        idx = d % len(ICU_GOLD)
        return pa.table({
            "doc_id": pa.array(d),
            "folded": pa.array(folded[idx], pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow").sort("doc_id")


def icu_folding_sql() -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{gold}'" for i, (_, gold) in enumerate(ICU_GOLD))
    return (
        f"SELECT doc_id, CASE doc_id % {len(ICU_GOLD)} {whens} END AS folded "
        "FROM documents ORDER BY doc_id"
    )


def charfilter_token_counts(sf_dir: str) -> ray.data.Dataset:
    """Char-filter chain demo over real data: PatternReplaceCharFilter
    rewrites whole-word 'merge' -> 'combine', MappingCharFilter maps the
    character sequence 'window' -> 'pane', THEN the standard chain runs;
    the entry counts the rewritten terms per doc. Neither replacement
    token exists in the corpus vocabulary, so the oracle is the original
    merge/window counts."""
    from lucene_solr_ray.analysis import (MappingCharFilter, PatternReplaceCharFilter,
                                          char_filtered_tokenize)

    chain = char_filtered_tokenize([
        PatternReplaceCharFilter(r"\bmerge\b", "combine"),
        MappingCharFilter({"window": "pane"}),
    ])

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n_comb = np.zeros(len(texts), np.int64)
        n_pane = np.zeros(len(texts), np.int64)
        for i, s in enumerate(texts):
            toks = chain(s)
            n_comb[i] = sum(1 for w in toks if w == "combine")
            n_pane[i] = sum(1 for w in toks if w == "pane")
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_combine": pa.array(n_comb),
                         "n_pane": pa.array(n_pane)})

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def synonym_graph_counts(sf_dir: str) -> ray.data.Dataset:
    """Multi-token synonym contraction over real data (SynonymGraphFilter
    n:1 rules, [U] lucene/analysis/common/.../synonym/SynonymGraphFilter.java):
    'merge join' -> hashjoin, 'window vector' -> winvec (greedy
    left-to-right, longest-first). Per doc: count of each contraction
    plus the doc's post-filter token total (proves consumed tokens left
    the stream). Rule token sets are chosen so matches can never overlap
    — what makes the SQL position-marking oracle exact."""
    from lucene_solr_ray.analysis import synonym_graph_filter

    rules = {("merge", "join"): ["hashjoin"], ("window", "vector"): ["winvec"]}

    def _tokens(s: str) -> list[str]:
        return _WS.split(s.strip()) if s and s.strip() else []

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n_hj = np.zeros(len(texts), np.int64)
        n_wv = np.zeros(len(texts), np.int64)
        n_tok = np.zeros(len(texts), np.int64)
        for i, s in enumerate(texts):
            toks = synonym_graph_filter(_tokens(s), rules)
            n_hj[i] = sum(1 for w in toks if w == "hashjoin")
            n_wv[i] = sum(1 for w in toks if w == "winvec")
            n_tok[i] = len(toks)
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_hashjoin": pa.array(n_hj),
                         "n_winvec": pa.array(n_wv),
                         "n_tokens": pa.array(n_tok)})

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def common_grams_counts(sf_dir: str) -> ray.data.Dataset:
    """CommonGramsFilter over real data ([U] lucene/analysis/common/.../
    commongrams/CommonGramsFilter.java, common set {'the','a'}): per
    doc, the number of emitted common-grams and the post-filter stream
    length (unigrams + grams — the filter ADDS tokens, unlike the
    synonym contraction)."""
    from lucene_solr_ray.analysis import common_grams_filter

    common = frozenset({"the", "a"})

    def _tokens(s: str) -> list[str]:
        return _WS.split(s.strip()) if s and s.strip() else []

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        n_grams = np.zeros(len(texts), np.int64)
        n_stream = np.zeros(len(texts), np.int64)
        for i, s in enumerate(texts):
            toks = _tokens(s)
            out = common_grams_filter(toks, common)
            n_grams[i] = len(out) - len(toks)
            n_stream[i] = len(out)
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_grams": pa.array(n_grams),
                         "n_stream": pa.array(n_stream)})

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def edge_ngram_counts(sf_dir: str, min_gram: int = 2, max_gram: int = 4,
                      k: int = 20) -> ray.data.Dataset:
    """EdgeNGramTokenFilter term histogram ([U] lucene/analysis/common/
    .../ngram/EdgeNGramTokenFilter.java over the canonical chain): top-k
    edge n-grams by total occurrences (ties -> gram asc). Scale shape:
    per-batch Counter partials over TERMS (vocab-bounded) -> groupby-term
    Sum -> the vocab-sized result expands to edge grams and re-combines;
    no corpus-sized token rows ever shuffle."""
    from ray.data.aggregate import Sum

    from lucene_solr_ray.analysis import edge_ngram_filter, tokenize

    def term_partials(t: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter()
        for s in t.column("text").to_pylist():
            c.update(tokenize(s or ""))
        return pa.table({"term": pa.array(list(c.keys()), pa.string()),
                         "tf": pa.array(list(c.values()), pa.int64())})

    def to_grams(t: pa.Table) -> pa.Table:
        grams, tfs = [], []
        for term, tf in zip(t.column("term").to_pylist(), t.column("tf_sum").to_pylist()):
            for g in edge_ngram_filter([term], min_gram, max_gram):
                grams.append(g)
                tfs.append(tf)
        return pa.table({"gram": pa.array(grams, pa.string()),
                         "n": pa.array(tfs, pa.int64())})

    return (
        _read_docs(sf_dir)
        .map_batches(term_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("tf", alias_name="tf_sum"))
        .map_batches(to_grams, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "gram"], descending=[True, False])
        .limit(k)
    )


def term_facet_prefix(sf_dir: str, prefix: str = "s", k: int = 10) -> ray.data.Dataset:
    """facet.field with ``facet.prefix`` ([U] solr/core/.../request/
    SimpleFacets.java prefix handling): term-facet counts over the
    indexed vocabulary restricted to a prefix, ranked count desc (ties
    term asc) — the classic facet ordering. The prefix cut happens in
    the map-side partial, so only matching vocab rows ever shuffle."""
    from ray.data.aggregate import Sum

    from lucene_solr_ray.analysis import tokenize

    def term_partials(t: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter()
        for s in t.column("text").to_pylist():
            c.update(tok for tok in tokenize(s or "") if tok.startswith(prefix))
        return pa.table({"term": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    return (
        _read_docs(sf_dir)
        .map_batches(term_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "term"], descending=[True, False])
        .limit(k)
    )


def urlemail_token_counts(sf_dir: str) -> ray.data.Dataset:
    """UAX29URLEmailTokenizer ([U] lucene/analysis/common/.../standard/
    UAX29URLEmailTokenizer.java): emails stay ONE token (type <EMAIL>)
    instead of splitting at '@'. Runs over the deterministically
    PII-augmented view (the pii_scan derivation — the raw corpus has no
    emails by construction): per doc, the email-token count and the
    total token count (emails + the standard tokens of the
    email-stripped remainder). Both counts are exact integers the SQL
    oracle reproduces with the same two regexes."""
    import re as _re

    from lucene_solr_ray.functions.curation import PII_PATTERNS

    email_re = _re.compile(PII_PATTERNS["email"])
    word_re = _re.compile(r"\w+(?:[.']\w+)*")

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        texts = t.column("text").to_pylist()
        n_email = np.zeros(len(ids), np.int64)
        n_total = np.zeros(len(ids), np.int64)
        for i, (d, s) in enumerate(zip(ids, texts)):
            aug = (f"{s} contact u{d}@example.org ip 10.0.{d % 256}.{d % 100} "
                   f"tel 555-{d % 900 + 100:03d}-{d % 9000 + 1000:04d}")
            emails = email_re.findall(aug)
            rest = email_re.sub(" ", aug)
            n_email[i] = len(emails)
            n_total[i] = len(emails) + len(word_re.findall(rest))
        return pa.table({"doc_id": pa.array(ids), "n_email": pa.array(n_email),
                         "n_tokens": pa.array(n_total)})

    return _read_docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


def elision_token_counts(sf_dir: str) -> ray.data.Dataset:
    """ElisionFilter counts over the deterministically French-augmented
    view of lang='fr' docs (the urlemail derivation pattern — the raw
    corpus has no apostrophes by construction): token pos i gains an
    elidable article prefix "<art>'" when (doc_id + i) % 4 == 0, the
    chain re-tokenizes (apostrophes kept, the FrenchAnalyzer tokenizer
    contract) and elides, and the counts land back at the view's exact
    integers: n_tokens = token count, n_elided = positions the filter
    stripped. A broken filter (wrong article set, wrong split) changes
    both."""
    import re as _re

    from lucene_solr_ray.analysis import elision_filter

    word_re = _re.compile(r"\w+(?:'\w+)*")
    arts = ("l", "d", "qu", "j", "n", "m", "t", "s", "c")

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        texts = t.column("text").to_pylist()
        n_tok = np.zeros(len(ids), np.int64)
        n_eli = np.zeros(len(ids), np.int64)
        for i, (d, s) in enumerate(zip(ids, texts)):
            toks = _WS.split(s.strip()) if s and s.strip() else []
            aug = [f"{arts[p % len(arts)]}'{tok}" if (int(d) + p) % 4 == 0 else tok
                   for p, tok in enumerate(toks)]
            retok = word_re.findall(" ".join(aug))
            stripped = elision_filter(retok)
            n_tok[i] = len(stripped)
            n_eli[i] = sum(a != b for a, b in zip(retok, stripped))
        return pa.table({"doc_id": pa.array(ids), "n_tokens": pa.array(n_tok),
                         "n_elided": pa.array(n_eli)})

    return (
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
        .filter(expr='lang == "fr"')
        .map_batches(fn, batch_format="pyarrow")
        .sort("doc_id")
    )


def winnowing_fingerprints(sf_dir: str, window: int = 8,
                           guarantee: int = 4, base: int = 257) -> ray.data.Dataset:
    """Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken 2003,
    "Winnowing: Local Algorithms for Document Fingerprinting" — the
    MOSS algorithm; the fingerprint-SELECTION step on top of the
    Karp-Rabin rolling hashes rolling_fingerprint computes): slide a
    width-``guarantee`` window over the k-gram hash sequence and keep
    each window's MINIMUM hash. Any shared substring of length
    window + guarantee - 1 is guaranteed a shared selected fingerprint.
    Emitted as the per-doc DISTINCT selected-value set (tie position
    doesn't affect the value set, so the SQL oracle is position-free).
    Vectorized: sliding_window_view over the hash array, row-min,
    unique. Docs shorter than one k-gram select their full-doc hash."""
    mod = _MERSENNE61

    class Winnow:
        def __init__(self):
            pows = [1]
            for _ in range(max(window, 64)):
                pows.append(pows[-1] * base % mod)
            self._pows = np.array(pows, dtype=np.uint64)
            self.win_pows = self._pows[:window][::-1].copy()

        def _full(self, b: np.ndarray) -> int:
            n = len(b)
            pw = self._pows
            while len(pw) < n:
                pw = np.append(pw, np.uint64(int(pw[-1]) * base % mod))
            self._pows = pw
            return int(_summod(_mulmod_bytes_pows(b, pw[:n][::-1])))

        def __call__(self, t: pa.Table) -> pa.Table:
            out_d, out_f = [], []
            for d, s in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
                b = np.frombuffer((s or "").encode("utf-8"),
                                  dtype=np.uint8).astype(np.uint64)
                if len(b) == 0:
                    continue
                if len(b) < window:
                    sel = np.array([self._full(b)], np.int64)
                else:
                    wins = np.lib.stride_tricks.sliding_window_view(b, window)
                    hs = _summod(_mulmod_bytes_pows(wins, self.win_pows[None, :]),
                                 axis=1).astype(np.int64)
                    if len(hs) <= guarantee:
                        sel = np.array([hs.min()], np.int64)
                    else:
                        gw = np.lib.stride_tricks.sliding_window_view(hs, guarantee)
                        sel = np.unique(gw.min(axis=1))
                out_d.extend([d] * len(sel))
                out_f.extend(sel.tolist())
            return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                             "fp": pa.array(out_f, pa.int64())})

    return (
        _read_docs(sf_dir)
        .map_batches(Winnow, batch_format="pyarrow", concurrency=pool_size())
        .sort(["doc_id", "fp"])
    )


def keyword_repeat_docs(sf_dir: str, surface_q: str = "value",
                        stem_q: str = "valu") -> ray.data.Dataset:
    """KeywordRepeatFilter + PorterStem + RemoveDuplicates retrieval
    semantics ([U] lucene/analysis/common/.../miscellaneous/
    KeywordRepeatFilter.java): the chain emits BOTH the original surface
    token and its stem at the same position, so an exact query hits
    surface forms and a stem query hits every inflection. Two query
    kinds in one result: docs matching the surface query exactly, and
    docs matching the stem query through either path. One stateless
    pass, zero shuffle."""
    from lucene_solr_ray.analysis import porter_stem, tokenize

    def fn(t: pa.Table) -> pa.Table:
        out_k, out_d = [], []
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            toks = set(tokenize(s or ""))
            emitted = toks | {porter_stem(x) for x in toks}
            if surface_q in emitted:
                out_k.append("surface")
                out_d.append(d)
            if stem_q in emitted:
                out_k.append("stem")
                out_d.append(d)
        return pa.table({"query_kind": pa.array(out_k, pa.string()),
                         "doc_id": pa.array(out_d, pa.int64())})

    return (
        _read_docs(sf_dir)
        .map_batches(fn, batch_format="pyarrow")
        .sort(["query_kind", "doc_id"])
    )


GERMAN_ENDINGS = ("ern", "en", "es", "e")


def german_stem_counts(sf_dir: str, k: int = 20) -> pa.Table:
    """GermanLightStemFilter counts over the deterministically
    German-augmented view of lang='de' docs (the elision-entry
    derivation pattern — the raw corpus has no umlauts or case endings
    by construction): token at position p with (doc_id + p) % 5 == 0 is
    inflected — its FIRST 'a' umlautized to 'ä' and a case ending from
    GERMAN_ENDINGS[p % 4] appended — then every token passes through
    the stemmer and the stem histogram (top-k by count desc, stem asc)
    must land back at exact counts. A broken fold or suffix step shifts
    the histogram."""
    from ray.data.aggregate import Sum

    from lucene_solr_ray.analysis import german_light_stem

    def partials(t: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter()
        for d, s in zip(t.column("doc_id").to_pylist(),
                        t.column("text").to_pylist()):
            toks = _WS.split(s.strip()) if s and s.strip() else []
            for p, tok in enumerate(toks):
                if (int(d) + p) % 5 == 0:
                    tok = tok.replace("a", "ä", 1) + GERMAN_ENDINGS[p % 4]
                c[german_light_stem(tok)] += 1
        return pa.table({"stem": pa.array(list(c), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    out = (
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
        .filter(expr='lang == "de"')
        .map_batches(partials, batch_format="pyarrow")
        .groupby("stem")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out = out.sort_values(["n", "stem"], ascending=[False, True]).head(k)
    return pa.table({
        "stem": pa.array(out["stem"].astype(str), pa.string()),
        "n": pa.array(out["n"].astype(np.int64), pa.int64()),
    })


def _word_counts(sf_dir: str) -> pd.DataFrame:
    """Distributed raw-token histogram (the BPE training input): per-batch
    Counter partials -> groupby-Sum; the result is VOCABULARY-sized, the
    only thing the driver ever holds."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter()
        for s in t.column("text").to_pylist():
            if s and s.strip():
                c.update(s.split())
        return pa.table({"term": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    return (
        _read_docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )


def bpe_pair_counts(sf_dir: str, k: int = 20) -> pa.Table:
    """The first BPE statistic (Sennrich et al. 2016): adjacent-character
    pair frequencies over the corpus, weighted by word frequency — the
    quantity the merge loop maximizes each round. Corpus pass = the
    shared vocabulary-sized word histogram; the pair expansion runs on
    that output-sized table. Top-k by (count desc, pair asc)."""
    from collections import Counter

    wc = _word_counts(sf_dir)
    pc_ = Counter()
    for term, n in zip(wc["term"], wc["n"]):
        for i in range(len(term) - 1):
            pc_[term[i:i + 2]] += int(n)
    rows = sorted(pc_.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table({"pair": pa.array([r[0] for r in rows], pa.string()),
                     "n": pa.array([r[1] for r in rows], pa.int64())})


def bpe_train_merges(sf_dir: str, n_merges: int = 10) -> list[tuple[str, str]]:
    """BPE merge-rule training (Sennrich et al. 2016, learn_bpe): greedy
    best-pair merges over the frequency-weighted vocabulary, ties broken
    (pair_left asc, pair_right asc) for determinism. ONE distributed
    corpus pass (the word histogram); the merge loop itself runs on the
    vocabulary-sized model — exactly the state a 100 TB train would keep
    on the driver. Validated by pytest against a naive re-tokenizing
    reference."""
    from collections import Counter

    wc = _word_counts(sf_dir)
    return bpe_merges_from_counts(
        {str(t): int(n) for t, n in zip(wc["term"], wc["n"])}, n_merges)


def bpe_merges_from_counts(word_counts: dict, n_merges: int) -> list[tuple[str, str]]:
    """The greedy merge loop over an explicit word histogram (shared by
    the frequency-weighted trainer above and the distinct-word-set
    basis bpe_encode_counts uses for scale-invariant encode maps)."""
    from collections import Counter

    vocab = {tuple(term): int(n) for term, n in word_counts.items() if len(term)}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab: dict[tuple, int] = {}
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def bpe_apply(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply trained BPE merge rules IN TRAINING ORDER to one word
    (Sennrich et al. apply_bpe): start from characters, replay each rule
    everywhere it fires. Deterministic by construction."""
    sym = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def bpe_encode_counts(sf_dir: str, n_merges: int = 10, k_out: int = 30) -> pa.Table:
    """BPE ENCODE — the apply side of the train/apply pair: train the
    merge rules, replay them over every distinct word, and emit the
    corpus-weighted subword-token histogram (the 'what does the corpus
    look like under this tokenizer' diagnostic). The merge rules here
    train on the DISTINCT word set (weight 1), making the rule list —
    and every word's encoding — invariant to corpus scale (the unigram
    entry's lesson; frequency-weighted training stays the
    bpe_pair_counts/bpe_train_merges surface); usage counts weight by
    corpus word frequency."""
    from collections import Counter

    wc0 = _word_counts(sf_dir)
    merges = bpe_merges_from_counts({str(t): 1 for t in wc0["term"]}, n_merges)
    wc = _word_counts(sf_dir)
    usage: Counter = Counter()
    for w, n in zip(wc["term"], wc["n"]):
        for piece in bpe_apply(str(w), merges):
            usage[piece] += int(n)
    rows = sorted(usage.items(), key=lambda kv: (-kv[1], kv[0]))[:k_out]
    return pa.table({
        "piece": pa.array([r[0] for r in rows], pa.string()),
        "n_uses": pa.array([r[1] for r in rows], pa.int64()),
    })


def fingerprint_dedup_groups(sf_dir: str, k: int = 20) -> ray.data.Dataset:
    """FingerprintFilter grouping ([U] lucene/analysis/common/.../
    miscellaneous/FingerprintFilter.java as Solr wires it for near-dup
    signatures): one fingerprint token per doc (sorted distinct analyzed
    tokens joined), grouped to (fingerprint hash, n_docs, first doc_id).
    The shuffle key is the md5 hex of the fingerprint, not the
    fingerprint string itself (bounded key bytes at any doc length);
    top-k by (n_docs desc, fp asc)."""
    import hashlib as _hl

    from ray.data.aggregate import Count, Min

    from lucene_solr_ray.analysis import fingerprint_filter, tokenize

    def fp(t: pa.Table) -> pa.Table:
        fps = [
            _hl.md5(fingerprint_filter(tokenize(s or "")).encode()).hexdigest()
            for s in t.column("text").to_pylist()
        ]
        return pa.table({"fp": pa.array(fps, pa.string()),
                         "doc_id": t.column("doc_id")})

    return (
        _read_docs(sf_dir)
        .map_batches(fp, batch_format="pyarrow")
        .groupby("fp")
        .aggregate(Count(alias_name="n_docs"), Min("doc_id", alias_name="first_doc"))
        .sort(["n_docs", "fp"], descending=[True, False])
        .limit(k)
    )


def limit_token_counts(sf_dir: str, limit: int = 10, k: int = 20) -> ray.data.Dataset:
    """LimitTokenCountFilter ([U] lucene/analysis/common/.../
    miscellaneous/LimitTokenCountFilter.java): only the first ``limit``
    tokens of each doc (post-stop chain order) reach the index — the
    truncation knob for huge docs. Output: top-k (term, tf) histogram
    over the truncated stream, (tf desc, term asc)."""
    from ray.data.aggregate import Sum

    from lucene_solr_ray.analysis import tokenize

    def term_partials(t: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter()
        for s in t.column("text").to_pylist():
            c.update(tokenize(s or "")[:limit])
        return pa.table({"term": pa.array(list(c.keys()), pa.string()),
                         "tf": pa.array(list(c.values()), pa.int64())})

    return (
        _read_docs(sf_dir)
        .map_batches(term_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("tf", alias_name="tf_sum"))
        .sort(["tf_sum", "term"], descending=[True, False])
        .limit(k)
    )


def path_hierarchy_counts(sf_dir: str) -> ray.data.Dataset:
    """PathHierarchyTokenizer ([U] lucene/analysis/common/.../path/
    PathHierarchyTokenizer.java) over the synthetic 'lang/source' path of
    every doc: each ancestor prefix is a token ('en', 'en/src3'), so
    the per-token doc counts give the drill-down tree Solr uses it for.
    Vocab-sized partials only."""
    from ray.data.aggregate import Sum

    from lucene_solr_ray.analysis import path_hierarchy_tokenize
    from lucene_solr_ray.io_utils import read_parquet_clean

    def partials(t: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter()
        for lang, src in zip(t.column("lang").to_pylist(), t.column("source").to_pylist()):
            c.update(path_hierarchy_tokenize(f"{lang}/{src}"))
        return pa.table({"path": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    return (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["lang", "source"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("path")
        .aggregate(Sum("n", alias_name="n_docs"))
        .sort("path")
    )


def stemmer_override_counts(sf_dir: str,
                            overrides: dict[str, str] | None = None) -> ray.data.Dataset:
    """StemmerOverrideFilter ([U] lucene/analysis/common/.../
    miscellaneous/StemmerOverrideFilter.java; KeywordMarker when a word
    maps to itself): dictionary-pinned stems bypass Porter — the filter
    every real schema puts BEFORE the stemmer to protect product names.
    Histogram of the overridden chain's stems, sorted by stem."""
    from ray.data.aggregate import Count

    from lucene_solr_ray.analysis import porter_stem, tokenize

    ov = overrides or {"merge": "merge", "filter": "filt3r"}

    def explode(t: pa.Table) -> pa.Table:
        terms = []
        for s in t.column("text").to_pylist():
            terms.extend(ov.get(w, None) or porter_stem(w) for w in tokenize(s or ""))
        return pa.table({"term": pa.array(terms, pa.string())})

    return (
        _read_docs(sf_dir)
        .map_batches(explode, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Count(alias_name="n"))
        .sort("term")
    )


# ---------------- unigram-LM (SentencePiece-style) segmentation ----------------

def _unigram_vocab(wc: pd.DataFrame, max_piece_len: int = 4,
                   top_k: int = 64) -> dict[str, int]:
    """Seed piece vocabulary: every substring of length 1..max_piece_len
    of every corpus word, weighted by word frequency; keep the top_k by
    (total count desc, piece asc) PLUS all single characters (coverage
    guarantee — any word always segments). -> {piece: count}."""
    from collections import Counter

    sub = Counter()
    for w, n in zip(wc["term"], wc["n"]):
        w = str(w)
        for i in range(len(w)):
            for l in range(1, max_piece_len + 1):
                if i + l <= len(w):
                    sub[w[i:i + l]] += int(n)
    singles = {p: c for p, c in sub.items() if len(p) == 1}
    top = dict(sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k])
    top.update(singles)
    return top


def unigram_viterbi(word: str, logp: dict[str, int],
                    max_piece_len: int = 4) -> list[str]:
    """Exact-int Viterbi segmentation (the SentencePiece unigram-LM
    decode, Kudo 2018 "Subword Regularization" eq. 2): maximize the sum
    of micro-nat piece log-probs. Deterministic tie-break: for equal
    scores prefer the SMALLEST split point (longest final piece)."""
    n = len(word)
    NEG = -(1 << 62)
    best = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            p = word[j:i]
            lp = logp.get(p)
            if lp is None or best[j] == NEG:
                continue
            sc = best[j] + lp
            if sc > best[i] or (sc == best[i] and j < back[i]):
                best[i] = sc
                back[i] = j
    out = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    return out[::-1]


def unigram_segment_counts(sf_dir: str, max_piece_len: int = 4,
                           top_k: int = 64, k_out: int = 30) -> pa.Table:
    """SentencePiece-style unigram-LM segmentation over the corpus: seed
    a piece vocabulary from substring frequencies, assign each piece the
    micro-nat log-prob L(count) - L(total) (the per-log quantization
    making every Viterbi score an exact int), Viterbi-decode every
    distinct word, and emit corpus-weighted piece usage counts (one EM
    E-step's sufficient statistics — the M-step would renormalize these
    counts and iterate).

    Scale shape: the corpus pass is the distributed word histogram
    (_word_counts: per-batch Counter partials -> vocab groupby); the
    vocabulary and the Viterbi loop are vocab-sized driver work, the BPE
    training precedent. Piece statistics come from the DISTINCT word set
    (each word weight 1), so the piece table — and with it every word's
    segmentation — is invariant to corpus scale; only the usage counts
    are corpus-weighted."""
    wc = _word_counts(sf_dir)
    wset = wc.copy()
    wset["n"] = 1
    vocab = _unigram_vocab(wset, max_piece_len, top_k)
    total = sum(vocab.values())

    def L(x: int) -> int:
        return int(np.floor(np.log(np.float64(x)) * 1e6 + 0.5))

    lt = L(total)
    logp = {p: L(c) - lt for p, c in vocab.items()}
    from collections import Counter

    usage: Counter = Counter()
    for w, n in zip(wc["term"], wc["n"]):
        for piece in unigram_viterbi(str(w), logp, max_piece_len):
            usage[piece] += int(n)
    rows = sorted(usage.items(), key=lambda kv: (-kv[1], kv[0]))[:k_out]
    return pa.table({
        "piece": pa.array([r[0] for r in rows], pa.string()),
        "n_uses": pa.array([r[1] for r in rows], pa.int64()),
    })


def pmi_term_pairs(sf_dir: str, min_pairs: int = 20, k: int = 20,
                   prune: bool = True, diag: dict | None = None) -> pa.Table:
    """Pointwise mutual information over document-level term
    co-occurrence — the collocation-mining signal (the pairwise cousin
    of significantTerms/SKG relatedness): pmi = ln(N*c(ab)/(c(a)*c(b))),
    kept exact as pmi_micro = L(N*cab) - L(ca*cb) with the per-log
    micro-nat quantization L(x) = floor(ln(x)*1e6 + 0.5) (a difference
    of two quantized logs — order-stable integers, the dsir
    convention). N pins to the documents row count.

    Distributed shape (two passes, the standard collocation prune):
    pass 1 counts per-term dfs (vocab-sized groupby); the driver keeps
    only terms with df >= min_pairs — EXACT by pigeonhole, since
    c(ab) <= min(df_a, df_b), so a pair with a pruned member can never
    reach the min_pairs output threshold — and broadcasts the surviving
    vocabulary as a sorted numpy array (ray.put once, searchsorted
    membership per doc). Pass 2 explodes per-doc DISTINCT unordered
    pairs over SURVIVORS only, with per-batch Counter pre-aggregation
    and ONE pair-domain groupby now bounded by candidates^2 instead of
    vocab^2 (on an open web vocab the unpruned domain is the
    scale-killer; hot terms are few). ``prune=False`` keeps the old
    single-pass shape for the parity pytest. Top-k by (pmi desc, pair
    asc) among pairs with cab >= min_pairs."""
    from collections import Counter

    from ray.data.aggregate import Sum

    from lucene_solr_ray.analysis import tokenize

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["text"])

    cand_ref = None
    n_docs = None
    dfs: dict = {}
    if prune:
        def df_partials(t: pa.Table) -> pa.Table:
            c1: Counter = Counter()
            n = 0
            for s in t.column("text").to_pylist():
                n += 1
                c1.update(set(tokenize(s or "")))
            return pa.table({"term": pa.array(list(c1) + ["\x00N"], pa.string()),
                             "n": pa.array(list(c1.values()) + [n], pa.int64())})

        dfa = (
            ds.map_batches(df_partials, batch_format="pyarrow")
            .groupby("term")
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas()
        )
        n_docs = int(dfa.loc[dfa["term"] == "\x00N", "n"].iloc[0])
        voc = dfa[dfa["term"] != "\x00N"]
        dfs = dict(zip(voc["term"].astype(str), voc["n"].astype(int)))
        cand = np.sort(voc.loc[voc["n"] >= min_pairs, "term"].to_numpy().astype(str))
        if diag is not None:
            diag["n_vocab"] = len(voc)
            diag["n_candidates"] = len(cand)
        cand_ref = ray.put(cand)

    def pair_partials(t: pa.Table) -> pa.Table:
        cp: Counter = Counter()
        c1: Counter = Counter()
        n = 0
        cand = ray.get(cand_ref) if cand_ref is not None else None
        for s in t.column("text").to_pylist():
            n += 1
            ts = sorted(set(tokenize(s or "")))
            if cand is not None:
                arr = np.asarray(ts, dtype=str)
                if len(arr):
                    idx = np.searchsorted(cand, arr)
                    np.minimum(idx, max(0, len(cand) - 1), out=idx)
                    ok = (cand[idx] == arr) if len(cand) else np.zeros(len(arr), bool)
                    ts = [w for w, o in zip(ts, ok) if o]
            else:
                c1.update(ts)
            for i in range(len(ts)):
                for j in range(i + 1, len(ts)):
                    cp[(ts[i], ts[j])] += 1
        rows_a = [p[0] for p in cp] + list(c1) + ["\x00N"]
        rows_b = [p[1] for p in cp] + ["\x00df"] * len(c1) + ["\x00N"]
        rows_n = list(cp.values()) + list(c1.values()) + [n]
        return pa.table({"ta": pa.array(rows_a, pa.string()),
                         "tb": pa.array(rows_b, pa.string()),
                         "n": pa.array(rows_n, pa.int64())})

    agg = (
        ds.map_batches(pair_partials, batch_format="pyarrow")
        .groupby(["ta", "tb"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if not prune:
        n_docs = int(agg.loc[agg["ta"] == "\x00N", "n"].iloc[0])
        dfs = {r["ta"]: int(r["n"]) for _, r in agg[agg["tb"] == "\x00df"].iterrows()}
    pairs = agg[(agg["tb"] != "\x00df") & (agg["ta"] != "\x00N")]

    def L(x: int) -> int:
        return int(np.floor(np.log(np.float64(x)) * 1e6 + 0.5))

    rows = []
    for _, r in pairs.iterrows():
        cab = int(r["n"])
        if cab < min_pairs:
            continue
        ta, tb = str(r["ta"]), str(r["tb"])
        pmi = L(n_docs * cab) - L(dfs[ta] * dfs[tb])
        rows.append((pmi, ta, tb, cab))
    rows.sort(key=lambda x: (-x[0], x[1], x[2]))
    rows = rows[:k]
    return pa.table({
        "term_a": pa.array([r[1] for r in rows], pa.string()),
        "term_b": pa.array([r[2] for r in rows], pa.string()),
        "n_docs_both": pa.array([r[3] for r in rows], pa.int64()),
        "pmi_micro": pa.array([r[0] for r in rows], pa.int64()),
    })


def domain_doc_counts(sf_dir: str,
                      blocklist=("example-2.com", "example-5.com")
                      ) -> pa.Table:
    """URL-domain curation primitive (the domain-blocklist / per-domain
    budget pass of web-corpus curation; the UAX29URLEmail tokenizer's
    [U] lucene/analysis/common/.../standard/UAX29URLEmailTokenizer.java
    URL recognition feeding a per-registered-domain rollup): extract the
    registered domain of each doc's URL over the deterministically
    URL-augmented view (the urlemail derivation pattern — the raw corpus
    carries no URLs by construction), count docs per domain, and flag
    blocklisted domains.

    Distributed shape: stateless per-batch regex extraction with
    map-side Counter partials, ONE domain-sized groupby — at web scale
    the domain cardinality is millions (tiny vs docs) and the blocklist
    broadcast is KB-sized."""
    import re as _re

    from collections import Counter

    from ray.data.aggregate import Sum

    dom_re = _re.compile(r"https://(?:[\w-]+\.)*([\w-]+\.com)")

    def partials(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        texts = t.column("text").to_pylist()
        c: Counter = Counter()
        for d, s in zip(ids, texts):
            aug = f"{s} see https://sub{d % 13}.example-{d % 7}.com/p/{d}"
            m = dom_re.search(aug)
            if m:
                c[m.group(1)] += 1
        return pa.table({"domain": pa.array(list(c), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    agg = (
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("domain")
        .aggregate(Sum("n", alias_name="n_docs"))
        .to_pandas()
        .sort_values("domain")
        .reset_index(drop=True)
    )
    blocked = agg["domain"].isin(set(blocklist)).astype(np.int64)
    return pa.table({
        "domain": pa.array(agg["domain"].astype(str), pa.string()),
        "n_docs": pa.array(agg["n_docs"].astype(np.int64), pa.int64()),
        "blocked": pa.array(blocked.to_numpy(), pa.int64()),
    })

"""Canonical analysis chain: tokenize -> lowercase -> stopword filter.

StandardAnalyzer-equivalent per FIXTURES.md §2. Reference semantics:
- tokenizer ~ Lucene StandardTokenizer (UAX#29 approximation; reference
  [U] lucene/core/.../analysis/standard/StandardTokenizer, maxTokenLength=255)
- LowerCaseFilter ([U] lucene/core/.../analysis/LowerCaseFilter.java)
- StopFilter with EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (33 words,
  [U] lucene/core/.../analysis/en/EnglishAnalyzer.java)

This module is imported by BOTH the engine (inside map_batches UDFs) and the
brute-force oracle, so parity holds by construction.

Document length ``dl`` = number of tokens emitted after the full chain.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np

# Tokens = maximal runs of \w optionally joined by . or ' (FIXTURES.md §2).
TOKEN_RE = re.compile(r"[\w]+(?:[.'][\w]+)*", re.UNICODE)

MAX_TOKEN_LEN = 255  # StandardTokenizer default maxTokenLength

# Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (classic 33-word list).
STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with".split()
)

_UNDERSCORES = frozenset("_")


def tokenize(text: str) -> list[str]:
    """Full canonical chain for one string -> list of emitted tokens."""
    if not text:
        return []
    text = unicodedata.normalize("NFC", text)
    out = []
    for tok in TOKEN_RE.findall(text):
        if len(tok) > MAX_TOKEN_LEN:
            continue
        if not tok.strip("_"):  # pure-underscore token
            continue
        tok = tok.lower()
        if tok in STOPWORDS:
            continue
        out.append(tok)
    return out


def tokenize_with_positions(text: str) -> list[tuple[str, int]]:
    """Canonical chain, keeping token positions. Per Lucene semantics
    (FIXTURES.md §2): stop-filtered tokens still increment the position
    (StopFilter keeps posIncr gaps); tokenizer-level drops (over-length,
    pure-underscore) do not emit a position at all."""
    if not text:
        return []
    text = unicodedata.normalize("NFC", text)
    out = []
    pos = 0
    for tok in TOKEN_RE.findall(text):
        if len(tok) > MAX_TOKEN_LEN:
            continue
        if not (set(tok) - _UNDERSCORES):
            continue
        low = tok.lower()
        if low not in STOPWORDS:
            out.append((low, pos))
        pos += 1  # stopwords leave a gap
    return out


def _token_filters(flat_list):
    """Per-flat-token (low, emits_pos, keep) arrays, computed once per
    DISTINCT raw token (hash factorize) and gathered back through the
    codes — Zipf batches carry ~100x fewer distinct tokens than tokens,
    and the per-token semantics stay the canonical chain's Python
    ``str.lower`` / ``strip('_')`` / length cap / stopword test
    verbatim (bit-identical to the oracle's per-row tokenize)."""
    import pandas as pd

    codes, uniq = pd.factorize(np.asarray(flat_list, dtype=object), sort=False)
    u_low = np.array([t.lower() for t in uniq], dtype=object)
    u_emits = np.fromiter(
        ((len(t) <= MAX_TOKEN_LEN) and t.strip("_") != "" for t in uniq),
        dtype=bool, count=len(uniq),
    )
    u_keep = u_emits & np.fromiter(
        (t not in STOPWORDS for t in u_low), dtype=bool, count=len(uniq)
    )
    return u_low[codes], u_emits[codes], u_keep[codes]


def analyze_texts(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized-ish batch analysis.

    Parameters
    ----------
    texts : iterable of str (or None)

    Returns
    -------
    (row_idx, terms, dl):
      row_idx : int64 array, one entry per emitted token (position order)
      terms   : object array of token strings, parallel to row_idx
      dl      : int64 array, per input row, token count after the chain
    """
    import itertools

    n_rows = len(texts)
    raw_lists = [
        TOKEN_RE.findall(unicodedata.normalize("NFC", t)) if t else [] for t in texts
    ]
    counts = np.fromiter((len(r) for r in raw_lists), dtype=np.int64, count=n_rows)
    if counts.sum() == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=object), np.zeros(n_rows, np.int64)
    # filters are conjunctive, so order doesn't matter; computed per
    # distinct raw token: raw-length cap, pure-underscore drop,
    # lowercase, stopword drop
    low, _, keep = _token_filters(list(itertools.chain.from_iterable(raw_lists)))
    row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), counts)[keep]
    terms = low[keep]
    dl = np.bincount(row_idx, minlength=n_rows).astype(np.int64)
    return row_idx, terms, dl


def batch_term_positions(texts):
    """Like batch_term_counts but also returns the flat positions array:
    (rows, terms, tfs, dl, pos_flat) with one (row, term) entry per
    distinct pair and ``pos_flat`` holding each pair's ascending token
    positions contiguously (pair order == output order).

    Vectorized like ``analyze_texts`` (the positional path used to be a
    per-row/per-token Python loop — every positional build paid it):
    token positions come from a cumulative count of position-emitting
    tokens per row (StopFilter semantics: stopwords increment the
    position but emit nothing; tokenizer-level drops don't increment)."""
    import itertools

    import pandas as pd

    n_rows = len(texts)
    raw_lists = [
        TOKEN_RE.findall(unicodedata.normalize("NFC", t)) if t else [] for t in texts
    ]
    counts = np.fromiter((len(r) for r in raw_lists), dtype=np.int64, count=n_rows)
    empty = (
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=object),
        np.empty(0, dtype=np.int64),
        np.zeros(n_rows, np.int64),
        np.empty(0, dtype=np.int64),
    )
    if counts.sum() == 0:
        return empty
    # position-emitting tokens: pass tokenizer-level filters (length cap,
    # pure-underscore) — stopwords among them take a position slot
    low, emits_pos, keep = _token_filters(list(itertools.chain.from_iterable(raw_lists)))
    row_all = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    # within-row position of each emitting token = #emitting tokens
    # strictly before it in the same row
    before = np.cumsum(emits_pos) - emits_pos  # global count strictly before i
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1]
    # clip: a trailing zero-count row's offset == len(flat); the value is
    # never used (repeat count 0) but the index must stay in bounds
    row_base = np.repeat(before[np.minimum(offsets, len(emits_pos) - 1)], counts)
    pos_all = before - row_base
    row_idx = row_all[keep]
    terms = low[keep]
    pos_emit = pos_all[keep]
    dl = np.bincount(row_idx, minlength=n_rows).astype(np.int64)
    if len(terms) == 0:
        return empty[0], empty[1], empty[2], dl, empty[4]
    codes, uniq_terms = pd.factorize(terms, sort=False)
    uniq_terms = np.asarray(uniq_terms, dtype=object)
    pair_key = row_idx * len(uniq_terms) + codes
    order = np.argsort(pair_key, kind="stable")  # stable: positions stay ascending per pair
    pk_s = pair_key[order]
    starts = np.flatnonzero(np.concatenate([[True], pk_s[1:] != pk_s[:-1]]))
    bounds = np.append(starts, len(pk_s))
    tfs = np.diff(bounds).astype(np.int64)
    out_rows = pk_s[starts] // len(uniq_terms)
    out_codes = pk_s[starts] % len(uniq_terms)
    return out_rows, uniq_terms[out_codes], tfs, dl, pos_emit[order]


def batch_term_counts(texts, analyzer=None) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-(row, term) tf counts for a batch — the map-side combiner.

    Returns (row_idx, terms, tfs, dl): one entry per DISTINCT (row, term)
    pair; ``dl`` per input row. This is the in-RAM postings-hash analogue of
    Lucene's TermsHashPerField ([U] lucene/core/.../index/TermsHashPerField.java),
    expressed as a vectorized unique-count.

    ``analyzer``: a per-text tokenize callable from ANALYZERS (the
    PerFieldAnalyzerWrapper plug point, [U] lucene/analysis/common/.../
    miscellaneous/PerFieldAnalyzerWrapper.java). None/`tokenize` keeps
    the fully-vectorized canonical chain; other analyzers run per text
    and feed the same factorize/count tail.
    """
    if analyzer is not None and analyzer is not tokenize:
        token_lists = [analyzer(t) if t else [] for t in texts]
        counts = np.fromiter((len(r) for r in token_lists), dtype=np.int64,
                             count=len(texts))
        dl = counts.copy()
        if counts.sum() == 0:
            return (np.empty(0, np.int64), np.empty(0, object),
                    np.empty(0, np.int64), dl)
        import itertools

        row_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
        terms = np.array(list(itertools.chain.from_iterable(token_lists)),
                         dtype=object)
    else:
        row_idx, terms, dl = analyze_texts(texts)
    if len(terms) == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=object),
            np.empty(0, dtype=np.int64),
            dl,
        )
    # Factorize terms (hash-based, O(n) — object-string np.unique would
    # pay an O(n log n) string argsort), then count distinct pairs.
    import pandas as pd

    codes, uniq_terms = pd.factorize(terms, sort=False)
    uniq_terms = np.asarray(uniq_terms, dtype=object)
    pair_key = row_idx * len(uniq_terms) + codes
    uniq_pairs, tfs = np.unique(pair_key, return_counts=True)
    out_rows = uniq_pairs // len(uniq_terms)
    out_codes = uniq_pairs % len(uniq_terms)
    return out_rows, uniq_terms[out_codes], tfs.astype(np.int64), dl


def batch_term_vectors(texts):
    """Per-(row, term) entries WITH positions and character offsets — the
    stored-term-vectors producer ([U] lucene/core/.../codecs/lucene50/
    Lucene50TermVectorsFormat stores (term, freq, positions, offsets) per
    doc). Returns (rows, terms, tfs, pos_flat, start_flat, end_flat):
    pair order matches ``batch_term_positions``; the three flat arrays are
    aligned (one entry per token occurrence, ascending position within
    each pair). Offsets index into the NFC-normalized text (the same form
    every chain here tokenizes).
    """
    import itertools

    import pandas as pd

    n_rows = len(texts)
    match_lists = [
        list(TOKEN_RE.finditer(unicodedata.normalize("NFC", t))) if t else []
        for t in texts
    ]
    counts = np.fromiter((len(r) for r in match_lists), dtype=np.int64, count=n_rows)
    empty = (
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=object),
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
    )
    if counts.sum() == 0:
        return empty
    flat = list(itertools.chain.from_iterable(match_lists))
    starts = np.fromiter((m.start() for m in flat), dtype=np.int64, count=len(flat))
    ends = np.fromiter((m.end() for m in flat), dtype=np.int64, count=len(flat))
    low, emits_pos, keep = _token_filters([m.group(0) for m in flat])
    row_all = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
    before = np.cumsum(emits_pos) - emits_pos
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1]
    row_base = np.repeat(before[np.minimum(offsets, len(emits_pos) - 1)], counts)
    pos_all = before - row_base
    row_idx = row_all[keep]
    terms = low[keep]
    pos_emit = pos_all[keep]
    st_emit = starts[keep]
    en_emit = ends[keep]
    if len(terms) == 0:
        return empty
    codes, uniq_terms = pd.factorize(terms, sort=False)
    uniq_terms = np.asarray(uniq_terms, dtype=object)
    pair_key = row_idx * len(uniq_terms) + codes
    order = np.argsort(pair_key, kind="stable")  # stable: occurrences stay ascending
    pk_s = pair_key[order]
    starts_idx = np.flatnonzero(np.concatenate([[True], pk_s[1:] != pk_s[:-1]]))
    bounds = np.append(starts_idx, len(pk_s))
    tfs = np.diff(bounds).astype(np.int64)
    out_rows = pk_s[starts_idx] // len(uniq_terms)
    out_codes = pk_s[starts_idx] % len(uniq_terms)
    return (out_rows, uniq_terms[out_codes], tfs,
            pos_emit[order], st_emit[order], en_emit[order])


# ---------------- Porter stemmer (SURVEY §2.2 stemmers) ----------------
#
# Classic Porter (1980) algorithm, reimplemented from the published
# description ([U] lucene/analysis/common/.../en/PorterStemFilter.java
# wraps the same algorithm; the algorithm itself is public domain).

_VOWELS = frozenset("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in the [C](VC)^m[V] form."""
    m = 0
    i = 0
    n = len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """*o: ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(w: str) -> str:
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and not stem.endswith(("s", "t")):
                    pass
                else:
                    w = stem
            break
    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# ---------------- ASCIIFoldingFilter + token filters (SURVEY §2.2) ----------------

def ascii_fold(token: str) -> str:
    """ASCIIFoldingFilter-lite ([U] lucene/analysis/common/.../
    miscellaneous/ASCIIFoldingFilter.java): NFD-decompose and strip
    combining marks, plus the common ligature/special-letter mappings."""
    special = {"ß": "ss", "æ": "ae", "œ": "oe", "ø": "o", "đ": "d", "ð": "d",
               "þ": "th", "ł": "l", "ħ": "h", "ı": "i", "ŋ": "n"}
    out = []
    for ch in token:
        low = special.get(ch)
        if low is not None:
            out.append(low)
            continue
        decomp = unicodedata.normalize("NFD", ch)
        kept = "".join(c for c in decomp if not unicodedata.combining(c))
        out.append(kept)
    return "".join(out)


def shingle_filter(tokens: list[str], min_size: int = 2, max_size: int = 2,
                   sep: str = " ") -> list[str]:
    """ShingleFilter ([U] lucene/analysis/common/.../shingle/
    ShingleFilter.java): token n-grams, unigrams NOT included."""
    out = []
    for n in range(min_size, max_size + 1):
        out.extend(sep.join(tokens[i : i + n]) for i in range(len(tokens) - n + 1))
    return out


def ngram_filter(tokens: list[str], min_gram: int = 2, max_gram: int = 3) -> list[str]:
    """NGramTokenFilter ([U] lucene/analysis/common/.../ngram/
    NGramTokenFilter.java): character n-grams per token, position order."""
    out = []
    for tok in tokens:
        for n in range(min_gram, max_gram + 1):
            out.extend(tok[i : i + n] for i in range(len(tok) - n + 1))
    return out


def edge_ngram_filter(tokens: list[str], min_gram: int = 2, max_gram: int = 4) -> list[str]:
    """EdgeNGramTokenFilter ([U] lucene/analysis/common/.../ngram/
    EdgeNGramTokenFilter.java): leading-edge prefixes of each token for
    every n in [min_gram, max_gram] with len(token) >= n (no
    preserveOriginal), in position order."""
    out = []
    for tok in tokens:
        out.extend(tok[:n] for n in range(min_gram, max_gram + 1) if len(tok) >= n)
    return out


def length_filter(tokens: list[str], min_len: int = 1, max_len: int = 255) -> list[str]:
    """LengthFilter ([U] lucene/analysis/common/.../miscellaneous/
    LengthFilter.java): keep tokens with min_len <= len <= max_len."""
    return [t for t in tokens if min_len <= len(t) <= max_len]


def trim_filter(tokens: list[str]) -> list[str]:
    """TrimFilter ([U] lucene/analysis/common/.../miscellaneous/
    TrimFilter.java): strip leading/trailing whitespace (meaningful after
    KeywordTokenizer, which preserves interior/edge whitespace)."""
    return [t.strip() for t in tokens]


def delimited_payload_filter(tokens: list[str], delimiter: str = "|",
                             ) -> tuple[list[str], list[int | None]]:
    """DelimitedPayloadTokenFilter ([U] lucene/analysis/common/.../payloads/
    DelimitedPayloadTokenFilter.java, IntegerEncoder): a token may carry a
    trailing ``<delimiter><payload>``; the filter strips the suffix and
    attaches the decoded integer payload to the token's position. Tokens
    without the delimiter pass through with payload None (as in Lucene,
    where the payload attribute is simply absent). Splits on the LAST
    delimiter so token text may itself contain the delimiter char."""
    toks: list[str] = []
    pays: list[int | None] = []
    for tok in tokens:
        head, sep, tail = tok.rpartition(delimiter)
        if sep and tail.lstrip("-").isdigit():
            toks.append(head)
            pays.append(int(tail))
        else:
            toks.append(tok)
            pays.append(None)
    return toks, pays


_WD_SPLIT = re.compile(r"[^0-9A-Za-z]+|(?<=[a-z])(?=[A-Z])|(?<=[A-Za-z])(?=[0-9])|(?<=[0-9])(?=[A-Za-z])")


def word_delimiter_split(token: str) -> list[str]:
    """WordDelimiterGraphFilter core rules ([U] lucene/analysis/common/
    .../miscellaneous/WordDelimiterGraphFilter.java): split on
    non-alphanumerics, case transitions, and letter<->digit boundaries."""
    return [p for p in _WD_SPLIT.split(token) if p]


def synonym_filter(tokens: list[str], mapping: dict[str, list[str]]) -> list[str]:
    """SynonymGraphFilter-lite ([U] lucene/analysis/common/.../synonym/
    SynonymGraphFilter.java): single-token synonyms injected at the same
    position (original kept, like expand=true)."""
    out = []
    for tok in tokens:
        out.append(tok)
        out.extend(mapping.get(tok, ()))
    return out


def synonym_graph_filter(tokens: list[str],
                         rules: dict[tuple[str, ...], list[str]]) -> list[str]:
    """Multi-token synonym matching ([U] lucene/analysis/common/.../
    synonym/SynonymGraphFilter.java + SynonymMap.Builder): rules map an
    input token SEQUENCE to replacement tokens. Matching is greedy
    longest-first at each position (the FST takes the longest arc), the
    matched sequence is REPLACED (keepOrig=false contraction — the n:1
    direction the lite filter can't express), and unmatched tokens pass
    through. Output is a flat token stream, so downstream counting /
    inverted indexing see the contracted vocabulary."""
    if not rules:
        return list(tokens)
    max_len = max(len(k) for k in rules)
    out: list[str] = []
    i = 0
    n = len(tokens)
    while i < n:
        matched = False
        for ln in range(min(max_len, n - i), 0, -1):
            rep = rules.get(tuple(tokens[i:i + ln]))
            if rep is not None:
                out.extend(rep)
                i += ln
                matched = True
                break
        if not matched:
            out.append(tokens[i])
            i += 1
    return out


_CJK_RE = re.compile(r"[぀-ヿ㐀-鿿豈-﫿]+")


def common_grams_filter(tokens, common):
    """CommonGramsFilter ([U] lucene/analysis/common/.../commongrams/
    CommonGramsFilter.java): wherever a bigram touches a common word,
    emit the joined token ``w1_w2`` ALONGSIDE the unigrams — phrase
    queries over stopword-heavy text then match the pre-joined grams
    instead of huge stopword postings. Emission order matches the
    reference stream: each unigram, then the gram starting at it."""
    out = []
    n = len(tokens)
    for i, w in enumerate(tokens):
        out.append(w)
        if i + 1 < n and (w in common or tokens[i + 1] in common):
            out.append(f"{w}_{tokens[i + 1]}")
    return out


def cjk_bigram_tokenize(text: str) -> list[str]:
    """CJKAnalyzer-equivalent ([U] lucene/analysis/common/.../cjk/
    CJKBigramFilter.java): CJK runs emit overlapping character bigrams
    (a lone CJK char emits itself); non-CJK spans go through the
    standard chain."""
    if not text:
        return []
    out = []
    last = 0
    for m in _CJK_RE.finditer(text):
        if m.start() > last:
            out.extend(tokenize(text[last : m.start()]))
        run = m.group()
        if len(run) == 1:
            out.append(run)
        else:
            out.extend(run[i : i + 2] for i in range(len(run) - 1))
        last = m.end()
    out.extend(tokenize(text[last:]))
    return out


def english_tokenize(text: str) -> list[str]:
    """EnglishAnalyzer-equivalent chain: standard chain + PorterStemFilter
    ([U] lucene/core/.../analysis/en/EnglishAnalyzer.java)."""
    return [porter_stem(t) for t in tokenize(text)]


def folding_tokenize(text: str) -> list[str]:
    """Standard chain + ASCIIFoldingFilter applied to each emitted token."""
    return [ascii_fold(t) for t in tokenize(text)]


def icu_fold(token: str) -> str:
    """ICUFoldingFilter-equivalent ([U] lucene/analysis/icu/src/java/org/
    apache/lucene/analysis/icu/ICUFoldingFilter.java — the UTR #30
    foldings most relevant to search), via stdlib unicodedata: NFKC
    compatibility normalization (full-width forms, ligatures, circled
    digits, roman numerals), Unicode case folding (casefold, not lower:
    handles ß->ss, Ǌ->nj), then combining-mark removal under NFD and
    recomposition."""
    import unicodedata

    t = unicodedata.normalize("NFKC", token)
    t = t.casefold()
    t = "".join(
        c for c in unicodedata.normalize("NFD", t) if not unicodedata.combining(c)
    )
    return unicodedata.normalize("NFC", t)


def icu_tokenize(text: str) -> list[str]:
    """ICU analysis chain: ICUNormalizer2CharFilter (NFKC on the raw
    text, so full-width stopwords like ｔｈｅ normalize BEFORE the stop
    filter) + standard chain + ICUFoldingFilter per token."""
    import unicodedata

    out = []
    for t in tokenize(unicodedata.normalize("NFKC", text)):
        f = icu_fold(t)
        if f and f not in STOPWORDS:
            out.append(f)
    return out


# ---------------- PhoneticFilter / Soundex (SURVEY §2.2) ----------------

_SOUNDEX_CODE = {}
for _digit, _letters in (("1", "bfpv"), ("2", "cgjkqsxz"), ("3", "dt"),
                         ("4", "l"), ("5", "mn"), ("6", "r")):
    for _c in _letters:
        _SOUNDEX_CODE[_c] = _digit


def soundex(word: str) -> str:
    """American Soundex ([U] solr's PhoneticFilterFactory with the
    commons-codec Soundex encoder, lucene/analysis/phonetic/.../
    PhoneticFilter.java): consonant classes 1-6; h/w are transparent
    (adjacent same-coded consonants across h/w collapse); vowels break
    adjacency but emit nothing; first letter kept verbatim and its own
    code dropped from the digits — but an initial h/w (which has NO
    code) drops nothing, so Wright->W623 (the h/w-initial case a naive
    head-drop gets wrong). Non-ASCII-alpha chars are treated like
    vowels (adjacency breakers), matching the SQL oracle's ELSE arm.
    Verified against the canonical vectors (Robert->R163, Tymczak->T522,
    Pfister->P236, Wright->W623) in tests/test_analysis.py."""
    if not word:
        return ""
    raw = [_SOUNDEX_CODE.get(ch, "" if ch in "hw" else "v") for ch in word]
    l1 = [c for c in raw if c]  # h/w transparent
    collapsed = [c for i, c in enumerate(l1) if i == 0 or c != l1[i - 1]]
    # drop the first LETTER's (possibly collapsed-into) code — unless the
    # first letter is h/w, which emitted nothing to drop
    tail = collapsed if raw[0] == "" else collapsed[1:]
    digits = [c for c in tail if c != "v"]
    return word[0].upper() + ("".join(digits) + "000")[:3]


def phonetic_tokenize(text: str) -> list[str]:
    """Standard chain + Soundex PhoneticFilter (replace=true: the code
    substitutes the token, as in <filter class="solr.PhoneticFilterFactory"
    encoder="Soundex" inject="false"/>)."""
    return [soundex(t) for t in tokenize(text)]


# commons-codec RefinedSoundex US_ENGLISH mapping, one code per a..z
_REFINED_MAP = "01360240043788015936020505"
_REFINED_CODE = {chr(ord("a") + i): c for i, c in enumerate(_REFINED_MAP)}


def refined_soundex(word: str) -> str:
    """Refined Soundex ([U] solr's PhoneticFilterFactory with the
    commons-codec RefinedSoundex encoder): finer 10-class consonant
    table, vowels code to '0' and are KEPT (unlike classic Soundex's
    silent vowels), only CONSECUTIVE equal codes collapse, no h/w
    transparency, no length cap. Result = first letter verbatim + the
    collapsed code of every char including the first. Non-ASCII-alpha
    chars code to '0' (the vowel class), matching the SQL oracle's
    ELSE arm. Hand-derived vectors from the mapping table
    (merge->M80940, testing->T6036084) pin it in tests."""
    if not word:
        return ""
    codes = [_REFINED_CODE.get(ch, "0") for ch in word]
    collapsed = [c for i, c in enumerate(codes) if i == 0 or c != codes[i - 1]]
    return word[0].upper() + "".join(collapsed)


# ---------------- analyzer registry (SURVEY §2.11 Analyzer SPI) ----------------

def whitespace_tokenize(text: str) -> list[str]:
    """WhitespaceTokenizer ([U] lucene/analysis/common/.../core/
    WhitespaceTokenizer.java): split on whitespace, no lowercase, no stop."""
    return text.split() if text else []


def keyword_tokenize(text: str) -> list[str]:
    """KeywordTokenizer: the whole input as one atomic token."""
    return [text] if text else []


_HTML_TAG_RE = re.compile(r"<[^>]*>")


def html_strip_standard_tokenize(text: str) -> list[str]:
    """HTMLStripCharFilter ([U] lucene/analysis/common/.../charfilter/
    HTMLStripCharFilter.java) pre-pass + the canonical standard chain."""
    return tokenize(_HTML_TAG_RE.sub(" ", text)) if text else []


class MappingCharFilter:
    """[U] lucene/analysis/common/.../charfilter/MappingCharFilter.java:
    greedy longest-match character-sequence replacement applied BEFORE
    tokenization. One compiled alternation (longest keys first — Lucene's
    FST picks the longest match the same way); state built once, so the
    instance is safe to hold in a per-actor analyzer chain."""

    def __init__(self, mappings: dict[str, str]):
        self.mappings = dict(mappings)
        keys = sorted(self.mappings, key=len, reverse=True)
        self._re = re.compile("|".join(re.escape(k) for k in keys)) if keys else None

    def __call__(self, text: str) -> str:
        if not text or self._re is None:
            return text or ""
        return self._re.sub(lambda m: self.mappings[m.group(0)], text)


class PatternReplaceCharFilter:
    """[U] lucene/analysis/common/.../pattern/PatternReplaceCharFilter.java:
    regex replacement over the raw character stream before the tokenizer."""

    def __init__(self, pattern: str, replacement: str):
        self._re = re.compile(pattern)
        self.replacement = replacement

    def __call__(self, text: str) -> str:
        return self._re.sub(self.replacement, text) if text else ""


def char_filtered_tokenize(char_filters, tokenizer=None):
    """Compose char filters (applied in order) in front of a token chain —
    the CharFilter slot of Lucene's Analyzer contract."""
    tok = tokenizer or tokenize

    def fn(text: str) -> list[str]:
        for f in char_filters:
            text = f(text)
        return tok(text)

    return fn


# ---------------- Japanese morphological analysis (SURVEY §2.2) ----------------
# Kuromoji's mechanism, reduced ([U] lucene/analysis/kuromoji/...
# /JapaneseTokenizer.java): a Viterbi search over a word lattice built
# from a dictionary plus unknown-word character-class rules. Reductions:
# a pinned embedded lexicon instead of mecab-ipadic, and a flat
# connection model (uniform per-word costs by entry class instead of the
# left/right connection matrix). Costs: dictionary word 1.0, unknown
# katakana run 1.5, unknown single char 2.5 — so the minimum-cost path
# prefers fewest tokens, resolving 日本語 as one word (1.0) over
# 日本+語 (1.0 + 2.5) the way dictionary segmentation should.

_JA_STOP = frozenset(
    "は が を に で と も の へ や から まで より".split()
)

_JA_LEXICON = frozenset(
    """
    私 彼 彼女 友達 先生 学生 学校 大学 会社 図書館 本 駅 電車 映画 音楽 料理 寿司
    東京 京都 日本 日本語 言語 自然 処理 形態素 解析 検索 索引 文書 情報 技術
    研究 開発 勉強 旅行 今日 明日 昨日 天気 時間 良い 新しい
    する します した です ます 行く 行き 食べる 食べ 読む 読み
    は が を に で と も の へ や から まで より
    """.split()
)

_JA_MAXLEN = max(map(len, _JA_LEXICON))


def _is_katakana(ch: str) -> bool:
    return "ァ" <= ch <= "ヺ" or ch == "ー"  # ァ..ヺ + ー


def _lattice_segment(run: str, lexicon: frozenset, maxlen: int) -> list[str]:
    """Minimum-cost Viterbi segmentation of one CJK run over a pinned
    lexicon — the shared mechanism behind the ja (kuromoji-style) and zh
    (smartcn-role, dictionary-DP) chains. Deterministic tie-break: equal
    cost prefers the longer final token. The katakana unknown-word rule
    only fires on katakana codepoints, so it is a no-op for Chinese."""
    n = len(run)
    inf = float("inf")
    # best[j] = (cost, start_of_last_token, last_token)
    best: list[tuple[float, int, str]] = [(inf, -1, "")] * (n + 1)
    best[0] = (0.0, -1, "")

    def relax(j: int, cand: tuple[float, int, str]) -> None:
        cur = best[j]
        if cand[0] < cur[0] or (cand[0] == cur[0] and len(cand[2]) > len(cur[2])):
            best[j] = cand

    for i in range(n):
        ci = best[i][0]
        if ci == inf:
            continue
        for length in range(1, min(maxlen, n - i) + 1):
            w = run[i : i + length]
            if w in lexicon:
                relax(i + length, (ci + 1.0, i, w))
        if _is_katakana(run[i]):
            # unknown-word rule: a maximal katakana run is one token
            j = i
            while j < n and _is_katakana(run[j]):
                j += 1
            relax(j, (ci + 1.5, i, run[i:j]))
        relax(i + 1, (ci + 2.5, i, run[i]))  # unknown single char
    out = []
    j = n
    while j > 0:
        _, i, w = best[j]
        out.append(w)
        j = i
    out.reverse()
    return out


def _ja_lattice_segment(run: str) -> list[str]:
    return _lattice_segment(run, _JA_LEXICON, _JA_MAXLEN)


def japanese_tokenize(text: str) -> list[str]:
    """JapaneseAnalyzer-equivalent chain: CJK runs are lattice-segmented
    over the pinned lexicon with particle stop-filtering (the analyzer's
    stoptags/stopword role); non-CJK spans go through the standard
    chain. Degenerates to the standard chain on CJK-free text."""
    if not text:
        return []
    out: list[str] = []
    last = 0
    for m in _CJK_RE.finditer(text):
        if m.start() > last:
            out.extend(tokenize(text[last : m.start()]))
        out.extend(w for w in _ja_lattice_segment(m.group()) if w not in _JA_STOP)
        last = m.end()
    out.extend(tokenize(text[last:]))
    return out


# Chinese word segmentation ([U] lucene/analysis/smartcn/ fills this
# role upstream via an HMM; the public dictionary-DP formulation — a DAG
# of lexicon matches + min-cost dynamic programming, the jieba shape —
# uses the same lattice machinery as the ja chain).
_ZH_STOP = frozenset("的 了 是 在 和 有 我 你 他 她 它 吗 呢 也 都".split())

_ZH_LEXICON = frozenset(
    """
    中文 分词 搜索 引擎 索引 文档 信息 检索 自然 语言 处理 机器 学习 数据
    我们 他们 今天 明天 昨天 天气 很好 北京 上海 大学 学生 老师 公司
    电脑 手机 喜欢 工作 时间 问题 研究 开发 技术
    的 了 是 在 和 有 我 你 他 她 它 吗 呢 也 都
    """.split()
)

_ZH_MAXLEN = max(map(len, _ZH_LEXICON))


def chinese_tokenize(text: str) -> list[str]:
    """SmartChineseAnalyzer-equivalent chain (reduced): CJK runs are
    lattice-segmented over the pinned zh lexicon with function-word stop
    filtering; non-CJK spans run the standard chain."""
    if not text:
        return []
    out: list[str] = []
    last = 0
    for m in _CJK_RE.finditer(text):
        if m.start() > last:
            out.extend(tokenize(text[last : m.start()]))
        out.extend(
            w for w in _lattice_segment(m.group(), _ZH_LEXICON, _ZH_MAXLEN)
            if w not in _ZH_STOP
        )
        last = m.end()
    out.extend(tokenize(text[last:]))
    return out


# ---------------- Korean morphological analysis (SURVEY §2.2) ----------------
# Nori's mechanism, reduced ([U] lucene/analysis/nori/.../
# KoreanTokenizer.java + KoreanPartOfSpeechStopFilter.java): Viterbi over
# a dictionary lattice (mecab-ko-dic upstream), POS-driven stop filtering
# (particles/josa and verbal endings/eomi are discarded the way the
# stop-tag set drops J*/E* tags), and decompounding expressed through
# lexicon granularity — compound PARTS are entries, the compound is not,
# so the min-cost path splits 자연어처리 -> 자연어+처리 (nori's
# DECOMPOUND mode). Unknown syllables fall back to single-char tokens
# (cost 2.5), the same reduction the ja chain documents.

_HANGUL_RE = re.compile(r"[가-힣]+")

_KO_PARTICLES = frozenset(
    "은 는 이 가 을 를 에 에서 의 와 과 도 로 으로 부터 까지 에게 한테 보다".split()
)
_KO_ENDINGS = frozenset("하다 한다 합니다 했다 입니다 이다 습니다".split())
_KO_STOP = _KO_PARTICLES | _KO_ENDINGS

_KO_LEXICON = frozenset(
    """
    나 너 우리 그녀 친구 선생님 학생 학교 대학 대학교 회사 도서관 책 역 기차
    영화 음악 요리 서울 부산 한국 한국어 언어 자연 자연어 처리 형태소 분석
    검색 색인 문서 정보 기술 연구 개발 공부 여행 감상 김치 오늘 내일 어제
    날씨 시간 좋다 먹다 읽다
    """.split()
) | _KO_STOP

_KO_MAXLEN = max(map(len, _KO_LEXICON))


def korean_tokenize(text: str) -> list[str]:
    """KoreanAnalyzer-equivalent chain (nori mechanism, reduced): hangul
    runs are lattice-segmented over the pinned lexicon, then particles
    and verbal endings are stop-filtered (the KoreanPartOfSpeechStopFilter
    role). Non-hangul spans run the CJK-bigram chain, so hanja/kana runs
    in Korean text keep bigram recall (nori's hanja reading role) and
    plain text degenerates to the standard chain."""
    if not text:
        return []
    out: list[str] = []
    last = 0
    for m in _HANGUL_RE.finditer(text):
        if m.start() > last:
            out.extend(cjk_bigram_tokenize(text[last : m.start()]))
        out.extend(
            w for w in _lattice_segment(m.group(), _KO_LEXICON, _KO_MAXLEN)
            if w not in _KO_STOP
        )
        last = m.end()
    out.extend(cjk_bigram_tokenize(text[last:]))
    return out


# per-language analyzer dispatch (lang_id output routes each doc to its
# language's chain — ja, zh and ko get dictionary segmentation; other
# CJK-tagged docs keep the bigram chain; the canonical standard chain
# otherwise)
CJK_LANGS = frozenset({"zh", "ja", "ko"})


def analyzer_for_lang(lang: str):
    if lang == "ja":
        return japanese_tokenize
    if lang == "zh":
        return chinese_tokenize
    if lang == "ko":
        return korean_tokenize
    return cjk_bigram_tokenize if lang in CJK_LANGS else tokenize


ANALYZERS = {
    "standard": tokenize,          # the parity-pinned canonical chain
    "whitespace": whitespace_tokenize,
    "keyword": keyword_tokenize,
    "html_standard": html_strip_standard_tokenize,
    "english": english_tokenize,   # standard + Porter stem
    "folding": folding_tokenize,   # standard + ASCII folding
    "icu_folding": icu_tokenize,   # NFKC char filter + ICU folding filter
    "phonetic": phonetic_tokenize,  # standard + Soundex PhoneticFilter
    "cjk": cjk_bigram_tokenize,    # CJK bigrams + standard for non-CJK
    "japanese": japanese_tokenize,  # kuromoji-mechanism lattice morphology
    "chinese": chinese_tokenize,    # smartcn-role dictionary-DP segmentation
    "korean": korean_tokenize,      # nori-mechanism lattice + josa/eomi stops
    # canned char-filtered chains (the configurable path is
    # char_filtered_tokenize([MappingCharFilter(...), ...]))
    "quote_mapping_standard": char_filtered_tokenize(
        [MappingCharFilter({"‘": "'", "’": "'", "“": '"', "”": '"'})]
    ),
    "nodigits_standard": char_filtered_tokenize(
        [PatternReplaceCharFilter(r"\d+", " ")]
    ),
}


def get_analyzer(name: str):
    try:
        return ANALYZERS[name]
    except KeyError:
        raise ValueError(f"unknown analyzer {name!r}; known: {sorted(ANALYZERS)}")


def german_light_stem(token: str) -> str:
    """GermanLightStemFilter ([U] lucene/analysis/common/.../de/
    GermanLightStemmer.java — Savoy's light German stemmer): fold
    umlauts/accents to base vowels, then two suffix-stripping steps
    (-ern / -e[mnrs] / -e / -s-after-consonant, then -est / -e[rn] /
    -st-after-consonant). Case endings and plurals collapse; short
    tokens pass through."""
    s = list(token)
    fold = {"ä": "a", "à": "a", "á": "a", "â": "a",
            "ö": "o", "ò": "o", "ó": "o", "ô": "o",
            "ï": "i", "ì": "i", "í": "i", "î": "i",
            "ü": "u", "ù": "u", "ú": "u", "û": "u",
            "ß": "ss"}
    s = list("".join(fold.get(c, c) for c in s))

    def st_ending(ch: str) -> bool:
        return ch in "bdfghklmnt"

    n = len(s)
    # step 1
    if n > 5 and s[n - 3] == "e" and s[n - 2] == "r" and s[n - 1] == "n":
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in "mnrs":
        n -= 2
    elif n > 3 and s[n - 1] == "e":
        n -= 1
    elif n > 3 and s[n - 1] == "s" and st_ending(s[n - 2]):
        n -= 1
    # step 2
    if n > 5 and s[n - 3] == "e" and s[n - 2] == "s" and s[n - 1] == "t":
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in "rn":
        n -= 2
    elif n > 5 and s[n - 2] == "s" and s[n - 1] == "t" and st_ending(s[n - 3]):
        n -= 2
    return "".join(s[:n])


# FrenchAnalyzer's default elidable articles ([U] lucene/analysis/common/
# .../fr/FrenchAnalyzer.java DEFAULT_ARTICLES)
FRENCH_ARTICLES = frozenset(
    ["l", "m", "t", "qu", "n", "s", "j", "d", "c", "jusqu", "quoiqu",
     "lorsqu", "puisqu"])


def elision_filter(tokens: list[str]) -> list[str]:
    """ElisionFilter ([U] lucene/analysis/common/.../util/
    ElisionFilter.java): strip a leading "<article>'" from each token
    when the prefix is an elidable French article — "l'avenir" ->
    "avenir". Non-article apostrophe prefixes pass through unchanged."""
    out = []
    for t in tokens:
        head, ap, rest = t.partition("'")
        if ap and rest and head.lower() in FRENCH_ARTICLES:
            out.append(rest)
        else:
            out.append(t)
    return out


def fingerprint_filter(tokens: list[str], separator: str = " ") -> str:
    """FingerprintFilter ([U] lucene/analysis/common/.../miscellaneous/
    FingerprintFilter.java, Solr's FingerprintFilterFactory): collapse
    the whole token stream into ONE normalized token — the sorted
    distinct tokens joined by the separator. Equal fingerprints mean
    equal token SETS, the clustering/dedup key OpenRefine popularized."""
    return separator.join(sorted(set(tokens)))


def path_hierarchy_tokenize(path: str, delimiter: str = "/") -> list[str]:
    """PathHierarchyTokenizer ([U] lucene/analysis/common/.../path/
    PathHierarchyTokenizer.java): emit every ancestor prefix of a
    delimited path — 'a/b/c' -> ['a', 'a/b', 'a/b/c'] — so a filter on
    any ancestor matches all descendants."""
    parts = [p for p in path.split(delimiter) if p != ""]
    return [delimiter.join(parts[: i + 1]) for i in range(len(parts))]

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

    import pandas as pd

    n_rows = len(texts)
    raw_lists = [
        TOKEN_RE.findall(unicodedata.normalize("NFC", t)) if t else [] for t in texts
    ]
    counts = np.fromiter((len(r) for r in raw_lists), dtype=np.int64, count=n_rows)
    if counts.sum() == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=object), np.zeros(n_rows, np.int64)
    flat = pd.Series(list(itertools.chain.from_iterable(raw_lists)), dtype=object)
    # filters are conjunctive, so order doesn't matter; all vectorized:
    # raw-length cap, pure-underscore drop, lowercase, stopword drop
    low = flat.str.lower()
    keep = (
        (flat.str.len() <= MAX_TOKEN_LEN)
        & (flat.str.strip("_") != "")
        & ~low.isin(STOPWORDS)
    ).to_numpy()
    row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), counts)[keep]
    terms = low.to_numpy()[keep]
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
    flat = pd.Series(list(itertools.chain.from_iterable(raw_lists)), dtype=object)
    low = flat.str.lower()
    # position-emitting tokens: pass tokenizer-level filters (length cap,
    # pure-underscore) — stopwords among them take a position slot
    emits_pos = ((flat.str.len() <= MAX_TOKEN_LEN) & (flat.str.strip("_") != "")).to_numpy()
    keep = emits_pos & ~low.isin(STOPWORDS).to_numpy()
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
    terms = low.to_numpy()[keep]
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


def batch_term_counts(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-(row, term) tf counts for a batch — the map-side combiner.

    Returns (row_idx, terms, tfs, dl): one entry per DISTINCT (row, term)
    pair; ``dl`` per input row. This is the in-RAM postings-hash analogue of
    Lucene's TermsHashPerField ([U] lucene/core/.../index/TermsHashPerField.java),
    expressed as a vectorized unique-count.
    """
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


ANALYZERS = {
    "standard": tokenize,          # the parity-pinned canonical chain
    "whitespace": whitespace_tokenize,
    "keyword": keyword_tokenize,
    "html_standard": html_strip_standard_tokenize,
}


def get_analyzer(name: str):
    try:
        return ANALYZERS[name]
    except KeyError:
        raise ValueError(f"unknown analyzer {name!r}; known: {sorted(ANALYZERS)}")

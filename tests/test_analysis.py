import numpy as np

from lucene_solr_ray.analysis import MAX_TOKEN_LEN, STOPWORDS, analyze_texts, batch_term_counts, tokenize


def test_basic_chain():
    assert tokenize("The quick brown Fox!") == ["quick", "brown", "fox"]


def test_stopwords_all_dropped():
    assert tokenize(" ".join(sorted(STOPWORDS))) == []
    assert len(STOPWORDS) == 33


def test_case_and_unicode():
    assert tokenize("Café NAÏVE") == ["café", "naïve"]
    assert tokenize("東京 Ω") == ["東京", "ω"]


def test_apostrophe_and_dot_joins():
    assert tokenize("don't stop O'Neil v1.2.3") == ["don't", "stop", "o'neil", "v1.2.3"]


def test_underscore_and_long_tokens():
    assert tokenize("___ a_b") == ["a_b"]
    long_tok = "x" * (MAX_TOKEN_LEN + 1)
    assert tokenize(f"{long_tok} ok") == ["ok"]
    assert tokenize("y" * MAX_TOKEN_LEN) == ["y" * MAX_TOKEN_LEN]


def test_empty_and_none():
    row_idx, terms, dl = analyze_texts(["", None, "one two"])
    assert dl.tolist() == [0, 0, 2]
    assert row_idx.tolist() == [2, 2]
    assert list(terms) == ["one", "two"]


def test_batch_term_counts_combiner():
    rows, terms, tfs, dl = batch_term_counts(["bb aa bb bb", "aa cc"])
    got = sorted(zip(rows.tolist(), terms.tolist(), tfs.tolist()))
    assert got == [(0, "aa", 1), (0, "bb", 3), (1, "aa", 1), (1, "cc", 1)]
    assert dl.tolist() == [4, 2]


def test_nfc_normalization():
    # decomposed e + combining acute must equal precomposed é
    assert tokenize("café") == tokenize("café") == ["café"]

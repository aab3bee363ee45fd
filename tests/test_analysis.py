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


def test_porter_stemmer_vectors():
    """Classic Porter algorithm vectors (full-algorithm outputs)."""
    from lucene_solr_ray.analysis import porter_stem

    vec = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
        "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration", "digitizer": "digit",
        "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
        "hopefulness": "hope", "callousness": "callous", "formaliti": "formal",
        "sensitiviti": "sensit", "sensibiliti": "sensibl", "triplicate": "triplic",
        "formative": "form", "formalize": "formal", "electriciti": "electr",
        "electrical": "electr", "hopeful": "hope", "goodness": "good",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
        "defensible": "defens", "irritant": "irrit", "replacement": "replac",
        "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
        "communism": "commun", "activate": "activ", "angulariti": "angular",
        "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
        "probate": "probat", "rate": "rate", "cease": "ceas", "controll": "control",
        "roll": "roll", "generalization": "gener", "oscillators": "oscil",
    }
    bad = {w: (porter_stem(w), e) for w, e in vec.items() if porter_stem(w) != e}
    assert not bad, bad


def test_ascii_folding():
    from lucene_solr_ray.analysis import ascii_fold, folding_tokenize

    assert ascii_fold("café") == "cafe"
    assert ascii_fold("naïve") == "naive"
    assert ascii_fold("Über") == "Uber"
    assert ascii_fold("straße") == "strasse"
    assert ascii_fold("œuvre") == "oeuvre"
    assert ascii_fold("plain") == "plain"
    assert folding_tokenize("Café naïve THE") == ["café".replace("é", "e"), "naive"]


def test_token_filters():
    from lucene_solr_ray.analysis import (
        ngram_filter,
        shingle_filter,
        synonym_filter,
        word_delimiter_split,
    )

    assert shingle_filter(["a", "b", "c"]) == ["a b", "b c"]
    assert shingle_filter(["a", "b", "c"], 2, 3) == ["a b", "b c", "a b c"]
    assert ngram_filter(["abcd"], 2, 3) == ["ab", "bc", "cd", "abc", "bcd"]
    assert word_delimiter_split("PowerShot500-XL") == ["Power", "Shot", "500", "XL"]
    assert word_delimiter_split("wi-fi") == ["wi", "fi"]
    assert synonym_filter(["fast", "car"], {"fast": ["quick"]}) == ["fast", "quick", "car"]


def test_english_analyzer_registered():
    from lucene_solr_ray.analysis import get_analyzer

    en = get_analyzer("english")
    assert en("merging the merges") == ["merg", "merg"]


def test_mapping_char_filter_longest_match():
    from lucene_solr_ray.analysis import MappingCharFilter, char_filtered_tokenize

    f = MappingCharFilter({"ab": "X", "abc": "Y", "’": "'"})
    assert f("abc ab a’b") == "Y X a'b"  # longest key wins, like Lucene's FST
    chain = char_filtered_tokenize([MappingCharFilter({"window": "pane"})])
    assert chain("the window merge") == ["pane", "merge"]  # stopword still dropped


def test_pattern_replace_char_filter():
    from lucene_solr_ray.analysis import PatternReplaceCharFilter, char_filtered_tokenize

    chain = char_filtered_tokenize([PatternReplaceCharFilter(r"\bmerge\b", "combine")])
    assert chain("merge merged merge") == ["combine", "merged", "combine"]
    assert chain("") == []


def test_char_filters_compose_in_order():
    from lucene_solr_ray.analysis import (MappingCharFilter, PatternReplaceCharFilter,
                                          char_filtered_tokenize)

    chain = char_filtered_tokenize([
        PatternReplaceCharFilter(r"\d+", "merge"),
        MappingCharFilter({"merge": "join"}),  # sees the pattern's output
    ])
    assert chain("42 stream") == ["join", "stream"]


def test_lang_routed_analyzer_cjk():
    from lucene_solr_ray.analysis import analyzer_for_lang

    # ko routes to the nori-mechanism lattice; hanja (non-hangul CJK)
    # runs keep bigram recall inside the ko chain
    assert analyzer_for_lang("ko")("中文分析 merge") == [
        "中文", "文分", "分析", "merge"]
    assert analyzer_for_lang("ko")("한국어를 검색") == ["한국어", "검색"]
    # zh routes to dictionary segmentation: lexicon words split at word
    # boundaries, out-of-vocabulary chars fall back to singles
    assert analyzer_for_lang("zh")("中文分词 merge") == ["中文", "分词", "merge"]
    # the standard chain treats the CJK run as ONE \w token; the routed
    # chain segments it — the dispatch is observable
    assert analyzer_for_lang("en")("中文分析 merge") == ["中文分析", "merge"]
    assert analyzer_for_lang("en")("the merge") == ["merge"]
    from lucene_solr_ray.analysis import get_analyzer

    assert get_analyzer("quote_mapping_standard")("it’s fine") == ["it's", "fine"]
    assert get_analyzer("nodigits_standard")("ab12cd 7 merge") == ["ab", "cd", "merge"]


def test_synonym_graph_filter_multi_token():
    """Multi-token (n:1) synonym contraction: greedy longest-first at
    each position, matched sequence replaced, left-to-right non-overlap
    — the FST semantics of SynonymGraphFilter's contraction direction."""
    from lucene_solr_ray.analysis import synonym_graph_filter

    rules = {("a", "b"): ["ab"], ("a", "b", "c"): ["abc"], ("x",): ["y", "z"]}
    # longest-first: a b c -> abc, not (ab, c)
    assert synonym_graph_filter(["a", "b", "c"], rules) == ["abc"]
    # left-to-right non-overlap: a b a b -> ab ab
    assert synonym_graph_filter(["a", "b", "a", "b"], rules) == ["ab", "ab"]
    # partial tail: a b a -> ab a (second 'a' has no 'b' after)
    assert synonym_graph_filter(["a", "b", "a"], rules) == ["ab", "a"]
    # 1:n expansion and pass-through
    assert synonym_graph_filter(["q", "x", "q"], rules) == ["q", "y", "z", "q"]
    assert synonym_graph_filter([], rules) == []
    assert synonym_graph_filter(["a"], {}) == ["a"]


def test_common_grams_filter():
    from lucene_solr_ray.analysis import common_grams_filter

    out = common_grams_filter(["the", "quick", "fox"], {"the"})
    assert out == ["the", "the_quick", "quick", "fox"]
    # gram when the SECOND word is common; trailing common word emits none
    assert common_grams_filter(["fast", "a", "fox", "a"], {"a"}) == [
        "fast", "fast_a", "a", "a_fox", "fox", "fox_a", "a"]
    assert common_grams_filter([], {"a"}) == []
    assert common_grams_filter(["x"], {"a"}) == ["x"]


def test_soundex_canonical_vectors():
    """American Soundex against the canonical published vectors (the
    engine fn and the DuckDB oracle implement the identical algorithm;
    phonetic_term_groups' gate entry proves the SQL side)."""
    from lucene_solr_ray.analysis import phonetic_tokenize, soundex

    vectors = {
        "robert": "R163", "rupert": "R163", "ashcraft": "A261",
        "ashcroft": "A261", "tymczak": "T522", "pfister": "P236",
        "honeyman": "H555", "jackson": "J250", "washington": "W252",
        "lee": "L000", "gutierrez": "G362", "wheaton": "W350",
        # h/w-initial followed by a consonant: the first letter emitted
        # no code, so the first CONSONANT's code must survive
        "wright": "W623", "write": "W630", "hrothgar": "H632",
    }
    for w, code in vectors.items():
        assert soundex(w) == code, w
    # standard chain feeds the filter: stopwords never reach the encoder
    assert phonetic_tokenize("the robert and rupert") == ["R163", "R163"]


def test_delimited_payload_filter():
    from lucene_solr_ray.analysis import delimited_payload_filter

    toks, pays = delimited_payload_filter(["merge|3", "plain", "a|b|7", "x|-2", "odd|"])
    assert toks == ["merge", "plain", "a|b", "x", "odd|"]
    assert pays == [3, None, 7, -2, None]
    # custom delimiter
    toks, pays = delimited_payload_filter(["merge#4"], delimiter="#")
    assert (toks, pays) == (["merge"], [4])


def test_edge_ngram_length_trim_filters():
    from lucene_solr_ray.analysis import edge_ngram_filter, length_filter, trim_filter

    assert edge_ngram_filter(["merge"], 2, 4) == ["me", "mer", "merg"]
    assert edge_ngram_filter(["ab"], 2, 4) == ["ab"]          # len < n grams skipped
    assert edge_ngram_filter(["a"], 2, 4) == []
    assert edge_ngram_filter(["sort", "x"], 1, 2) == ["s", "so", "x"]
    assert length_filter(["a", "ab", "abc", "abcd"], 2, 3) == ["ab", "abc"]
    assert trim_filter(["  a b  ", "c", " "]) == ["a b", "c", ""]


def test_refined_soundex_vectors():
    """Hand-derived from the commons-codec US_ENGLISH mapping table
    '01360240043788015936020505' (a..z): vowels keep '0', consecutive
    equal codes collapse, first letter verbatim + every code."""
    from lucene_solr_ray.analysis import refined_soundex

    assert refined_soundex("merge") == "M80940"      # m8 e0 r9 g4 e0
    assert refined_soundex("testing") == "T6036084"  # t6 e0 s3 t6 i0 n8 g4
    assert refined_soundex("scan") == "S308"         # s3 c3(collapse) a0 n8
    assert refined_soundex("bb") == "B1"             # consecutive collapse
    assert refined_soundex("") == ""


def test_japanese_lattice_morphology_gold():
    """Hand-specified gold segmentations for the kuromoji-mechanism
    lattice (dictionary Viterbi + unknown-word rules + particle stop
    filter), on sentences where the bigram chain disagrees."""
    from lucene_solr_ray.analysis import (
        analyzer_for_lang, cjk_bigram_tokenize, japanese_tokenize)

    gold = [
        # dictionary compounds split at word boundaries, particles drop
        ("私は東京大学で自然言語処理を研究する",
         ["私", "東京", "大学", "自然", "言語", "処理", "研究", "する"]),
        ("今日は良い天気です", ["今日", "良い", "天気", "です"]),
        ("形態素解析の検索索引", ["形態素", "解析", "検索", "索引"]),
        # unknown-word rule: maximal katakana runs are single tokens
        ("彼女はカタカナのテキストを読む",
         ["彼女", "カタカナ", "テキスト", "読む"]),
        ("東京で寿司を食べる", ["東京", "寿司", "食べる"]),
        # unknown kanji falls back to a single-char token
        ("鰯を食べる", ["鰯", "食べる"]),
        # longest-match disambiguation: 日本語 (one entry) beats 日本+語
        ("日本語の勉強をします", ["日本語", "勉強", "します"]),
        ("駅から大学まで電車で行きます",
         ["駅", "大学", "電車", "行き", "ます"]),
        # mixed script: non-CJK spans run the standard chain
        ("BM25で日本語を検索する", ["bm25", "日本語", "検索", "する"]),
    ]
    for text, want in gold:
        got = japanese_tokenize(text)
        assert got == want, f"{text!r}: {got} != {want}"
        # the dispatch routes ja to morphology
        assert analyzer_for_lang("ja")(text) == want
        assert got != cjk_bigram_tokenize(text)  # genuinely different
    # CJK-free text degenerates to the standard chain (oracle invariant)
    from lucene_solr_ray.analysis import tokenize
    s = "the quick merge of Streams 42"
    assert japanese_tokenize(s) == tokenize(s)


def test_korean_lattice_morphology_gold():
    """Hand-specified gold segmentations for the nori-mechanism lattice
    (dictionary Viterbi + josa/eomi stop filtering + decompounding via
    lexicon granularity)."""
    from lucene_solr_ray.analysis import (
        analyzer_for_lang, cjk_bigram_tokenize, korean_tokenize, tokenize)

    gold = [
        # particles (josa) and verbal endings (eomi) are stop-filtered
        ("나는 학교에서 한국어를 공부한다", ["나", "학교", "한국어", "공부"]),
        ("오늘은 날씨가 좋다", ["오늘", "날씨", "좋다"]),
        # decompound: 자연어처리 has no lexicon entry, its parts do
        ("자연어처리를 연구합니다", ["자연어", "처리", "연구"]),
        ("나는 서울에서 친구와 영화를 감상한다",
         ["나", "서울", "친구", "영화", "감상"]),
        # longest match: 대학교 (one entry) beats 대학+교
        ("한국 대학교 학생입니다", ["한국", "대학교", "학생"]),
        # mixed script: non-hangul spans run the standard chain
        ("BM25로 한국어를 검색한다", ["bm25", "한국어", "검색"]),
        # unknown word falls back to single-char tokens
        ("비빔밥을 먹다", ["비", "빔", "밥", "먹다"]),
        ("정보 검색 기술을 개발한다", ["정보", "검색", "기술", "개발"]),
        ("그녀는 도서관에서 책을 읽다", ["그녀", "도서관", "책", "읽다"]),
    ]
    for text, want in gold:
        got = korean_tokenize(text)
        assert got == want, f"{text!r}: {got} != {want}"
        assert analyzer_for_lang("ko")(text) == want
        assert got != cjk_bigram_tokenize(text)  # genuinely different
    # hangul-free text degenerates to the standard chain (oracle invariant)
    s = "the quick merge of Streams 42"
    assert korean_tokenize(s) == tokenize(s)
    # gate gold table stays in sync with the lattice
    from lucene_solr_ray.functions.textstats import KO_GOLD
    for text, n, head in KO_GOLD:
        toks = korean_tokenize(text)
        assert len(toks) == n and toks[0] == head


def test_icu_folding_chain():
    """ICUFoldingFilter-equivalent: NFKC + casefold + combining-mark
    strip; char-filter order means full-width stopwords die in the stop
    filter and folded-to-stopword tokens are dropped too."""
    from lucene_solr_ray.analysis import get_analyzer, icu_fold

    assert icu_fold("Ｃａｆé") == "cafe"
    assert icu_fold("ﬁle") == "file"
    assert icu_fold("Ｓｔｒａßｅ") == "strasse"
    assert icu_fold("Ǌegoš") == "njegos"
    assert icu_fold("①") == "1"
    assert icu_fold("Ⅻ") == "xii"
    chain = get_analyzer("icu_folding")
    assert chain("ｔｈｅ Ｃａｆé ﬁle") == ["cafe", "file"]  # NFKC'd stopword dies
    assert chain("Thé naïve") == ["naive"]  # folded-to-stopword drops
    # plain ASCII degenerates to the standard chain
    from lucene_solr_ray.analysis import tokenize
    s = "the quick merge of Streams 42"
    assert chain(s) == tokenize(s)


def test_chinese_lattice_segmentation_gold():
    """Hand-specified gold segmentations for the zh dictionary-DP chain
    (smartcn's role): compound splitting, stop-word removal, unknown
    chars as singles, mixed script."""
    from lucene_solr_ray.analysis import (
        analyzer_for_lang, chinese_tokenize, cjk_bigram_tokenize)

    gold = [
        ("我们在北京大学研究自然语言处理",
         ["我们", "北京", "大学", "研究", "自然", "语言", "处理"]),
        ("今天天气很好", ["今天", "天气", "很好"]),
        ("中文分词是搜索引擎的技术",
         ["中文", "分词", "搜索", "引擎", "技术"]),
        ("我喜欢机器学习", ["喜欢", "机器", "学习"]),
        # unknown char falls back to a single-char token
        ("鑫是技术", ["鑫", "技术"]),
        # mixed script: non-CJK spans run the standard chain
        ("BM25是搜索技术", ["bm25", "搜索", "技术"]),
    ]
    for text, want in gold:
        got = chinese_tokenize(text)
        assert got == want, f"{text!r}: {got} != {want}"
        assert analyzer_for_lang("zh")(text) == want
        assert got != cjk_bigram_tokenize(text)
    # CJK-free text degenerates to the standard chain
    from lucene_solr_ray.analysis import tokenize
    s = "the quick merge of Streams 42"
    assert chinese_tokenize(s) == tokenize(s)


def test_elision_filter_gold():
    """ElisionFilter gold vectors: elidable articles strip, non-article
    apostrophes and bare tokens pass through."""
    from lucene_solr_ray.analysis import elision_filter

    assert elision_filter(["l'avenir", "qu'il", "d'une", "jusqu'ici"]) == \
        ["avenir", "il", "une", "ici"]
    assert elision_filter(["o'brien", "avenir", "l'", "rock'n'roll"]) == \
        ["o'brien", "avenir", "l'", "rock'n'roll"]
    assert elision_filter(["L'Avenir"]) == ["Avenir"]  # case-blind article


def test_german_light_stem_gold():
    """GermanLightStemmer gold vectors (Savoy light stemmer): umlaut
    fold + the two suffix steps; short tokens and vowel-s pass through."""
    from lucene_solr_ray.analysis import german_light_stem as g

    assert g("häusern") == "haus"      # fold + -ern
    assert g("bücher") == "buch"       # fold + -er
    assert g("jahres") == "jahr"       # -es
    assert g("kindes") == "kind"
    assert g("frauen") == "frau"       # -en
    assert g("schönsten") == "schon"   # -en then -st after consonant
    assert g("tages") == "tag"
    assert g("autos") == "autos"       # 's' after vowel: not an st-ending
    assert g("rot") == "rot"           # too short to strip
    assert g("straße") == "strass"     # ß -> ss, then -e


def test_analysis_properties_fuzz():
    """Property fuzz for the round-4 analysis additions: the German
    light stemmer never lengthens a token and always folds umlauts;
    elision strips exactly the article prefix; unigram Viterbi
    segmentations concatenate back to the word whenever single chars
    are in the vocabulary."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lucene_solr_ray.analysis import (
        FRENCH_ARTICLES, elision_filter, german_light_stem)
    from lucene_solr_ray.functions.textstats import unigram_viterbi

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet="abcdefghijklmnopqrstuvwxyzäöüß", min_size=1,
                   max_size=12))
    def p_stem(w):
        s = german_light_stem(w)
        # ß -> ss may lengthen by the fold, never by stripping
        assert len(s) <= len(w) + w.count("ß")
        assert not set(s) & set("äöüß")

    @settings(max_examples=200, deadline=None)
    @given(st.sampled_from(sorted(FRENCH_ARTICLES)),
           st.text(alphabet="abcdefghij", min_size=1, max_size=8))
    def p_elision(art, w):
        assert elision_filter([f"{art}'{w}"]) == [w]

    @settings(max_examples=200, deadline=None)
    @given(st.text(alphabet="abcd", min_size=1, max_size=10))
    def p_viterbi(w):
        logp = {c: -10 for c in "abcd"}
        logp.update({"ab": -15, "cd": -12})
        pieces = unigram_viterbi(w, logp)
        assert "".join(pieces) == w

    p_stem()
    p_elision()
    p_viterbi()

"""Okapi BM25, Lucene 8.x form (LUCENE-8563: no (k1+1) numerator).

Reference: [U] lucene/core/.../search/similarities/BM25Similarity.java.
Formula + float-narrowing order pinned in FIXTURES.md §3; this module is
shared by the engine AND the oracle, so parity is by construction:

    idf(t)   = ln(1 + (N - df + 0.5)/(df + 0.5))        # float64
    avgdl    = sum_dl / N                               # raw dl sum
    w(t)     = float32(idf(t))                          # boost = 1
    denom(d) = k1 * (1 - b + b*dl'(d)/avgdl)            # float64, per norm byte
    s(t,d)   = float32(w(t) * tf/(tf + denom(d)))
    score    = float32 accumulation of s over DISTINCT query terms in
               ascending term (UTF-8 byte) order
"""

from __future__ import annotations

import math

import numpy as np

from lucene_solr_ray.codec.norms import DECODED_TABLE

K1 = 1.2
B = 0.75


def idf(n_docs: int, df: int) -> float:
    """float64 idf; callers narrow to float32 as the term weight."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def term_weight(n_docs: int, df: int) -> np.float32:
    return np.float32(idf(n_docs, df))


def denom_cache(avgdl: float) -> np.ndarray:
    """256-entry float64 cache of k1*(1-b+b*dl'/avgdl), indexed by norm
    byte — BM25Similarity's per-norm cache."""
    return K1 * (1.0 - B + B * DECODED_TABLE.astype(np.float64) / avgdl)


def score_term(w: np.float32, tfs: np.ndarray, norm_bytes: np.ndarray, cache: np.ndarray) -> np.ndarray:
    """Vectorized s(t, d) -> float32 array."""
    tfs = tfs.astype(np.float64)
    return (np.float64(w) * (tfs / (tfs + cache[norm_bytes]))).astype(np.float32)


def score_upper_bound(w: np.float32, max_tf, min_norm, cache: np.ndarray) -> np.float64:
    """True float upper bound on s(t, d) over a block with impacts
    (max_tf, min_norm): s is increasing in tf, decreasing in denom, and
    denom is increasing in decoded dl (byte4 monotonic). A small relative
    margin guards the float64->float32 narrowing of actual scores."""
    mt = np.float64(max_tf)
    ub = np.float64(w) * (mt / (mt + cache[min_norm]))
    return ub * (1.0 + 1e-6) + 1e-12


class BM25:
    """Default similarity — thin class facade over the module functions
    (the Similarity plug point, [U] lucene/core/.../search/similarities/;
    SURVEY §2.11)."""

    name = "bm25"

    @staticmethod
    def idf(n_docs: int, df: int) -> float:
        return idf(n_docs, df)

    @staticmethod
    def term_weight(n_docs: int, df: int) -> np.float32:
        return term_weight(n_docs, df)

    @staticmethod
    def denom_cache(avgdl: float) -> np.ndarray:
        return denom_cache(avgdl)

    @staticmethod
    def score_term(w, tfs, norm_bytes, cache) -> np.ndarray:
        return score_term(w, tfs, norm_bytes, cache)

    @staticmethod
    def score_upper_bound(w, max_tf, min_norm, cache):
        return score_upper_bound(w, max_tf, min_norm, cache)

    @staticmethod
    def block_upper_bounds(w, max_tfs: np.ndarray, min_norms: np.ndarray, cache) -> np.ndarray:
        mt = max_tfs.astype(np.float64)
        ub = np.float64(w) * (mt / (mt + cache[min_norms]))
        return ub * (1.0 + 1e-6) + 1e-12


class BM25Tuned:
    """BM25 with non-default constructor parameters ([U] lucene/core/
    .../search/similarities/BM25Similarity.java ``BM25Similarity(k1, b)``
    — the plug point Solr exposes as <similarity class=... k1=.. b=..>):
    k1 = 0.9, b = 0.3, the common short-field tuning. Same pinned float
    tree as the default model, different constants; registered as its
    own similarity so the ctor-parameter surface is a first-class
    registry entry."""

    name = "bm25_tuned"
    K1 = 0.9
    B = 0.3

    @staticmethod
    def idf(n_docs: int, df: int) -> float:
        return idf(n_docs, df)

    @staticmethod
    def term_weight(n_docs: int, df: int) -> np.float32:
        return term_weight(n_docs, df)

    @classmethod
    def denom_cache(cls, avgdl: float) -> np.ndarray:
        dl = DECODED_TABLE.astype(np.float64)
        return np.float64(cls.K1) * ((1.0 - cls.B) + (cls.B * dl) / avgdl)

    @staticmethod
    def score_term(w, tfs, norm_bytes, cache) -> np.ndarray:
        tfs = np.asarray(tfs, dtype=np.float64)
        return (np.float64(w) * (tfs / (tfs + cache[norm_bytes]))).astype(np.float32)

    @staticmethod
    def score_upper_bound(w, max_tf, min_norm, cache):
        mt = np.float64(max_tf)
        ub = np.float64(w) * (mt / (mt + cache[min_norm]))
        return ub * (1.0 + 1e-6) + 1e-12

    @staticmethod
    def block_upper_bounds(w, max_tfs: np.ndarray, min_norms: np.ndarray, cache) -> np.ndarray:
        mt = max_tfs.astype(np.float64)
        ub = np.float64(w) * (mt / (mt + cache[min_norms]))
        return ub * (1.0 + 1e-6) + 1e-12


class ClassicTFIDF:
    """Lucene ClassicSimilarity (TF-IDF,
    [U] lucene/core/.../search/similarities/ClassicSimilarity.java):
    tf = sqrt(freq), idf = 1 + ln((N+1)/(df+1)), lengthNorm = 1/sqrt(dl').
    The per-norm "cache" slot holds the length norm."""

    name = "classic"

    @staticmethod
    def idf(n_docs: int, df: int) -> float:
        return 1.0 + math.log((n_docs + 1.0) / (df + 1.0))

    @staticmethod
    def term_weight(n_docs: int, df: int) -> np.float32:
        return np.float32(1.0 + math.log((n_docs + 1.0) / (df + 1.0)))

    @staticmethod
    def denom_cache(avgdl: float) -> np.ndarray:
        dl = np.maximum(DECODED_TABLE.astype(np.float64), 1.0)
        return 1.0 / np.sqrt(dl)

    @staticmethod
    def score_term(w, tfs, norm_bytes, cache) -> np.ndarray:
        tfs = np.asarray(tfs, dtype=np.float64)
        return (np.float64(w) * np.sqrt(tfs) * cache[norm_bytes]).astype(np.float32)

    @staticmethod
    def score_upper_bound(w, max_tf, min_norm, cache):
        ub = np.float64(w) * np.sqrt(np.float64(max_tf)) * cache[min_norm]
        return ub * (1.0 + 1e-6) + 1e-12

    @staticmethod
    def block_upper_bounds(w, max_tfs: np.ndarray, min_norms: np.ndarray, cache) -> np.ndarray:
        ub = np.float64(w) * np.sqrt(max_tfs.astype(np.float64)) * cache[min_norms]
        return ub * (1.0 + 1e-6) + 1e-12


class LMDirichlet:
    """Lucene LMDirichletSimilarity ([U] lucene/core/.../search/
    similarities/LMDirichletSimilarity.java, mu = 2000; collection model
    [U] LMSimilarity.DefaultCollectionModel: p(t|C) = (cf+1)/(sumTotalTermFreq+1)):

        s(t,d) = float32(max(0, ln(1 + tf/(mu*p)) + ln(mu/(dl'+mu))))

    The protocol's ``w`` slot carries the float64 collection probability
    (set via ``term_weight_stats`` — this similarity needs cf, not df);
    the per-norm cache holds ln(mu/(dl'+mu)). Scores clamp at 0 (Lucene
    8 requires non-negative scores), are increasing in tf and decreasing
    in dl, so impacts (max_tf, min_norm) give exact WAND bounds. Only
    the term/boolean scoring paths support LM similarities — boosted /
    phrase paths are BM25-family (they fold boosts into idf)."""

    name = "lmdirichlet"
    needs_cf = True
    MU = 2000.0

    @classmethod
    def term_weight_stats(cls, n_docs: int, df: int, cf: int, sum_dl: int) -> np.float64:
        return np.float64((cf + 1.0) / (sum_dl + 1.0))

    @classmethod
    def denom_cache(cls, avgdl: float) -> np.ndarray:
        dl = DECODED_TABLE.astype(np.float64)
        return np.log(cls.MU / (dl + cls.MU))

    @classmethod
    def score_term(cls, w, tfs, norm_bytes, cache) -> np.ndarray:
        tfs = np.asarray(tfs, dtype=np.float64)
        s = np.log(1.0 + tfs / (cls.MU * np.float64(w))) + cache[norm_bytes]
        return np.maximum(s, 0.0).astype(np.float32)

    @classmethod
    def score_upper_bound(cls, w, max_tf, min_norm, cache):
        ub = np.log(1.0 + np.float64(max_tf) / (cls.MU * np.float64(w))) + cache[min_norm]
        ub = max(float(ub), 0.0)
        return ub * (1.0 + 1e-6) + 1e-12

    @classmethod
    def block_upper_bounds(cls, w, max_tfs: np.ndarray, min_norms: np.ndarray, cache) -> np.ndarray:
        ub = np.log(1.0 + max_tfs.astype(np.float64) / (cls.MU * np.float64(w))) + cache[min_norms]
        ub = np.maximum(ub, 0.0)
        return ub * (1.0 + 1e-6) + 1e-12


class LMJelinekMercer:
    """Lucene LMJelinekMercerSimilarity ([U] .../LMJelinekMercerSimilarity.java,
    lambda = 0.1):

        s(t,d) = float32(max(0, ln(1 + ((1-lam)*tf/dl') / (lam*p))))

    Same protocol conventions as LMDirichlet (w = p via term_weight_stats;
    cache holds decoded dl' — tf/dl' happens per hit, and tf >= 1 implies
    dl' >= 1 so the division is safe on every scored posting)."""

    name = "lmjelinekmercer"
    needs_cf = True
    LAM = 0.1

    @classmethod
    def term_weight_stats(cls, n_docs: int, df: int, cf: int, sum_dl: int) -> np.float64:
        return np.float64((cf + 1.0) / (sum_dl + 1.0))

    @classmethod
    def denom_cache(cls, avgdl: float) -> np.ndarray:
        return DECODED_TABLE.astype(np.float64)

    @classmethod
    def score_term(cls, w, tfs, norm_bytes, cache) -> np.ndarray:
        tfs = np.asarray(tfs, dtype=np.float64)
        s = np.log(1.0 + ((1.0 - cls.LAM) * tfs / cache[norm_bytes]) / (cls.LAM * np.float64(w)))
        return np.maximum(s, 0.0).astype(np.float32)

    @classmethod
    def score_upper_bound(cls, w, max_tf, min_norm, cache):
        dl = max(float(cache[min_norm]), 1.0)
        ub = np.log(1.0 + ((1.0 - cls.LAM) * np.float64(max_tf) / dl) / (cls.LAM * np.float64(w)))
        ub = max(float(ub), 0.0)
        return ub * (1.0 + 1e-6) + 1e-12

    @classmethod
    def block_upper_bounds(cls, w, max_tfs: np.ndarray, min_norms: np.ndarray, cache) -> np.ndarray:
        dl = np.maximum(cache[min_norms], 1.0)
        ub = np.log(1.0 + ((1.0 - cls.LAM) * max_tfs.astype(np.float64) / dl) / (cls.LAM * np.float64(w)))
        ub = np.maximum(ub, 0.0)
        return ub * (1.0 + 1e-6) + 1e-12


class DFRInL2:
    """Lucene DFRSimilarity(BasicModelIn, AfterEffectL, NormalizationH2)
    — the classic "InL2" DFR model ([U] lucene/core/.../search/
    similarities/DFRSimilarity.java + BasicModelIn/AfterEffectL/
    NormalizationH2, c = 1):

        tfn    = tf * log2(1 + c * avgdl / dl')        (H2 normalization)
        score  = float32( w * tfn/(tfn + 1) )          (L after-effect)
        w      = float32( log2((N + 1)/(df + 0.5)) )   (I(n) basic model)

    Fits the protocol unchanged (df-only weight); cache[norm] holds the
    float64 log2(1 + avgdl/dl'). Increasing in tf, decreasing in dl, so
    impacts give exact WAND bounds."""

    name = "dfr_inl2"
    C = 1.0

    @staticmethod
    def idf(n_docs: int, df: int) -> float:
        return math.log2((n_docs + 1.0) / (df + 0.5))

    @classmethod
    def term_weight(cls, n_docs: int, df: int) -> np.float32:
        return np.float32(cls.idf(n_docs, df))

    @classmethod
    def denom_cache(cls, avgdl: float) -> np.ndarray:
        dl = np.maximum(DECODED_TABLE.astype(np.float64), 1.0)
        return np.log2(1.0 + cls.C * avgdl / dl)

    @staticmethod
    def score_term(w, tfs, norm_bytes, cache) -> np.ndarray:
        tfn = np.asarray(tfs, dtype=np.float64) * cache[norm_bytes]
        return (np.float64(w) * (tfn / (tfn + 1.0))).astype(np.float32)

    @staticmethod
    def score_upper_bound(w, max_tf, min_norm, cache):
        tfn = np.float64(max_tf) * cache[min_norm]
        ub = np.float64(w) * (tfn / (tfn + 1.0))
        return ub * (1.0 + 1e-6) + 1e-12

    @staticmethod
    def block_upper_bounds(w, max_tfs: np.ndarray, min_norms: np.ndarray, cache) -> np.ndarray:
        tfn = max_tfs.astype(np.float64) * cache[min_norms]
        ub = np.float64(w) * (tfn / (tfn + 1.0))
        return ub * (1.0 + 1e-6) + 1e-12


class DFRIneL2:
    """Lucene DFRSimilarity(BasicModelIne, AfterEffectL, NormalizationH2)
    ([U] lucene/core/.../search/similarities/BasicModelIne.java — I(n_e),
    the expected-document-frequency variant of I(n); c = 1):

        ne    = N * (1 - ((N-1)/N)^cf)         (expected df under a
                                                binomial scatter of the
                                                cf occurrences)
        w     = float32( log2((N+1)/(ne+0.5)) )
        tfn   = tf * log2(1 + c*avgdl/dl')      (H2)
        score = float32( w * tfn/(tfn+1) )      (L after-effect)

    needs_cf protocol: the w slot carries the float32 I(ne) weight
    (computed in float64 then narrowed, like the other tf-idf models).
    Same monotonicity as InL2 -> exact WAND bounds."""

    name = "dfr_ine_l2"
    needs_cf = True
    C = 1.0

    @staticmethod
    def idf(n_docs: int, df: int) -> float:
        # df-proxy for the boosted/phrase folds (cf unavailable there)
        return math.log2((n_docs + 1.0) / (df + 0.5))

    @classmethod
    def term_weight_stats(cls, n_docs: int, df: int, cf: int, sum_dl: int) -> np.float32:
        n = np.float64(n_docs)
        ne = n * (1.0 - np.power((n - 1.0) / n, np.float64(cf)))
        return np.float32(np.log2((n + 1.0) / (ne + 0.5)))

    @classmethod
    def denom_cache(cls, avgdl: float) -> np.ndarray:
        dl = np.maximum(DECODED_TABLE.astype(np.float64), 1.0)
        return np.log2(1.0 + cls.C * avgdl / dl)

    @staticmethod
    def score_term(w, tfs, norm_bytes, cache) -> np.ndarray:
        tfn = np.asarray(tfs, dtype=np.float64) * cache[norm_bytes]
        return (np.float64(w) * (tfn / (tfn + 1.0))).astype(np.float32)

    @staticmethod
    def score_upper_bound(w, max_tf, min_norm, cache):
        tfn = np.float64(max_tf) * cache[min_norm]
        ub = np.float64(w) * (tfn / (tfn + 1.0))
        return ub * (1.0 + 1e-6) + 1e-12

    @staticmethod
    def block_upper_bounds(w, max_tfs: np.ndarray, min_norms: np.ndarray, cache) -> np.ndarray:
        tfn = max_tfs.astype(np.float64) * cache[min_norms]
        ub = np.float64(w) * (tfn / (tfn + 1.0))
        return ub * (1.0 + 1e-6) + 1e-12


class DFRGL2:
    """Lucene DFRSimilarity(BasicModelG, AfterEffectL, NormalizationH2)
    — the "GL2" geometric DFR model ([U] lucene/core/.../search/
    similarities/BasicModelG.java + AfterEffectL + NormalizationH2,
    c = 1; Lucene 8's geometric replacement after BasicModelP/BE were
    dropped):

        lambda = cf / (N + cf)                       (geometric prior)
        tfn    = tf * log2(1 + c * avgdl / dl')      (H2 normalization)
        score  = float32(max(0, (log2(1/(1+lambda))
                               + tfn * log2((1+lambda)/lambda)) / (1 + tfn)))

    The ``w`` slot carries float64 lambda (needs_cf protocol, like the
    LM models). Increasing in tfn — d/dtfn = (B - A)/(1+tfn)^2 with
    A = log2(1/(1+lambda)) <= 0 <= B — and tfn decreases in dl, so
    impacts (max_tf, min_norm) give exact WAND bounds."""

    name = "dfr_gl2"
    needs_cf = True
    C = 1.0

    @classmethod
    def term_weight_stats(cls, n_docs: int, df: int, cf: int, sum_dl: int) -> np.float64:
        return np.float64(cf) / np.float64(n_docs + cf)

    @classmethod
    def denom_cache(cls, avgdl: float) -> np.ndarray:
        dl = np.maximum(DECODED_TABLE.astype(np.float64), 1.0)
        return np.log2(1.0 + cls.C * avgdl / dl)

    @staticmethod
    def _ab(lam: np.float64) -> tuple[np.float64, np.float64]:
        return (np.log2(1.0 / (1.0 + lam)), np.log2((1.0 + lam) / lam))

    @classmethod
    def score_term(cls, w, tfs, norm_bytes, cache) -> np.ndarray:
        a, b = cls._ab(np.float64(w))
        tfn = np.asarray(tfs, dtype=np.float64) * cache[norm_bytes]
        s = (a + tfn * b) / (1.0 + tfn)
        return np.maximum(s, 0.0).astype(np.float32)

    @classmethod
    def score_upper_bound(cls, w, max_tf, min_norm, cache):
        a, b = cls._ab(np.float64(w))
        tfn = np.float64(max_tf) * cache[min_norm]
        ub = max(float((a + tfn * b) / (1.0 + tfn)), 0.0)
        return ub * (1.0 + 1e-6) + 1e-12

    @classmethod
    def block_upper_bounds(cls, w, max_tfs: np.ndarray, min_norms: np.ndarray, cache) -> np.ndarray:
        a, b = cls._ab(np.float64(w))
        tfn = max_tfs.astype(np.float64) * cache[min_norms]
        ub = np.maximum((a + tfn * b) / (1.0 + tfn), 0.0)
        return ub * (1.0 + 1e-6) + 1e-12


class BooleanSim:
    """Lucene BooleanSimilarity ([U] lucene/core/.../search/similarities/
    BooleanSimilarity.java): score = boost, norms ignored — every match
    contributes exactly its weight."""

    name = "boolean"

    @staticmethod
    def idf(n_docs: int, df: int) -> float:
        return 1.0

    @staticmethod
    def term_weight(n_docs: int, df: int) -> np.float32:
        return np.float32(1.0)

    @staticmethod
    def denom_cache(avgdl: float) -> np.ndarray:
        return np.zeros_like(DECODED_TABLE, dtype=np.float64)

    @staticmethod
    def score_term(w, tfs, norm_bytes, cache) -> np.ndarray:
        return np.full(len(np.asarray(tfs)), np.float32(w), dtype=np.float32)

    @staticmethod
    def score_upper_bound(w, max_tf, min_norm, cache):
        return np.float64(w) * (1.0 + 1e-6) + 1e-12

    @staticmethod
    def block_upper_bounds(w, max_tfs: np.ndarray, min_norms: np.ndarray, cache) -> np.ndarray:
        return np.full(len(max_tfs), np.float64(w) * (1.0 + 1e-6) + 1e-12)


class DFIChiSquared:
    """Lucene DFISimilarity with the ChiSquared independence measure
    ([U] lucene/core/.../search/similarities/DFISimilarity.java +
    IndependenceChiSquared.java):

        expected = p * dl',  p = (cf + 1)/(sum_dl + 1)   (float64)
        s(t,d)   = 0 when tf <= expected, else
                   float32( log2((tf - expected)^2 / expected + 1) )

    The ``w`` slot carries p (needs_cf, like the LM models); the
    per-norm cache holds the decoded float64 dl'. Increasing in tf and
    decreasing in dl (expected grows with dl), so impacts (max_tf,
    min_norm) give exact WAND bounds."""

    name = "dfi_chi2"
    needs_cf = True

    @classmethod
    def term_weight_stats(cls, n_docs: int, df: int, cf: int, sum_dl: int) -> np.float64:
        return np.float64((cf + 1.0) / (sum_dl + 1.0))

    @classmethod
    def denom_cache(cls, avgdl: float) -> np.ndarray:
        return DECODED_TABLE.astype(np.float64)

    @classmethod
    def score_term(cls, w, tfs, norm_bytes, cache) -> np.ndarray:
        tfs = np.asarray(tfs, dtype=np.float64)
        e = np.float64(w) * cache[norm_bytes]
        diff = tfs - e
        s = np.where(tfs > e, np.log2(diff * diff / e + 1.0), 0.0)
        return s.astype(np.float32)

    @classmethod
    def score_upper_bound(cls, w, max_tf, min_norm, cache):
        e = float(np.float64(w) * cache[min_norm])
        mt = float(max_tf)
        ub = math.log2((mt - e) * (mt - e) / e + 1.0) if mt > e else 0.0
        return ub * (1.0 + 1e-6) + 1e-12

    @classmethod
    def block_upper_bounds(cls, w, max_tfs: np.ndarray, min_norms: np.ndarray, cache) -> np.ndarray:
        mt = max_tfs.astype(np.float64)
        e = np.float64(w) * cache[min_norms]
        diff = mt - e
        ub = np.where(mt > e, np.log2(diff * diff / e + 1.0), 0.0)
        return ub * (1.0 + 1e-6) + 1e-12


class IBLogLogistic:
    """Lucene IBSimilarity(DistributionLL, LambdaDF, NormalizationH2)
    ([U] lucene/core/.../search/similarities/IBSimilarity.java +
    DistributionLL/LambdaDF/NormalizationH2, c = 1):

        tfn  = tf * log2(1 + avgdl/dl')            (H2)
        lam  = (df + 1)/(N + 1)                    (LambdaDF, the w slot)
        s    = float32( ln(1 + tfn/lam) )          (log-logistic;
               algebraically == Lucene's -ln(lam/(tfn+lam)), written in
               the 1+x/lam form so engine and oracle share one tree)

    Increasing in tf, decreasing in dl -> exact WAND bounds from
    (max_tf, min_norm) impacts."""

    name = "ib_ll"

    @staticmethod
    def idf(n_docs: int, df: int) -> float:
        return math.log(1.0 + (n_docs + 1.0) / (df + 1.0))  # monotone df proxy

    @staticmethod
    def term_weight(n_docs: int, df: int) -> np.float64:
        return np.float64((df + 1.0) / (n_docs + 1.0))

    @staticmethod
    def denom_cache(avgdl: float) -> np.ndarray:
        dl = np.maximum(DECODED_TABLE.astype(np.float64), 1.0)
        return np.log2(1.0 + avgdl / dl)

    @staticmethod
    def score_term(w, tfs, norm_bytes, cache) -> np.ndarray:
        tfn = np.asarray(tfs, dtype=np.float64) * cache[norm_bytes]
        return np.log(1.0 + tfn / np.float64(w)).astype(np.float32)

    @staticmethod
    def score_upper_bound(w, max_tf, min_norm, cache):
        ub = float(np.log(1.0 + np.float64(max_tf) * cache[min_norm] / np.float64(w)))
        return ub * (1.0 + 1e-6) + 1e-12

    @staticmethod
    def block_upper_bounds(w, max_tfs: np.ndarray, min_norms: np.ndarray, cache) -> np.ndarray:
        ub = np.log(1.0 + max_tfs.astype(np.float64) * cache[min_norms] / np.float64(w))
        return ub * (1.0 + 1e-6) + 1e-12


class IBSmoothedPowerLaw:
    """Lucene IBSimilarity(DistributionSPL, LambdaDF, NormalizationH2)
    ([U] lucene/core/.../search/similarities/DistributionSPL.java +
    LambdaDF/NormalizationH2, c = 1) — the other shipped
    information-based distribution:

        tfn  = tf * log2(1 + avgdl/dl')            (H2)
        lam  = (df + 1)/(N + 1)                    (LambdaDF, the w slot)
        s    = float32(max(0, -ln((lam^(tfn/(tfn+1)) - 1)/(lam - 1))))

    lam in (0, 1), so both numerator and denominator are negative and
    the ratio is a probability in (0, 1) increasing toward lam as
    tfn grows — its -ln is positive and increasing in tfn, decreasing
    in dl: exact WAND bounds from (max_tf, min_norm) impacts."""

    name = "ib_spl"

    @staticmethod
    def idf(n_docs: int, df: int) -> float:
        return math.log(1.0 + (n_docs + 1.0) / (df + 1.0))  # monotone df proxy

    @staticmethod
    def term_weight(n_docs: int, df: int) -> np.float64:
        return np.float64((df + 1.0) / (n_docs + 1.0))

    @staticmethod
    def denom_cache(avgdl: float) -> np.ndarray:
        dl = np.maximum(DECODED_TABLE.astype(np.float64), 1.0)
        return np.log2(1.0 + avgdl / dl)

    @staticmethod
    def _score64(lam, tfn):
        r = (np.power(lam, tfn / (tfn + 1.0)) - 1.0) / (lam - 1.0)
        return np.maximum(-np.log(r), 0.0)

    @classmethod
    def score_term(cls, w, tfs, norm_bytes, cache) -> np.ndarray:
        tfn = np.asarray(tfs, dtype=np.float64) * cache[norm_bytes]
        return cls._score64(np.float64(w), tfn).astype(np.float32)

    @classmethod
    def score_upper_bound(cls, w, max_tf, min_norm, cache):
        tfn = np.float64(max_tf) * cache[min_norm]
        ub = float(cls._score64(np.float64(w), tfn))
        return ub * (1.0 + 1e-6) + 1e-12

    @classmethod
    def block_upper_bounds(cls, w, max_tfs: np.ndarray, min_norms: np.ndarray, cache) -> np.ndarray:
        tfn = max_tfs.astype(np.float64) * cache[min_norms]
        ub = cls._score64(np.float64(w), tfn)
        return ub * (1.0 + 1e-6) + 1e-12


class AxiomaticF2EXP:
    """Lucene AxiomaticF2EXP ([U] lucene/core/.../search/similarities/
    AxiomaticF2EXP.java + Axiomatic.java, s = 0.5, k = 0.35 defaults):

        w(t)    = float32( ((N + 1)/df)^k )           (idf component)
        denom   = s + s*dl'/avgdl                     (float64, per norm byte)
        s(t,d)  = float32( w * tf/(tf + denom) )      (F2 tf-length norm)

    Structurally identical to BM25 (increasing in tf, decreasing in dl),
    so impacts (max_tf, min_norm) give exact WAND bounds. df-only weight
    (no cf), so it rides the default plug-point path."""

    name = "ax_f2exp"
    S = 0.5
    K = 0.35

    @classmethod
    def idf(cls, n_docs: int, df: int) -> float:
        return ((n_docs + 1.0) / df) ** cls.K

    @classmethod
    def term_weight(cls, n_docs: int, df: int) -> np.float32:
        return np.float32(cls.idf(n_docs, df))

    @classmethod
    def denom_cache(cls, avgdl: float) -> np.ndarray:
        return cls.S + cls.S * DECODED_TABLE.astype(np.float64) / avgdl

    @staticmethod
    def score_term(w, tfs, norm_bytes, cache) -> np.ndarray:
        tfs = np.asarray(tfs, dtype=np.float64)
        return (np.float64(w) * (tfs / (tfs + cache[norm_bytes]))).astype(np.float32)

    @staticmethod
    def score_upper_bound(w, max_tf, min_norm, cache):
        mt = np.float64(max_tf)
        ub = np.float64(w) * (mt / (mt + cache[min_norm]))
        return ub * (1.0 + 1e-6) + 1e-12

    @staticmethod
    def block_upper_bounds(w, max_tfs: np.ndarray, min_norms: np.ndarray, cache) -> np.ndarray:
        mt = max_tfs.astype(np.float64)
        ub = np.float64(w) * (mt / (mt + cache[min_norms]))
        return ub * (1.0 + 1e-6) + 1e-12


class SweetSpot:
    """Lucene SweetSpotSimilarity ([U] lucene/misc/.../
    SweetSpotSimilarity.java): ClassicSimilarity with the plateau length
    norm — docs whose length falls inside [LN_MIN, LN_MAX] get norm 1.0,
    outside the plateau the norm decays hyperbolically:

        norm(dl') = 1/sqrt(steep*(|dl'-min| + |dl'-max| - (max-min)) + 1)

    tf = sqrt(freq) and idf = 1 + ln((N+1)/(df+1)) are inherited from the
    classic model. The plateau makes the norm NON-monotone in dl, so the
    (max_tf, min_norm-byte) impact pair cannot bound it; the WAND bounds
    use the global norm maximum (exactly 1.0 on the plateau) instead —
    looser but still admissible, so results stay exact."""

    name = "sweetspot"
    LN_MIN, LN_MAX, STEEP = 20.0, 60.0, 0.5

    @staticmethod
    def idf(n_docs: int, df: int) -> float:
        return 1.0 + math.log((n_docs + 1.0) / (df + 1.0))

    @staticmethod
    def term_weight(n_docs: int, df: int) -> np.float32:
        return np.float32(SweetSpot.idf(n_docs, df))

    @classmethod
    def denom_cache(cls, avgdl: float) -> np.ndarray:
        dl = DECODED_TABLE.astype(np.float64)
        norm = 1.0 / np.sqrt(
            cls.STEEP * (np.abs(dl - cls.LN_MIN) + np.abs(dl - cls.LN_MAX)
                         - (cls.LN_MAX - cls.LN_MIN)) + 1.0)
        norm[(dl >= cls.LN_MIN) & (dl <= cls.LN_MAX)] = 1.0
        return norm

    @staticmethod
    def score_term(w, tfs, norm_bytes, cache) -> np.ndarray:
        tfs = np.asarray(tfs, dtype=np.float64)
        return (np.float64(w) * np.sqrt(tfs) * cache[norm_bytes]).astype(np.float32)

    @staticmethod
    def score_upper_bound(w, max_tf, min_norm, cache):
        # plateau: norm is non-monotone in dl -> bound with the global max
        ub = np.float64(w) * np.sqrt(np.float64(max_tf)) * cache.max()
        return ub * (1.0 + 1e-6) + 1e-12

    @staticmethod
    def block_upper_bounds(w, max_tfs: np.ndarray, min_norms: np.ndarray, cache) -> np.ndarray:
        ub = np.float64(w) * np.sqrt(max_tfs.astype(np.float64)) * cache.max()
        return ub * (1.0 + 1e-6) + 1e-12


SIMILARITIES = {
    "bm25": BM25,
    "bm25_tuned": BM25Tuned,
    "classic": ClassicTFIDF,
    "lmdirichlet": LMDirichlet,
    "lmjelinekmercer": LMJelinekMercer,
    "dfr_inl2": DFRInL2,
    "dfr_gl2": DFRGL2,
    "dfr_ine_l2": DFRIneL2,
    "dfi_chi2": DFIChiSquared,
    "ib_ll": IBLogLogistic,
    "ib_spl": IBSmoothedPowerLaw,
    "ax_f2exp": AxiomaticF2EXP,
    "sweetspot": SweetSpot,
    "boolean": BooleanSim,
}


def weight_for(simcls, n_docs: int, df: int, cf: int, sum_dl: int):
    """Per-term weight under any registered similarity: LM models carry
    the collection probability in the ``w`` slot (needs_cf), the
    tf-idf family narrows idf to float32. Shared by engine AND oracle so
    parity is by construction."""
    if getattr(simcls, "needs_cf", False):
        return simcls.term_weight_stats(n_docs, df, cf, sum_dl)
    return simcls.term_weight(n_docs, df)


def get_similarity(name: str):
    try:
        return SIMILARITIES[name]
    except KeyError:
        raise ValueError(f"unknown similarity {name!r}; known: {sorted(SIMILARITIES)}")


def accumulate(parts: list[np.ndarray]) -> np.ndarray:
    """float32 left-to-right accumulation (parts pre-sorted by term)."""
    if not parts:
        return np.empty(0, dtype=np.float32)
    acc = parts[0].astype(np.float32)
    for p in parts[1:]:
        acc = (acc + p).astype(np.float32)
    return acc


def dismax_combine(parts: list[np.ndarray], tie_breaker: float) -> np.ndarray:
    """DisjunctionMaxQuery combine ([U] lucene/core/.../search/
    DisjunctionMaxQuery.java): max of clause scores + tie_breaker * sum of
    the others; float32 result, shared by engine and oracle."""
    stack = np.stack([p.astype(np.float32) for p in parts])
    mx = stack.max(axis=0)
    total = stack.astype(np.float64).sum(axis=0)
    return (mx.astype(np.float64) + tie_breaker * (total - mx.astype(np.float64))).astype(np.float32)

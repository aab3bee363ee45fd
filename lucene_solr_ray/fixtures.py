"""Deterministic fixture generators — FIXTURES.md §1 (transcripts, seed 42)
and §4 (reference query set, seed 43). No external data; pure NumPy.

Tiers: t1 smoke n_convs=50, t2 correctness n_convs=1_000, bench 100_000+.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from lucene_solr_ray.analysis import STOPWORDS, tokenize

VOCAB_SIZE = 10_000
ZIPF_S = 1.07
STOPWORD_LIST = sorted(STOPWORDS)
UNICODE_WORDS = ["café", "naïve", "東京", "Ω"]
EPOCH = np.datetime64("2026-01-01T00:00:00", "us")


def _zipf_probs() -> np.ndarray:
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    p = ranks ** -ZIPF_S
    return p / p.sum()


def gen_transcripts(n_convs: int, seed: int = 42) -> pa.Table:
    """Transcript table per FIXTURES.md §1, rows pre-shuffled (the engine
    must re-establish (conv_id, turn_idx) order itself)."""
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:04d}" for i in range(VOCAB_SIZE)], dtype=object)
    zipf_p = _zipf_probs()

    turns_per_conv = np.clip(1 + rng.poisson(7.0, size=n_convs), 1, 64)
    n_turns = int(turns_per_conv.sum())
    conv_of_turn = np.repeat(np.arange(n_convs), turns_per_conv)
    turn_idx = np.concatenate([np.arange(c) for c in turns_per_conv]).astype(np.int32)

    # token counts per turn
    tok_counts = np.clip(1 + rng.geometric(0.08, size=n_turns), 0, 400)
    u = rng.random(n_turns)
    tok_counts[u < 0.01] = 0  # 1% empty turns
    tok_counts[(u >= 0.01) & (u < 0.015)] = 2000  # 0.5% very long turns
    n_tokens = int(tok_counts.sum())

    # token stream: stopword p=0.4, unicode p=0.005, else Zipf content word
    kind = rng.random(n_tokens)
    content = vocab[rng.choice(VOCAB_SIZE, size=n_tokens, p=zipf_p)]
    stop = np.array(STOPWORD_LIST, dtype=object)[rng.integers(0, len(STOPWORD_LIST), n_tokens)]
    uni = np.array(UNICODE_WORDS, dtype=object)[rng.integers(0, len(UNICODE_WORDS), n_tokens)]
    words = np.where(kind < 0.4, stop, np.where(kind < 0.405, uni, content))

    offsets = np.concatenate([[0], np.cumsum(tok_counts)])
    texts = [" ".join(words[offsets[i] : offsets[i + 1]]) for i in range(n_turns)]

    role_u = rng.random(n_turns)
    parity = np.where(turn_idx % 2 == 0, "user", "assistant")
    role = np.where(role_u < 0.1, "system", np.where(role_u < 0.2, "tool", parity))
    tools = np.array(["search", "python", "browser"], dtype=object)
    tool = np.where(role == "tool", tools[rng.integers(0, 3, n_turns)], "")

    conv_offset_s = conv_of_turn.astype(np.int64) * 3600
    ts = EPOCH + ((conv_offset_s + 13 * turn_idx.astype(np.int64)) * 1_000_000).astype("timedelta64[us]")

    conv_ids = np.array([f"conv-{c:06d}" for c in conv_of_turn], dtype=object)

    perm = rng.permutation(n_turns)  # seeded shuffle — engine must re-sort
    return pa.table(
        {
            "conv_id": pa.array(conv_ids[perm], type=pa.string()),
            "turn_idx": pa.array(turn_idx[perm], type=pa.int32()),
            "role": pa.array(role[perm].astype(object), type=pa.string()),
            "text": pa.array(np.array(texts, dtype=object)[perm], type=pa.string()),
            "tool": pa.array(tool[perm].astype(object), type=pa.string()),
            "ts": pa.array(ts[perm], type=pa.timestamp("us")),
        }
    )


def write_transcripts(path: str, n_convs: int, seed: int = 42, num_files: int = 1) -> str:
    """Write the fixture corpus as parquet; idempotent (skips if present)."""
    os.makedirs(path, exist_ok=True)
    marker = os.path.join(path, f".done-{n_convs}-{seed}-{num_files}")
    if os.path.exists(marker):
        return path
    for stale in os.listdir(path):  # different num_files layouts must not mix
        os.unlink(os.path.join(path, stale))
    table = gen_transcripts(n_convs, seed)
    n = table.num_rows
    per = (n + num_files - 1) // num_files
    for f in range(num_files):
        pq.write_table(table.slice(f * per, per), os.path.join(path, f"part-{f:04d}.parquet"))
    with open(marker, "w") as fh:
        fh.write("ok")
    return path


# ---------------- reference query set (FIXTURES.md §4, seed 43) ----------------

def corpus_df(texts) -> dict[str, int]:
    """Exact document frequency per term over an iterable of texts."""
    df: dict[str, int] = {}
    for text in texts:
        for t in set(tokenize(text)):
            df[t] = df.get(t, 0) + 1
    return df


def gen_query_set(texts, seed: int = 43, n_single=80, n_or=80, n_and=40, k: int = 10) -> pa.Table:
    """200 queries stratified by df over the given corpus texts."""
    rng = np.random.default_rng(seed)
    df = corpus_df(texts)
    terms_sorted = sorted(df, key=lambda t: (-df[t], t))
    n_terms = len(terms_sorted)
    hi = terms_sorted[: max(1, n_terms // 100)]
    low = [t for t in terms_sorted if df[t] <= 3] or terms_sorted[-10:]
    mid = terms_sorted[n_terms // 4 : 3 * n_terms // 4] or terms_sorted

    def pick(pool, n):
        idx = rng.choice(len(pool), size=n, replace=len(pool) < n)
        return [pool[i] for i in idx]

    queries: list[tuple[str, str, list[str]]] = []
    per = n_single // 4
    for stratum, pool in (("hi", hi), ("mid", mid), ("low", low)):
        for t in pick(pool, per):
            queries.append((f"single-{stratum}", "single", [t]))
    oddballs = (
        ["the", "and", "with", "is", "not", "to", "a"]
        + ["café", "naïve", "東京", "Ω"]
        + [f"zz-absent-{i}" for i in range(9)]
    )
    for t in oddballs[:per]:
        queries.append(("single-odd", "single", [t]))

    all_pools = {"hi": hi, "mid": mid, "low": low}
    for _ in range(n_or):
        nt = int(rng.integers(2, 6))
        terms: list[str] = []
        for _ in range(nt):
            pool = all_pools[["hi", "mid", "low"][int(rng.integers(0, 3))]]
            terms.append(pool[int(rng.integers(0, len(pool)))])
        queries.append(("or", "or", sorted(set(terms))))

    # AND: sample co-occurring terms from a random doc's token set
    tok_cache = [sorted(set(tokenize(t))) for t in texts]
    nonempty = [i for i, ts in enumerate(tok_cache) if len(ts) >= 3]
    for _ in range(n_and):
        doc = tok_cache[nonempty[int(rng.integers(0, len(nonempty)))]]
        nt = int(rng.integers(2, 4))
        idx = rng.choice(len(doc), size=min(nt, len(doc)), replace=False)
        queries.append(("and", "and", sorted(doc[i] for i in idx)))

    return pa.table(
        {
            "query_id": pa.array([f"q{i:04d}-{tag}" for i, (tag, _, _) in enumerate(queries)]),
            "type": pa.array([ty for _, ty, _ in queries]),
            "terms": pa.array([ts for _, _, ts in queries], type=pa.list_(pa.string())),
            "k": pa.array([k] * len(queries), type=pa.int32()),
        }
    )

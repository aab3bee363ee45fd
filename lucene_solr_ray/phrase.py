"""Phrase matching shared by engine and oracle (parity by construction).

Exact phrase (slop=0) and sloppy phrase matching over per-term position
lists. Reference: [U] lucene/core/.../search/PhraseQuery.java and
SloppyPhraseMatcher.java. Semantics here:

- positions are query-offset-shifted (p_i - qpos_i); a match is a
  selection of one shifted position per term with max-min <= slop;
- phrase frequency counts DISJOINT matches greedily (advance all
  pointers on a match, else advance the smallest) — for slop=0 this
  equals the size of the shifted-position intersection, i.e. classic
  exact-phrase frequency. For slop>0 this is a deterministic simplified
  variant of Lucene's sloppyFreq (which weights matches by
  1/(1+displacement)); both sides of the parity suite share this code.
"""

from __future__ import annotations

import numpy as np


def span_near_unordered(pos_lists: list[np.ndarray], slop: int) -> bool:
    """NearSpansUnordered existence test ([U] lucene/core/.../search/
    spans/NearSpansUnordered.java), single-term clauses: does ANY window
    containing >= one position from every list have
    (max - min + 1) - n_clauses <= slop? Classic sliding window over the
    source-tagged merged position stream."""
    n = len(pos_lists)
    if n == 0 or any(len(p) == 0 for p in pos_lists):
        return False
    allpos = np.concatenate(pos_lists)
    src = np.concatenate([np.full(len(p), i, dtype=np.int64)
                          for i, p in enumerate(pos_lists)])
    order = np.argsort(allpos, kind="stable")
    allpos, src = allpos[order], src[order]
    need = n
    count = np.zeros(n, dtype=np.int64)
    lo = 0
    for hi in range(len(allpos)):
        if count[src[hi]] == 0:
            need -= 1
        count[src[hi]] += 1
        while need == 0:
            width = int(allpos[hi] - allpos[lo] + 1) - n
            if width <= slop:
                return True
            count[src[lo]] -= 1
            if count[src[lo]] == 0:
                need += 1
            lo += 1
    return False


def span_near_ordered(pos_lists: list[np.ndarray], slop: int) -> bool:
    """NearSpansOrdered existence test ([U] .../spans/NearSpansOrdered.java),
    single-term clauses: positions strictly increasing in clause order
    (each span starts after the previous span's end) with total gap
    (p_last - p_first + 1) - n <= slop. Greedy next-greater leapfrog from
    each start finds the minimal end, so existence is exact."""
    n = len(pos_lists)
    if n == 0 or any(len(p) == 0 for p in pos_lists):
        return False
    if n == 1:
        return True
    for p0 in pos_lists[0]:
        cur = int(p0)
        ok = True
        for lst in pos_lists[1:]:
            j = int(np.searchsorted(lst, cur, side="right"))
            if j >= len(lst):
                ok = False
                break
            cur = int(lst[j])
        if ok and (cur - int(p0) + 1) - n <= slop:
            return True
        if not ok:
            # no later start can complete either once a list is exhausted
            # above cur only if cur grows monotonically — starts increase,
            # so every later p0 fails the same exhausted list too
            return False
    return False


def phrase_freq(shifted_positions: list[np.ndarray], slop: int = 0) -> int:
    """Number of disjoint sloppy matches given query-shifted, ascending
    position arrays (one per phrase term)."""
    if not shifted_positions or any(len(p) == 0 for p in shifted_positions):
        return 0
    ptrs = [0] * len(shifted_positions)
    count = 0
    while True:
        heads = [int(p[i]) for p, i in zip(shifted_positions, ptrs)]
        lo, hi = min(heads), max(heads)
        if hi - lo <= slop:
            count += 1
            ptrs = [i + 1 for i in ptrs]
            if any(i >= len(p) for p, i in zip(shifted_positions, ptrs)):
                return count
        else:
            j = heads.index(lo)
            ptrs[j] += 1
            if ptrs[j] >= len(shifted_positions[j]):
                return count


def minimal_intervals_two(pos_a: np.ndarray, pos_b: np.ndarray) -> list[tuple[int, int]]:
    """Minimal intervals of the unordered pair {A, B} ([U] lucene/queries/
    .../intervals/ — an interval is minimal iff it properly contains no
    other matching interval). For two single terms: candidates pair each
    a-occurrence with its nearest b on either side; dominated (properly
    containing) candidates are removed. Shared by the engine and any
    oracle that reimplements containment."""
    if len(pos_a) == 0 or len(pos_b) == 0:
        return []
    cands = set()
    for x in np.asarray(pos_a, dtype=np.int64):
        i = int(np.searchsorted(pos_b, x))
        if i < len(pos_b):
            cands.add((int(min(x, pos_b[i])), int(max(x, pos_b[i]))))
        if i > 0:
            cands.add((int(min(x, pos_b[i - 1])), int(max(x, pos_b[i - 1]))))
    out = []
    for lo, hi in cands:
        if not any((lo2 >= lo and hi2 <= hi and (lo2, hi2) != (lo, hi))
                   for lo2, hi2 in cands):
            out.append((lo, hi))
    return sorted(out)

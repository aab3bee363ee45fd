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

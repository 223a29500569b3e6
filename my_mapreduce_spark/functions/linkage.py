"""Record-linkage comparators: batch-vectorized Jaro / Jaro-Winkler.

Spark has no jaro built-in (only ``levenshtein`` / ``soundex``), and
the per-pair greedy character matching is inherently sequential over
STRING POSITIONS — not expressible as DataFrame column algebra. The
right Spark shape is therefore an Arrow-batched scalar pandas_udf
whose kernel vectorizes across the BATCH: strings become a padded
(n, L) codepoint matrix and every loop below runs over the ≤ L (or
≤ L²) character positions with numpy row-vector ops — never a Python
loop over rows. Cost is O(L²) vector ops per batch (L = longest
string in the batch), which at part-name lengths (~40 chars) is a few
ms per 10k-row Arrow batch.

At 100 TB the comparator NEVER sees raw pairs: it runs strictly after
a candidate generator (blocking / sorted neighborhood / LSH — see
q_jaro_winkler_blocked, q_sorted_neighborhood_pairs), so its input is
candidate-bounded exactly like every verification stage in
queries/dedup.py.

Conventions are pinned bit-for-bit against DuckDB's
``jaro_winkler_similarity`` (tests/test_record_linkage.py — 30k real
name pairs, max abs diff 0.0):

- the alphabet is UTF-8 BYTES, not codepoints (DuckDB runs jaro over
  the raw VARCHAR bytes; identical for ASCII, and the hypothesis
  sweep pinned the multibyte divergence);
- match window: floor(max(l1, l2) / 2) - 1 over byte lengths, clamped
  at 0; greedy first-unmatched matching scanning s2 left-to-right per
  s1 position;
- transpositions are FLOORED: t = (#mismatched matched positions) // 2
  (the rapidfuzz/DuckDB convention — textbook half-as-float differs
  on odd mismatch counts, e.g. jaro(' ge', 'e gear'));
- either side empty -> 0.0 (both-empty included);
- Winkler prefix boost (up to 4 chars, p = 0.1) applies only when
  jaro > 0.7 (the standard boost threshold).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WINKLER_P = 0.1
_BOOST_THRESHOLD = 0.7
_MAX_PREFIX = 4


def blocked_pairs(df: DataFrame, block_keys: list[str],
                  key: str) -> DataFrame:
    """Equality-blocked candidate pairs: self-join ``df`` on every
    column in ``block_keys`` with ``a.key < b.key`` ordering the pair
    once. THE candidate-generator contract of the linkage family
    (q_er_fellegi_sunter, q_jaro_winkler_blocked share this single
    definition so the block key cannot drift between the agreement
    scorer and the comparator — brand-only blocking went quadratic
    once already, see BASELINE.md round 7). Callers reference the
    two sides as ``a.<col>`` / ``b.<col>``.

    The composite key must have corpus-tracking cardinality: pairs
    per block are quadratic in block size, so a fixed-cardinality
    key (brand: 25 values at every scale) makes the pair relation
    quadratic in the corpus. Use sorted-neighborhood
    (q_sorted_neighborhood_pairs) when no such key exists."""
    a, b = df.alias("a"), df.alias("b")
    cond = F.col(f"a.{key}") < F.col(f"b.{key}")
    for k in block_keys:
        cond = (F.col(f"a.{k}") == F.col(f"b.{k}")) & cond
    return a.join(b, cond)


def _byte_matrix(vals: list[bytes], n: int, width: int) -> np.ndarray:
    """Pad n UTF-8 byte strings into an (n, width) uint8 matrix
    (0 = pad; NUL never occurs in real text columns). BYTES, not
    codepoints: DuckDB's jaro runs over the raw VARCHAR bytes, and
    bit-equality with the oracle requires the same alphabet
    (hypothesis found the divergence on multibyte codepoints —
    identical for ASCII)."""
    m = np.zeros((n, width), np.uint8)
    for i, x in enumerate(vals):
        if x:
            m[i, : len(x)] = np.frombuffer(x, np.uint8)
    return m


def jaro_batch(s1: pd.Series, s2: pd.Series,
               winkler: bool = True) -> np.ndarray:
    """Jaro (or Jaro-Winkler) similarity for a batch of string pairs;
    all loops run over character positions, vectorized across rows."""
    a_vals = [x.encode("utf-8") for x in s1.fillna("").tolist()]
    b_vals = [x.encode("utf-8") for x in s2.fillna("").tolist()]
    n = len(a_vals)
    if n == 0:
        return np.zeros(0, np.float64)
    l1 = np.fromiter((len(x) for x in a_vals), np.int64, count=n)
    l2 = np.fromiter((len(x) for x in b_vals), np.int64, count=n)
    L = int(max(l1.max(initial=0), l2.max(initial=0), 1))
    A = _byte_matrix(a_vals, n, L)
    B = _byte_matrix(b_vals, n, L)

    # greedy match: a[i] pairs with the first unmatched b[j] inside
    # the window |i - j| <= mw; the j-scan is the inner position loop,
    # each step one boolean row-vector op over the whole batch
    mw = np.maximum(np.maximum(l1, l2) // 2 - 1, 0)
    matched_a = np.zeros((n, L), bool)
    matched_b = np.zeros((n, L), bool)
    for i in range(L):
        ai = A[:, i]
        lo = np.maximum(i - mw, 0)
        hi = np.minimum(i + mw + 1, l2)
        found = np.zeros(n, bool)
        live = i < l1
        if not live.any():
            break
        for j in range(L):
            cand = (live & ~found & (j >= lo) & (j < hi)
                    & (B[:, j] == ai) & ~matched_b[:, j])
            matched_b[:, j] |= cand
            found |= cand
        matched_a[:, i] = found

    # transpositions: scatter matched codepoints into order slots
    # (cumsum ranks), compare the two ordered sequences
    m = matched_a.sum(1)
    oa = np.cumsum(matched_a, 1) - 1
    ob = np.cumsum(matched_b, 1) - 1
    SA = np.zeros((n, L), np.uint8)
    SB = np.zeros((n, L), np.uint8)
    r, c = np.nonzero(matched_a)
    SA[r, oa[r, c]] = A[r, c]
    r, c = np.nonzero(matched_b)
    SB[r, ob[r, c]] = B[r, c]
    k = np.arange(L)[None, :]
    t = ((SA != SB) & (k < m[:, None])).sum(1) // 2  # FLOORED (DuckDB)

    safe = np.where(m > 0, m, 1)
    sl1 = np.where(l1 > 0, l1, 1)
    sl2 = np.where(l2 > 0, l2, 1)
    jaro = np.where(
        m > 0, (m / sl1 + m / sl2 + (m - t) / safe) / 3.0, 0.0)
    if not winkler:
        return jaro

    pref = np.zeros(n, np.int64)
    live = np.ones(n, bool)
    for i in range(min(_MAX_PREFIX, L)):
        live = live & (i < l1) & (i < l2) & (A[:, i] == B[:, i])
        pref += live
    return np.where(jaro > _BOOST_THRESHOLD,
                    jaro + pref * _WINKLER_P * (1.0 - jaro), jaro)

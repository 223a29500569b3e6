"""Shared text expression builders: tokens, shingles, hashes.

All hashing is md5-based so the DuckDB oracle can reproduce every
signature bit-for-bit (Spark ``xxhash64``/``hash`` and DuckDB
``hash`` are engine-specific; ``md5`` is the deterministic common
ground). md5 is only used as a uniform hash here, never for
security.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT = r"[^a-z0-9]+"


def tokens(col="text") -> Column:
    """Non-empty lowercase word tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, TOKEN_SPLIT), lambda x: x != "")


def shingles(words: Column, n: int = 3) -> Column:
    """Word n-gram shingles as space-joined strings; empty array for
    docs shorter than n words (callers filter those)."""
    return F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )


def minhash_expr(seed: int) -> Column:
    """One MinHash component: min over the group of
    md5('<seed>|' || shingle). String-min of a uniform hex hash is a
    valid MinHash permutation, and it is engine-portable.
    Use as an aggregate over an exploded (doc, shingle) relation."""
    return F.min(F.md5(F.concat(F.lit(f"{seed}|"), F.col("shingle"))))

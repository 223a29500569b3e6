"""Property test for q_editdist1_join's candidate generator: the
deletion neighborhood V(s) = {s} ∪ {s minus one char} is a LOSSLESS
candidate source for edit-distance-1 pairs — any a ≠ b with
levenshtein(a, b) <= 1 must share a variant. The fixture oracle
proves it per run on customer names; this pins the claim on
arbitrary short strings so it cannot silently depend on the
fixed-width digit-suffix shape of c_name."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def variants(s: str) -> set[str]:
    """Pure-Python mirror of the query's variant expression
    (coverage_ext.q_editdist1_join: self + each single deletion,
    deduplicated)."""
    return {s} | {s[:i] + s[i + 1:] for i in range(len(s))}


def lev1(a: str, b: str) -> bool:
    """True iff levenshtein(a, b) == 1 (lengths differ by <= 1)."""
    if a == b:
        return False
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    lo, hi = (a, b) if la < lb else (b, a)
    return lo in variants(hi)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(alphabet="ab", min_size=0, max_size=6),
                min_size=2, max_size=8, unique=True))
def test_deletion_neighborhood_is_lossless(names):
    """Every true ed-1 pair is a variant-collision candidate, and
    candidates filtered by the exact check equal the brute-force
    answer — the completeness + soundness contract of the query."""
    cands = set()
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            if variants(a) & variants(b):
                cands.add((min(a, b), max(a, b)))
    truth = {(min(a, b), max(a, b))
             for i, a in enumerate(names) for b in names[i + 1:]
             if lev1(a, b)}
    assert truth <= cands                      # lossless candidates
    filtered = {p for p in cands if lev1(*p)}  # the query's verify step
    assert filtered == truth


def test_spark_variant_expression_matches_mirror(spark):
    """The Spark column expression generates exactly variants()."""
    import pyspark.sql.functions as F

    samples = ["", "a", "ab", "aab", "abba", "Customer#0001"]
    df = spark.createDataFrame([(s,) for s in samples], "c_name string")
    expr = F.array_distinct(F.concat(
        F.array(F.col("c_name")),
        F.transform(
            F.sequence(F.lit(1), F.length("c_name")),
            lambda i: F.concat(
                F.col("c_name").substr(F.lit(1), i - 1),
                F.col("c_name").substr(i + 1, F.length("c_name"))))))
    got = {r["c_name"]: set(r["v"])
           for r in df.select("c_name", expr.alias("v")).collect()}
    for s in samples:
        assert got[s] == variants(s), s

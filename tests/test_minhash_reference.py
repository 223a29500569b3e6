"""Bit-exact cross-check of minhash_lsh_pairs against an
independent pure-Python implementation of the same md5 scheme —
signatures, band hashes, candidate generation, and match counts must
agree on every pair, for more than one (bands, rows) config. This is
the oracle-style gate for the parametrized builder (the registered
3x3 instance also has a DuckDB oracle; this covers the knob's other
settings)."""

from __future__ import annotations

import hashlib
import random


def _py_reference(doc_shingles: dict[int, set[str]], n_bands: int,
                  n_rows: int) -> set[tuple]:
    """(doc_a, doc_b, n_matches) for every candidate pair, computed
    with plain hashlib — no Spark."""
    n = n_bands * n_rows

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    sig = {d: [min(md5(f"{i}|{s}") for s in sh) for i in range(n)]
           for d, sh in doc_shingles.items()}
    bands = {d: [md5("".join(m[j * n_rows:(j + 1) * n_rows]))
                 for j in range(n_bands)] for d, m in sig.items()}
    docs = sorted(doc_shingles)
    out = set()
    for ai, a in enumerate(docs):
        for b in docs[ai + 1:]:
            if any(x == y for x, y in zip(bands[a], bands[b])):
                matches = sum(x == y for x, y in zip(sig[a], sig[b]))
                out.add((a, b, matches))
    return out


def _random_corpus(seed: int, n_docs: int = 30):
    """Docs drawn from a small shared shingle universe so band
    collisions actually happen, plus a few planted exact/near dups."""
    rng = random.Random(seed)
    universe = [f"u{i}" for i in range(40)]
    docs = {}
    for d in range(n_docs):
        k = rng.randint(3, 12)
        docs[d] = set(rng.sample(universe, k))
    docs[n_docs] = set(docs[0])                      # exact dup
    near = set(docs[1])
    near.add("u_extra")                              # near dup
    docs[n_docs + 1] = near
    return docs


def test_builder_matches_pure_python_reference(spark):
    from my_mapreduce_spark.queries.dedup import minhash_lsh_pairs

    for seed in (7, 41):
        corpus = _random_corpus(seed)
        rows = [(d, s) for d, sh in corpus.items() for s in sh]
        df = spark.createDataFrame(rows, "doc_id long, shingle string")
        for bands, rows_per in ((3, 3), (4, 2)):
            got = {(r.doc_a, r.doc_b, r.n_matches) for r in
                   minhash_lsh_pairs(df, bands, rows_per).collect()}
            want = _py_reference(corpus, bands, rows_per)
            assert got == want, (
                f"seed={seed} config={bands}x{rows_per}: "
                f"spark^py={got ^ want}")
            spark.catalog.clearCache()
        # the exact dup must always be a full-signature match
        n = 3 * 3
        assert any(a == 0 and m == n for a, b, m in
                   _py_reference(corpus, 3, 3) if b == len(corpus) - 2)


def test_cw_scheme_matches_pure_python_reference(spark):
    """scheme="cw" (Carter-Wegman permutations over one md5-derived
    32-bit shingle hash) must equal an independent hashlib+int
    implementation bit-for-bit — the oracle-style gate for the
    production-fidelity path."""
    from my_mapreduce_spark.queries.dedup import (_cw_params,
                                                  minhash_lsh_pairs)

    corpus = _random_corpus(11)
    rows = [(d, s) for d, sh in corpus.items() for s in sh]
    df = spark.createDataFrame(rows, "doc_id long, shingle string")
    for bands, rows_per in ((4, 2), (8, 4)):
        n = bands * rows_per
        params, prime = _cw_params(n)

        def halves(s: str) -> tuple[int, int]:
            hx = hashlib.md5(s.encode()).hexdigest()
            return int(hx[:7], 16), int(hx[7:14], 16)

        sig = {d: [min((a * halves(s)[0] + b * halves(s)[1] + c) % prime
                       for s in sh)
                   for a, b, c in params]
               for d, sh in corpus.items()}
        bnd = {d: [hashlib.md5("|".join(
                    str(m[j * rows_per + k]) for k in range(rows_per))
                    .encode()).hexdigest() for j in range(bands)]
               for d, m in sig.items()}
        docs = sorted(corpus)
        want = set()
        for ai, a in enumerate(docs):
            for b in docs[ai + 1:]:
                if any(x == y for x, y in zip(bnd[a], bnd[b])):
                    want.add((a, b,
                              sum(x == y for x, y in zip(sig[a], sig[b]))))
        got = {(r.doc_a, r.doc_b, r.n_matches) for r in
               minhash_lsh_pairs(df, bands, rows_per,
                                 scheme="cw").collect()}
        assert got == want, f"{bands}x{rows_per}: {got ^ want}"
        spark.catalog.clearCache()

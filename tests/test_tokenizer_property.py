"""Property-based tokenizer parity (SURVEY.md §7 risk #1).

The reference tokenizes with Go ``unicode.IsLetter``
(``mrapps/wc.go:21-26``); our three implementations must agree:

- Python: ``str.isalpha`` split (``apps.tokenize``) — the
  sequential-golden side;
- Spark JVM: ``split(text, '[^\\p{L}]+')`` — the fast path;
- DuckDB: ``regexp_split_to_array(text, '[^\\p{L}]+')`` — the oracle.

Hypothesis generates adversarial unicode (combining marks, digits
of many scripts, surrogum-adjacent codepoints, empty/edge strings);
each batch round-trips through all three tokenizers.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from my_mapreduce_spark.apps import tokenize

# Mixed alphabet: ASCII, Latin-1, Greek, Cyrillic, CJK, digits from
# several scripts, combining marks, punctuation, whitespace variants.
_ALPHABET = st.characters(
    codec="utf-8",
    categories=("Lu", "Ll", "Lt", "Lm", "Lo",   # letters (all scripts)
                "Nd", "No",                     # digits / number forms
                "Mn", "Mc",                     # combining marks
                "Po", "Ps", "Pe", "Zs", "Cc"))  # punct / space / control

texts = st.lists(st.text(_ALPHABET, max_size=60), min_size=1, max_size=24)


def _duck_tokenize(con, vals: list[str]) -> list[list[str]]:
    rel = con.sql(
        r"""
        SELECT list_filter(regexp_split_to_array(t, '[^\p{L}]+'), x -> x <> '')
        FROM (SELECT UNNEST($vals) AS t)
        """, params={"vals": vals})
    return [row[0] for row in rel.fetchall()]


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(texts)
def test_python_vs_duckdb_tokenizer(batch):
    con = duckdb.connect()
    got = _duck_tokenize(con, batch)
    want = [tokenize(t) for t in batch]
    assert got == want


@pytest.mark.parametrize("probe", [
    "", " ", "a", "héllo wörld", "ΚΌσμε κόσμε", "русский текст",
    "日本語テキスト", "foo123bar", "٣٤٥ arabic ١٢ digits",
    "á combining", "tab\tand\nnewline", "ǅungla titlecase",
    "ʻokina ʼmodifier", "ⅣⅤ roman numerals", "half­soft-hyphen",
])
def test_three_way_tokenizer_parity(spark, duck, probe):
    """Spark JVM split vs DuckDB vs Python on curated probes."""
    from pyspark.sql import functions as F
    sdf = spark.createDataFrame([(probe,)], "t string").select(
        F.filter(F.split("t", r"[^\p{L}]+"), lambda x: x != "").alias("w"))
    jvm = sdf.collect()[0].w
    dk = _duck_tokenize(duck, [probe])[0]
    py = tokenize(probe)
    assert jvm == dk == py, f"probe {probe!r}: jvm={jvm} duck={dk} py={py}"

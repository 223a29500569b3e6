"""The reference's application Map/Reduce pairs, re-stated in Python.

These are the literal plugin closures from ``/root/reference/mrapps/``
(loaded there via ``go build -buildmode=plugin`` +
``main/mrworker.go:35-52``), usable with
:func:`my_mapreduce_spark.mapreduce.mapreduce`. The DataFrame-native
fast paths live in ``queries/reference_parity.py``; these exist for
exact golden parity with a sequential run of the original logic.
"""

from __future__ import annotations


def tokenize(text: str) -> list[str]:
    """Split on runs of non-letters, like the reference's
    ``strings.FieldsFunc(contents, !unicode.IsLetter)``
    (mrapps/wc.go:21-26). Python ``str.isalpha`` matches Unicode
    letters like Go ``unicode.IsLetter``."""
    return "".join(c if c.isalpha() else " " for c in text).split()


def wc_map(filename: str, contents: str):
    """mrapps/wc.go:27-33 — emit (word, "1") per token."""
    return [(w, "1") for w in tokenize(contents)]


def wc_reduce(key: str, values: list[str]) -> str:
    """mrapps/wc.go:39-42 — count of values, stringified."""
    return str(len(values))


def indexer_map(filename: str, contents: str):
    """mrapps/indexer.go:21-32 — per-doc distinct words → (word, doc)."""
    return [(w, filename) for w in set(tokenize(contents))]


def indexer_reduce(key: str, values: list[str]) -> str:
    """mrapps/indexer.go:37-40 — "<doc count> <sorted doc list>"."""
    return f"{len(values)} {','.join(sorted(values))}"


def early_exit_map(filename: str, contents: str):
    """mrapps/early_exit.go:19-23 — one (filename, "1") per input."""
    return [(filename, "1")]


def early_exit_reduce(key: str, values: list[str]) -> str:
    """mrapps/early_exit.go:28-36, minus the harness sleep."""
    return str(len(values))


def concat_map(filename: str, contents: str):
    """mrapps/nocrash.go:28-40 (crash.go:36-45 minus fault injection):
    four fixed keys a-d carrying doc name / lengths / a constant."""
    return [("a", filename),
            ("b", str(len(filename))),
            ("c", str(len(contents))),
            ("d", "xyzzy")]


def concat_reduce(key: str, values: list[str]) -> str:
    """mrapps/nocrash.go:42-49 — sorted space-join of all values."""
    return " ".join(sorted(values))

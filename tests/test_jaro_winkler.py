"""Jaro-Winkler kernel parity: the engine's Python kernel must be
bit-identical to DuckDB's jaro_winkler_similarity (RapidFuzz semantics) —
that is what lets the registry oracle hash-compare scores. No Spark session
needed; this is a pure-kernel differential test."""

from __future__ import annotations

import random

import duckdb
import pytest

from hierarchical_graph_db_spark.operators.dedup_fuzzy import jaro_winkler


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _duck_jw(con, a: str, b: str) -> float:
    return con.execute(
        "select jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]


def test_textbook_values(duck):
    # Winkler's canonical examples + boost-threshold behavior
    assert jaro_winkler("martha", "marhta") == pytest.approx(
        0.9611111111111111, abs=0)
    assert jaro_winkler("dixon", "dicksonx") == pytest.approx(
        0.8133333333333332, abs=0)
    # below the 0.7 boost threshold the prefix bonus must NOT apply
    low = jaro_winkler("abcdzzzzzz", "abcdyyyy")
    assert low == _duck_jw(duck, "abcdzzzzzz", "abcdyyyy")


def test_edges(duck):
    for a, b in [("", ""), ("x", ""), ("", "x"), ("a", "a"),
                 ("ab", "ba"), ("aaaa", "aaaa")]:
        assert jaro_winkler(a, b) == _duck_jw(duck, a, b), (a, b)


def test_fuzz_bit_parity(duck):
    rnd = random.Random(20260814)
    alphabet = "abcdef #xyz0123"
    for _ in range(8000):
        a = "".join(rnd.choice(alphabet)
                    for _ in range(rnd.randint(0, 14)))
        b = "".join(rnd.choice(alphabet)
                    for _ in range(rnd.randint(0, 14)))
        assert jaro_winkler(a, b) == _duck_jw(duck, a, b), (a, b)


def test_symmetry():
    rnd = random.Random(7)
    for _ in range(500):
        a = "".join(rnd.choice("abcd") for _ in range(rnd.randint(0, 9)))
        b = "".join(rnd.choice("abcd") for _ in range(rnd.randint(0, 9)))
        assert jaro_winkler(a, b) == jaro_winkler(b, a)

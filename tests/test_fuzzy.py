"""edit1_pairs: deletion-neighborhood banding must be EXACT at d≤1 —
checked against a brute-force O(n²) Levenshtein over planted typo
populations (insertion / deletion / substitution / far strings)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdx_writer_spark.functions import fuzzy


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(names):
    distinct = sorted(set(names))
    out = set()
    for i, a in enumerate(distinct):
        for b in distinct[i + 1:]:
            d = _lev(a, b)
            if d <= 1:
                out.add((a, b, d))
    return out


def _run(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "name string")
    return {(r["name_a"], r["name_b"], r["dist"])
            for r in fuzzy.edit1_pairs(df, "name").collect()}


def test_matches_bruteforce_on_typo_population(spark):
    base = [f"host{i}.example.com" for i in range(30)]
    typos = ([s[1:] for s in base[:10]]            # deletion
             + [s + "x" for s in base[10:20]]      # insertion
             + [("Z" + s[1:]) for s in base[20:]]  # substitution
             + ["completely-different", ""])       # far + empty
    names = base + typos
    assert _run(spark, names) == _brute(names)


def test_exact_duplicates_collapse_not_pair(spark):
    # identical strings are ONE distinct name — no (x, x, 0) row
    got = _run(spark, ["abc", "abc", "abc", "abd"])
    assert got == {("abc", "abd", 1)}


def test_single_char_and_empty_edges(spark):
    got = _run(spark, ["", "a", "b", "ab"])
    # "" ~ "a" (1), "" ~ "b" (1), "a" ~ "b" (1), "a" ~ "ab" (1),
    # "b" ~ "ab" (1); "" ~ "ab" is 2
    assert got == {("", "a", 1), ("", "b", 1), ("a", "b", 1),
                   ("a", "ab", 1), ("ab", "b", 1)}


def test_partitioning_invariant(spark):
    names = [f"w{i % 17}x{i % 5}" for i in range(200)]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    a = {tuple(r) for r in fuzzy.edit1_pairs(
        df.repartition(1), "name").collect()}
    b = {tuple(r) for r in fuzzy.edit1_pairs(
        df.repartition(16, "name"), "name").collect()}
    assert a == b and a


def test_plan_is_fully_native(spark):
    df = spark.createDataFrame([("abc",), ("abd",)], "name string")
    plan = (fuzzy.edit1_pairs(df, "name")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan

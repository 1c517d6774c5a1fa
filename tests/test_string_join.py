"""PassJoin exact edit-distance join: dual-implementation checks
against a from-scratch DP-Levenshtein brute force (the completeness
proof q92 gets from its integer prefix filter, applied to the
edit-distance join)."""

import itertools
import random

import pytest

from pubmed_and_method_spark.operators.string_join import passjoin_edit_join


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
            prev = cur
    return dp[-1]


def _truth(strs, tau):
    return sorted(
        (min(a, b), max(a, b), _lev(a, b))
        for a, b in itertools.combinations(sorted(set(strs)), 2)
        if _lev(a, b) <= tau
    )


@pytest.mark.parametrize("tau", [1, 2, 3])
def test_passjoin_equals_brute_force_binary_alphabet(spark, tau):
    """Adversarial tiny alphabet: maximal near-dup density, lengths
    1..9 straddling the short-pool boundary at every tau."""
    rng = random.Random(7)
    strs = list(
        {
            "".join(rng.choice("ab") for _ in range(rng.randint(1, 9)))
            for _ in range(150)
        }
    )
    df = spark.createDataFrame([(s,) for s in strs], ["name"])
    got = sorted(
        tuple(r) for r in passjoin_edit_join(df, "name", tau=tau).collect()
    )
    assert got == _truth(strs, tau)


def test_passjoin_name_like_corpus(spark):
    """Realistic shape: surname-like strings with planted typos."""
    rng = random.Random(11)
    base = ["garcia", "martinez", "smith", "okonkwo", "li", "nakamura"]
    strs = set(base)
    for s in base:
        for _ in range(4):
            i = rng.randrange(len(s))
            strs.add(s[:i] + rng.choice("xyz") + s[i + 1 :])  # sub
            strs.add(s[:i] + s[i + 1 :])  # del
            strs.add(s[:i] + rng.choice("xyz") + s[i:])  # ins
    strs = sorted(strs)
    df = spark.createDataFrame([(s,) for s in strs], ["name"])
    got = sorted(
        tuple(r) for r in passjoin_edit_join(df, "name", tau=2).collect()
    )
    assert got == _truth(strs, 2)
    assert len(got) > 0


def test_passjoin_drops_empties_and_dedupes(spark):
    df = spark.createDataFrame(
        [("", ), ("a",), ("a",), ("ab",)], ["name"]
    )
    rows = sorted(
        tuple(r) for r in passjoin_edit_join(df, "name", tau=1).collect()
    )
    # empty string never appears; duplicate inputs yield one pair
    assert rows == [("a", "ab", 1)]

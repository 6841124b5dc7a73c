"""Frequent-itemset mining: hand-computed lattice + rule math."""

from pyspark.sql import functions as F

from dataflowex_spark.operators.itemsets import (
    association_rules,
    frequent_itemsets,
)

# 6 baskets; {1,2} in 4, {1,2,3} in 3, item 4 in 2, item 5 in 1
BASKETS = [
    (1, [1, 2, 3]),
    (2, [1, 2, 3]),
    (3, [1, 2, 3, 4]),
    (4, [1, 2, 4]),
    (5, [1, 5]),
    (6, [2, 3]),
]


def _bi(spark):
    return spark.createDataFrame(
        [(b, i) for b, items in BASKETS for i in items], "b int, i int"
    )


def test_lattice_exact(spark):
    got = {
        (r["itemset"], r["k"]): r["s"]
        for r in frequent_itemsets(_bi(spark), "b", "i", 3).collect()
    }
    assert got == {
        ("1", 1): 5,
        ("2", 1): 5,
        ("3", 1): 4,
        ("1|2", 2): 4,
        ("1|3", 2): 3,
        ("2|3", 2): 4,
        ("1|2|3", 3): 3,
    }


def test_threshold_and_max_size(spark):
    only_pairs = frequent_itemsets(_bi(spark), "b", "i", 3, max_size=2)
    assert only_pairs.filter(F.col("k") == 3).count() == 0
    # raising support to 5 kills every pair (max pair support is 4)
    strict = frequent_itemsets(_bi(spark), "b", "i", 5)
    assert {r["itemset"] for r in strict.collect()} == {"1", "2"}


def test_duplicate_rows_do_not_inflate_support(spark):
    dup = _bi(spark).unionByName(_bi(spark).limit(4))
    a = frequent_itemsets(_bi(spark), "b", "i", 3).collect()
    b = frequent_itemsets(dup, "b", "i", 3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_rules_confidence_ppm(spark):
    sets = frequent_itemsets(_bi(spark), "b", "i", 3, max_size=2)
    rules = {
        (r["antecedent"], r["consequent"]): r["conf_ppm"]
        for r in association_rules(sets, 0).collect()
    }
    # conf(1→2) = 4/5, conf(3→2) = 4/4
    assert rules[("1", "2")] == 800_000
    assert rules[("3", "2")] == 1_000_000
    # threshold filters: ≥ 81% keeps only the 100% and 4/4-style rules
    high = association_rules(sets, 810_000)
    assert all(r["conf_ppm"] >= 810_000 for r in high.collect())

"""Unit tests for the skew-aware shuffle utilities."""

from pyspark.sql import functions as F

from doccrawler_spark.shuffle import global_sequence, topk_per_group


def test_global_sequence_dense_and_ordered(spark):
    rows = [(f"k{i:04d}", i % 7) for i in range(500)]
    df = spark.createDataFrame(rows, "key string, grp int")
    out = global_sequence(df, ["key"], "seq", start=100).collect()
    by_key = sorted(out, key=lambda r: r["key"])
    seqs = [r["seq"] for r in by_key]
    assert seqs == list(range(100, 600))


def test_global_sequence_empty(spark):
    df = spark.createDataFrame([], "key string")
    assert global_sequence(df, ["key"], "seq").count() == 0


def test_topk_per_group_exact_split(spark):
    rows = [(g, i, f"u{g}-{i}") for g in ["a", "b", "hot"] for i in range(
        50 if g == "hot" else 5)]
    df = spark.createDataFrame(rows, "host string, priority int, url string")
    top, rest = topk_per_group(
        df, "host", ["priority"], F.lit(3), salt=4, unique_col="url"
    )
    t = top.collect()
    r = rest.collect()
    assert len(t) + len(r) == len(rows)
    for g, n in [("a", 3), ("b", 3), ("hot", 3)]:
        got = sorted(x["priority"] for x in t if x["host"] == g)
        assert got == [0, 1, 2], (g, got)
    # rest holds everything else, no dupes across halves
    assert {(x["host"], x["priority"]) for x in t}.isdisjoint(
        {(x["host"], x["priority"]) for x in r}
    )


def test_topk_per_group_variable_k(spark):
    rows = [("a", i, 2) for i in range(10)] + [("b", i, 5) for i in range(10)]
    df = spark.createDataFrame(rows, "host string, priority int, quota int")
    top, rest = topk_per_group(df, "host", ["priority"], F.col("quota"), salt=3)
    per = {g: sorted(x["priority"] for x in top.collect() if x["host"] == g)
           for g in ["a", "b"]}
    assert per == {"a": [0, 1], "b": [0, 1, 2, 3, 4]}

"""Remaining relational/commons coverage: renames, string ops, membership
annotation, truthy filters, group-count HAVING."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_thoughts_spark.operators import relational


def test_force_rename_clobbers(spark):
    df = spark.createDataFrame([(1, "a", "b")], "id int, x string, y string")
    out = relational.force_rename_columns(df, {"x": "y"})
    assert out.columns == ["id", "y"]
    assert out.collect()[0]["y"] == "a"


def test_strip_and_concat_columns(spark):
    df = spark.createDataFrame([("  hi  ", "there")], "a string, b string")
    out = relational.strip_column(df, "a")
    assert out.collect()[0]["a"] == "hi"
    cc = relational.concatenate_columns(out, ["a", "b"], "joined", start="<", sep=" ", end=">")
    assert cc.collect()[0]["joined"] == "<hi there>"


def test_filter_truthy_and_select_rows(spark):
    df = spark.createDataFrame(
        [(1, True, "x"), (2, False, "x"), (3, True, "y")], "id int, ok boolean, k string"
    )
    assert relational.filter_truthy(df, "ok").count() == 2
    assert relational.filter_truthy(df, "ok", keep_truthy=False).count() == 1
    assert relational.select_rows(df, {"ok": True, "k": "x"}).count() == 1
    assert relational.select_rows_regex(df, "k", "^y$").count() == 1
    assert relational.filter_by_values(df, "k", include=["y"]).count() == 1
    assert relational.filter_by_values(df, "k", exclude=["y"]).count() == 2


def test_annotate_membership_broadcast(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, dom string")
    dim = spark.createDataFrame([("a",), ("c",)], "dom string")
    out = relational.annotate_membership(df, dim, "dom", "is_edu")
    got = {r["id"]: r["is_edu"] for r in out.collect()}
    assert got == {1: True, 2: False, 3: True}


def test_count_and_filter_low_frequency(spark):
    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 2 + [("c",)] * 1, "dom string"
    )
    out = relational.count_and_filter_low_frequency(df, "dom", 2)
    got = {r["dom"]: r["count"] for r in out.collect()}
    assert got == {"a": 5, "b": 2}


def test_shard_and_group_by_partition(spark):
    df = spark.range(100).withColumn("k", (F.col("id") % 5).cast("string"))
    assert relational.shard(df, 7).rdd.getNumPartitions() == 7
    grouped = relational.group_by_partition(df, ["k"], 5)
    # co-location: every key lives in exactly one partition
    spread = (
        grouped.withColumn("p", F.spark_partition_id())
        .groupBy("k")
        .agg(F.countDistinct("p").alias("nparts"))
    )
    assert spread.filter(F.col("nparts") != 1).count() == 0


def test_add_row_ids_scalable_matches_global_window(spark):
    from open_thoughts_spark.operators import relational

    df = spark.range(0, 5000).select(
        (F.col("id") * 37 % 5000).alias("k"), F.col("id").alias("v")
    )
    a = {r["k"]: r["row_id"]
         for r in relational.add_row_ids(df, ["k"]).collect()}
    b = {r["k"]: r["row_id"]
         for r in relational.add_row_ids_scalable(df, ["k"], num_partitions=8).collect()}
    assert a == b
    assert sorted(b.values()) == list(range(1, 5001))  # dense 1..N


def test_asof_join_backward_inclusive(spark):
    from open_thoughts_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, "l-a"), (1, 5, "l-b"), (1, 3, "l-c"), (2, 7, "l-d")],
        "k long, ts long, lname string",
    )
    right = spark.createDataFrame(
        [(1, 10, "r-x"), (1, 4, "r-y"), (2, 9, "r-z")],
        "k long, ts long, rname string",
    )
    out = {r["lname"]: r["rname_asof"]
           for r in asof_join(left, right, ["k"], "ts", "ts", ["rname"]).collect()}
    assert out == {
        "l-a": "r-x",   # equal ts matches (inclusive)
        "l-b": "r-y",   # latest at-or-before 5 is ts=4
        "l-c": None,    # nothing at-or-before 3
        "l-d": None,    # right ts=9 is after left ts=7
    }
    # row count preserved (left join)
    assert asof_join(left, right, ["k"], "ts", "ts", ["rname"]).count() == 4


def test_range_join_bucket_expansion(spark):
    from open_thoughts_spark.operators.asof import range_join

    points = spark.createDataFrame(
        [(1, "2025-01-01 10:00:00", "p1"), (1, "2025-01-01 11:59:59", "p2"),
         (1, "2025-01-01 12:00:00", "p3"), (2, "2025-01-01 10:30:00", "p4")],
        "k long, ts string, pid string",
    ).withColumn("ts", F.to_timestamp("ts"))
    ivals = spark.createDataFrame(
        [(1, "2025-01-01 10:00:00", "2025-01-01 12:00:00", "w1"),
         (2, "2025-01-01 11:00:00", "2025-01-01 13:00:00", "w2")],
        "k long, s string, e string, wid string",
    ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))
    got = {(r["pid"], r["wid"])
           for r in range_join(points, ivals, ["k"], "ts", "s", "e",
                               bucket_seconds=1800).collect()}
    # start inclusive, end exclusive; keys respected; exactly one row/pair
    assert got == {("p1", "w1"), ("p2", "w1")}


def test_asof_join_whole_row_and_null_semantics(spark):
    """Code-review r2: multi-column right values must come from ONE right
    row (no per-column mixing over NULLs), and NULL keys/timestamps never
    match — like the SQL ASOF join."""
    from open_thoughts_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 2, "l1"), (7, 5, "l7"), (None, 4, "ln")],
        "k long, ts long, lname string",
    )
    right = spark.createDataFrame(
        [
            (1, 0, 1, 2),        # older row, both values set
            (1, 1, 5, None),     # newer row, b is NULL
            (7, None, 9, 9),     # NULL ts: must never match
            (None, 1, 8, 8),     # NULL key: must never match
        ],
        "k long, ts long, a long, b long",
    )
    rows = {r["lname"]: (r["a_asof"], r["b_asof"])
            for r in asof_join(left, right, ["k"], "ts", "ts", ["a", "b"]).collect()}
    assert rows["l1"] == (5, None)   # whole newest row, NOT (5, 2)
    assert rows["l7"] == (None, None)
    assert rows["ln"] == (None, None)


def test_range_join_inverted_interval_yields_nothing(spark):
    from open_thoughts_spark.operators.asof import range_join

    points = spark.createDataFrame(
        [(1, "2025-01-01 10:00:00", "p1")], "k long, ts string, pid string"
    ).withColumn("ts", F.to_timestamp("ts"))
    bad = spark.createDataFrame(
        [(1, "2025-06-01 00:00:00", "2025-01-01 00:00:00", "wbad")],
        "k long, s string, e string, wid string",
    ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))
    assert range_join(points, bad, ["k"], "ts", "s", "e").count() == 0


def test_bench_headline_keys_exist():
    """Every bench.py headline query must exist in the entry registry —
    a rename otherwise breaks only at driver bench time."""
    import bench

    import __spark_entry__ as entrymod

    missing = set(bench.HEADLINE) - set(entrymod.queries())
    assert not missing, missing
    # and the driver contract: every query has an oracle
    assert sorted(entrymod.queries()) == sorted(entrymod.oracle_sql())


def test_sample_to_token_budget(spark):
    """Under-budget domains pass through whole; over-budget domains keep an
    ~budget-sized token subset; the decision is deterministic and
    partition-layout independent."""
    rows = [("big", i, 100) for i in range(200)] + [
        ("small", 1000 + i, 10) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "domain string, id long, toks int")
    out = relational.sample_to_token_budget(df, "domain", "toks", 2000, ["id"])
    got = {(r["domain"], r["id"]) for r in out.collect()}
    # small: 50 tokens total, far under budget -> complete
    assert {(d, i) for d, i in got if d == "small"} == {
        ("small", 1000 + i) for i in range(5)
    }
    # big: 20000 tokens at budget 2000 -> ~10% keep, binomial(200, .1)
    n_big = sum(1 for d, _ in got if d == "big")
    assert 5 <= n_big <= 45
    # deterministic and layout-independent
    again = {
        (r["domain"], r["id"])
        for r in relational.sample_to_token_budget(
            df.repartition(7), "domain", "toks", 2000, ["id"]
        ).collect()
    }
    assert again == got
    # a zero-token domain passes through whole (no div-by-zero)
    z = spark.createDataFrame([("z", 1, 0), ("z", 2, 0)], "domain string, id long, toks int")
    assert relational.sample_to_token_budget(z, "domain", "toks", 100, ["id"]).count() == 2


def test_sample_to_token_budget_per_domain_dict(spark):
    """Dict budgets: listed domains get their own budget; unlisted domains
    pass through whole without a default, and follow default_budget with
    one. The scalar form stays equivalent to a constant dict."""
    rows = (
        [("big", i, 100) for i in range(200)]
        + [("mid", 500 + i, 100) for i in range(50)]
        + [("small", 1000 + i, 10) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "domain string, id long, toks int")
    out = relational.sample_to_token_budget(
        df, "domain", "toks", {"big": 2000}, ["id"]
    )
    got = {(r["domain"], r["id"]) for r in out.collect()}
    # unlisted domains, no default -> complete pass-through
    assert sum(1 for d, _ in got if d == "mid") == 50
    assert sum(1 for d, _ in got if d == "small") == 5
    n_big = sum(1 for d, _ in got if d == "big")
    assert 5 <= n_big <= 45  # ~10% keep

    # default_budget applies to unlisted domains
    with_default = {
        (r["domain"], r["id"])
        for r in relational.sample_to_token_budget(
            df, "domain", "toks", {"big": 2000}, ["id"], default_budget=500
        ).collect()
    }
    n_mid = sum(1 for d, _ in with_default if d == "mid")
    assert n_mid < 50  # 5000 tokens at budget 500 -> ~10% keep
    assert sum(1 for d, _ in with_default if d == "small") == 5  # under budget

    # scalar == constant dict with default for every domain
    scalar = {
        (r["domain"], r["id"])
        for r in relational.sample_to_token_budget(
            df, "domain", "toks", 2000, ["id"]
        ).collect()
    }
    dict_form = {
        (r["domain"], r["id"])
        for r in relational.sample_to_token_budget(
            df, "domain", "toks", {}, ["id"], default_budget=2000
        ).collect()
    }
    assert scalar == dict_form

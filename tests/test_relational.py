"""Relational odds and ends not covered by the oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_approx_distinct_within_5pct(spark):
    from gibbon_spark.sources.tables import load_table

    orders = load_table(spark, SF_SMALL, "orders")
    exact = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    approx = {
        r.o_orderpriority: r.n
        for r in orders.groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey").alias("n"))
        .collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.10  # HLL++ default rsd is 5%; small groups wobble


def test_q1_plan_pushes_filter_and_prunes_columns(spark):
    """The scan under Q1 must show a pushed shipdate filter and a pruned
    schema (no scan of unused columns) — the .explain contract from the
    build brief."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q1_pricing_summary"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "l_orderkey" not in plan.split("ReadSchema")[-1]  # pruned


def test_topk_uses_take_ordered(spark):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["orders_topk"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_q5_broadcasts_dims(spark):
    import __spark_entry__ as entrymod

    df = entrymod.queries()["q5_region_revenue"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_count_min_sketch_upper_bound(spark):
    """CMS guarantee: for any key, min over its 4 cells >= true count."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from gibbon_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    sketch = {
        (r.row_id, r.bucket): r.cnt
        for r in entrymod.queries()["sketch_count_min"](spark, SF_SMALL).collect()
    }
    events = load_table(spark, SF_SMALL, "events")
    truth = {
        r.user_id: r.n
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).limit(20).collect()
    }
    probe = events.select(F.col("user_id").cast("string").alias("uid")).distinct().limit(20)
    cells = probe.select(
        "uid",
        *[
            (
                F.conv(
                    F.substring(F.md5(F.concat_ws(":", F.lit(str(i)), "uid")), 1, 4),
                    16, 10,
                ).cast("int") % 256
            ).alias(f"b{i}")
            for i in range(4)
        ],
    ).collect()
    for r in cells:
        est = min(sketch.get((str(i), r[f"b{i}"]), 0) for i in range(4))
        assert est >= truth.get(int(r.uid), 0)


def test_bloom_prefilter_actually_prunes(spark):
    """The hand-rolled Bloom pre-filter must pass every true match (no
    false negatives — guaranteed by construction, checked anyway) and
    prune a meaningful share of non-matching fact rows (k=4, 64 Kib
    filter => FP rate << 50% at test cardinalities)."""
    from gibbon_spark.queries_llm import _bloom_pos_exprs, _bloom_words_df
    from gibbon_spark.sources.tables import load_table

    words = {r.word: r.bits for r in _bloom_words_df(spark, SF_SMALL).collect()}
    hexstr = "".join(f"{words.get(w, 0):08x}" for w in range(2048))
    orders = load_table(spark, SF_SMALL, "orders").withColumn("__bh", F.lit(hexstr))
    cond = None
    for e in _bloom_pos_exprs("CAST(o_custkey AS STRING)"):
        c = F.expr(
            f"(CAST(conv(substring(__bh, ({e} >> 5) * 8 + 1, 8), 16, 10) AS BIGINT)"
            f" & shiftleft(CAST(1 AS BIGINT), {e} % 32)) != 0"
        )
        cond = c if cond is None else (cond & c)
    passed = orders.filter(cond)
    cust = load_table(spark, SF_SMALL, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    true_matches = orders.join(
        building, orders.o_custkey == building.c_custkey, "left_semi"
    )
    n_total, n_passed, n_true = orders.count(), passed.count(), true_matches.count()
    # no false negatives: every true match survives the probe
    assert (
        true_matches.join(
            passed.select("o_orderkey"), "o_orderkey", "left_anti"
        ).count()
        == 0
    )
    assert n_true <= n_passed < n_total, (n_true, n_passed, n_total)
    # prunes at least half of the non-matching rows
    assert (n_passed - n_true) <= 0.5 * (n_total - n_true), (n_true, n_passed, n_total)


def test_global_running_sum_matches_window(spark):
    """Two-level running sum (repartitionByRange + broadcast offsets)
    must equal the single-window serial semantics exactly, including
    duplicate order values resolved by the tiebreak column."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gibbon_spark.operators.ranking import global_running_sum

    rows = [(i, (i * 7) % 5, float((i * 13) % 97) / 4) for i in range(1, 501)]
    df = spark.createDataFrame(rows, ["k", "grp", "x"])
    val = F.round(F.col("x") + F.lit(1e-9), 4).cast("decimal(24,4)")
    got = global_running_sum(
        df, [F.asc("grp"), F.asc("k")], val, out_col="rs", n_parts=7
    )
    w = Window.orderBy("grp", "k").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("rs", F.sum(val).over(w))
    g = {r.k: float(r.rs) for r in got.collect()}
    e = {r.k: float(r.rs) for r in want.collect()}
    assert g == e

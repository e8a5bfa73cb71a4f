"""Physical layout: partition pruning + bucketed zero-shuffle joins +
UDF surface cross-checks."""

import pyspark.sql.functions as F
import pytest

from conftest import SF_ORACLE

from netflow_analysis_with_spark_streaming_spark import tables
from netflow_analysis_with_spark_streaming_spark.plans import inspect, layout


def test_day_partitioned_write_prunes(spark, tmp_path):
    """A day-range filter on the partitioned layout must prune to the
    matching day directories (partition filters in the scan, not a
    full-file read + post-filter)."""
    ev = tables.load(spark, "events", SF_ORACLE)
    path = str(tmp_path / "events_by_day")
    layout.write_day_partitioned(ev, path)

    df = layout.read_day_range(spark, path, "2024-01-05", "2024-01-07")
    plan = inspect.executed_plan(df)
    assert "PartitionFilters" in plan and "day" in plan, plan
    # correctness: same rows as filtering the unpartitioned table
    expect = ev.filter(
        (F.date_format("ts", "yyyy-MM-dd") >= "2024-01-05")
        & (F.date_format("ts", "yyyy-MM-dd") <= "2024-01-07")
    ).count()
    assert df.count() == expect
    # and the scan reads only 3 of ~30 day dirs
    import glob

    all_days = len(glob.glob(f"{path}/day=*"))
    assert all_days >= 25
    files_read = df.select(F.input_file_name()).distinct().count()
    pruned_days = len({d for d in range(5, 8)})
    assert files_read <= all_days  # sanity
    got_days = {
        r[0].split("day=")[1].split("/")[0]
        for r in df.select(F.input_file_name()).distinct().collect()
    }
    assert got_days == {"2024-01-05", "2024-01-06", "2024-01-07"}, got_days


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must SortMergeJoin with no
    Exchange on either side — the recurring fact-fact join fix."""
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
    orders = tables.load(spark, "orders", SF_ORACLE).select("o_orderkey", "o_orderpriority")
    lineitem = tables.load(spark, "lineitem", SF_ORACLE).select(
        "l_orderkey", "l_extendedprice"
    )
    layout.write_bucketed(orders, "t_orders_b", "o_orderkey", n_buckets=8)
    layout.write_bucketed(lineitem, "t_lineitem_b", "l_orderkey", n_buckets=8)
    # At sf0.01 the planner would broadcast the small side (masking the
    # bucketing); disable broadcast to model the at-scale case where
    # both facts are too big to broadcast — bucketing is the fix there.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_lineitem_b").join(
            spark.table("t_orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = inspect.executed_plan(joined)
        assert "SortMergeJoin" in plan, plan
        # bucketed co-location: no shuffle exchanges in the join plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_salted_join_equivalence(spark):
    """Salted join must return exactly the plain join's rows, and the
    salt must spread a hot key across multiple values."""
    from netflow_analysis_with_spark_streaming_spark.plans import skew

    lineitem = tables.load(spark, "lineitem", SF_ORACLE).select(
        "l_orderkey", "l_extendedprice", "l_linenumber"
    )
    orders = tables.load(spark, "orders", SF_ORACLE).select(
        "o_orderkey", "o_orderpriority"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    plain = lineitem.join(orders, ["l_orderkey"]).groupBy("o_orderpriority").count()
    salted = (
        skew.salted_join(lineitem, orders, ["l_orderkey"], n=4)
        .groupBy("o_orderpriority")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # the salt actually spreads rows of one key
    spread = (
        skew.salt_left(lineitem, 4)
        .filter(F.col("l_orderkey") == lineitem.select("l_orderkey").first()[0])
        .select(skew.SALT_COL)
        .distinct()
        .count()
    )
    assert spread >= 1  # deterministic; >1 when the key has >1 distinct row


def test_udf_surface_oracle(spark, duck):
    import importlib, sys

    mod = sys.modules.get("__spark_entry__") or importlib.import_module("__spark_entry__")
    from conftest import assert_matches_oracle

    df = mod.queries()["udf_surface"](spark, SF_ORACLE)
    assert_matches_oracle(df, duck, mod.oracle_sql()["udf_surface"])


def test_row_udf_matches_builtin(spark):
    """The slow-path row UDF must agree with the built-in conversion."""
    from netflow_analysis_with_spark_streaming_spark.functions import udfs as U

    ev = tables.load(spark, "events", SF_ORACLE).limit(200)
    s = F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    cmp = ev.select(
        U.parse_timestamp_udf(s).alias("via_udf"),
        F.to_timestamp(s, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("via_builtin"),
    )
    bad = cmp.filter(F.col("via_udf") != F.col("via_builtin")).count()
    assert bad == 0


def test_global_topk_plans_as_take_ordered(spark):
    """Global top-20s must plan as TakeOrderedAndProject (distributed
    per-partition heaps), never a row_number over an unpartitioned
    window — the single-task sort that dies at 100x scale."""
    from conftest import CORPUS

    for name in ["similarity_ngram_jaccard", "similarity_embedding_neardup"]:
        df = CORPUS.queries()[name](spark, SF_ORACLE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, (name, plan)


def test_neardup_bucketed_path_recall(spark):
    """The >broadcast-limit route (LSH-bucketed self-join) must (a)
    plan with no driver collect — it's pure DataFrame ops — and (b)
    recover a meaningful share of the exact blockwise top pairs."""
    from netflow_analysis_with_spark_streaming_spark.functions import vectors as V

    emb = tables.load(spark, "embeddings", SF_ORACLE)
    exact = {
        (r["id_a"], r["id_b"])
        for r in V.neardup_candidates_blockwise(emb, k_per_row=5)
        .orderBy(F.col("cos").desc())
        .limit(50)
        .collect()
    }
    # force the at-scale route by shrinking the broadcast gate to zero
    bucketed = V.neardup_candidates(emb, k_per_row=5, broadcast_row_limit=0)
    got = {(r["id_a"], r["id_b"]) for r in bucketed.collect()}
    recall = len(exact & got) / len(exact)
    assert recall >= 0.2, recall
    # and the bucketed plan is a shuffled equi-join, not a cartesian
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan


def test_neardup_bucketed_adaptive_planes_recall(spark):
    """The round-6 scaling fix (adaptive plane count + per-bucket BLAS
    kernel) must keep recall at a corpus size where the plane count
    actually grows: 4096 vectors -> 5 planes / 32 buckets. 60 planted
    near-dup pairs (v, v + small noise; cosine ~ 0.999) must be
    recovered well above the theta/pi splitting loss (5 planes at
    theta ~ 0.03 rad -> ~95% expected joint retention)."""
    import numpy as np

    from netflow_analysis_with_spark_streaming_spark.functions import vectors as V

    rng = np.random.default_rng(11)
    base = rng.standard_normal((4096, 64)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    planted = []
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    for j in range(60):  # near-dup partner of vector j, appended at the end
        nid = 4096 + j
        noisy = base[j] + rng.standard_normal(64).astype(np.float32) * 0.01
        rows.append((nid, [float(x) for x in noisy]))
        planted.append((j, nid))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cand = V.neardup_candidates(emb, k_per_row=5, broadcast_row_limit=0)
    got = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    recall = sum(1 for p in planted if p in got) / len(planted)
    assert recall >= 0.8, recall
    """The flagship moves KBs through exactly one aggregate exchange
    (plus the final tiny sort) — pin that so a regression is loud."""
    import importlib, sys

    mod = sys.modules.get("__spark_entry__") or importlib.import_module("__spark_entry__")
    df = mod.queries()["flagship_access_trend"](spark, SF_ORACLE)
    assert inspect.has_partial_final_agg(df)
    assert inspect.shuffle_count(df) <= 2, inspect.executed_plan(df)
    assert inspect.uses_whole_stage_codegen(df)


@pytest.mark.parametrize(
    "name,max_shuffles",
    [
        # suites run several constituents, each with its own agg
        # exchange; the budget pins "no accidental extra shuffle"
        ("flagship_access_trend", 2),
        ("join_shuffle_large", 4),
        ("agg_pricing_summary", 2),
        ("window_topk_per_group", 2),
        ("topk_heavy_hitters", 2),
        ("agg_count_distinct", 3),
        ("join_asof", 3),
        ("scalar_functions", 2),
    ],
)
def test_plan_shuffle_budget(spark, name, max_shuffles):
    """Exchange-count budgets for headline queries: a regression that
    introduces an extra shuffle (lost broadcast, lost partial agg,
    accidental repartition) fails loudly here instead of 10x-ing at
    scale."""
    from conftest import CORPUS

    df = CORPUS.queries()[name](spark, SF_ORACLE)
    n = inspect.shuffle_count(df)
    assert n <= max_shuffles, (name, n, inspect.executed_plan(df))


def test_dynamic_partition_pruning_on_day_layout(spark, tmp_path):
    """DPP: joining the day-partitioned fact with a FILTERED small dim
    on the partition column must prune fact partitions at runtime
    (dynamicpruning expression in the scan) — the mechanism that makes
    dim-driven scans cheap at 100 TB without literal date predicates."""
    ev = tables.load(spark, "events", SF_ORACLE)
    path = str(tmp_path / "events_by_day")
    layout.write_day_partitioned(ev, path)
    fact = spark.read.parquet(path)
    days = (
        fact.select("day").distinct().limit(3).withColumn("tag", F.lit("campaign"))
    )
    days.write.mode("overwrite").parquet(str(tmp_path / "dim"))
    dim = spark.read.parquet(str(tmp_path / "dim"))
    joined = fact.join(dim.filter(F.col("tag") == "campaign"), "day").groupBy(
        "day"
    ).count()
    optimized = joined._jdf.queryExecution().optimizedPlan().toString()
    physical = inspect.executed_plan(joined)
    assert "dynamicpruning" in (optimized + physical).lower(), physical
    assert joined.count() == 3


def test_runtime_bloom_filter_join_pruning(spark):
    """Runtime row-level filtering: a selective filter on one join
    side must inject a bloom filter (might_contain) into the other
    side's scan when broadcast is off — the mechanism that prunes the
    100 TB probe side before the shuffle."""
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_cr = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
    )
    prev_ap = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # sf0.01 sizes are far below the production thresholds; lower them
    # to make the optimization fire at test scale
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
    )
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    try:
        li = tables.load(spark, "lineitem", SF_ORACLE)
        orders = tables.load(spark, "orders", SF_ORACLE).filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        j.collect()
        plan = inspect.executed_plan(j)
        assert "might_contain" in plan.lower(), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", prev_cr
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            prev_ap,
        )


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's runtime skew handling: a join where one key holds ~90% of
    the left side must get its hot partition split (skew=true on the
    join node) once thresholds are scaled to test data — the runtime
    complement to the static salted_join helper."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200_000).selectExpr(
            "CASE WHEN id % 10 = 0 THEN CAST(id % 7 AS LONG) ELSE 99 END AS k",
            "id AS payload",
        )
        right = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS attr")
        # global agg, not groupBy(k): a downstream requirement on k's
        # partitioning would veto the skew split (AQE won't break a
        # required distribution unless forceOptimizeSkewedJoin)
        j = left.join(right, "k").agg(F.sum("payload").alias("s"))
        j.collect()
        plan = inspect.executed_plan(j)
        assert "skew=true" in plan, plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_flagship_managed_layout_partition_pruning(spark):
    """The managed-layout flagship's scan must carry day partition
    filters (directory pruning) AND read fewer partitions than the
    table holds — the layout story end-to-end through a real query."""
    from conftest import SF_ORACLE
    from netflow_analysis_with_spark_streaming_spark import queries as Q

    df = Q.all_queries()["flagship_managed_layout"](spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    filters = plan.split("PartitionFilters: [", 1)
    assert len(filters) == 2 and "day" in filters[1][:200], plan[:2000]
    # the day range bounds must appear as partition predicates
    assert "2024-01-05" in filters[1][:300] and "2024-01-15" in filters[1][:300]
    assert layout.partition_filter_count(df) >= 2

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship quality-filter pipeline; ``queries()``
exposes one entry per implemented operator family (SURVEY.md §2) over the
driver testdata tables; ``oracle_sql()`` gives the DuckDB-equivalent SQL.
Every SQL oracle is generated from the SAME constants as the Spark plan
(open_thoughts_spark.oracle.duck_sql) in the Java/Python/RE2-portable regex
subset, and every cross-row aggregate is computed in integer space (cents,
counts) so float summation order can't desynchronize the engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_thoughts_spark import config
from open_thoughts_spark.functions.langid import LANGS, langid_exprs
from open_thoughts_spark.functions.text_stats import with_text_stats, fingerprint_expr
from open_thoughts_spark.oracle import duck_sql
from open_thoughts_spark.operators import dedup, decontaminate, relational, similarity
from open_thoughts_spark.pipeline import quality_filter
from open_thoughts_spark.rules.scrub import scrub_expr, scrub_sql

SF_DEFAULT = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs_spread(spark: SparkSession, sf_dir: str, n: int = 32) -> DataFrame:
    """documents scan spread to >= n partitions before an expensive map.

    A single-file parquet scan is 1-2 tasks (CLAUDE.md perf lore), so the
    heavy native-regex projections (text stats, langid cascade, scrub,
    BPE count, gopher rules) otherwise run on 2 of 32 cores — VERDICT r3
    measured text_stats at 2.08 s warm that way. On a real multi-file
    table the conditional is a no-op; the 0.6 MB shuffle here is noise
    next to the map it parallelizes."""
    df = _t(spark, sf_dir, "documents")
    # inputFiles() is a driver-side metadata call; the .rdd probe the dedup
    # ops use costs ~0.18 s of plan conversion per query (measured)
    if len(df.inputFiles()) < n // 2:
        df = df.repartition(n)
    return df


def _cents(col):
    """Exact integer cents from a 2-dp double (portable across engines)."""
    return F.round(col * 100).cast("long")


# --------------------------------------------------------------------------
# transcripts derivation: a deterministic transcripts-shaped table from the
# documents table, so the north-rule pipeline is exercised on driver data too
# --------------------------------------------------------------------------

N_DERIVED_CONVS = 60
_ROLES = ["user", "assistant", "system"]


def derive_transcripts(docs: DataFrame) -> DataFrame:
    conv = F.concat(
        F.lit("conv-"), F.lpad((F.col("doc_id") % N_DERIVED_CONVS).cast("string"), 4, "0")
    )
    w = Window.partitionBy(F.col("doc_id") % N_DERIVED_CONVS).orderBy("doc_id")
    role = F.element_at(
        F.array(*[F.lit(r) for r in _ROLES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        conv.alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        role.alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(F.lit(1735689600) + F.col("doc_id") * 17).alias("ts"),
    )


DERIVE_TRANSCRIPTS_SQL = f"""
    select
      'conv-' || lpad((doc_id % {N_DERIVED_CONVS})::varchar, 4, '0') as conv_id,
      (row_number() over (partition by doc_id % {N_DERIVED_CONVS} order by doc_id) - 1) as turn_idx,
      (case doc_id % 3 when 0 then 'user' when 1 then 'assistant' else 'system' end) as role,
      text
    from documents
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full quality-filter pipeline over transcripts derived from
    the sf0.001 documents table (langid + perplexity + rules + scrub)."""
    docs = _t(spark, SF_DEFAULT, "documents")
    tr = derive_transcripts(docs)
    out = quality_filter(tr, langid_mode="udf")
    return out.select(
        "conv_id", "turn_idx", "role", "lang", "lang_prob", "bits_per_char",
        "drop_reason", "keep", "scrubbed_text", "turn_rank",
    )


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------

def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1-style pricing summary (partial+final agg, integer cents)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(_cents(F.col("l_extendedprice")) * (100 - disc_pct)).alias(
                "sum_disc_cents_pct"
            ),
            F.count("*").alias("count_order"),
        )
    )


SQL_TPCH_Q1 = """
    select l_returnflag, l_linestatus,
      cast(sum(cast(l_quantity as bigint)) as bigint) as sum_qty,
      cast(sum(cast(round(l_extendedprice*100) as bigint)) as bigint) as sum_base_cents,
      cast(sum(cast(round(l_extendedprice*100) as bigint)
          * (100 - cast(round(l_discount*100) as bigint))) as bigint) as sum_disc_cents_pct,
      count(*) as count_order
    from lineitem
    where l_shipdate <= timestamp '1998-09-02'
    group by l_returnflag, l_linestatus
"""


def q_tpch_q3(spark, sf_dir):
    """Q3-style: top-10 orders by revenue for one segment (join + top-k)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey")
        .agg(F.sum(_cents(F.col("l_extendedprice")) * (100 - disc_pct)).alias("revenue_cents_pct"))
    )
    return rev.orderBy(F.desc("revenue_cents_pct"), "l_orderkey").limit(10)


SQL_TPCH_Q3 = """
    select l_orderkey,
      cast(sum(cast(round(l_extendedprice*100) as bigint)
          * (100 - cast(round(l_discount*100) as bigint))) as bigint) as revenue_cents_pct
    from lineitem
    join orders on l_orderkey = o_orderkey
    join customer on o_custkey = c_custkey
    where c_mktsegment = 'BUILDING'
    group by l_orderkey
    order by revenue_cents_pct desc, l_orderkey
    limit 10
"""


def q_tpch_q5(spark, sf_dir):
    """Q5-style: revenue per region (6-way join; dims broadcast)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum(_cents(F.col("l_extendedprice")) * (100 - disc_pct)).alias("revenue_cents_pct"),
            F.count("*").alias("n_items"),
        )
    )


SQL_TPCH_Q5 = """
    select r_name,
      cast(sum(cast(round(l_extendedprice*100) as bigint)
          * (100 - cast(round(l_discount*100) as bigint))) as bigint) as revenue_cents_pct,
      count(*) as n_items
    from lineitem
    join orders on l_orderkey = o_orderkey
    join customer on o_custkey = c_custkey
    join nation on c_nationkey = n_nationkey
    join region on n_regionkey = r_regionkey
    group by r_name
"""


def q_events_daily(spark, sf_dir):
    """Tumbling daily rollup per event type (streaming-shaped agg in batch)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.col("ts"), "yyyy-MM-dd").alias("event_date"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("value_cents"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


SQL_EVENTS_DAILY = """
    select strftime(ts, '%Y-%m-%d') as event_date, event_type,
      count(*) as n_events,
      cast(sum(cast(round(value*100) as bigint)) as bigint) as value_cents,
      count(distinct user_id) as n_users
    from events
    group by 1, 2
"""


def q_events_sessionize(spark, sf_dir):
    """Sessionization: 30-min-gap sessions per user (lag window + cum sum)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))  # exact integer µs
    gap = us - F.lag(us).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    return (
        ev.withColumn("_new", new_sess)
        .groupBy("user_id")
        .agg(
            F.sum("_new").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


SQL_EVENTS_SESSIONIZE = """
    with g as (
      select user_id,
        case when epoch_us(ts) - lag(epoch_us(ts)) over (partition by user_id order by ts, event_id)
               is null
             or epoch_us(ts) - lag(epoch_us(ts)) over (partition by user_id order by ts, event_id)
               > 1800000000
             then 1 else 0 end as new_sess
      from events
    )
    select user_id, cast(sum(new_sess) as bigint) as n_sessions, count(*) as n_events
    from g group by user_id
"""


def q_events_tumbling_window(spark, sf_dir):
    """Tumbling 6-hour window aggregation via F.window — the exact
    batch-mode expression of the streaming windowed agg (same function
    Structured Streaming uses with a watermark); oracled via DuckDB
    time_bucket."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("value_cents"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n_events", "value_cents",
        )
    )


SQL_EVENTS_TUMBLING = """
    select strftime(time_bucket(interval 6 hours, ts), '%Y-%m-%d %H:%M:%S')
             as window_start,
      event_type, count(*) as n_events,
      cast(sum(cast(round(value*100) as bigint)) as bigint) as value_cents
    from events group by 1, 2
"""


def q_events_time_rollup(spark, sf_dir):
    """Hypertable-style hierarchical time rollup: one pass emits 6-hour,
    daily and grand-total aggregates via ROLLUP(day, bucket6h) with
    grouping_id — the continuous-aggregate shape over event time."""
    ev = _t(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    b6 = F.date_format(F.timestamp_seconds(F.floor(F.unix_seconds(F.col("ts").cast("timestamp_ltz")) / 21600) * 21600), "yyyy-MM-dd HH:mm:ss")
    return (
        ev.select(day.alias("day"), b6.alias("bucket6h"), "value")
        .rollup("day", "bucket6h")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("value_cents"),
            F.grouping_id().alias("gid"),
        )
    )


SQL_EVENTS_TIME_ROLLUP = """
    with e as (
      select strftime(ts, '%Y-%m-%d') as day,
        -- epoch_ms returns a NAIVE timestamp (to_timestamp would be
        -- TIMESTAMPTZ and render in the host TimeZone, breaking the UTC
        -- parity on non-UTC hosts — code-review r2)
        strftime(epoch_ms(cast(floor(epoch(ts) / 21600) * 21600000 as bigint)),
                 '%Y-%m-%d %H:%M:%S') as bucket6h,
        value
      from events
    )
    select day, bucket6h, count(*) as n_events,
      cast(sum(cast(round(value*100) as bigint)) as bigint) as value_cents,
      cast(grouping(day, bucket6h) as bigint) as gid
    from e group by rollup(day, bucket6h)
"""


def q_events_session_window(spark, sf_dir):
    """Native gap-based sessions via F.session_window (the Structured
    Streaming session operator, in batch): 30-min gap, per-user session
    start + event count. Spark MERGES an event arriving at exactly
    start+gap into the session (verified empirically), so the oracle's
    lag/cumsum splits strictly on gap > 30min."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


SQL_EVENTS_SESSION_WINDOW = """
    with g as (
      select user_id, ts, event_id,
        case when epoch_us(ts) - lag(epoch_us(ts))
               over (partition by user_id order by ts, event_id) is null
             or epoch_us(ts) - lag(epoch_us(ts))
               over (partition by user_id order by ts, event_id)
               > 1800000000
             then 1 else 0 end as new_sess
      from events
    ), s as (
      select user_id, ts,
        sum(new_sess) over (partition by user_id order by ts, event_id
                            rows between unbounded preceding and current row)
          as sid
      from g
    )
    select user_id,
      strftime(min(ts), '%Y-%m-%d %H:%M:%S') as session_start,
      count(*) as n_events
    from s group by user_id, sid
"""


def q_window_top_customers(spark, sf_dir):
    """Top-3 customers per market segment by balance (ranked window)."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        c.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("c_mktsegment", "rank", "c_custkey", "c_acctbal")
    )


SQL_WINDOW_TOP_CUSTOMERS = """
    select c_mktsegment, rank, c_custkey, c_acctbal from (
      select c_mktsegment, c_custkey, c_acctbal,
        row_number() over (partition by c_mktsegment
                           order by c_acctbal desc, c_custkey) as rank
      from customer
    ) where rank <= 3
"""


def q_orders_running_total(spark, sf_dir):
    """Per-customer running order total (cumulative window, integer cents)."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_cents(F.col("o_totalprice"))).over(w).alias("running_cents"),
    )


SQL_ORDERS_RUNNING_TOTAL = """
    select o_custkey, o_orderkey,
      cast(sum(cast(round(o_totalprice*100) as bigint))
        over (partition by o_custkey order by o_orderdate, o_orderkey
              rows between unbounded preceding and current row) as bigint) as running_cents
    from orders
"""


def q_events_asof_join(spark, sf_dir):
    """As-of join: each click gets the user's latest purchase at-or-before
    its timestamp (backward inclusive). Spark lacks the operator — this is
    the single-shuffle union+window formulation; the oracle is DuckDB's
    native ASOF LEFT JOIN."""
    from open_thoughts_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = relational.dedup_on_columns(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("event_id").alias("purchase_id"), "ts"
        ),
        ["user_id", "ts"],
        ["purchase_id"],
    )
    out = asof_join(
        clicks, purchases, ["user_id"], "ts", "ts", ["purchase_id"]
    )
    return out.select("event_id", "user_id", F.col("purchase_id_asof"))


SQL_EVENTS_ASOF = """
    with c as (
      select user_id, event_id, ts from events where event_type = 'click'
    ), p0 as (
      select user_id, ts, event_id as purchase_id,
        row_number() over (partition by user_id, ts order by event_id) as rn
      from events where event_type = 'purchase'
    ), p as (
      select user_id, ts, purchase_id from p0 where rn = 1
    )
    select c.event_id, c.user_id, p.purchase_id as purchase_id_asof
    from c asof left join p on c.user_id = p.user_id and c.ts >= p.ts
"""


def q_events_range_join(spark, sf_dir):
    """Range join: clicks falling inside [purchase_ts, purchase_ts + 2h)
    attribution windows per user — bucket-expansion equi-join (no theta
    join); oracle is the plain BETWEEN join."""
    from open_thoughts_spark.operators.asof import range_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    windows = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("interval 2 hours")).alias("w_end"),
    )
    out = range_join(
        clicks, windows, ["user_id"], "ts", "w_start", "w_end",
        bucket_seconds=7200,
    )
    return out.select("click_id", "purchase_id", "user_id")


SQL_EVENTS_RANGE_JOIN = """
    with c as (
      select user_id, event_id as click_id, ts from events
      where event_type = 'click'
    ), p as (
      select user_id, event_id as purchase_id, ts as w_start,
        ts + interval 2 hours as w_end
      from events where event_type = 'purchase'
    )
    select c.click_id, p.purchase_id, c.user_id
    from c join p on c.user_id = p.user_id
      and c.ts >= p.w_start and c.ts < p.w_end
"""


def q_events_pivot(spark, sf_dir):
    """Per-user event-type counts (pivot as conditional aggregation)."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in types
    ]
    return ev.groupBy("user_id").agg(*aggs)


SQL_EVENTS_PIVOT = """
    select user_id,
      cast(sum(case when event_type='click' then 1 else 0 end) as bigint) as n_click,
      cast(sum(case when event_type='view' then 1 else 0 end) as bigint) as n_view,
      cast(sum(case when event_type='purchase' then 1 else 0 end) as bigint) as n_purchase,
      cast(sum(case when event_type='signup' then 1 else 0 end) as bigint) as n_signup,
      cast(sum(case when event_type='error' then 1 else 0 end) as bigint) as n_error
    from events group by user_id
"""


def q_merge_enrich(spark, sf_dir):
    """merge-operator semantics: left-enrich orders with customer + nation."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    enriched = relational.merge_left_enrich(
        o.withColumnRenamed("o_custkey", "c_custkey"), c, "c_custkey"
    )
    enriched = relational.merge_left_enrich(
        enriched.withColumnRenamed("c_nationkey", "n_nationkey"), n, "n_nationkey"
    )
    return enriched.select("o_orderkey", "c_custkey", "c_name", "n_name")


SQL_MERGE_ENRICH = """
    select o_orderkey, o_custkey as c_custkey, c_name, n_name
    from orders
    left join customer on o_custkey = c_custkey
    left join nation on c_nationkey = n_nationkey
"""


# --- quality-filter family over documents ---

def q_qf_docs_decisions(spark, sf_dir):
    """Full heuristic cascade + langid on documents (no roles, no ppl)."""
    docs = _docs_spread(spark, sf_dir)
    out = quality_filter(
        docs.withColumnRenamed("doc_id", "doc_id"),
        with_turn_order=False,
        compute_ppl=False,
        role_col=None,
    )
    return out.select(
        "doc_id",
        F.col("lang").alias("pred_lang"),
        "drop_reason",
        "keep",
    )


def sql_qf_docs_decisions():
    pred, _ = duck_sql.langid_pred_sql("text")
    cascade = duck_sql.reason_cascade_sql("text")
    return f"""
        select doc_id, {pred} as pred_lang,
          {cascade} as drop_reason,
          ({cascade} is null) as keep
        from documents
    """


def q_qf_rule_matrix(spark, sf_dir):
    """Per-rule ablation matrix (pipeline.metrics.rule_hit_matrix):
    independent hits vs cascade-attributed drops vs shadowed overlap, for
    every rule in the inventory — the threshold-tuning view the
    first-match drop_reason metrics can't show. The oracle recomputes
    every rule predicate independently in SQL plus the cascade, then
    aggregates the same three counters. Spark's repetition flag is gated
    to wc <= TOO_LONG (an optimization invisible to the cascade but
    visible to independent hits), so the oracle mirrors the gate."""
    from open_thoughts_spark.pipeline.metrics import rule_hit_matrix

    docs = _docs_spread(spark, sf_dir)
    out = quality_filter(
        docs, with_turn_order=False, compute_ppl=False, role_col=None
    )
    return rule_hit_matrix(out)


def sql_qf_rule_matrix():
    flags = duck_sql.rule_flags_sql("text")
    wc = duck_sql.word_count_sql("text")
    # mirror the Spark flag's wc <= TOO_LONG gate (see q_qf_rule_matrix)
    flags["repetition"] = (
        f"({flags['repetition']} and {wc} <= {config.TOO_LONG_WORDS})"
    )
    cascade = duck_sql.reason_cascade_sql("text")
    order = [r for r in config.RULE_ORDER if r in flags]
    flag_cols = ",\n          ".join(
        f"coalesce({flags[r]}, false) as f_{r}" for r in order
    )
    branches = " union all ".join(
        f"""select '{r}' as rule,
            sum(case when f_{r} then 1 else 0 end)::bigint as hits,
            sum(case when dr = '{r}' then 1 else 0 end)::bigint as attributed
            from f"""
        for r in order
    )
    return f"""
        with f as (
          select {cascade} as dr,
          {flag_cols}
          from documents
        )
        select rule, hits, attributed, hits - attributed as shadowed
        from ({branches})
    """


def q_qf_docs_scrub(spark, sf_dir):
    """PII scrub parity: inject deterministic PII, scrub, exact text out."""
    docs = _docs_spread(spark, sf_dir)
    pii = F.concat(
        F.substring(F.col("text"), 1, 40),
        F.lit(" contact user"),
        (F.col("doc_id") % 997).cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" token sk-"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12),
        F.lit(" host 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 card 4111 1111 1111 "),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ok"),
    )
    return docs.select(
        "doc_id", scrub_expr(pii).alias("scrubbed_text")
    )


def sql_qf_docs_scrub():
    pii = (
        "substr(text, 1, 40) || ' contact user' || (doc_id % 997)::varchar"
        " || '@example.com or +1-555-' || lpad((doc_id % 10000)::varchar, 4, '0')"
        " || ' token sk-' || substr(md5(doc_id::varchar), 1, 12)"
        " || ' host 10.0.' || (doc_id % 256)::varchar || '.7'"
        " || ' card 4111 1111 1111 ' || lpad((doc_id % 10000)::varchar, 4, '0')"
        " || ' ok'"
    )
    return f"select doc_id, {scrub_sql(pii)} as scrubbed_text from documents"


def q_qf_transcripts(spark, sf_dir):
    """North-rule pipeline (langid + role-gated rules + scrub) on derived
    transcripts — the SQL-oracled subset (perplexity rule excluded)."""
    docs = _t(spark, sf_dir, "documents")
    tr = derive_transcripts(docs)
    out = quality_filter(tr, with_turn_order=True, compute_ppl=False)
    return out.select(
        "conv_id", "turn_idx", "role", "lang", "drop_reason", "keep",
        "scrubbed_text", "turn_rank",
    )


def sql_qf_transcripts():
    from open_thoughts_spark.rules.heuristics import RULE_ROLES

    pred, _ = duck_sql.langid_pred_sql("text")
    cascade = duck_sql.reason_cascade_sql(
        "text", role_expr="role", role_gates=RULE_ROLES
    )
    return f"""
        with t as ({DERIVE_TRANSCRIPTS_SQL})
        select conv_id, turn_idx, role, {pred} as lang,
          {cascade} as drop_reason,
          ({cascade} is null) as keep,
          {scrub_sql('text')} as scrubbed_text,
          turn_idx + 1 as turn_rank
        from t
    """


def q_qf_metrics(spark, sf_dir):
    """Drop-reason metrics table (commons.py:425-433 logging as a first-
    class DataFrame): the cascade over derived transcripts, rolled up per
    reason with exact integer counts (fraction expressed in ppm so the
    value hash stays in integer space)."""
    from open_thoughts_spark.pipeline.metrics import drop_reason_metrics

    tr = derive_transcripts(_t(spark, sf_dir, "documents"))
    decided = quality_filter(tr, with_turn_order=False, compute_ppl=False)
    m = drop_reason_metrics(decided)
    # identical float-op ORDER as the SQL oracle (rows*1e6/total, one
    # division) — round((rows/total)*1e6) can land on the other side of a
    # .5 boundary
    total = F.sum("rows").over(Window.partitionBy())
    return m.select(
        "reason", "rows",
        F.round(F.col("rows") * 1_000_000.0 / total).cast("long").alias("ppm"),
    )


def sql_qf_metrics():
    from open_thoughts_spark.rules.heuristics import RULE_ROLES

    cascade = duck_sql.reason_cascade_sql(
        "text", role_expr="role", role_gates=RULE_ROLES
    )
    return f"""
        with t as ({DERIVE_TRANSCRIPTS_SQL}),
        d as (select coalesce({cascade}, 'kept') as reason from t)
        select reason, count(*) as rows,
          cast(round(count(*) * 1000000.0 / (select count(*) from d)) as bigint)
            as ppm
        from d group by reason
    """


def q_conversation_policy(spark, sf_dir):
    """Conversation-level keep policy on top of turn decisions: a
    conversation survives iff >= 60% of its turns keep AND no boilerplate
    turn exists — aggregate-of-decisions, the conversation-granularity
    member of the quality-filter family."""
    tr = derive_transcripts(_t(spark, sf_dir, "documents"))
    decided = quality_filter(tr, with_turn_order=False, compute_ppl=False)
    return (
        decided.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            # coalesce: the == is NULL on kept turns (drop_reason null), and
            # max over all-NULL would null out fully-kept conversations
            F.max(
                F.coalesce((F.col("drop_reason") == "boilerplate").cast("int"), F.lit(0))
            ).alias("_has_bp"),
        )
        .select(
            "conv_id", "n_turns", "n_kept",
            (
                (F.col("n_kept") * 100 >= F.col("n_turns") * 60)
                & (F.col("_has_bp") == 0)
            ).alias("keep_conv"),
        )
    )


def sql_conversation_policy():
    from open_thoughts_spark.rules.heuristics import RULE_ROLES

    cascade = duck_sql.reason_cascade_sql(
        "text", role_expr="role", role_gates=RULE_ROLES
    )
    return f"""
        with t as ({DERIVE_TRANSCRIPTS_SQL}),
        d as (select conv_id, {cascade} as drop_reason from t)
        select conv_id, count(*) as n_turns,
          cast(sum(case when drop_reason is null then 1 else 0 end) as bigint)
            as n_kept,
          (cast(sum(case when drop_reason is null then 1 else 0 end) as bigint) * 100
             >= count(*) * 60
           and max(case when drop_reason = 'boilerplate' then 1 else 0 end) = 0)
            as keep_conv
        from d group by conv_id
    """


def q_gopher_quality_filter(spark, sf_dir):
    """Gopher web-quality rule cascade (Rae et al. 2021 §A1.1 — the rule
    family the reference's DCLM/RefinedWeb inputs were curated with).
    Every rule fires via deterministic adversarial variants derived from
    documents; the untouched rows exercise the pass path."""
    from open_thoughts_spark.rules.gopher import with_gopher_decision

    docs = _docs_spread(spark, sf_dir)
    m8 = F.col("doc_id") % 8
    bullets = F.repeat(F.lit("- item alpha beta\n"), 20)      # 80 words, 95% bullets
    nonalpha = F.concat(
        F.repeat(F.lit("1234 5678 9012 3456 7890 "), 12),     # 60 digit words
        F.lit("the of and to be that have"),                  # stopwords present
    )
    nostop = F.repeat(F.lit("zzzz qqqq wwww "), 20)           # 60 words, no stopwords
    shortmean = F.concat(F.repeat(F.lit("a b c "), 40), F.lit("the of"))
    longtext = F.concat(
        F.lit("the cat sat with the dog and that was that "),
        F.col("text"), F.lit(" "), F.col("text"),
    )
    text = (
        F.when(m8 == 0, F.substring(F.col("text"), 1, 30))    # too few words
        .when(m8 == 1, F.concat(longtext, F.lit(" ### ## # ### # ## ###")))
        .when(m8 == 2, bullets)
        .when(m8 == 3, F.concat(longtext, F.lit("...\nmore...\nyes...")))
        .when(m8 == 4, nonalpha)
        .when(m8 == 5, nostop)
        .when(m8 == 6, shortmean)                             # mean word len < 3
        .otherwise(longtext)
    )
    return with_gopher_decision(docs.select("doc_id", text.alias("text"))).select(
        "doc_id", "gopher_drop_reason", "keep_gopher"
    )


def sql_gopher_quality_filter():
    from open_thoughts_spark.rules.gopher import gopher_reason_sql

    longtext = "'the cat sat with the dog and that was that ' || text || ' ' || text"
    text = (
        "case when doc_id % 8 = 0 then substr(text, 1, 30)"
        f" when doc_id % 8 = 1 then {longtext} || ' ### ## # ### # ## ###'"
        " when doc_id % 8 = 2 then repeat('- item alpha beta' || chr(10), 20)"
        f" when doc_id % 8 = 3 then {longtext} || '...' || chr(10) || 'more...' ||"
        " chr(10) || 'yes...'"
        " when doc_id % 8 = 4 then repeat('1234 5678 9012 3456 7890 ', 12)"
        " || 'the of and to be that have'"
        " when doc_id % 8 = 5 then repeat('zzzz qqqq wwww ', 20)"
        " when doc_id % 8 = 6 then repeat('a b c ', 40) || 'the of'"
        f" else {longtext}"
        " end"
    )
    reason = gopher_reason_sql(f"({text})")
    return f"""
        select doc_id, {reason} as gopher_drop_reason,
          ({reason} is null) as keep_gopher
        from documents
    """


def q_gopher_repetition_filter(spark, sf_dir):
    """MassiveText repetition filters: duplicate-line fraction (pure map)
    + top-bigram coverage (one explode + per-doc agg). Derived variants
    plant duplicate lines / looped bigrams so both channels fire."""
    from open_thoughts_spark.rules.gopher import with_repetition_stats

    docs = _docs_spread(spark, sf_dir)
    m4 = F.col("doc_id") % 4
    line = F.substring(F.col("text"), 1, 40)
    nl = F.lit("\n")
    para = F.lit("\n\n")
    loop3 = F.concat_ws(
        " ",
        *([F.substring(F.col("text"), 1, 11)] * 12),
    )
    text = (
        # null-propagating concat (like SQL ||), NOT null-skipping concat_ws
        F.when(m4 == 0, F.concat(line, nl, line, nl, line, nl, F.col("text")))
        .when(m4 == 1, loop3)
        .when(m4 == 2, F.concat(line, para, line, para, line, para, F.col("text")))
        .otherwise(F.col("text"))
    )
    out = with_repetition_stats(
        docs.select("doc_id", text.alias("text")), "doc_id"
    )
    return out.select(
        "doc_id",
        F.round("dup_line_frac", 6).alias("dup_line_frac6"),
        F.round("dup_paragraph_frac", 6).alias("dup_para_frac6"),
        F.round("top_bigram_frac", 6).alias("top_bigram_frac6"),
        "keep_repetition",
    )


def sql_gopher_repetition_filter():
    text = (
        "case when doc_id % 4 = 0 then substr(text, 1, 40) || chr(10) ||"
        " substr(text, 1, 40) || chr(10) || substr(text, 1, 40) || chr(10) || text"
        " when doc_id % 4 = 1 then concat_ws(' ', "
        + ", ".join(["substr(text, 1, 11)"] * 12)
        + ") when doc_id % 4 = 2 then substr(text, 1, 40) || chr(10) || chr(10) ||"
        " substr(text, 1, 40) || chr(10) || chr(10) || substr(text, 1, 40)"
        " || chr(10) || chr(10) || text"
        " else text end"
    )
    return f"""
        with d as (
          select doc_id, ({text}) as text from documents
        ), lines as (
          select doc_id,
            len(string_split(text, chr(10)))::double as n_lines,
            len(list_distinct(string_split(text, chr(10))))::double as n_uniq,
            len(string_split(text, chr(10) || chr(10)))::double as n_paras,
            len(list_distinct(string_split(text, chr(10) || chr(10))))::double
              as n_uniq_paras
          from d
        ), w as (
          select doc_id, {WORDS_SQL} as words from d
        ), grams as (
          select doc_id, unnest([
            array_to_string(words[i:i+1], ' ')
            for i in range(1, greatest(len(words) - 1, 0) + 1)
          ]) as g
          from w
        ), top as (
          select doc_id, max(c)::double / sum(c)::double as top_frac from (
            select doc_id, g, count(*) as c from grams group by 1, 2
          ) group by doc_id
        )
        select l.doc_id,
          round((l.n_lines - l.n_uniq) / l.n_lines, 6) as dup_line_frac6,
          round((l.n_paras - l.n_uniq_paras) / l.n_paras, 6) as dup_para_frac6,
          round(coalesce(t.top_frac, 0.0), 6) as top_bigram_frac6,
          ((l.n_lines - l.n_uniq) / l.n_lines <= 0.3
           and (l.n_paras - l.n_uniq_paras) / l.n_paras <= 0.3
           and coalesce(t.top_frac, 0.0) <= 0.2) as keep_repetition
        from lines l left join top t on t.doc_id = l.doc_id
    """


def q_text_stats(spark, sf_dir):
    docs = _docs_spread(spark, sf_dir)
    out = with_text_stats(docs)
    return out.select(
        "doc_id",
        F.col("ws_tokens").cast("long").alias("ws_tokens"),
        F.col("bpe_tokens").cast("long").alias("bpe_tokens"),
        F.col("stopwords").cast("long").alias("stopwords"),
        F.col("punct_chars").cast("long").alias("punct_chars"),
        "quality_score",
        "fingerprint",
    )


def sql_text_stats():
    from open_thoughts_spark.functions.text_stats import (
        BPE_TOKEN_REGEX,
        STOPWORD_REGEX,
    )

    wc = duck_sql.word_count_sql("text")
    bpe = f"len(regexp_extract_all(text, {duck_sql.q(BPE_TOKEN_REGEX)}))"
    stop = f"len(regexp_extract_all(text, {duck_sql.q(STOPWORD_REGEX)}))"
    punct = (
        "len(regexp_extract_all(text,"
        " '[!\"#$%&''()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]'))"
    )
    len_score = f"least({wc} / 20.0, 1.0) * (case when {wc} > 200 then 0.5 else 1.0 end)"
    stop_score = f"least((case when {wc} > 0 then {stop} / ({wc})::double else 0.0 end) * 4, 1.0)"
    punct_score = (
        f"greatest(1.0 - (case when length(text) > 0 then {punct} /"
        f" length(text)::double else 0.0 end) * 2, 0.0)"
    )
    quality = f"round(({len_score}) * (0.5 + 0.5 * ({stop_score})) * ({punct_score}), 6)"
    norm = (
        "regexp_replace(lower(trim(regexp_replace(text,"
        " '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))), '[^a-z0-9 ]', '', 'g')"
    )
    return f"""
        select doc_id, {wc} as ws_tokens, {bpe} as bpe_tokens,
          {stop} as stopwords, {punct} as punct_chars,
          {quality} as quality_score, md5({norm}) as fingerprint
        from documents
    """


def q_corpus_quality_report(spark, sf_dir):
    """Per-language corpus profile — the analytics a mixing decision reads
    before setting token budgets: doc counts, total tokens, exact R-7
    percentiles of token length and quality score. percentile() is
    Spark's exact interpolated aggregate (no approx sketch), matching
    DuckDB quantile_cont; floats are round6 per the driver contract, and
    the total stays integer. One groupBy — partial aggregation map-side,
    percentiles merged from per-partition buffers."""
    docs = _docs_spread(spark, sf_dir)
    s = with_text_stats(docs)
    return s.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("ws_tokens").cast("long")).alias("total_ws_tokens"),
        F.round(
            F.percentile(F.col("ws_tokens").cast("double"), F.lit(0.5)), 6
        ).alias("median_ws_tokens"),
        F.round(
            F.percentile(F.col("ws_tokens").cast("double"), F.lit(0.9)), 6
        ).alias("p90_ws_tokens"),
        F.round(F.percentile(F.col("quality_score"), F.lit(0.5)), 6).alias(
            "median_quality"
        ),
    )


def sql_corpus_quality_report():
    return f"""
        with s as ({sql_text_stats()}),
        j as (
          select s.*, d.lang from s join documents d on s.doc_id = d.doc_id
        )
        select lang, count(*) as n_docs,
          sum(ws_tokens)::bigint as total_ws_tokens,
          round(quantile_cont(ws_tokens::double, 0.5), 6) as median_ws_tokens,
          round(quantile_cont(ws_tokens::double, 0.9), 6) as p90_ws_tokens,
          round(quantile_cont(quality_score, 0.5), 6) as median_quality
        from j group by lang
    """


def q_token_length_filter(spark, sf_dir):
    """Exact-tokenizer token counting + length cutoff (the 16k-cutoff rule,
    Stratos/filter_out_less_16k.py:69-72, cutoff scaled to fixture size).
    The mini-BPE merge table replays in DuckDB as a replace chain, so the
    count itself is value-checked — not a regex proxy."""
    from open_thoughts_spark.functions.bpe import with_bpe_token_count

    docs = _docs_spread(spark, sf_dir)
    counted = with_bpe_token_count(docs)
    return counted.select(
        "doc_id",
        F.col("bpe_count").alias("n_tokens"),
        (F.col("bpe_count") >= 150).alias("keep_len"),
    )


def sql_token_length_filter():
    from open_thoughts_spark.functions.bpe import bpe_count_sql

    c = bpe_count_sql("text")
    return f"""
        select doc_id, {c} as n_tokens, ({c} >= 150) as keep_len
        from documents
    """


def q_fingerprint_summary(spark, sf_dir):
    docs = _docs_spread(spark, sf_dir)
    fp = docs.withColumn("fingerprint", fingerprint_expr(F.col("text")))
    return fp.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fingerprint").alias("n_unique"),
    )


SQL_FINGERPRINT_SUMMARY = """
    select source, count(*) as n_docs,
      count(distinct md5(regexp_replace(lower(trim(regexp_replace(text,
        '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))), '[^a-z0-9 ]', '', 'g'))) as n_unique
    from documents group by source
"""


# --- dedup family ---

def q_math_domain_filter(spark, sf_dir):
    """Math/proof domain filter cascade (math/filter.py:4-18 +
    MultipleSamples/utils.py:295-301). Problems/solutions are derived
    deterministically from documents so every rule family fires on the
    fixture (same injection pattern as the PII scrub query)."""
    from open_thoughts_spark.rules.math_rules import with_math_decision

    docs = _docs_spread(spark, sf_dir)
    m5 = F.col("doc_id") % 5
    problem = (
        F.when(m5 == 0, F.concat(F.lit("a) "), F.col("text"), F.lit(" b) part two")))
        .when(m5 == 1, F.concat(F.col("text"), F.lit(" as shown in the Figure below")))
        .when(m5 == 2, F.concat(F.lit("Prove that "), F.col("text")))
        .otherwise(F.col("text"))
    )
    m4 = F.col("doc_id") % 4
    solution = (
        F.when(m4 == 0, F.lit("QED. \\boxed{}"))
        .when(m4 == 1, F.lit(""))
        .when(m4 == 2, F.concat(F.lit("discussion: "), F.col("text")))
        .otherwise(
            F.concat(F.lit("thus \\boxed{"), (F.col("doc_id") % 97).cast("string"), F.lit("}"))
        )
    )
    derived = docs.select(
        "doc_id", problem.alias("problem"), solution.alias("solution")
    )
    return with_math_decision(derived).select(
        "doc_id", "math_drop_reason", "keep_math"
    )


def sql_math_domain_filter():
    from open_thoughts_spark.rules.math_rules import math_reason_sql

    problem = (
        "case when doc_id % 5 = 0 then 'a) ' || text || ' b) part two'"
        " when doc_id % 5 = 1 then text || ' as shown in the Figure below'"
        " when doc_id % 5 = 2 then 'Prove that ' || text"
        " else text end"
    )
    solution = (
        "case when doc_id % 4 = 0 then 'QED. \\boxed{}'"
        " when doc_id % 4 = 1 then ''"
        " when doc_id % 4 = 2 then 'discussion: ' || text"
        " else 'thus \\boxed{' || (doc_id % 97)::varchar || '}' end"
    )
    reason = math_reason_sql(f"({problem})", f"({solution})")
    return f"""
        select doc_id, {reason} as math_drop_reason,
          ({reason} is null) as keep_math
        from documents
    """


def q_code_domain_filter(spark, sf_dir):
    """Code-domain curation cascade (open_thoughts/code/filters.py:4-48):
    url/[image]/short description, empty test inputs/outputs, empty
    solutions — derived deterministically from documents so every rule
    fires."""
    from open_thoughts_spark.rules.math_rules import with_code_decision

    docs = _docs_spread(spark, sf_dir)
    m4 = F.col("doc_id") % 4
    long_text = F.concat(F.col("text"), F.lit(" "), F.col("text"), F.lit(" "), F.col("text"))
    description = (
        F.when(m4 == 0, F.concat(F.lit("fetch from http://example.com then "), long_text))
        .when(m4 == 1, F.concat(F.lit("As shown [Image] here: "), long_text))
        .when(m4 == 2, F.substring(F.col("text"), 1, 50))
        .otherwise(long_text)
    )
    m3 = F.col("doc_id") % 3
    tests = (
        F.when(m3 == 0, F.lit('{"inputs": [], "outputs": []}'))
        .when(m3 == 1, F.lit('{"inputs": ["1", "2"], "outputs": ["a"]}'))
        .otherwise(F.lit('{"inputs": ["1"], "outputs": []}'))
    )
    solutions = F.when(F.col("doc_id") % 2 == 0, F.lit("[]")).otherwise(
        F.lit('["def f(): pass"]')
    )
    derived = docs.select(
        "doc_id",
        description.alias("description"),
        tests.alias("tests"),
        solutions.alias("solutions"),
    )
    return with_code_decision(derived).select(
        "doc_id", "code_drop_reason", "keep_code"
    )


def sql_code_domain_filter():
    from open_thoughts_spark.rules.math_rules import code_reason_sql

    long_text = "text || ' ' || text || ' ' || text"
    description = (
        "case when doc_id % 4 = 0 then 'fetch from http://example.com then ' || " + long_text
        + " when doc_id % 4 = 1 then 'As shown [Image] here: ' || " + long_text
        + " when doc_id % 4 = 2 then substr(text, 1, 50)"
        + f" else {long_text} end"
    )
    tests = (
        "case when doc_id % 3 = 0 then '{\"inputs\": [], \"outputs\": []}'"
        " when doc_id % 3 = 1 then '{\"inputs\": [\"1\", \"2\"], \"outputs\": [\"a\"]}'"
        " else '{\"inputs\": [\"1\"], \"outputs\": []}' end"
    )
    solutions = (
        "case when doc_id % 2 = 0 then '[]'"
        " else '[\"def f(): pass\"]' end"
    )
    reason = code_reason_sql(f"({description})", f"({tests})", f"({solutions})")
    return f"""
        select doc_id, {reason} as code_drop_reason,
          ({reason} is null) as keep_code
        from documents
    """


def q_dedup_keyfirst(spark, sf_dir):
    """Exact dedup keep-first on a colliding key (lang, word_count)."""
    docs = _t(spark, sf_dir, "documents")
    wc = F.size(F.split(F.col("text"), " ")).cast("long")
    keyed = docs.withColumn("word_count", wc)
    kept = relational.dedup_on_columns(keyed, ["lang", "word_count"], ["doc_id"])
    return kept.select("doc_id", "lang", "word_count")


SQL_DEDUP_KEYFIRST = """
    select doc_id, lang, word_count from (
      select doc_id, lang, len(string_split(text, ' '))::bigint as word_count,
        row_number() over (partition by lang, len(string_split(text, ' '))
                           order by doc_id) as rn
      from documents
    ) where rn = 1
"""


def q_minhash_signatures(spark, sf_dir):
    sig = dedup.minhash_signature(
        _t(spark, sf_dir, "documents"), "doc_id", "text", num_perm=8, shingle_n=3
    )
    return sig


# DuckDB equivalent of dedup.words_expr: lowercase, trim, split on ASCII
# whitespace runs (string_split on ' ' would diverge on uppercase or
# multi-space text even though the fixture happens to be normalized).
WORDS_SQL = "string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+')"


def minhash_cte_sql(num_perm: int = 8) -> str:
    """Shared CTE prefix (w → sh → sig) for every minhash oracle — ONE
    source of truth for the shingle formulation and signature hashing
    (three queries previously duplicated this text; code-review r2)."""
    # one salted md5 per shingle yields 8 x 16-bit perm hashes (4 hex
    # chars each) — replays dedup.minhash_signature's chunked kernel
    mins = ", ".join(
        f"min(substr(md5('{i // 8}' || '|' || sh), {(i % 8) * 4 + 1}, 4)) as mh_{i}"
        for i in range(num_perm)
    )
    return f"""w as (
          select doc_id, {WORDS_SQL} as words from documents
        ), sh as (
          select doc_id, unnest(list_distinct([
            array_to_string(words[i:i+2], ' ')
            for i in range(1, greatest(len(words) - 2, 0) + 1)
          ])) as sh
          from w
        ), sig as (
          select doc_id, {mins} from sh group by doc_id
        )"""


def band_rows_sql(bands: int = 4, rows_per_band: int = 2) -> str:
    pieces = []
    for b in range(bands):
        cols = " || '|' || ".join(
            f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)
        )
        pieces.append(
            f"select doc_id, {b} as band_idx, md5({cols}) as band_key from sig"
        )
    return " union all ".join(pieces)


def sql_minhash_signatures():
    return f"""
        with {minhash_cte_sql()}
        select * from sig
    """


def q_minhash_pairs(spark, sf_dir):
    """LSH candidate pairs (4 bands × 2 rows over 8 perms) + exact Jaccard."""
    docs = _t(spark, sf_dir, "documents")
    sig = dedup.minhash_signature(
        docs, "doc_id", "text", num_perm=8, shingle_n=3, min_parallelism=32
    )
    bands = dedup.lsh_bands(sig, "doc_id", bands=4, rows_per_band=2)
    cands = dedup.candidate_pairs(bands, "doc_id")
    verified = dedup.jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, pairs=cands, min_parallelism=32
    )
    return verified.select(
        "id_a", "id_b", "common", "size_a", "size_b", F.round("jaccard", 6).alias("jaccard_r6")
    )


def sql_minhash_pairs():
    return f"""
        with {minhash_cte_sql()}, bands as ({band_rows_sql()}),
        cands as (
          select distinct a.doc_id as id_a, b.doc_id as id_b
          from bands a join bands b
            on a.band_idx = b.band_idx and a.band_key = b.band_key
           and a.doc_id < b.doc_id
        ), sizes as (
          select doc_id, count(*) as n from sh group by doc_id
        ), common as (
          select a.doc_id as id_a, b.doc_id as id_b, count(*) as common
          from sh a join sh b on a.sh = b.sh and a.doc_id < b.doc_id
          group by 1, 2
        )
        select c.id_a, c.id_b, c.common,
          sa.n as size_a, sb.n as size_b,
          round(c.common / (sa.n + sb.n - c.common)::double, 6) as jaccard_r6
        from common c
        join cands k on c.id_a = k.id_a and c.id_b = k.id_b
        join sizes sa on sa.doc_id = c.id_a
        join sizes sb on sb.doc_id = c.id_b
    """


def q_minhash_bucket_cap(spark, sf_dir):
    """LSH candidate pairs under the degenerate-bucket skew guard
    (dedup.cap_band_buckets): band buckets holding more than 2 ids are
    dropped before the self-join, so one hot band value (boilerplate / empty
    text at web scale) can never go quadratic. The oracle recomputes bucket
    sizes in SQL and keeps only pairs whose shared bucket survived the cap —
    proving the window-count guard drops exactly the over-cap buckets and
    nothing else (at sf0.01 the cap prunes the four size-3 buckets, so the
    result provably differs from the uncapped q_minhash_pairs candidates)."""
    docs = _t(spark, sf_dir, "documents")
    sig = dedup.minhash_signature(
        docs, "doc_id", "text", num_perm=8, shingle_n=3, min_parallelism=32
    )
    bands = dedup.lsh_bands(sig, "doc_id", bands=4, rows_per_band=2)
    return dedup.candidate_pairs(bands, "doc_id", max_bucket_size=2)


def sql_minhash_bucket_cap():
    return f"""
        with {minhash_cte_sql()}, bands as ({band_rows_sql()}),
        kept as (
          select doc_id, band_idx, band_key from (
            select doc_id, band_idx, band_key,
              count(*) over (partition by band_idx, band_key) as bucket_n
            from bands
          ) where bucket_n <= 2
        )
        select distinct a.doc_id as id_a, b.doc_id as id_b
        from kept a join kept b
          on a.band_idx = b.band_idx and a.band_key = b.band_key
         and a.doc_id < b.doc_id
    """


def q_oversize_buckets(spark, sf_dir):
    """The audit side of the skew guard: which band buckets would a cap of 2
    drop, and how many ids sit in each — what an operator inspects before
    choosing the threshold at 100 TB (partial-agg count; hot keys combine
    map-side and never concentrate on one task)."""
    docs = _t(spark, sf_dir, "documents")
    sig = dedup.minhash_signature(
        docs, "doc_id", "text", num_perm=8, shingle_n=3, min_parallelism=32
    )
    bands = dedup.lsh_bands(sig, "doc_id", bands=4, rows_per_band=2)
    return dedup.oversize_band_buckets(bands, max_bucket_size=2)


def sql_oversize_buckets():
    return f"""
        with {minhash_cte_sql()}, bands as ({band_rows_sql()})
        select band_idx, band_key, count(*) as bucket_n
        from bands group by 1, 2 having count(*) > 2
    """


def q_minhash_dedup_kept(spark, sf_dir):
    """The COMPLETE fuzzy-dedup operator end to end: signatures → LSH
    candidates → Jaccard verify (>= 0.2) → transitive closure → keep
    min-id per component. The oracle replays every stage including the
    recursive closure — the strongest single check of the dedup family."""
    docs = _t(spark, sf_dir, "documents")
    kept = dedup.minhash_dedup(
        docs, "doc_id", "text", min_jaccard=0.2, num_perm=8, shingle_n=3,
        transitive=True, bands=4, rows_per_band=2, min_parallelism=32,
    )
    return kept.select("doc_id")


def sql_minhash_dedup_kept():
    return f"""
        with recursive {minhash_cte_sql()}, bands as ({band_rows_sql()}),
        cands as (
          select distinct a.doc_id as id_a, b.doc_id as id_b
          from bands a join bands b
            on a.band_idx = b.band_idx and a.band_key = b.band_key
           and a.doc_id < b.doc_id
        ), sizes as (
          select doc_id, count(*) as n from sh group by doc_id
        ), pairs as (
          select c.id_a, c.id_b from (
            select k.id_a, k.id_b, count(*) as common
            from cands k
            join sh a on a.doc_id = k.id_a
            join sh b on b.doc_id = k.id_b and b.sh = a.sh
            group by 1, 2
          ) c
          join sizes sa on sa.doc_id = c.id_a
          join sizes sb on sb.doc_id = c.id_b
          where c.common / (sa.n + sb.n - c.common)::double >= 0.2
        ), edges as (
          select id_a as src, id_b as dst from pairs
          union
          select id_b, id_a from pairs
        ), r as (
          select src as node, src as reach from edges
          union
          select r.node, e.dst from r join edges e on e.src = r.reach
        ), losers as (
          select node from r group by node having min(reach) != node
        )
        select doc_id from documents
        where doc_id not in (select node from losers)
    """


def q_simhash(spark, sf_dir):
    return dedup.simhash32(
        _t(spark, sf_dir, "documents"), "doc_id", "text", min_parallelism=32
    )


def sql_simhash():
    sums = ",\n      ".join(
        f"sum(case when ascii(substr(md5(w), {j + 1}, 1)) % 2 = 1 then 1 else -1 end) as s{j}"
        for j in range(32)
    )
    bits = " + ".join(
        f"(case when s{j} > 0 then {2**j}::bigint else 0 end)" for j in range(32)
    )
    return f"""
        with w as (
          select doc_id, unnest({WORDS_SQL}) as w
          from documents
        ), f as (select doc_id, w from w where w != ''),
        s as (select doc_id, {sums} from f group by doc_id)
        select doc_id, {bits} as simhash from s
    """


def q_ngram_jaccard(spark, sf_dir):
    """Blocked n-gram Jaccard near-dup pairs (within lang blocks)."""
    docs = _t(spark, sf_dir, "documents")
    # r4 audit: the shingle map on an unspread scan ran 7-9 s at sf0.1;
    # spread brings it to 1.3-2.2 s (same fix as the minhash family)
    pairs = dedup.jaccard_pairs(
        docs, "doc_id", "text", shingle_n=2, min_jaccard=0.2, block_col="lang",
        min_parallelism=32,
    )
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard_r6"))


def sql_ngram_jaccard():
    return f"""
        with w as (
          select doc_id, lang, {WORDS_SQL} as words
          from documents
        ), sh as (
          select doc_id, lang, unnest(list_distinct([
            array_to_string(words[i:i+1], ' ')
            for i in range(1, greatest(len(words) - 1, 0) + 1)
          ])) as sh
          from w
        ), sizes as (select doc_id, count(*) as n from sh group by doc_id),
        common as (
          select a.doc_id as id_a, b.doc_id as id_b, count(*) as common
          from sh a join sh b on a.sh = b.sh and a.lang = b.lang
            and a.doc_id < b.doc_id
          group by 1, 2
        )
        select c.id_a, c.id_b,
          round(c.common / (sa.n + sb.n - c.common)::double, 6) as jaccard_r6
        from common c
        join sizes sa on sa.doc_id = c.id_a
        join sizes sb on sb.doc_id = c.id_b
        where c.common / (sa.n + sb.n - c.common)::double >= 0.2
    """


def q_dedup_closure(spark, sf_dir):
    """Fuzzy-dedup transitive closure. Derives bridge-shaped variants from
    each document — two disjoint halves (low ids) plus the full text
    (highest id): each half is Jaccard-similar to the full text but not to
    the other half, so single-pass pairwise keep-min keeps BOTH halves
    while closure groups all three. NOTE: closure is this repo's semantic
    upgrade — the reference (deduplicate.py:41-49) removes per matched
    pair and would also keep both halves. Output: (vid, component)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    w = dedup.words_expr(F.col("text"))
    n2 = F.floor(F.size(w) / 2).cast("int")
    left = F.array_join(F.slice(w, 1, n2), " ")
    right = F.array_join(F.slice(w, n2 + 1, F.size(w) - n2), " ")
    full = F.array_join(w, " ")
    variants = (
        docs.select((F.col("doc_id") * 3).alias("vid"), left.alias("text"))
        .union(docs.select((F.col("doc_id") * 3 + 1).alias("vid"), right.alias("text")))
        .union(docs.select((F.col("doc_id") * 3 + 2).alias("vid"), full.alias("text")))
    )
    pairs = dedup.jaccard_pairs(
        variants, "vid", "text", shingle_n=2, min_jaccard=0.4
    )
    cc = dedup.connected_components(pairs)
    return variants.join(cc, variants.vid == cc.node, "left").select(
        "vid", F.coalesce(F.col("comp"), F.col("vid")).alias("component")
    )


def sql_dedup_closure():
    return f"""
        with recursive doc40 as (
          select doc_id, {WORDS_SQL} as words from documents where doc_id < 40
        ), halves as (
          select doc_id, cast(floor(len(words) / 2) as int) as n2, words
          from doc40
        ), variants as (
          select doc_id * 3 as vid, array_to_string(words[1:n2], ' ') as text
          from halves
          union all
          select doc_id * 3 + 1,
                 array_to_string(words[n2 + 1:len(words)], ' ') from halves
          union all
          select doc_id * 3 + 2, array_to_string(words, ' ') from halves
        ), w2 as (
          select vid,
            string_split_regex(lower(trim(text)), '[ \\t\\n\\x0B\\f\\r]+') as words
          from variants
        ), sh as (
          select vid, unnest(list_distinct([
            array_to_string(words[i:i+1], ' ')
            for i in range(1, greatest(len(words) - 1, 0) + 1)
          ])) as sh
          from w2
        ), sizes as (
          select vid, count(*) as n from sh group by 1
        ), pairs as (
          select c.id_a, c.id_b from (
            select a.vid as id_a, b.vid as id_b, count(*) as common
            from sh a join sh b on a.sh = b.sh and a.vid < b.vid
            group by 1, 2
          ) c
          join sizes sa on sa.vid = c.id_a
          join sizes sb on sb.vid = c.id_b
          where c.common / (sa.n + sb.n - c.common)::double >= 0.4
        ), edges as (
          select id_a as src, id_b as dst from pairs
          union
          select id_b, id_a from pairs
        ), r as (
          select vid as node, vid as reach from variants
          union
          select r.node, e.dst from r join edges e on e.src = r.reach
        )
        select node as vid, min(reach) as component from r group by node
    """


def q_decontaminate(spark, sf_dir):
    """n-gram decontamination: ids sharing a 3-gram with the src0 'eval' set."""
    # spread (r4 audit): the pool-side gram explode ran 3.3-5.2 s unspread
    # at sf0.1, 1.2-1.5 s spread; combined_contaminated_ids below needs no
    # spread (its minhash stages dominate and re-shuffle anyway)
    docs = _docs_spread(spark, sf_dir)
    eval_df = docs.filter(F.col("source") == "src0")
    pool = docs.filter(F.col("source") != "src0")
    return decontaminate.contaminated_ids(pool, eval_df, "doc_id", "text", n=3)


SQL_DECONTAMINATE = f"""
    with w as (
      select doc_id, source, {WORDS_SQL} as words
      from documents
    ), sh as (
      select doc_id, source, unnest(list_distinct([
        array_to_string(words[i:i+2], ' ')
        for i in range(1, greatest(len(words) - 2, 0) + 1)
      ])) as sh
      from w
    )
    select distinct d.doc_id
    from sh d join (select distinct sh from sh where source = 'src0') e
      on d.sh = e.sh
    where d.source != 'src0'
"""


def q_decontaminate_combined(spark, sf_dir):
    """Production decontamination mask (_A1_Source/utils.py:161-189):
    3-gram overlap OR (LSH candidate AND Jaccard >= 0.2) vs the src0 eval
    set, channels OR-combined. The oracle replays BOTH channels including
    the exact LSH candidacy (8 perms, 4 bands x 2 rows)."""
    docs = _t(spark, sf_dir, "documents")
    eval_df = docs.filter(F.col("source") == "src0")
    pool = docs.filter(F.col("source") != "src0")
    return decontaminate.combined_contaminated_ids(
        pool, eval_df, "doc_id", "text",
        n=3, min_jaccard=0.2, num_perm=8, bands=4, rows_per_band=2,
        shingle_n=3,
    )


def sql_decontaminate_combined():
    band_rows = []
    for b in range(4):
        c0, c1 = f"mh_{2*b}", f"mh_{2*b+1}"
        band_rows.append(
            f"select doc_id, {b} as band_idx,"
            f" md5({c0} || '|' || {c1}) as band_key from sig"
        )
    bands = " union all ".join(band_rows)
    mins = ", ".join(
        f"min(substr(md5('0' || '|' || sh), {(i % 8) * 4 + 1}, 4)) as mh_{i}"
        for i in range(8)
    )
    return f"""
        with w as (
          select doc_id, source, {WORDS_SQL} as words from documents
        ), sh as (
          select doc_id, source, unnest(list_distinct([
            array_to_string(words[i:i+2], ' ')
            for i in range(1, greatest(len(words) - 2, 0) + 1)
          ])) as sh
          from w
        ), ngram_ids as (
          select distinct d.doc_id
          from sh d join (select distinct sh from sh where source = 'src0') e
            on d.sh = e.sh
          where d.source != 'src0'
        ), sig as (
          select doc_id, {mins} from sh group by doc_id
        ), bands as ({bands}),
        cand_pairs as (
          select distinct e.doc_id as eid, d.doc_id as did
          from bands e
          join documents de on de.doc_id = e.doc_id and de.source = 'src0'
          join bands d on d.band_idx = e.band_idx and d.band_key = e.band_key
          join documents dd on dd.doc_id = d.doc_id and dd.source != 'src0'
        ), sizes as (
          select doc_id, count(*) as n from sh group by doc_id
        ), common as (
          select c.eid, c.did, count(*) as common
          from cand_pairs c
          join sh a on a.doc_id = c.eid
          join sh b on b.doc_id = c.did and b.sh = a.sh
          group by 1, 2
        ), fuzzy_ids as (
          select distinct c.did as doc_id
          from common c
          join sizes se on se.doc_id = c.eid
          join sizes sd on sd.doc_id = c.did
          where c.common / (se.n + sd.n - c.common)::double >= 0.2
        )
        select doc_id from ngram_ids
        union
        select doc_id from fuzzy_ids
    """


def q_decontaminate_benchmarks(spark, sf_dir):
    """Registry-driven decontamination (open_thoughts/eval.py parity): two
    fixture 'benchmarks' (src0/src1 documents as eval sets) run through the
    per-benchmark mask; output is the production metrics table
    (benchmark, contaminated_count)."""
    from open_thoughts_spark.operators.decontaminate import (
        EVAL_BENCHMARKS, EvalBenchmark,
    )

    # per-benchmark threshold override (VERDICT r3 #9): srcB decontaminates
    # at 4-gram while the call-level default stays 3-gram — the reference's
    # 114k-vs-DCFT split (decontaminate.py:12 vs the DCFT yaml constants).
    # Passed as a CALL-LEVEL registry override, not register_benchmark —
    # mutating the module global leaked the entry into every later call in
    # the process (code-review r4)
    registry = {
        **EVAL_BENCHMARKS,
        "fixture/srcB": EvalBenchmark("fixture/srcB", ("text",), ngram_n=4),
    }
    docs = _docs_spread(spark, sf_dir)
    pool = docs.filter(~F.col("source").isin("src0", "src1"))
    frames = {
        "fixture/srcA": docs.filter(F.col("source") == "src0").select("text"),
        "fixture/srcB": docs.filter(F.col("source") == "src1").select("text"),
    }
    return decontaminate.benchmark_contamination_report(
        pool, frames, "doc_id", "text", n=3, mode="ngram", registry=registry
    )


SQL_DECONTAMINATE_BENCHMARKS = f"""
    with w as (
      select doc_id, source, {WORDS_SQL} as words
      from documents
    ), sh3 as (
      select doc_id, source, unnest(list_distinct([
        array_to_string(words[i:i+2], ' ')
        for i in range(1, greatest(len(words) - 2, 0) + 1)
      ])) as sh
      from w
    ), sh4 as (
      select doc_id, source, unnest(list_distinct([
        array_to_string(words[i:i+3], ' ')
        for i in range(1, greatest(len(words) - 3, 0) + 1)
      ])) as sh
      from w
    )
    select 'fixture/srcA' as benchmark,
      count(distinct d.doc_id) as contaminated_count
    from sh3 d join (select distinct sh from sh3 where source = 'src0') e
      on d.sh = e.sh
    where d.source not in ('src0', 'src1')
    union all
    select 'fixture/srcB' as benchmark,
      count(distinct d.doc_id) as contaminated_count
    from sh4 d join (select distinct sh from sh4 where source = 'src1') e
      on d.sh = e.sh
    where d.source not in ('src0', 'src1')
"""


# --- sampling / top-k ---

def q_puzzle_format_sample(spark, sf_dir):
    """The puzzle-chain head (puzzle.py:10-33): riddle_sense choices fold
    into the question body + seeded shuffle-take — the two stages of
    curate_puzzle not already gate-covered by the dedup/decontaminate/
    completions oracles. Choices derive deterministically from doc_id so
    the fold itself is value-checked."""
    from open_thoughts_spark.pipeline.curation import riddle_sense_format

    docs = _t(spark, sf_dir, "documents")
    riddles = docs.select(
        F.col("doc_id").alias("rid"),
        F.concat(F.lit("riddle number "), F.col("doc_id").cast("string")).alias(
            "question"
        ),
        F.struct(
            F.array(F.lit("A"), F.lit("B")).alias("label"),
            F.array(
                F.concat(F.lit("choice-a-"), F.col("lang")),
                F.concat(F.lit("choice-b-"), (F.col("doc_id") % 7).cast("string")),
            ).alias("text"),
        ).alias("choices"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("A")).otherwise(F.lit("B")).alias(
            "answerKey"
        ),
    )
    out = relational.uniform_sample_fixed(
        riddle_sense_format(riddles), 50, ["rid"], salt="riddle42"
    )
    return out.select("rid", "question", "answer")


SQL_PUZZLE_FORMAT_SAMPLE = """
    with r as (
      select doc_id as rid,
        'riddle number ' || doc_id::varchar
          || chr(10) || 'A: choice-a-' || lang
          || chr(10) || 'B: choice-b-' || (doc_id % 7)::varchar as question,
        case when doc_id % 2 = 0 then 'A' else 'B' end as answer
      from documents
    )
    select rid, question, answer from r
    order by md5('riddle42' || '|' || rid::varchar), rid
    limit 50
"""


def q_stratified_sample(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = relational.stratified_sample(docs, "lang", 20, ["doc_id"], salt="strat")
    return out.select("doc_id", "lang")


SQL_STRATIFIED_SAMPLE = """
    select doc_id, lang from (
      select doc_id, lang,
        row_number() over (partition by lang
          order by md5('strat' || '|' || doc_id::varchar), doc_id) as rn
      from documents
    ) where rn <= 20
"""


def q_sample_token_budget(spark, sf_dir):
    """Token-budget domain mixing (relational.sample_to_token_budget): each
    lang downsampled to an expected 4000 whitespace tokens — at sf0.01 that
    cuts 'en' (~11.8k tokens) to ~34% keep probability, trims 'zh' (~4.1k)
    marginally, and passes the under-budget langs through whole. The keep
    decision is the md5-uniform-vs-trunc(prob*2^32) integer compare, so the
    oracle replays every row exactly (trunc, not cast — DuckDB cast
    rounds)."""
    from open_thoughts_spark.functions.text_stats import ws_token_count

    docs = _t(spark, sf_dir, "documents")
    counted = docs.withColumn(
        "ws_tokens", ws_token_count(F.col("text")).cast("long")
    )
    out = relational.sample_to_token_budget(
        counted, "lang", "ws_tokens", 4000, ["doc_id"]
    )
    return out.select("doc_id", "lang", "ws_tokens")


def sql_sample_token_budget():
    wc = duck_sql.word_count_sql("text")
    return f"""
        with t as (
          select doc_id, lang, ({wc})::bigint as ws_tokens from documents
        ), tot as (
          select lang, sum(ws_tokens) as domain_tokens from t group by 1
        )
        select t.doc_id, t.lang, t.ws_tokens
        from t join tot on t.lang = tot.lang
        where ('0x' || substr(md5('tokbudget' || '|' || t.doc_id::varchar), 1, 8))::bigint
          < trunc(least(1.0, 4000.0 / greatest(tot.domain_tokens, 1)::double)
                  * 4294967296.0)::bigint
    """


def q_sample_token_budget_per_domain(spark, sf_dir):
    """Per-domain budgets (the dict form): mixture specs upweight some
    domains — here en gets 2000 tokens, zh 3000, every other lang has no
    entry and passes through whole (budget = its own total). The budget
    CASE is driver-side literals, so the oracle replays it as the same
    CASE."""
    from open_thoughts_spark.functions.text_stats import ws_token_count

    docs = _t(spark, sf_dir, "documents")
    counted = docs.withColumn(
        "ws_tokens", ws_token_count(F.col("text")).cast("long")
    )
    out = relational.sample_to_token_budget(
        counted, "lang", "ws_tokens", {"en": 2000, "zh": 3000}, ["doc_id"]
    )
    return out.select("doc_id", "lang", "ws_tokens")


def sql_sample_token_budget_per_domain():
    wc = duck_sql.word_count_sql("text")
    return f"""
        with t as (
          select doc_id, lang, ({wc})::bigint as ws_tokens from documents
        ), tot as (
          select lang, sum(ws_tokens) as domain_tokens from t group by 1
        )
        select t.doc_id, t.lang, t.ws_tokens
        from t join tot on t.lang = tot.lang
        where ('0x' || substr(md5('tokbudget' || '|' || t.doc_id::varchar), 1, 8))::bigint
          < trunc(least(1.0,
              (case when t.lang = 'en' then 2000.0
                    when t.lang = 'zh' then 3000.0
                    else tot.domain_tokens::double end)
              / greatest(tot.domain_tokens, 1)::double)
              * 4294967296.0)::bigint
    """


def q_weighted_mix(spark, sf_dir):
    """Training-mixture weighting: sources sampled at different fractions
    (hash-threshold deterministic — layout-independent), unioned, counted
    per source."""
    docs = _t(spark, sf_dir, "documents")
    srcs = [docs.filter(F.col("source") == f"src{i}") for i in range(3)]
    mixed = relational.weighted_mix(srcs, [0.9, 0.5, 0.2], ["doc_id"])
    return mixed.groupBy("source").agg(F.count("*").alias("n_rows"))


SQL_WEIGHTED_MIX = """
    with m as (
      select source, doc_id,
        case source when 'src0' then 0 when 'src1' then 1 else 2 end as si,
        case source when 'src0' then cast(trunc(0.9 * 4294967296) as bigint)
                    when 'src1' then cast(trunc(0.5 * 4294967296) as bigint)
                    else cast(trunc(0.2 * 4294967296) as bigint) end as thr
      from documents where source in ('src0', 'src1', 'src2')
    )
    select source, count(*) as n_rows from m
    where ('0x' || substr(md5('mixw' || si::varchar || '|' || doc_id::varchar),
                          1, 8))::bigint < thr
    group by source
"""


def q_topn_longest(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return relational.filter_top_n(docs, "n_chars", 25, ["doc_id"]).select(
        "doc_id", "n_chars"
    )


SQL_TOPN_LONGEST = """
    select doc_id, n_chars from documents
    order by n_chars desc, doc_id limit 25
"""


# --- similarity search ---

def q_knn(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.knn_bruteforce(
        emb, queries, k=5, min_parallelism=32
    ).select(
        "query_id", "neighbor_id", "rank"
    )


SQL_KNN = """
    with v as (select vec_id, embedding::double[] as e from embeddings),
    sims as (
      select q.vec_id as query_id, c.vec_id as neighbor_id,
        round(list_dot_product(q.e, c.e) /
              (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))),
              6) as sim6
      from v q join v c on c.vec_id != q.vec_id
      where q.vec_id < 10
    )
    select query_id, neighbor_id, rank from (
      select query_id, neighbor_id,
        row_number() over (partition by query_id
                           order by sim6 desc, neighbor_id) as rank
      from sims
    ) where rank <= 5
"""


def q_ann_lsh(spark, sf_dir):
    """Approximate NN via random-hyperplane LSH. Planes are md5-derived
    integer weights over trunc(v*1e6)-quantized vectors (exact int64
    projections), so bucketing + multiprobe + in-bucket cosine replay
    exactly in DuckDB (was rows-only in r1)."""
    emb = _t(spark, sf_dir, "embeddings")
    # no min_parallelism spread here (VERDICT r3 #7 A/B): the LSH projection
    # map is integer-light, so at sf0.1 the repartition shuffle costs more
    # than the parallel map buys (warm 1.43 vs 1.17 s measured). knn keeps
    # its spread — its brute-force map is heavy enough to win.
    # query_pred (r6): the query set is a corpus subset, so bucket once and
    # share the exchange — one Python stage and one scan instead of two.
    return similarity.ann_lsh_topk(
        emb, None, k=5, query_pred=F.col("vec_id") < 10
    ).select("query_id", "neighbor_id", "rank")


ANN_WS = "[ \\t\\n\\x0B\\f\\r]+"


SQL_ANN_LSH = """
    with v as (
      select vec_id, embedding::double[] as e,
        list_transform(embedding::double[],
                       x -> cast(trunc(x * 1000000) as bigint)) as q
      from embeddings
    ), w as (
      select p, i,
        ('0x' || substr(md5(p::varchar || '|' || i::varchar), 1, 8))::bigint
          % 16 - 8 as wt
      from range(8) t(p), range(64) d(i)
    ), proj as (
      select vec_id, p, sum(q[i + 1] * wt) as s
      from v, w group by 1, 2
    ), bkt as (
      select vec_id,
        cast(sum(case when s > 0 then 1::bigint << p else 0 end) as bigint)
          as bucket
      from proj group by 1
    ), qprobe as (
      select distinct b.vec_id, xor(b.bucket, f.f) as bucket
      from bkt b, (select unnest([0,1,2,4,8,16,32,64,128]) as f) f
      where b.vec_id < 10
    ), cand as (
      select distinct q.vec_id as query_id, c.vec_id as neighbor_id
      from qprobe q join bkt c on q.bucket = c.bucket
      where c.vec_id != q.vec_id
    ), sims as (
      select cand.query_id, cand.neighbor_id,
        round(list_dot_product(a.e, b.e) /
              (sqrt(list_dot_product(a.e, a.e))
               * sqrt(list_dot_product(b.e, b.e))), 6) as sim6
      from cand join v a on a.vec_id = cand.query_id
                join v b on b.vec_id = cand.neighbor_id
    )
    select query_id, neighbor_id, rank from (
      select query_id, neighbor_id,
        row_number() over (partition by query_id
                           order by sim6 desc, neighbor_id) as rank
      from sims
    ) where rank <= 5
"""


def q_ann_ivf(spark, sf_dir):
    """IVF approximate NN (coarse-quantizer cells from md5-derived integer
    centroids, 4-probe) — the second ANN scale path beside LSH; fully
    DuckDB-oracled via the same exact-integer assignment."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    # spread dropped — same A/B result as ann_lsh (warm 1.45 vs 1.24 s)
    return similarity.ann_ivf_topk(
        emb, queries, k=5, n_centroids=16, n_probe=4
    ).select("query_id", "neighbor_id", "rank")


SQL_ANN_IVF = """
    with v as (
      select vec_id, embedding::double[] as e,
        list_transform(embedding::double[],
                       x -> cast(trunc(x * 1000000) as bigint)) as q
      from embeddings
    ), w as (
      select k, i,
        ('0x' || substr(md5('c' || k::varchar || '|' || i::varchar), 1, 8))::bigint
          % 16 - 8 as wt
      from range(16) t(k), range(64) d(i)
    ), sc as (
      select vec_id, k, sum(q[i + 1] * wt) as s
      from v, w group by 1, 2
    ), ranked as (
      select vec_id, k,
        row_number() over (partition by vec_id order by s desc, k) as rn
      from sc
    ), cells as (
      select vec_id, k as cell from ranked where rn = 1
    ), qprobe as (
      select vec_id, k as cell from ranked where rn <= 4 and vec_id < 10
    ), cand as (
      select distinct q.vec_id as query_id, c.vec_id as neighbor_id
      from qprobe q join cells c on q.cell = c.cell
      where c.vec_id != q.vec_id
    ), sims as (
      select cand.query_id, cand.neighbor_id,
        round(list_dot_product(a.e, b.e) /
              (sqrt(list_dot_product(a.e, a.e))
               * sqrt(list_dot_product(b.e, b.e))), 6) as sim6
      from cand join v a on a.vec_id = cand.query_id
                join v b on b.vec_id = cand.neighbor_id
    )
    select query_id, neighbor_id, rank from (
      select query_id, neighbor_id,
        row_number() over (partition by query_id
                           order by sim6 desc, neighbor_id) as rank
      from sims
    ) where rank <= 5
"""


def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs within label blocks. Threshold 0.4
    verifies non-zero pairs on the driver fixture (max in-block cosine is
    ~0.47; 0.6 returned 0 rows and made the gate vacuous — VERDICT r1)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_pairs(
        emb, "vec_id", "embedding", min_cosine=0.4, block_col="label",
        min_parallelism=32,
    )


SQL_EMBEDDING_NEARDUP = """
    with v as (select vec_id, label, embedding::double[] as e from embeddings)
    select a.vec_id as id_a, b.vec_id as id_b,
      round(list_dot_product(a.e, b.e) /
            (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))),
            6) as cosine
    from v a join v b on a.label = b.label and a.vec_id < b.vec_id
    where round(list_dot_product(a.e, b.e) /
          (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6)
          >= 0.4
"""


def q_embedding_neardup_lsh(spark, sf_dir):
    """Embedding near-dup pairs blocked by LSH bucket — the 100×-safe
    blocking (bucket cardinality grows with the corpus; a 10-value label
    block is quadratic within each value). md5-integer buckets make it
    value-checkable; 4 planes keeps the fixture's ~0.4-cosine pairs
    colliding often enough to verify non-zero rows."""
    emb = similarity.with_lsh_bucket(
        _t(spark, sf_dir, "embeddings"), n_planes=4
    )
    return similarity.cosine_pairs(
        emb, "vec_id", "embedding", min_cosine=0.4, block_col="lsh_bucket",
        min_parallelism=32,
    )


SQL_EMBEDDING_NEARDUP_LSH = """
    with v as (
      select vec_id, embedding::double[] as e,
        list_transform(embedding::double[],
                       x -> cast(trunc(x * 1000000) as bigint)) as q
      from embeddings
    ), w as (
      select p, i,
        ('0x' || substr(md5(p::varchar || '|' || i::varchar), 1, 8))::bigint
          % 16 - 8 as wt
      from range(4) t(p), range(64) d(i)
    ), proj as (
      select vec_id, p, sum(q[i + 1] * wt) as s from v, w group by 1, 2
    ), bkt as (
      select vec_id,
        cast(sum(case when s > 0 then 1::bigint << p else 0 end) as bigint)
          as bucket
      from proj group by 1
    )
    select a.vec_id as id_a, b.vec_id as id_b,
      round(list_dot_product(va.e, vb.e) /
            (sqrt(list_dot_product(va.e, va.e))
             * sqrt(list_dot_product(vb.e, vb.e))), 6) as cosine
    from bkt a join bkt b on a.bucket = b.bucket and a.vec_id < b.vec_id
    join v va on va.vec_id = a.vec_id
    join v vb on vb.vec_id = b.vec_id
    where round(list_dot_product(va.e, vb.e) /
          (sqrt(list_dot_product(va.e, va.e))
           * sqrt(list_dot_product(vb.e, vb.e))), 6) >= 0.4
"""


def q_embedding_neardup_banded(spark, sf_dir):
    """Embedding near-dup pairs via BANDED LSH candidates (OR over 3 bands
    of 4 sign bits) — the recall fix for the single-exact-bucket blocking
    (ADVICE r2: all-bits agreement ≈ 0.28 recall at cosine 0.95; banded OR
    at 3x4 bits ≈ 0.96). Round 4 widened the bands from 2 bits (4 buckets/
    band — bucket occupancy N/4, candidate count quadratic in it; the
    sf0.1 full-gate run spent 5.9 s mostly verifying N²/4-ish pairs) to 4
    bits (16 buckets/band, 4x fewer candidates) — still non-vacuous at
    the sf0.01 gate (~31 docs/bucket). The DuckDB oracle replays the
    identical plane signs, band keys and pair set, so the gate
    value-checks the banding itself."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_pairs_banded(
        emb, "vec_id", "embedding", min_cosine=0.4, n_planes=12, bands=3,
        min_parallelism=32,
    )


SQL_EMBEDDING_NEARDUP_BANDED = """
    with v as (
      select vec_id, embedding::double[] as e,
        list_transform(embedding::double[],
                       x -> cast(trunc(x * 1000000) as bigint)) as q
      from embeddings
    ), w as (
      select p, i,
        ('0x' || substr(md5(p::varchar || '|' || i::varchar), 1, 8))::bigint
          % 16 - 8 as wt
      from range(12) t(p), range(64) d(i)
    ), proj as (
      select vec_id, p, sum(q[i + 1] * wt) as s from v, w group by 1, 2
    ), bands as (
      select vec_id, p // 4 as band_idx,
        cast(sum(case when s > 0 then 1::bigint << (p % 4) else 0 end)
             as bigint) as band_val
      from proj group by 1, 2
    ), cand as (
      select distinct a.vec_id as id_a, b.vec_id as id_b
      from bands a
      join bands b on a.band_idx = b.band_idx and a.band_val = b.band_val
                  and a.vec_id < b.vec_id
    )
    select c.id_a, c.id_b,
      round(list_dot_product(va.e, vb.e) /
            (sqrt(list_dot_product(va.e, va.e))
             * sqrt(list_dot_product(vb.e, vb.e))), 6) as cosine
    from cand c
    join v va on va.vec_id = c.id_a
    join v vb on vb.vec_id = c.id_b
    where round(list_dot_product(va.e, vb.e) /
          (sqrt(list_dot_product(va.e, va.e))
           * sqrt(list_dot_product(vb.e, vb.e))), 6) >= 0.4
"""


def q_domain_extract_frequency(spark, sf_dir):
    """WebInstruct domain shape end to end: derive page URLs, extract the
    host with a portable regex (Spark parse_url has no DuckDB twin), count
    per domain, keep frequent ones (count_domains_per_shard →
    sum_and_filter, utils.py:122-167) — Catalyst's partial/final agg does
    the reference's two-phase by itself."""
    docs = _t(spark, sf_dir, "documents")
    # modulus 61 on 500 fixture docs → 12 domains at 9 pages, 49 at 8, so
    # the >= 9 threshold actually discriminates in the gate (a 23-domain
    # variant passed every domain — vacuously green, code-review r2)
    url = F.concat(
        F.lit("https://host"),
        (F.col("doc_id") % 61).cast("string"),
        F.lit(".example.org/p/"),
        F.col("doc_id").cast("string"),
    )
    domain = F.regexp_extract(url, "^[a-z]+://([^/]+)", 1)
    return (
        docs.select(domain.alias("domain"))
        .groupBy("domain")
        .agg(F.count("*").alias("n_pages"))
        .filter(F.col("n_pages") >= 9)
    )


SQL_DOMAIN_EXTRACT_FREQUENCY = """
    with u as (
      select 'https://host' || (doc_id % 61)::varchar || '.example.org/p/'
             || doc_id::varchar as url
      from documents
    )
    select regexp_extract(url, '^[a-z]+://([^/]+)', 1) as domain,
      count(*) as n_pages
    from u group by 1 having count(*) >= 9
"""


def q_domain_frequency(spark, sf_dir):
    """Two-phase count + HAVING (WebInstruct domain-frequency shape)."""
    docs = _t(spark, sf_dir, "documents")
    return relational.count_and_filter_low_frequency(docs, "lang", 30)


SQL_DOMAIN_FREQUENCY = """
    select lang, count(*) as count from documents
    group by lang having count(*) >= 30
"""


# --- conversation reshaping on derived transcripts ---

def q_conv_full_text(spark, sf_dir):
    """Whole-conversation text reconstruction (collect_list + sort_array)."""
    from open_thoughts_spark.operators.conversations import concatenate_turns

    tr = derive_transcripts(_t(spark, sf_dir, "documents"))
    return concatenate_turns(tr, sep=" | ")


SQL_CONV_FULL_TEXT = f"""
    with t as ({DERIVE_TRANSCRIPTS_SQL})
    select conv_id,
      string_agg(role || ': ' || text, ' | ' order by turn_idx) as full_text
    from t group by conv_id
"""


def q_conv_instruction_response(spark, sf_dir):
    """First user turn → instruction, first assistant turn → response."""
    from open_thoughts_spark.operators.conversations import (
        long_to_instruction_response,
    )

    tr = derive_transcripts(_t(spark, sf_dir, "documents"))
    return long_to_instruction_response(tr)


SQL_CONV_INSTRUCTION_RESPONSE = f"""
    with t as ({DERIVE_TRANSCRIPTS_SQL})
    select conv_id,
      arg_min(text, turn_idx) filter (where role = 'user') as instruction,
      arg_min(text, turn_idx) filter (where role = 'assistant') as response
    from t group by conv_id
"""


# --- additional relational coverage ---

def q_uniform_sample(spark, sf_dir):
    """Seeded (hash-keyed) uniform sample — partition-layout independent."""
    o = _t(spark, sf_dir, "orders")
    return relational.uniform_sample_fixed(o, 200, ["o_orderkey"], salt="sample").select(
        "o_orderkey"
    )


SQL_UNIFORM_SAMPLE = """
    select o_orderkey from (
      select o_orderkey, row_number() over (
        order by md5('sample' || '|' || o_orderkey::varchar), o_orderkey) as rn
      from orders
    ) where rn <= 200
"""


def q_events_lag_delta(spark, sf_dir):
    """Per-user event value delta (lag window, integer cents)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = _cents(F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        (cents - F.lag(cents).over(w)).alias("delta_cents"),
    )


SQL_EVENTS_LAG_DELTA = """
    select event_id, user_id,
      cast(round(value*100) as bigint) - lag(cast(round(value*100) as bigint))
        over (partition by user_id order by ts, event_id) as delta_cents
    from events
"""


def q_region_rollup(spark, sf_dir):
    """ROLLUP (region, nation) revenue with grouping_id — agg hierarchy."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    r = _t(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.sum(_cents(F.col("o_totalprice"))).alias("total_cents"),
        F.grouping_id().alias("gid"),
    )


SQL_REGION_ROLLUP = """
    select r_name, n_name,
      cast(sum(cast(round(o_totalprice*100) as bigint)) as bigint) as total_cents,
      cast(grouping(r_name, n_name) as bigint) as gid
    from orders
    join customer on o_custkey = c_custkey
    join nation on c_nationkey = n_nationkey
    join region on n_regionkey = r_regionkey
    group by rollup(r_name, n_name)
"""


def q_customers_without_orders(spark, sf_dir):
    """Anti-join: customers with no orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o, c.c_custkey == o.o_custkey, how="left_anti"
    ).select("c_custkey", "c_name")


SQL_CUSTOMERS_WITHOUT_ORDERS = """
    select c_custkey, c_name from customer
    where not exists (select 1 from orders where o_custkey = c_custkey)
"""


def q_repeat_dataset(spark, sf_dir):
    """repeat_dataset semantics (upsampling by explode, no driver loop)."""
    r = _t(spark, sf_dir, "region")
    return relational.repeat_dataset(r, 3)


SQL_REPEAT_DATASET = """
    select r_regionkey, r_name from region, range(3)
"""


def q_events_dedup_first(spark, sf_dir):
    """Keep-first dedup per (user, event_type) by time — dedup_on_columns."""
    ev = _t(spark, sf_dir, "events")
    kept = relational.dedup_on_columns(
        ev, ["user_id", "event_type"], ["ts", "event_id"]
    )
    return kept.select("event_id", "user_id", "event_type")


SQL_EVENTS_DEDUP_FIRST = """
    select event_id, user_id, event_type from (
      select event_id, user_id, event_type,
        row_number() over (partition by user_id, event_type
                           order by ts, event_id) as rn
      from events
    ) where rn = 1
"""


def q_simhash_neardup(spark, sf_dir):
    """SimHash near-dup pairs: hamming <= 10 within lang blocks."""
    docs = _t(spark, sf_dir, "documents")
    fp = dedup.simhash32(docs, "doc_id", "text")
    tagged = fp.join(docs.select("doc_id", "lang"), on="doc_id")
    a = tagged.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"), "lang"
    )
    b = tagged.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"), "lang"
    )
    return (
        a.join(b, on="lang")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= 10)
        .select("id_a", "id_b", "hamming")
    )


def sql_simhash_neardup():
    inner = sql_simhash()
    return f"""
        with fp as ({inner}),
        tagged as (
          select fp.doc_id, fp.simhash, d.lang
          from fp join documents d on fp.doc_id = d.doc_id
        )
        select a.doc_id as id_a, b.doc_id as id_b,
          bit_count(xor(a.simhash, b.simhash)) as hamming
        from tagged a join tagged b
          on a.lang = b.lang and a.doc_id < b.doc_id
        where bit_count(xor(a.simhash, b.simhash)) <= 10
    """


def q_simhash_bandblock(spark, sf_dir):
    """SimHash near-dup via fingerprint band-prefix blocking (the 100×-safe
    block key — VERDICT r1 flagged the 5-value lang block). The oracle is
    the UNBLOCKED all-pairs hamming<=3 truth, so the gate also proves the
    pigeonhole band join loses no pairs."""
    docs = _t(spark, sf_dir, "documents")
    fp = dedup.simhash32(docs, "doc_id", "text", min_parallelism=32)
    return dedup.simhash_neardup_pairs(fp, "doc_id", max_hamming=3, bands=4)


def sql_simhash_bandblock():
    return f"""
        with fp as ({sql_simhash()})
        select a.doc_id as id_a, b.doc_id as id_b,
          bit_count(xor(a.simhash, b.simhash)) as hamming
        from fp a join fp b on a.doc_id < b.doc_id
        where bit_count(xor(a.simhash, b.simhash)) <= 3
    """


def q_weighted_jaccard(spark, sf_dir):
    """Multiplicity-aware (weighted) Jaccard near-dup verify over minhash
    band candidates: J_w = sum(min tf)/sum(max tf) — the similarity the
    ICWS/weighted-minhash family estimates, computed exactly (integer tf
    sums) so the oracle replays it. Scores ship integer-scaled
    (trunc 1e6 * ratio) per the float-free driver contract."""
    docs = _t(spark, sf_dir, "documents")
    sig = dedup.minhash_signature(
        docs, "doc_id", "text", num_perm=8, shingle_n=3, min_parallelism=32
    )
    bands = dedup.lsh_bands(sig, "doc_id", bands=4, rows_per_band=2)
    cands = dedup.candidate_pairs(bands, "doc_id")
    out = dedup.weighted_jaccard_pairs(
        docs, "doc_id", "text", shingle_n=3, pairs=cands, min_parallelism=32
    )
    return out.select(
        "id_a", "id_b", "common_w", "size_a", "size_b",
        F.floor(F.lit(1_000_000) * F.col("jaccard_w"))
        .cast("long")
        .alias("jaccard_w_micro"),
    )


def sql_weighted_jaccard():
    return f"""
        with {minhash_cte_sql()}, bands as ({band_rows_sql()}),
        cands as (
          select distinct a.doc_id as id_a, b.doc_id as id_b
          from bands a join bands b
            on a.band_idx = b.band_idx and a.band_key = b.band_key
           and a.doc_id < b.doc_id
        ), shm as (
          select doc_id, unnest([
            array_to_string(words[i:i+2], ' ')
            for i in range(1, greatest(len(words) - 2, 0) + 1)
          ]) as sh
          from w
        ), tf as (
          select doc_id, sh, count(*) as tf from shm group by 1, 2
        ), sizes as (
          select doc_id, sum(tf) as n from tf group by doc_id
        ), mins as (
          select c.id_a, c.id_b, sum(least(a.tf, b.tf)) as common_w
          from cands c
          join tf a on a.doc_id = c.id_a
          join tf b on b.doc_id = c.id_b and b.sh = a.sh
          group by 1, 2
        )
        select m.id_a, m.id_b,
          cast(m.common_w as bigint) as common_w,
          cast(sa.n as bigint) as size_a,
          cast(sb.n as bigint) as size_b,
          cast(trunc(1000000 * (m.common_w
            / (sa.n + sb.n - m.common_w)::double)) as bigint)
            as jaccard_w_micro
        from mins m
        join sizes sa on sa.doc_id = m.id_a
        join sizes sb on sb.doc_id = m.id_b
    """


def q_simhash64_bandblock(spark, sf_dir):
    """64-bit SimHash near-dup via 4x16-bit band blocking — the web-scale
    band geometry (r2 verdict: 32-bit fp gives 8-bit band keys -> 256
    buckets -> quadratic at 10^9 docs; 16-bit keys stay fine-grained).
    The oracle is the UNBLOCKED all-pairs hamming<=3 truth over the same
    64-bit fingerprint, so the gate proves the pigeonhole join is lossless."""
    docs = _t(spark, sf_dir, "documents")
    fp = dedup.simhash64(docs, "doc_id", "text", min_parallelism=32)
    return dedup.simhash64_neardup_pairs(fp, "doc_id", max_hamming=3)


def sql_simhash64():
    """Replays dedup.simhash64's r4 kernel: one 32-bit chunk per word per
    half (('0x'||substr(md5,1,8))::bigint — the conv(substr,16,10) twin),
    bits by shift-and-mask, ±1 sums, sign -> packed bigint halves."""

    def half_sums(chunk, prefix):
        return ",\n      ".join(
            f"sum((({chunk} >> {j}) & 1) * 2 - 1) as {prefix}{j}"
            for j in range(32)
        )

    def pack(prefix):
        return " + ".join(
            f"(case when {prefix}{j} > 0 then {2**j}::bigint else 0 end)"
            for j in range(32)
        )

    return f"""
        with w as (
          select doc_id, unnest({WORDS_SQL}) as w
          from documents
        ), f as (
          select doc_id,
            ('0x' || substr(md5(w), 1, 8))::bigint as c0,
            ('0x' || substr(md5(w || '#'), 1, 8))::bigint as c1
          from w where w != ''
        ),
        s as (
          select doc_id,
            {half_sums("c0", "l")},
            {half_sums("c1", "h")}
          from f group by doc_id
        )
        select doc_id, {pack("h")} as simhash_hi, {pack("l")} as simhash_lo
        from s
    """


def sql_simhash64_bandblock():
    return f"""
        with fp as ({sql_simhash64()})
        select a.doc_id as id_a, b.doc_id as id_b,
          bit_count(xor(a.simhash_hi, b.simhash_hi))
            + bit_count(xor(a.simhash_lo, b.simhash_lo)) as hamming
        from fp a join fp b on a.doc_id < b.doc_id
        where bit_count(xor(a.simhash_hi, b.simhash_hi))
            + bit_count(xor(a.simhash_lo, b.simhash_lo)) <= 3
    """


def q_embed_and_knn(spark, sf_dir):
    """End-to-end: embed documents (hermetic md5-BoW encoder UDF) then
    self-kNN. normalize=False keeps integer term counts, so every dot/norm
    is an exact integer sum and the DuckDB oracle matches bit-for-bit
    (cosine is normalization-invariant)."""
    from open_thoughts_spark.operators.embedding import embed_texts

    # tokenless (whitespace-only) texts embed to the zero vector, whose
    # cosine is NaN in Spark but absent from the SQL token join — exclude
    # them on both sides so the oracle pair stays total
    docs = _t(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 200)
        & F.col("text").rlike("[^ \\t\\n\\x0B\\f\\r]")
    )
    emb = embed_texts(
        docs, dim=32, max_chars=1_000_000_000, normalize=False
    ).select("doc_id", "embedding")
    return similarity.knn_bruteforce(
        emb, emb.filter(F.col("doc_id") < 5), id_col="doc_id", k=3
    ).select("query_id", "neighbor_id", "rank")


SQL_EMBED_KNN = f"""
    with toks as (
      select doc_id, t from (
        select doc_id, unnest(string_split_regex(lower(text), '{ANN_WS}')) as t
        from documents
        where doc_id < 200 and regexp_matches(text, '[^ \\t\\n\\x0B\\f\\r]')
      ) where t != ''
    ), cnt as (
      select doc_id, ('0x' || substr(md5(t), 1, 8))::bigint % 32 as b,
        count(*)::double as c
      from toks group by 1, 2
    ), nrm as (
      select doc_id, sqrt(sum(c * c)) as nv from cnt group by 1
    ), dots as (
      select a.doc_id as query_id, b.doc_id as neighbor_id, sum(a.c * b.c) as dot
      from cnt a join cnt b on a.b = b.b and b.doc_id != a.doc_id
      where a.doc_id < 5
      group by 1, 2
    ), sims as (
      select query_id, neighbor_id, round(dot / (na.nv * nb.nv), 6) as sim6
      from dots join nrm na on na.doc_id = query_id
                join nrm nb on nb.doc_id = neighbor_id
    )
    select query_id, neighbor_id, rank from (
      select query_id, neighbor_id,
        row_number() over (partition by query_id
                           order by sim6 desc, neighbor_id) as rank
      from sims
    ) where rank <= 3
"""


def q_map_url_classify(spark, sf_dir):
    """URLClassifyMap end to end (WebInstruct/url_classify_map.py): derive
    a domain per document, run the classify map (mock: education-keyword
    heuristic, last-word yes/no contract), keep the boolean verdict. The
    oracle replays the keyword regex in DuckDB."""
    from open_thoughts_spark.operators.maps import MAPS, apply_map

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 3 == 0, F.lit("mathacademy"))
            .otherwise(F.lit("shop")),
            (F.col("doc_id") % 61).cast("string"),
            F.lit(".example.org"),
        ).alias("url"),
    )
    return apply_map(docs, MAPS["url_classify"]).select(
        "doc_id", "url", "url_classification"
    )


def q_map_url_classify_repeat(spark, sf_dir):
    """The completions n_repeat knob (completions_operator.py:53,61-65):
    every input row is duplicated n_repeat times BEFORE the map (narrow
    explode, no shuffle) — with the deterministic mock backend the two
    copies produce identical classifications, so the oracle is the same
    query cross-joined with a 2-row range."""
    from open_thoughts_spark.operators.maps import MAPS, apply_map

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 3 == 0, F.lit("mathacademy"))
            .otherwise(F.lit("shop")),
            (F.col("doc_id") % 61).cast("string"),
            F.lit(".example.org"),
        ).alias("url"),
    )
    return apply_map(
        docs, MAPS["url_classify"], n_repeat=2, merge_shards=8
    ).select("doc_id", "url", "url_classification")


SQL_MAP_URL_CLASSIFY_REPEAT = """
    with u as (
      select doc_id,
        (case when doc_id % 3 = 0 then 'mathacademy' else 'shop' end)
          || (doc_id % 61)::varchar || '.example.org' as url
      from documents cross join range(2)
    )
    select doc_id, url,
      regexp_matches(url,
        '(?i)(edu|school|university|academy|learn|course|tutorial|math|khan)')
        as url_classification
    from u
"""


SQL_MAP_URL_CLASSIFY = """
    with u as (
      select doc_id,
        (case when doc_id % 3 = 0 then 'mathacademy' else 'shop' end)
          || (doc_id % 61)::varchar || '.example.org' as url
      from documents
    )
    select doc_id, url,
      regexp_matches(url,
        '(?i)(edu|school|university|academy|learn|course|tutorial|math|khan)')
        as url_classification
    from u
"""


def q_map_extract_qa(spark, sf_dir):
    """ExtractQAMap end to end (WebInstruct/extract_qa_map.py): docs with
    embedded 'Q:/A:' pairs expand to one row per extracted pair; docs
    without any vanish (qa_exists=false). Even doc_ids carry one pair,
    multiples of 4 carry two — the oracle replays the extraction regex and
    the row expansion with parallel unnests."""
    from open_thoughts_spark.operators.maps import (
        MAPS, apply_map, extract_qa_expand,
    )

    docs = _t(spark, sf_dir, "documents")
    pair1 = F.concat(
        F.lit("Q: what is doc "), F.col("doc_id").cast("string"),
        F.lit("?\nA: lang "), F.col("lang"), F.lit("\n"),
    )
    pair2 = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(
            F.lit("Q: second question for "),
            F.col("doc_id").cast("string"),
            F.lit("?\nA: answer two\n"),
        ),
    ).otherwise(F.lit(""))
    body = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("intro text\n"), pair1, pair2, F.lit("outro")),
    ).otherwise(F.lit("plain document with no questions inside"))
    staged = docs.select("doc_id", body.alias("text"))
    return extract_qa_expand(
        apply_map(staged, MAPS["webinstruct_extract_qa"])
    ).select("doc_id", "question", "answer")


SQL_MAP_EXTRACT_QA = """
    with t as (
      select doc_id,
        'intro text' || chr(10)
        || 'Q: what is doc ' || doc_id::varchar || '?' || chr(10)
        || 'A: lang ' || lang || chr(10)
        || (case when doc_id % 4 = 0
            then 'Q: second question for ' || doc_id::varchar || '?' || chr(10)
                 || 'A: answer two' || chr(10)
            else '' end)
        || 'outro' as txt
      from documents
      where doc_id % 2 = 0
    )
    select doc_id,
      trim(unnest(regexp_extract_all(txt,
        'Q:[ \\t]*([^\\n]+)\\nA:[ \\t]*([^\\n]+)', 1))) as question,
      trim(unnest(regexp_extract_all(txt,
        'Q:[ \\t]*([^\\n]+)\\nA:[ \\t]*([^\\n]+)', 2))) as answer
    from t
"""


def q_classifier_filter(spark, sf_dir):
    """Train NB on lang labels, keep docs scored 'en' > 0.5. md5 token
    hashing + integer count training means the whole train→score→filter
    pipeline replays in DuckDB SQL (was rows-only in r1).

    Residual float risk, accepted: training counts are integer-exact, but
    the score is a sum of ln() terms whose last-bit values and summation
    order differ between numpy and DuckDB, so a document with p_en within
    ~1e-13 of the 0.5 cutoff could flip engines. NB posteriors concentrate
    near 0/1 (P(hit) ≈ 1e-13 × n_docs per run); a hard threshold on a
    model score cannot be made order-free without changing the operator's
    semantics."""
    from open_thoughts_spark.functions.classifier import (
        classifier_filter,
        train_text_classifier,
    )

    docs = _t(spark, sf_dir, "documents")
    model = train_text_classifier(docs, "text", "lang", dim=2**12)
    return classifier_filter(
        spark, docs, model, "text", "en", filter_threshold=0.5,
        min_parallelism=32,
    ).select("doc_id", "lang")


SQL_CLASSIFIER_FILTER = f"""
    with toks as (
      select doc_id, t from (
        select doc_id, unnest(string_split_regex(lower(text), '{ANN_WS}')) as t
        from documents
      ) where t != ''
    ), tok_b as (
      select doc_id, ('0x' || substr(md5(t), 1, 8))::bigint % 4096 as b
      from toks
    ), classes as (
      select lang as cls, count(*) as n_docs from documents group by 1
    ), consts as (
      select count(*) as n_total, count(distinct lang) as n_cls from documents
    ), prior as (
      select cls, ln((n_docs + 1.0) / (n_total + n_cls)) as lp
      from classes, consts
    ), cnts as (
      select d.lang as cls, tb.b, count(*) as f
      from tok_b tb join documents d using (doc_id)
      group by 1, 2
    ), ctot as (
      select cls, sum(f)::double as tot from cnts group by 1
    ), lik as (
      select g.doc_id, c.cls,
        sum(ln((coalesce(k.f, 0) + 1.0) / (ct.tot + 4096.0))) as s_lik
      from tok_b g cross join classes c
      left join cnts k on k.cls = c.cls and k.b = g.b
      join ctot ct on ct.cls = c.cls
      group by 1, 2
    ), sc as (
      select d.doc_id, p.cls, p.lp + coalesce(l.s_lik, 0.0) as s
      from documents d cross join prior p
      left join lik l on l.doc_id = d.doc_id and l.cls = p.cls
    ), sc2 as (
      select doc_id, cls, s, max(s) over (partition by doc_id) as m from sc
    ), p as (
      select doc_id,
        sum(case when cls = 'en' then exp(s - m) else 0 end)
          / sum(exp(s - m)) as p_en
      from sc2 group by doc_id
    )
    select d.doc_id, d.lang from documents d join p using (doc_id)
    where p_en > 0.5
"""


def q_multimodal_resize(spark, sf_dir):
    """Distributed image-resize plumbing, value-checked: image payloads
    re-encode at 8x6 through the Arrow-batched kernel (deterministic fake:
    repeated md5(payload|dims) truncated to w*h*3 bytes); the oracle
    replays the byte construction in HEX space (DuckDB md5 is
    VARCHAR-only, so the comparison column is the payload's hex)."""
    from open_thoughts_spark.multimodal.media import resize_images

    docs = _t(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 200) & (F.col("doc_id") % 3 == 0)
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/png").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )
    out = resize_images(media, width=8, height=6)
    return out.select(
        "media_id",
        F.lower(F.hex(F.col("payload"))).alias("payload_hex"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


SQL_MULTIMODAL_RESIZE = """
    select doc_id as media_id,
      substring(repeat(md5(text || '|8x6'), 10), 1, 288) as payload_hex,
      8 as width, 6 as height
    from documents
    where doc_id < 200 and doc_id % 3 = 0
"""


def q_multimodal_featurize(spark, sf_dir):
    """Multimodal plumbing end to end, value-checked: documents become
    typed media rows (opaque binary payload + metadata struct), native
    metadata attach (byte length + digest), video frame-grid explode, and
    the mapInPandas featurize stage (deterministic fake kernel — codecs
    absent). Features themselves are checked by shape (n_dims), bytes and
    digest by value; DuckDB md5(VARCHAR) over the text equals Spark md5
    over its UTF-8 payload bytes."""
    from open_thoughts_spark.multimodal import decode_and_featurize, sample_frames

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    kind = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.when(kind != "image", ((F.col("doc_id") % 60) * 1000 + 500).cast("int"))
            .alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )
    frames = (
        sample_frames(media, every_ms=1000, id_col="media_id")
        .groupBy("media_id")
        .agg(F.count("*").alias("n_frames"))
    )
    feats = decode_and_featurize(media, id_col="media_id", deterministic_fake=True)
    return (
        media.withColumn("payload_bytes", F.length("payload").cast("long"))
        .withColumn("payload_md5", F.md5("payload"))
        .join(frames, on="media_id", how="left")
        .join(feats.select("media_id", F.size("feature").alias("n_feature_dims")), on="media_id")
        .select(
            "media_id", "kind", "payload_bytes", "payload_md5",
            F.coalesce(F.col("n_frames"), F.lit(0)).cast("long").alias("n_frames"),
            F.col("n_feature_dims").cast("long"),
        )
    )


SQL_MULTIMODAL_FEATURIZE = """
    with m as (
      select doc_id as media_id,
        case when doc_id % 3 = 0 then 'image'
             when doc_id % 3 = 1 then 'audio' else 'video' end as kind,
        text,
        case when doc_id % 3 != 0 then (doc_id % 60) * 1000 + 500 end as duration_ms
      from documents where doc_id < 200
    )
    select media_id, kind,
      cast(octet_length(encode(text)) as bigint) as payload_bytes,
      md5(text) as payload_md5,
      cast(case when kind = 'video' then duration_ms // 1000 + 1 else 0 end
           as bigint) as n_frames,
      32::bigint as n_feature_dims
    from m
"""


def q_tree_search_beam(spark, sf_dir):
    """Beam-search scaffold (tree_search_operator.py:22-120) over prompts
    derived from documents; deterministic md5 mock expander — which makes
    the bounded search fully SQL-expressible: the oracle unrolls the 3
    expand→prune rounds as CTEs, value-checking frontier evolution, beam
    pruning and terminal accumulation."""
    from open_thoughts_spark.operators.tree_search import (
        BeamSearchConfig,
        beam_search,
        mock_expand,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 8)
    prompts = docs.select(
        F.col("doc_id").alias("prompt_id"),
        F.substring("text", 1, 60).alias("instruction"),
    )
    cfg = BeamSearchConfig(beam_width=3, beam_depth=3)
    return beam_search(prompts, mock_expand(3), cfg)


def sql_tree_search_beam(depth: int = 3, width: int = 3, branch: int = 3):
    """Unrolled beam-search oracle: one (expand, prune) CTE pair per round.
    h = md5(prompt|path|b); step/score/terminal derived exactly like
    tree_search.mock_expand (score division by the same constant gives
    bit-identical doubles)."""
    ctes = [
        """p0 as (
          select doc_id as prompt_id, substr(text, 1, 60) as prompt,
            '' as path, 0 as level, 0.0 as score, false as is_terminal
          from documents where doc_id < 8
        )"""
    ]
    terminal_unions = []
    for r in range(1, depth + 1):
        h = f"md5(prompt || '|' || path || '|' || b::varchar)"
        ctes.append(f"""s{r} as (
          select prompt_id, prompt,
            case when path = '' then 'step-' || substr({h}, 1, 6)
                 else path || ' -> ' || 'step-' || substr({h}, 1, 6) end as path,
            level + 1 as level,
            ('0x' || substr({h}, 1, 8))::bigint / 4294967295.0 as score,
            substr({h}, 32, 1) in ('0', '1', '2') as is_terminal
          from (select * from p{r - 1} where not is_terminal) live,
               range({branch}) t(b)
        )""")
        ctes.append(f"""p{r} as (
          select prompt_id, prompt, path, level, score, is_terminal from (
            select *, row_number() over (partition by prompt_id
                                         order by score desc, path) as rn
            from s{r}
          ) where rn <= {width}
        )""")
        terminal_unions.append(f"select * from p{r} where is_terminal")
    body = "\n        union all\n        ".join(
        terminal_unions + [f"select * from p{depth} where not is_terminal"]
    )
    return f"""
        with {', '.join(ctes)}
        select prompt_id, prompt, path, cast(level as int) as level,
          score, is_terminal
        from ({body})
    """


def q_rouge_seed_filter(spark, sf_dir):
    """ROUGE-L seed-pool novelty scores (Alpaca utils.py:289-309) against
    the first-5-doc 'seed pool' — VALUE-ORACLED (was rows-only through r2):
    the DuckDB oracle runs the same LCS as an anti-diagonal recursive CTE
    (dp cells on diagonal k depend only on diagonals k-1/k-2, so each
    iteration is one pure list_transform — no in-row dependency). Scores
    compare as trunc(1e6 * raw-double) int64s: both engines compute
    2.0*LCS/(n+m) with identical IEEE ops, so the integers match exactly."""
    from open_thoughts_spark.operators.rouge import with_max_rouge

    docs = _t(spark, sf_dir, "documents")
    seeds = [r["text"] for r in docs.filter(F.col("doc_id") < 5).collect()]
    pool = docs.filter((F.col("doc_id") >= 5) & (F.col("doc_id") < 100))
    raw = with_max_rouge(pool, seeds, round6=False)
    return raw.select(
        "doc_id",
        F.floor(F.lit(1_000_000) * F.col("max_rouge_l"))
        .cast("long")
        .alias("max_rouge_micro"),
    )


SQL_ROUGE_SEED_FILTER = """
    with recursive
    tok as (
      select doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') as t
      from documents where doc_id < 100
    ),
    pairs as (
      select d.doc_id, s.doc_id as seed_id, d.t as a, s.t as b,
             len(d.t) as n, len(s.t) as m
      from tok d, tok s
      where d.doc_id >= 5 and s.doc_id < 5
    ),
    dp as (
      select doc_id, seed_id, a, b, n, m, 1 as k,
        list_transform(range(0, n + 1), i -> 0) as prev,
        list_transform(range(0, n + 1), i -> 0) as cur
      from pairs where n > 0 and m > 0
      union all
      select doc_id, seed_id, a, b, n, m, k + 1,
        cur as prev,
        list_transform(range(0, n + 1), i ->
          case when i = 0 or (k + 1 - i) < 1 or (k + 1 - i) > m or i > n
               then 0
          else greatest(
            cur[i],
            cur[i + 1],
            prev[i] + (case when a[i] = b[k + 1 - i] then 1 else 0 end))
          end) as cur
      from dp where k < n + m
    ),
    scores as (
      select doc_id, seed_id, 2.0 * cur[n + 1] / (n + m) as f1
      from dp where k = n + m
    )
    select p.doc_id,
      cast(trunc(1000000 * coalesce(max(s.f1), 0.0)) as bigint)
        as max_rouge_micro
    from (select distinct doc_id from pairs) p
    left join scores s on s.doc_id = p.doc_id
    group by 1
"""


def q_part_supplier_revenue(spark, sf_dir):
    """Part-brand revenue with supplier dimension (covers part + supplier)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    sup = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(n), sup.s_nationkey == n.n_nationkey)
        .groupBy("p_brand", "n_name")
        .agg(
            F.sum(_cents(F.col("l_extendedprice"))).alias("revenue_cents"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
            F.count("*").alias("n_items"),
        )
    )


SQL_PART_SUPPLIER_REVENUE = """
    select p_brand, n_name,
      cast(sum(cast(round(l_extendedprice*100) as bigint)) as bigint) as revenue_cents,
      cast(sum(cast(l_quantity as bigint)) as bigint) as qty,
      count(*) as n_items
    from lineitem
    join part on l_partkey = p_partkey
    join supplier on l_suppkey = s_suppkey
    join nation on s_nationkey = n_nationkey
    group by p_brand, n_name
"""


def q_events_json_extract(spark, sf_dir):
    """Semi-structured extraction: JSON props field aggregated per type."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.when(k > 50, 1)).alias("n_high_k"),
    )


SQL_EVENTS_JSON_EXTRACT = """
    select event_type,
      cast(sum(cast(json_extract_string(props, '$.k') as bigint)) as bigint) as sum_k,
      count(case when cast(json_extract_string(props, '$.k') as bigint) > 50
                 then 1 end) as n_high_k
    from events group by event_type
"""


def q_events_cube(spark, sf_dir):
    """CUBE aggregation hierarchy (all subsets of the grouping keys) —
    completes the agg-hierarchy surface beside ROLLUP."""
    ev = _t(spark, sf_dir, "events")
    bucket = (F.col("user_id") % 5).alias("user_bucket")
    return (
        ev.select("event_type", bucket, "value")
        .cube("event_type", "user_bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_cents(F.col("value"))).alias("value_cents"),
            F.grouping_id().alias("gid"),
        )
    )


SQL_EVENTS_CUBE = """
    select event_type, user_id % 5 as user_bucket,
      count(*) as n_events,
      cast(sum(cast(round(value*100) as bigint)) as bigint) as value_cents,
      cast(grouping(event_type, user_id % 5) as bigint) as gid
    from events
    group by cube(event_type, user_id % 5)
"""


def q_customers_intersect_all(spark, sf_dir):
    """INTERSECT ALL (multiplicity-preserving set op): per-customer order
    months present in both 1995 and 1996, keeping duplicate counts."""
    o = _t(spark, sf_dir, "orders")
    m95 = o.filter(F.year("o_orderdate") == 1995).select(
        "o_custkey", F.month("o_orderdate").alias("m")
    )
    m96 = o.filter(F.year("o_orderdate") == 1996).select(
        "o_custkey", F.month("o_orderdate").alias("m")
    )
    return m95.intersectAll(m96)


SQL_CUSTOMERS_INTERSECT_ALL = """
    select o_custkey, month(o_orderdate) as m from orders
    where year(o_orderdate) = 1995
    intersect all
    select o_custkey, month(o_orderdate) from orders
    where year(o_orderdate) = 1996
"""


def q_customers_except_all(spark, sf_dir):
    """EXCEPT ALL: 1995 order months minus 1996's, multiplicity-aware."""
    o = _t(spark, sf_dir, "orders")
    m95 = o.filter(F.year("o_orderdate") == 1995).select(
        "o_custkey", F.month("o_orderdate").alias("m")
    )
    m96 = o.filter(F.year("o_orderdate") == 1996).select(
        "o_custkey", F.month("o_orderdate").alias("m")
    )
    return m95.exceptAll(m96)


SQL_CUSTOMERS_EXCEPT_ALL = """
    select o_custkey, month(o_orderdate) as m from orders
    where year(o_orderdate) = 1995
    except all
    select o_custkey, month(o_orderdate) from orders
    where year(o_orderdate) = 1996
"""


def q_customers_intersect_years(spark, sf_dir):
    """INTERSECT set op: customers active in both 1995 and 1996."""
    o = _t(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96)


SQL_CUSTOMERS_INTERSECT = """
    select o_custkey from orders where year(o_orderdate) = 1995
    intersect
    select o_custkey from orders where year(o_orderdate) = 1996
"""


def q_customers_except_years(spark, sf_dir):
    """EXCEPT set op: customers active in 1995 but not in 1996."""
    o = _t(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.subtract(y96)  # EXCEPT DISTINCT semantics


SQL_CUSTOMERS_EXCEPT = """
    select distinct o_custkey from orders where year(o_orderdate) = 1995
    except
    select o_custkey from orders where year(o_orderdate) = 1996
"""


def q_levenshtein_pairs(spark, sf_dir):
    """Blocked edit-distance fuzzy pairs (the fuzzy-dedup verify channel).
    min_parallelism spreads the pair rows before the O(len^2) DP — the
    lang-block join otherwise leaves ~5 skewed tasks doing 20+ min of
    serial levenshtein at sf0.1 (r4 audit)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.levenshtein_pairs(
        docs, "doc_id", "text", "lang", min_ratio=60.0, min_parallelism=32
    )


SQL_LEVENSHTEIN_PAIRS = """
    with base as (select doc_id, lang, text from documents)
    select a.doc_id as id_a, b.doc_id as id_b,
      round((1.0 - levenshtein(a.text, b.text) /
             greatest(length(a.text), length(b.text))::double) * 100, 4) as ratio
    from base a join base b
      on a.lang = b.lang and a.doc_id < b.doc_id
    where abs(length(a.text) - length(b.text))
          <= greatest(length(a.text), length(b.text)) * 0.2
      and (1.0 - levenshtein(a.text, b.text) /
           greatest(length(a.text), length(b.text))::double) * 100 >= 60.0
"""


def q_majority_vote(spark, sf_dir):
    """Majority answer per question — here: modal event_type per user
    (MultipleSamples majority-vote semantics)."""
    from open_thoughts_spark.operators.verify import majority_vote

    ev = _t(spark, sf_dir, "events")
    return majority_vote(ev, "user_id", "event_type", normalize=False)


SQL_MAJORITY_VOTE = """
    with counted as (
      select user_id, event_type as _a, count(*) as votes
      from events group by 1, 2
    ), totals as (
      select user_id, cast(sum(votes) as bigint) as total from counted group by 1
    )
    select c.user_id, c._a as majority_answer, c.votes, t.total
    from (
      select *, row_number() over (partition by user_id
                                   order by votes desc, _a) as rn
      from counted
    ) c join totals t on c.user_id = t.user_id
    where c.rn = 1
"""


def q_k_shortest(spark, sf_dir):
    """k-shortest texts per lang block (_D2_IA_Filtering selection)."""
    from open_thoughts_spark.operators.verify import k_shortest

    docs = _t(spark, sf_dir, "documents")
    return k_shortest(docs, "lang", "text", 3).select("doc_id", "lang")


SQL_K_SHORTEST = """
    select doc_id, lang from (
      select doc_id, lang, row_number() over (
        partition by lang order by length(text), text) as rn
      from documents
    ) where rn <= 3
"""


def q_two_phase_agg(spark, sf_dir):
    """Skew-safe salted aggregation == plain aggregation (semantics check)."""
    from open_thoughts_spark.pipeline.skew import two_phase_agg

    ev = _t(spark, sf_dir, "events")
    out = two_phase_agg(
        ev, "user_id", {"n_events": ("1", "sum"), "max_event_id": ("event_id", "max")}
    )
    return out.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        "max_event_id",
    )


SQL_TWO_PHASE_AGG = """
    select user_id, count(*) as n_events, max(event_id) as max_event_id
    from events group by user_id
"""


def q_verify_mix(spark, sf_dir):
    """verify_and_mix fan-in chain (mix.py:15-40): per-domain judge ->
    filter correct -> instruction/response -> ShareGPT -> union, oracled.
    The deterministic normalized-equality judge (MOCK_VERIFY posture,
    math/judge.py:46-49) makes correctness SQL-predictable: answers match
    truth except doc_id % 3 == 1 rows (planted wrong). The nested ShareGPT
    output is flattened to hashable columns (turn count + first human/gpt
    values) so the driver's value hash is struct-free."""
    from open_thoughts_spark.pipeline.curation import verify_and_mix

    docs = _t(spark, sf_dir, "documents")
    instruction = F.concat(F.lit("solve task "), F.col("doc_id").cast("string"))
    response = F.concat(F.lit("Answer-"), (F.col("doc_id") % 50).cast("string"))
    truth = (
        F.when(F.col("doc_id") % 3 == 1, F.lit("planted-wrong"))
        # judge normalizes case/whitespace: ' answer-N ' still verifies
        .otherwise(F.concat(F.lit(" answer-"), (F.col("doc_id") % 50).cast("string"), F.lit(" ")))
    )
    base = docs.select(
        "doc_id",
        instruction.alias("instruction"),
        response.alias("response"),
        truth.alias("truth"),
    )
    domains = {
        "alpha": base.filter(F.col("doc_id") % 2 == 0),
        "beta": base.filter(F.col("doc_id") % 2 == 1),
    }
    out = verify_and_mix(
        domains, "response", "truth", "instruction", "response", "doc_id"
    )["verified"]
    return out.select(
        "domain",
        "doc_id",
        F.size("conversations").cast("long").alias("n_turns"),
        F.element_at("conversations", 1)["value"].alias("human_msg"),
        F.element_at("conversations", 2)["value"].alias("gpt_msg"),
    )


SQL_VERIFY_MIX = """
    select
      case when doc_id % 2 = 0 then 'alpha' else 'beta' end as domain,
      doc_id,
      2::bigint as n_turns,
      'solve task ' || doc_id::varchar as human_msg,
      'Answer-' || (doc_id % 50)::varchar as gpt_msg
    from documents
    where doc_id % 3 != 1
"""


def q_html_main_content(spark, sf_dir):
    """Main-content HTML extraction (resiliparse main_content=True stand-in,
    WebInstruct/utils.py:32-50) value-oracled: each doc wraps into a page
    with a known block structure (nav / heading / one <p> / footer), the
    Spark side runs the REAL stdlib-HTMLParser extractor, and the oracle
    replays the jusText-style classifier (length >= 80, stopword-density
    thresholds 0.30/0.15, landmark drop, heading smoothing) in SQL on the
    same blocks — the parse isn't SQL-expressible but the classification
    and smoothing are, so verdicts and extracted text value-check.
    Three fixture families: 40-char snippet (stopword branch varies per
    doc), full text (length branch), stopword-free filler (always
    boilerplate)."""
    from open_thoughts_spark.functions.html_extract import with_main_content

    docs = _docs_spread(spark, sf_dir)
    m3 = F.col("doc_id") % 3
    ptext = (
        F.when(m3 == 0, F.substring(F.col("text"), 1, 40))
        .when(m3 == 2, F.repeat(F.lit("zzz qqq www "), 5))
        .otherwise(F.col("text"))
    )
    # sanitize to markup-inert printable ASCII so the fixture oracle holds
    # BY CONSTRUCTION, not by accident of the current data: '<'/'&' would
    # parse as tags/entities on the Spark side only, and non-ASCII
    # whitespace splits in Python str.split but not the oracle's ASCII
    # class (code-review r4)
    ptext = F.regexp_replace(ptext, "[<>&]|[^ -~]", "")
    html = F.concat(
        F.lit('<html><body><nav><a href="/">Home</a> <a href="/x">More</a>'
              "</nav><h1>Doc Heading "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"), ptext,
        F.lit('</p><footer>Copyright <a href="/l">Legal</a></footer>'
              "</body></html>"),
    )
    out = with_main_content(
        docs.select("doc_id", html.alias("html")), "html", "main_text"
    )
    return out.select("doc_id", "main_text")


_HTML_STOPLIST_SQL = (
    "['the','a','an','and','or','of','to','in','is','it',"
    "'that','for','on','with','as','was','at','by','be','this']"
)

SQL_HTML_MAIN_CONTENT = f"""
    with p as (
      select doc_id,
        trim(regexp_replace(
          regexp_replace(
            case when doc_id % 3 = 0 then substr(text, 1, 40)
                 when doc_id % 3 = 2 then repeat('zzz qqq www ', 5)
                 else text end,
            '[<>&]|[^ -~]', '', 'g'),
          '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) as norm
      from documents
    ), scored as (
      select doc_id, norm, length(norm) as n,
        len(string_split(norm, ' ')) as n_words,
        len(list_filter(string_split(norm, ' '),
          w -> list_contains({_HTML_STOPLIST_SQL},
                             lower(trim(w, '.,;:!?"''()'))))) as n_stop
      from p
    )
    select doc_id,
      case when n >= 80
             or (n_words > 0 and n_stop::double / n_words::double >= 0.30)
        then 'Doc Heading ' || doc_id::varchar || chr(10) || chr(10) || norm
        else '' end as main_text
    from scored
"""


def q_code_exec_verify(spark, sf_dir):
    """Sandboxed code-execution judge (open_thoughts/code/judge.py:73-172
    parity): generated code + JSON test cases -> subprocess-isolated
    execution with timeout -> per-row verdict. Five deterministic fixture
    families derived from documents exercise every verdict path; the
    verdicts are integers/booleans the SQL oracle predicts exactly because
    the planted code is deterministic — the Spark side REALLY executes it.
    doc_id % 25 < 5 keeps the subprocess count bench-sane (~1.2 spawns/doc
    at ~45 ms each) while covering every doc_id % 5 residue — a % 10 < 2
    decimation (code-review r4) silently confined m5 to {0,1} and left the
    compile-error / no-code / call-based families unexecuted."""
    from open_thoughts_spark.operators.code_judge import code_exec_judge

    docs = _docs_spread(spark, sf_dir).filter(F.col("doc_id") % 25 < 5)
    m5 = F.col("doc_id") % 5
    did = F.col("doc_id").cast("string")
    echo_code = F.lit(
        "Here is my solution:\n```python\nimport sys\n"
        "print(int(sys.stdin.read()) * 2)\n```"
    )
    cb_code = F.concat(
        F.lit("```python\ndef add_k(x):\n    return x + "),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("\n```"),
    )
    response = (
        F.when(m5 == 3, F.lit("no fenced code in this response"))
        .when(m5 == 2, F.lit("```python\ndef broken(:\n```"))
        .when(m5 == 4, cb_code)
        .otherwise(echo_code)
    )
    two_in = F.concat(
        F.lit('{"inputs": ["'), did, F.lit('", "'),
        (F.col("doc_id") + 1).cast("string"), F.lit('"], "outputs": ["'),
        (F.col("doc_id") * 2).cast("string"), F.lit('", "'),
    )
    tests = (
        F.when(
            m5 == 4,
            F.concat(
                F.lit('{"fn_name": "add_k", "inputs": [['), did,
                F.lit(']], "outputs": ['),
                (F.col("doc_id") + F.col("doc_id") % 7).cast("string"),
                F.lit("]}"),
            ),
        )
        .when(m5 == 1, F.concat(two_in, F.lit('999x"]}')))  # 2nd test wrong
        .otherwise(
            F.concat(two_in, (F.col("doc_id") * 2 + 2).cast("string"), F.lit('"]}'))
        )
    )
    judged = code_exec_judge(
        docs.select("doc_id", response.alias("response"), tests.alias("tests")),
        timeout_s=3.0,
    )
    return judged.select("doc_id", "correct", "judge_reason", "n_passed", "n_tests")


SQL_CODE_EXEC_VERIFY = """
    select doc_id,
      (doc_id % 5 in (0, 4)) as correct,
      case doc_id % 5
        when 1 then 'false'
        when 2 then 'returncode:1'
        when 3 then 'no_code'
        else '' end as judge_reason,
      case doc_id % 5 when 1 then 1 when 2 then 0 when 3 then 0
        when 4 then 1 else 2 end as n_passed,
      case doc_id % 5 when 3 then 0 when 4 then 1 else 2 end as n_tests
    from documents where doc_id % 25 < 5
"""


def q_pipeline_lineage(spark, sf_dir):
    """Per-stage run-metadata lineage table (reference parity: one Postgres
    ``datasets`` row per operator run with op hash / status / row_count —
    synthetic_data_manager.py:794-1056, database/models.py:21-149). A
    3-stage checkpointed pipeline over documents runs TWICE into a fresh
    checkpoint dir: run 1 computes + commits every boundary, run 2 resumes
    each stage from its snapshot — so the oracled output shows BOTH the
    computed and the cache-hit lineage rows. Returned columns are the
    deterministic subset (run/stage ordinals, action, integer row counts);
    uuid/hash/timing columns stay in the log but out of the value hash."""
    import tempfile

    from open_thoughts_spark.pipeline.checkpoint import (
        CheckpointedPipeline,
        Stage,
    )

    docs = _t(spark, sf_dir, "documents")
    stages = [
        Stage(
            "min_length",
            lambda d: d.filter(F.length("text") >= 100),
            {"min_len": 100},
        ),
        Stage(
            "english_only", lambda d: d.filter(F.col("lang") == "en"), {"lang": "en"}
        ),
        Stage(
            "mod_sample", lambda d: d.filter(F.col("doc_id") % 7 != 0), {"mod": 7}
        ),
    ]
    ckpt = tempfile.mkdtemp(prefix="lineage_q_")
    pipe = CheckpointedPipeline(spark, ckpt, stages)
    pipe.run(docs, input_fingerprint=f"docs@{sf_dir}")
    pipe.run(docs, input_fingerprint=f"docs@{sf_dir}")
    return pipe.lineage_df().select(
        F.col("run_seq").cast("long").alias("run_seq"),
        F.col("seq").cast("long").alias("seq"),
        "stage",
        "action",
        F.col("output_rows").alias("rows_out"),
    )


SQL_PIPELINE_LINEAGE = """
    with s1 as (select * from documents where length(text) >= 100),
         s2 as (select * from s1 where lang = 'en'),
         s3 as (select * from s2 where doc_id % 7 <> 0)
    select cast(r as bigint) as run_seq, cast(q as bigint) as seq,
           stage, action, rows_out
    from (
      select 1 as r, 0 as q, 'min_length' as stage, 'computed' as "action",
             (select count(*) from s1) as rows_out
      union all select 1, 1, 'english_only', 'computed', (select count(*) from s2)
      union all select 1, 2, 'mod_sample', 'computed', (select count(*) from s3)
      union all select 2, 0, 'min_length', 'resumed', (select count(*) from s1)
      union all select 2, 1, 'english_only', 'resumed', (select count(*) from s2)
      union all select 2, 2, 'mod_sample', 'resumed', (select count(*) from s3)
    )
"""


def q_frequent_ngrams(spark, sf_dir):
    """Corpus-frequent 3-grams (doc frequency >= 5): the frequency pass of
    the ExactSubstr-style boilerplate scrub — the Zipf head a crawl
    pipeline strips (headers, banners, license blurbs)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.frequent_ngrams(
        docs, "doc_id", "text", n=3, min_docs=5, min_parallelism=32
    )


SQL_FREQUENT_NGRAMS = f"""
    with w as (
      select doc_id, {WORDS_SQL} as words from documents
    ), pose as (
      select doc_id, unnest(list_distinct([
        array_to_string(words[i:i+2], ' ')
        for i in range(1, greatest(len(words) - 2, 0) + 1)
      ])) as gram
      from w
    )
    select gram, count(*) as doc_freq
    from pose group by gram having count(*) >= 5
"""


def q_scrub_frequent_ngrams(spark, sf_dir):
    """Corpus-level duplicate-substring removal: delete every occurrence
    of any 3-gram shared by >= 3 distinct documents, rebuild the text from
    the surviving words (Lee et al. "Deduplicating Training Data"
    ExactSubstr at word-gram granularity — removes boilerplate *inside*
    rows where minhash drops whole rows)."""
    docs = _t(spark, sf_dir, "documents")
    out = dedup.scrub_frequent_ngrams(
        docs, "doc_id", "text", n=3, min_docs=3, min_parallelism=32
    )
    return out.select(
        "doc_id",
        "scrubbed_text",
        "n_removed",
        F.md5(F.col("scrubbed_text")).alias("scrub_md5"),
    )


SQL_SCRUB_FREQUENT_NGRAMS = f"""
    with w as (
      select doc_id, {WORDS_SQL} as words from documents
    ), pose as (
      select doc_id, i as p0,
        array_to_string(words[i:i+2], ' ') as gram
      from w, unnest(range(1, greatest(len(words) - 2, 0) + 1)) as t(i)
    ), freq as (
      select gram from pose group by gram
      having count(distinct doc_id) >= 3
    ), cov as (
      select p.doc_id, list(distinct p.p0 + k.k) as cps
      from pose p
      join freq f on f.gram = p.gram
      cross join (select unnest([0, 1, 2]) as k) k
      group by p.doc_id
    ), final as (
      select w.doc_id, w.words, coalesce(c.cps, []) as cps,
        [w.words[i] for i in range(1, len(w.words) + 1)
         if not list_contains(coalesce(c.cps, []), i)] as kept
      from w left join cov c on c.doc_id = w.doc_id
    )
    select doc_id,
      -- array_to_string([]) is NULL in DuckDB; Spark's array_join gives ''
      coalesce(array_to_string(kept, ' '), '') as scrubbed_text,
      cast(len(words) - len(kept) as int) as n_removed,
      md5(coalesce(array_to_string(kept, ' '), '')) as scrub_md5
    from final
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tpch_q1_pricing": q_tpch_q1,
        "tpch_q3_top_orders": q_tpch_q3,
        "tpch_q5_region_revenue": q_tpch_q5,
        "events_daily_rollup": q_events_daily,
        "events_sessionize": q_events_sessionize,
        "events_type_pivot": q_events_pivot,
        "events_tumbling_window": q_events_tumbling_window,
        "events_asof_join": q_events_asof_join,
        "events_range_join": q_events_range_join,
        "events_time_rollup": q_events_time_rollup,
        "events_session_window": q_events_session_window,
        "window_top_customers": q_window_top_customers,
        "orders_running_total": q_orders_running_total,
        "merge_left_enrich": q_merge_enrich,
        "qf_docs_decisions": q_qf_docs_decisions,
        "qf_docs_scrub_pii": q_qf_docs_scrub,
        "qf_transcripts_pipeline": q_qf_transcripts,
        "qf_metrics_by_reason": q_qf_metrics,
        "qf_rule_hit_matrix": q_qf_rule_matrix,
        "qf_conversation_policy": q_conversation_policy,
        "text_stats_docs": q_text_stats,
        "corpus_quality_report": q_corpus_quality_report,
        "token_length_filter": q_token_length_filter,
        "docs_fingerprint_summary": q_fingerprint_summary,
        "math_domain_filter": q_math_domain_filter,
        "code_domain_filter": q_code_domain_filter,
        "gopher_quality_filter": q_gopher_quality_filter,
        "gopher_repetition_filter": q_gopher_repetition_filter,
        "dedup_exact_keyfirst": q_dedup_keyfirst,
        "dedup_minhash_signatures": q_minhash_signatures,
        "dedup_minhash_pairs": q_minhash_pairs,
        "dedup_minhash_bucket_cap": q_minhash_bucket_cap,
        "dedup_oversize_buckets": q_oversize_buckets,
        "dedup_minhash_kept": q_minhash_dedup_kept,
        "dedup_simhash": q_simhash,
        "dedup_ngram_jaccard": q_ngram_jaccard,
        "dedup_transitive_closure": q_dedup_closure,
        "decontaminate_ngram": q_decontaminate,
        "decontaminate_combined": q_decontaminate_combined,
        "decontaminate_benchmarks": q_decontaminate_benchmarks,
        "map_url_classify": q_map_url_classify,
        "map_extract_qa": q_map_extract_qa,
        "sample_stratified_by_lang": q_stratified_sample,
        "sample_token_budget": q_sample_token_budget,
        "sample_token_budget_per_domain": q_sample_token_budget_per_domain,
        "puzzle_format_sample": q_puzzle_format_sample,
        "topn_longest_docs": q_topn_longest,
        "weighted_mix_sources": q_weighted_mix,
        "knn_bruteforce_top5": q_knn,
        "ann_lsh_top5": q_ann_lsh,
        "ann_ivf_top5": q_ann_ivf,
        "embedding_neardup_pairs": q_embedding_neardup,
        "embedding_neardup_lsh": q_embedding_neardup_lsh,
        "embedding_neardup_banded": q_embedding_neardup_banded,
        "domain_frequency_filter": q_domain_frequency,
        "domain_extract_frequency": q_domain_extract_frequency,
        "conv_full_text": q_conv_full_text,
        "conv_instruction_response": q_conv_instruction_response,
        "orders_uniform_sample": q_uniform_sample,
        "events_lag_delta": q_events_lag_delta,
        "region_rollup_revenue": q_region_rollup,
        "customers_without_orders": q_customers_without_orders,
        "repeat_dataset_regions": q_repeat_dataset,
        "events_dedup_first": q_events_dedup_first,
        "dedup_simhash_neardup": q_simhash_neardup,
        "dedup_simhash_bandblock": q_simhash_bandblock,
        "dedup_simhash64_bandblock": q_simhash64_bandblock,
        "dedup_weighted_jaccard": q_weighted_jaccard,
        "embed_docs_knn": q_embed_and_knn,
        "classifier_lang_filter": q_classifier_filter,
        "rouge_seed_filter": q_rouge_seed_filter,
        "tree_search_beam": q_tree_search_beam,
        "multimodal_featurize": q_multimodal_featurize,
        "multimodal_resize": q_multimodal_resize,
        "part_supplier_revenue": q_part_supplier_revenue,
        "events_json_extract": q_events_json_extract,
        "customers_intersect_years": q_customers_intersect_years,
        "customers_except_years": q_customers_except_years,
        "customers_intersect_all": q_customers_intersect_all,
        "customers_except_all": q_customers_except_all,
        "events_cube": q_events_cube,
        "dedup_levenshtein_pairs": q_levenshtein_pairs,
        "majority_vote_per_user": q_majority_vote,
        "k_shortest_per_lang": q_k_shortest,
        "skew_two_phase_agg": q_two_phase_agg,
        "code_exec_verify": q_code_exec_verify,
        "map_url_classify_repeat": q_map_url_classify_repeat,
        "html_main_content": q_html_main_content,
        "verify_mix_sharegpt": q_verify_mix,
        "pipeline_lineage": q_pipeline_lineage,
        "docs_frequent_ngrams": q_frequent_ngrams,
        "dedup_scrub_frequent_ngrams": q_scrub_frequent_ngrams,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "tpch_q1_pricing": SQL_TPCH_Q1,
        "tpch_q3_top_orders": SQL_TPCH_Q3,
        "tpch_q5_region_revenue": SQL_TPCH_Q5,
        "events_daily_rollup": SQL_EVENTS_DAILY,
        "events_sessionize": SQL_EVENTS_SESSIONIZE,
        "events_type_pivot": SQL_EVENTS_PIVOT,
        "events_tumbling_window": SQL_EVENTS_TUMBLING,
        "events_asof_join": SQL_EVENTS_ASOF,
        "events_range_join": SQL_EVENTS_RANGE_JOIN,
        "events_time_rollup": SQL_EVENTS_TIME_ROLLUP,
        "events_session_window": SQL_EVENTS_SESSION_WINDOW,
        "window_top_customers": SQL_WINDOW_TOP_CUSTOMERS,
        "orders_running_total": SQL_ORDERS_RUNNING_TOTAL,
        "merge_left_enrich": SQL_MERGE_ENRICH,
        "qf_docs_decisions": sql_qf_docs_decisions(),
        "qf_docs_scrub_pii": sql_qf_docs_scrub(),
        "qf_transcripts_pipeline": sql_qf_transcripts(),
        "qf_metrics_by_reason": sql_qf_metrics(),
        "qf_rule_hit_matrix": sql_qf_rule_matrix(),
        "qf_conversation_policy": sql_conversation_policy(),
        "text_stats_docs": sql_text_stats(),
        "corpus_quality_report": sql_corpus_quality_report(),
        "token_length_filter": sql_token_length_filter(),
        "docs_fingerprint_summary": SQL_FINGERPRINT_SUMMARY,
        "math_domain_filter": sql_math_domain_filter(),
        "code_domain_filter": sql_code_domain_filter(),
        "gopher_quality_filter": sql_gopher_quality_filter(),
        "gopher_repetition_filter": sql_gopher_repetition_filter(),
        "dedup_exact_keyfirst": SQL_DEDUP_KEYFIRST,
        "dedup_minhash_signatures": sql_minhash_signatures(),
        "dedup_minhash_pairs": sql_minhash_pairs(),
        "dedup_minhash_bucket_cap": sql_minhash_bucket_cap(),
        "dedup_oversize_buckets": sql_oversize_buckets(),
        "dedup_minhash_kept": sql_minhash_dedup_kept(),
        "dedup_simhash": sql_simhash(),
        "dedup_ngram_jaccard": sql_ngram_jaccard(),
        "dedup_transitive_closure": sql_dedup_closure(),
        "decontaminate_ngram": SQL_DECONTAMINATE,
        "decontaminate_combined": sql_decontaminate_combined(),
        "decontaminate_benchmarks": SQL_DECONTAMINATE_BENCHMARKS,
        "map_url_classify": SQL_MAP_URL_CLASSIFY,
        "map_extract_qa": SQL_MAP_EXTRACT_QA,
        "rouge_seed_filter": SQL_ROUGE_SEED_FILTER,
        "sample_stratified_by_lang": SQL_STRATIFIED_SAMPLE,
        "sample_token_budget": sql_sample_token_budget(),
        "sample_token_budget_per_domain": sql_sample_token_budget_per_domain(),
        "puzzle_format_sample": SQL_PUZZLE_FORMAT_SAMPLE,
        "topn_longest_docs": SQL_TOPN_LONGEST,
        "weighted_mix_sources": SQL_WEIGHTED_MIX,
        "knn_bruteforce_top5": SQL_KNN,
        "embedding_neardup_pairs": SQL_EMBEDDING_NEARDUP,
        "embedding_neardup_lsh": SQL_EMBEDDING_NEARDUP_LSH,
        "embedding_neardup_banded": SQL_EMBEDDING_NEARDUP_BANDED,
        "domain_frequency_filter": SQL_DOMAIN_FREQUENCY,
        "domain_extract_frequency": SQL_DOMAIN_EXTRACT_FREQUENCY,
        "conv_full_text": SQL_CONV_FULL_TEXT,
        "conv_instruction_response": SQL_CONV_INSTRUCTION_RESPONSE,
        "orders_uniform_sample": SQL_UNIFORM_SAMPLE,
        "events_lag_delta": SQL_EVENTS_LAG_DELTA,
        "region_rollup_revenue": SQL_REGION_ROLLUP,
        "customers_without_orders": SQL_CUSTOMERS_WITHOUT_ORDERS,
        "repeat_dataset_regions": SQL_REPEAT_DATASET,
        "events_dedup_first": SQL_EVENTS_DEDUP_FIRST,
        "dedup_simhash_neardup": sql_simhash_neardup(),
        "dedup_simhash_bandblock": sql_simhash_bandblock(),
        "dedup_simhash64_bandblock": sql_simhash64_bandblock(),
        "dedup_weighted_jaccard": sql_weighted_jaccard(),
        "part_supplier_revenue": SQL_PART_SUPPLIER_REVENUE,
        "events_json_extract": SQL_EVENTS_JSON_EXTRACT,
        "customers_intersect_years": SQL_CUSTOMERS_INTERSECT,
        "customers_except_years": SQL_CUSTOMERS_EXCEPT,
        "customers_intersect_all": SQL_CUSTOMERS_INTERSECT_ALL,
        "customers_except_all": SQL_CUSTOMERS_EXCEPT_ALL,
        "events_cube": SQL_EVENTS_CUBE,
        "dedup_levenshtein_pairs": SQL_LEVENSHTEIN_PAIRS,
        "majority_vote_per_user": SQL_MAJORITY_VOTE,
        "k_shortest_per_lang": SQL_K_SHORTEST,
        "skew_two_phase_agg": SQL_TWO_PHASE_AGG,
        "code_exec_verify": SQL_CODE_EXEC_VERIFY,
        "map_url_classify_repeat": SQL_MAP_URL_CLASSIFY_REPEAT,
        "html_main_content": SQL_HTML_MAIN_CONTENT,
        "verify_mix_sharegpt": SQL_VERIFY_MIX,
        "pipeline_lineage": SQL_PIPELINE_LINEAGE,
        "ann_lsh_top5": SQL_ANN_LSH,
        "ann_ivf_top5": SQL_ANN_IVF,
        "multimodal_featurize": SQL_MULTIMODAL_FEATURIZE,
        "multimodal_resize": SQL_MULTIMODAL_RESIZE,
        "tree_search_beam": sql_tree_search_beam(),
        "embed_docs_knn": SQL_EMBED_KNN,
        "classifier_lang_filter": SQL_CLASSIFIER_FILTER,
        "docs_frequent_ngrams": SQL_FREQUENT_NGRAMS,
        "dedup_scrub_frequent_ngrams": SQL_SCRUB_FREQUENT_NGRAMS,
    }

"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exercises the operator inventory of SURVEY.md §2 through the
pathwaydataframework_spark engine API; ``oracle_sql()`` gives the DuckDB
equivalent for the driver's correctness harness (sf0.01, row-count + schema +
order-insensitive value hash).

Conventions shared by both sides (so value hashes match):
- every computed column is aliased identically in Spark and SQL
- money-ish double aggregates are rounded to 2 decimals, ratios/scores to 6
  (removes float-summation-order noise between engines)
- timestamps are TIMESTAMP_NTZ (Spark) ↔ naive TIMESTAMP (DuckDB); the
  loader pins the session timezone to UTC (pathwaydataframework_spark/data.py)
- top-k queries order by rounded values with unique-id tie-breaks
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

import pathwaydataframework_spark as pw
from pathwaydataframework_spark.data import load_table
from pathwaydataframework_spark.internals import reducers as R
from pathwaydataframework_spark.operators import (
    dedup,
    ordered,
    similarity,
    splitters,
    text,
)

SF0001 = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q3-style shipping-priority query on sf0.001."""
    return q03_shipping_priority(spark, SF0001)


# ---------------------------------------------------------------------------
# relational core


def q01_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q1-style groupby/reduce over lineitem (SURVEY §2.4)."""
    li = load_table(spark, sf, "lineitem")
    t = pw.this
    out = (
        li.filter(t.l_shipdate <= pw.lift(F.lit("1998-09-02").cast("timestamp_ntz")))
        .groupby(t.l_returnflag, t.l_linestatus)
        .reduce(
            sum_qty=R.sum(t.l_quantity).num.round(2),
            sum_base_price=R.sum(t.l_extendedprice).num.round(2),
            sum_disc_price=R.sum(t.l_extendedprice * (1 - t.l_discount)).num.round(2),
            sum_charge=R.sum(
                t.l_extendedprice * (1 - t.l_discount) * (1 + t.l_tax)
            ).num.round(2),
            avg_qty=R.avg(t.l_quantity).num.round(2),
            avg_price=R.avg(t.l_extendedprice).num.round(2),
            avg_disc=R.avg(t.l_discount).num.round(6),
            count_order=R.count(),
        )
    )
    return out.df


def q03_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """3-way join + agg + top-10 (SURVEY §2.3/§2.4)."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    cutoff = F.lit("2000-03-15").cast("timestamp_ntz")
    j1 = cust.filter(pw.this.c_mktsegment == "BUILDING").join(
        orders, pw.left.c_custkey == pw.right.o_custkey
    )
    co = j1.select(pw.right.o_orderkey, pw.right.o_orderdate)
    j2 = co.filter(pw.this.o_orderdate < pw.lift(cutoff)).join(
        li, pw.left.o_orderkey == pw.right.l_orderkey
    )
    grouped = j2.groupby(pw.left.o_orderkey, pw.left.o_orderdate).reduce(
        revenue=R.sum(pw.this.l_extendedprice * (1 - pw.this.l_discount)).num.round(2)
    )
    out = grouped.df.orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc()).limit(10)
    return out


def q05_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-hop dimensional join region→nation→customer→orders→lineitem."""
    region = load_table(spark, sf, "region")
    nation = load_table(spark, sf, "nation")
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")

    rn = region.join(nation, pw.left.r_regionkey == pw.right.n_regionkey).select(
        pw.right.n_nationkey, pw.left.r_name
    )
    rnc = rn.join(cust, pw.left.n_nationkey == pw.right.c_nationkey).select(
        pw.right.c_custkey, pw.left.r_name
    )
    rno = rnc.join(orders, pw.left.c_custkey == pw.right.o_custkey).select(
        pw.right.o_orderkey, pw.left.r_name
    )
    out = (
        rno.join(li, pw.left.o_orderkey == pw.right.l_orderkey)
        .groupby(pw.left.r_name)
        .reduce(
            revenue=R.sum(pw.this.l_extendedprice * (1 - pw.this.l_discount)).num.round(2),
            n_items=R.count(),
        )
    )
    return out.df


def q_part_strings(spark: SparkSession, sf: str) -> DataFrame:
    """String namespace ops (SURVEY §2.7 .str)."""
    part = load_table(spark, sf, "part")
    t = pw.this
    out = (
        part.filter(t.p_size > 20)
        .select(
            t.p_partkey,
            upper_name=t.p_name.str.upper(),
            name_len=t.p_name.str.len(),
            title_name=t.p_name.str.title(),
            is_small=t.p_name.str.startswith("small"),
            brand_num=t.p_brand.str.removeprefix("Brand#"),
            type_token_count=pw.lift(F.size(F.split(F.col("p_type"), " ")).cast("long")),
        )
    )
    return out.df


def q_orders_dates(spark: SparkSession, sf: str) -> DataFrame:
    """Datetime namespace ops (SURVEY §2.7 .dt)."""
    orders = load_table(spark, sf, "orders")
    t = pw.this
    out = (
        orders.with_columns(
            o_year=t.o_orderdate.dt.year(),
            o_month=t.o_orderdate.dt.month(),
        )
        .groupby(pw.this.o_year, pw.this.o_month)
        .reduce(
            n=R.count(),
            total=R.sum(t.o_totalprice).num.round(2),
            max_price=R.max(t.o_totalprice).num.round(2),
        )
    )
    return out.df


def q_argmax_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """argmax / max_by reducer (SURVEY §2.4)."""
    sup = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    j = sup.join(nat, pw.left.s_nationkey == pw.right.n_nationkey).select(
        pw.right.n_name, pw.left.s_name, pw.left.s_acctbal, pw.left.s_suppkey
    )
    out = j.groupby(pw.this.n_name).reduce(
        top_supplier=R.max_by(pw.this.s_name, pw.this.s_acctbal),
        top_acctbal=R.max(pw.this.s_acctbal).num.round(2),
        n_suppliers=R.count(),
    )
    return out.df


def q_sorted_names(spark: SparkSession, sf: str) -> DataFrame:
    """sorted_tuple reducer → deterministic string agg (SURVEY §2.4)."""
    sup = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    j = sup.join(nat, pw.left.s_nationkey == pw.right.n_nationkey).select(
        pw.right.n_name, pw.left.s_name
    )
    agg = j.groupby(pw.this.n_name).reduce(names_arr=R.sorted_tuple(pw.this.s_name))
    return agg.df.select(
        "n_name", F.array_join(F.col("names_arr"), ",").alias("supplier_names")
    )


def q_reducer_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """min/max/avg/unique/any/earliest/latest reducers on events (SURVEY §2.4)."""
    ev = load_table(spark, sf, "events")
    t = pw.this
    # v_avg: sum in decimal(18,9) (exact, order-independent) then ONE double
    # division — double-sum partial aggregation is summation-order-dependent
    # and flips the 6th decimal on half-ulp boundaries vs the oracle.
    exact_avg = pw.cast("double", R.sum(pw.cast("decimal(18,9)", t.value))) / R.count()
    out = ev.groupby(t.user_id).reduce(
        n=R.count(),
        v_min=R.min(t.value).num.round(6),
        v_max=R.max(t.value).num.round(6),
        v_avg=exact_avg.num.round(6),
        first_event=R.min_by(t.event_id, t.event_id),
        last_value=R.max_by(t.value, t.event_id).num.round(6),
        n_types=R.count_distinct(t.event_type),
    )
    return out.df


def q_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """Exact continuous-interpolation percentile reducer (extension over the
    reference's reducer set; Spark ``percentile`` ≡ DuckDB quantile_cont).
    The t-digest ``approx_percentile`` variant is the 100 TB path and is
    sanity-checked against the exact one in pytest (engines' sketches
    differ, so it cannot be oracle-hashed)."""
    ev = load_table(spark, sf, "events")
    t = pw.this
    out = ev.groupby(t.event_type).reduce(
        n=R.count(),
        p50=R.percentile(t.value, 0.5).num.round(6),
        p90=R.percentile(t.value, 0.9).num.round(6),
    )
    return out.df


def q_set_difference(spark: SparkSession, sf: str) -> DataFrame:
    """difference → left_anti on id hash (SURVEY §2.6)."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    havers = orders.select(c_custkey=pw.this.o_custkey).with_id_from("c_custkey")
    keyed = cust.select(pw.this.c_custkey, pw.this.c_name, pw.this.c_acctbal).with_id_from(
        "c_custkey"
    )
    out = keyed.difference(havers).select(
        pw.this.c_custkey, pw.this.c_name, acctbal=pw.this.c_acctbal.num.round(2)
    )
    return out.df


def q_intersect(spark: SparkSession, sf: str) -> DataFrame:
    """intersect → left_semi on id hash (SURVEY §2.6)."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    havers = orders.select(c_custkey=pw.this.o_custkey).with_id_from("c_custkey")
    rich = (
        cust.filter(pw.this.c_acctbal > 5000)
        .select(pw.this.c_custkey, pw.this.c_name)
        .with_id_from("c_custkey")
    )
    out = rich.intersect(havers).select(pw.this.c_custkey, pw.this.c_name)
    return out.df


def q_update_cells(spark: SparkSession, sf: str) -> DataFrame:
    """update_cells upsert (SURVEY §2.6): clamp negative balances to 0."""
    cust = load_table(spark, sf, "customer")
    base = cust.select(pw.this.c_custkey, pw.this.c_name, pw.this.c_acctbal).with_id_from(
        "c_custkey"
    )
    fixes = (
        cust.filter(pw.this.c_acctbal < 0)
        .select(pw.this.c_custkey, c_acctbal=pw.lift(F.lit(0.0)))
        .with_id_from("c_custkey")
    )
    out = base.update_cells(fixes).select(
        pw.this.c_custkey, pw.this.c_name, acctbal=pw.this.c_acctbal.num.round(2)
    )
    return out.df


def q_update_rows(spark: SparkSession, sf: str) -> DataFrame:
    """update_rows full-row upsert (SURVEY §2.6): replace rows for small
    custkeys AND insert brand-new rows — exercises both sides of the
    full-outer coalesce."""
    cust = load_table(spark, sf, "customer")
    base = cust.select(pw.this.c_custkey, pw.this.c_name, pw.this.c_acctbal).with_id_from(
        "c_custkey"
    )
    updated = (
        cust.filter(pw.this.c_custkey <= 100)
        .select(
            pw.this.c_custkey,
            c_name=pw.lift(F.lit("UPDATED")),
            c_acctbal=pw.lift(F.lit(0.0)),
        )
        .with_id_from("c_custkey")
    )
    inserted = (
        cust.filter(pw.this.c_custkey <= 10)
        .select(
            c_custkey=pw.this.c_custkey + 10_000_000,
            c_name=pw.lift(F.lit("NEW")),
            c_acctbal=pw.lift(F.lit(1.0)),
        )
        .with_id_from("c_custkey")
    )
    out = base.update_rows(updated.concat(inserted)).select(
        pw.this.c_custkey, pw.this.c_name, acctbal=pw.this.c_acctbal.num.round(2)
    )
    return out.df


def q_concat_reindex(spark: SparkSession, sf: str) -> DataFrame:
    """concat_reindex (SURVEY §2.6): union of two OVERLAPPING order slices
    with fresh ids — plain concat would reject the shared keys."""
    orders = load_table(spark, sf, "orders")
    urgent = orders.filter(pw.this.o_orderpriority == "1-URGENT").select(
        pw.this.o_orderkey, pw.this.o_totalprice
    )
    big = orders.filter(pw.this.o_totalprice > 150000).select(
        pw.this.o_orderkey, pw.this.o_totalprice
    )
    out = urgent.concat_reindex(big).select(
        pw.this.o_orderkey, price=pw.this.o_totalprice.num.round(2)
    )
    return out.df


def q_asof_nearest(spark: SparkSession, sf: str) -> DataFrame:
    """asof_join direction='nearest' (SURVEY §2.3): closer of the
    backward/forward order per event, ties backward."""
    ev = load_table(spark, sf, "events")
    orders = load_table(spark, sf, "orders")
    latest = orders.groupby(pw.this.o_custkey, pw.this.o_orderdate).reduce(
        o_orderkey=R.max(pw.this.o_orderkey)
    )
    j = ev.asof_join(
        latest,
        pw.this.ts,
        pw.this.o_orderdate,
        pw.left.user_id == pw.right.o_custkey,
        how="left",
        direction="nearest",
    )
    return j.select(
        pw.left.event_id,
        pw.left.user_id,
        matched_order=pw.right.o_orderkey,
        matched_date=pw.right.o_orderdate,
    ).df


def q_concat_split(spark: SparkSession, sf: str) -> DataFrame:
    """split + concat round-trip (SURVEY §2.2/§2.6)."""
    cust = load_table(spark, sf, "customer")
    pos, neg = cust.split(pw.this.c_acctbal >= 0)
    pos = pos.with_columns(bucket=pw.lift(F.lit("pos")))
    neg = neg.with_columns(bucket=pw.lift(F.lit("neg")))
    out = (
        pos.concat(neg)
        .groupby(pw.this.bucket)
        .reduce(n=R.count(), total=R.sum(pw.this.c_acctbal).num.round(2))
    )
    return out.df


def q_flatten_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """flatten → explode (SURVEY §2.6)."""
    part = load_table(spark, sf, "part")
    toks = part.select(
        pw.this.p_partkey, token=pw.this.p_name.str.split(" ")
    ).flatten(pw.this.token)
    out = toks.groupby(pw.this.token).reduce(n=R.count())
    return out.df


def q_ix_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """ix — lookup by pointer (SURVEY §2.2)."""
    cust = load_table(spark, sf, "customer").with_id_from("c_custkey")
    orders = load_table(spark, sf, "orders")
    looked = cust.ix(orders.pointer_from(pw.this.o_custkey), context=orders)
    out = looked.groupby(pw.this.c_mktsegment).reduce(n_orders=R.count())
    return out.df


def q_sql_passthrough(spark: SparkSession, sf: str) -> DataFrame:
    """pw.sql — the reference's SQL subset is native in Spark (SURVEY §2.11)."""
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    out = pw.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n,
               ROUND(SUM(l_extendedprice), 2) AS revenue
        FROM li JOIN ord ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY l_returnflag
        HAVING COUNT(*) > 10
        """,
        li=li,
        ord=orders,
    )
    return out.df


# ---------------------------------------------------------------------------
# ordered / analytic


def q_prev_next(spark: SparkSession, sf: str) -> DataFrame:
    """sort → prev/next values (SURVEY §2.5)."""
    ev = load_table(spark, sf, "events")
    out = ordered.retrieve_prev_next_values(
        ev, key=pw.this.event_id, value=pw.this.event_id, instance=pw.this.user_id
    )
    return out.df.select(
        "event_id",
        "user_id",
        F.col("prev_value").alias("prev_event"),
        F.col("next_value").alias("next_event"),
    )


def q_diff_values(spark: SparkSession, sf: str) -> DataFrame:
    """Table.diff (SURVEY §2.5)."""
    ev = load_table(spark, sf, "events")
    out = ev.diff(pw.this.event_id, pw.this.value, instance=pw.this.user_id)
    return out.df.select(
        "event_id", "user_id", F.round(F.col("diff_value"), 6).alias("diff_value")
    )


def q_topk_orders(spark: SparkSession, sf: str) -> DataFrame:
    """top-k per group (SURVEY §2.5)."""
    orders = load_table(spark, sf, "orders")
    out = orders.topk(3, pw.this.o_totalprice, instance=pw.this.o_custkey)
    return out.df.select(
        "o_custkey", "o_orderkey", F.round(F.col("o_totalprice"), 2).alias("price")
    )


def q_deduplicate_latest(spark: SparkSession, sf: str) -> DataFrame:
    """Table.deduplicate — keep last row per instance (SURVEY §2.9)."""
    ev = load_table(spark, sf, "events")
    out = ev.deduplicate(value=pw.this.event_id, instance=pw.this.user_id)
    return out.df.select("user_id", "event_id", F.round(F.col("value"), 6).alias("value"))


def q_unique_any(spark: SparkSession, sf: str) -> DataFrame:
    """unique + any reducers (SURVEY §2.4; reference reducers.py:426,457):
    unique yields the value when the whole group agrees (null otherwise —
    the engine's error-channel marker), any yields a deterministic member."""
    li = load_table(spark, sf, "lineitem")
    t = pw.this
    out = li.groupby(t.l_orderkey).reduce(
        n=R.count(),
        uniq_flag=R.unique(t.l_returnflag),
        any_status=R.any(t.l_linestatus),
    )
    return out.df


def q_asof_now(spark: SparkSession, sf: str) -> DataFrame:
    """asof_now_join — join the CURRENT right state (SURVEY §2.3/§2.9,
    reference _asof_now_join.py:176); in batch the current state is the
    whole table, i.e. a plain equi-join (the stream-static variant is the
    streaming round's covered path)."""
    ev = load_table(spark, sf, "events")
    cust = load_table(spark, sf, "customer")
    j = pw.temporal.asof_now_join(
        ev, cust, pw.left.user_id == pw.right.c_custkey, how="inner"
    )
    return j.select(
        pw.left.event_id, pw.left.user_id, cust_name=pw.right.c_name
    ).df


def q_session_predicate(spark: SparkSession, sf: str) -> DataFrame:
    """session(predicate=...) — merge consecutive events while the Python
    predicate holds (SURVEY §2.5, reference _window.py:595); the batch plan
    is one applyInPandas pass per instance."""
    from pathwaydataframework_spark.operators import stateful

    ev = load_table(spark, sf, "events")

    def within_10min(prev_t, next_t):
        return (next_t - prev_t).total_seconds() <= 600

    out = stateful.session_windows_by_predicate(
        ev,
        pw.this.ts,
        within_10min,
        instance=pw.this.user_id,
        aggregations={"n": ("event_id", "count"), "v_max": ("value", "max")},
    )
    return out.df.select(
        "user_id", "_pw_window_start", "_pw_window_end", "n",
        F.round(F.col("v_max"), 6).alias("v_max"),
    )


def q_interval_outer(spark: SparkSession, sf: str) -> DataFrame:
    """interval_join how='outer' — both unmatched sides padded through the
    occurrence-counted row-hash anti-join (SURVEY §2.3)."""
    ev = load_table(spark, sf, "events")
    l = ev.filter(pw.this.event_type == "error")
    r = load_table(spark, sf, "events").filter(pw.this.event_type == "purchase")
    j = l.interval_join(
        r,
        pw.this.ts,
        pw.this.ts,
        pw.interval(0, 1800),
        pw.left.user_id == pw.right.user_id,
        how="outer",
    )
    return j.select(id_a=pw.left.event_id, id_b=pw.right.event_id).df


def q_asof_right(spark: SparkSession, sf: str) -> DataFrame:
    """asof_join how='right' — matched pairs + never-matched right rows
    padded with a NULL left (SURVEY §2.3; exercises the r3
    duplicate-multiplicity pad)."""
    ev = load_table(spark, sf, "events")
    orders = load_table(spark, sf, "orders")
    latest = orders.groupby(pw.this.o_custkey, pw.this.o_orderdate).reduce(
        o_orderkey=R.max(pw.this.o_orderkey)
    )
    j = ev.asof_join(
        latest,
        pw.this.ts,
        pw.this.o_orderdate,
        pw.left.user_id == pw.right.o_custkey,
        how="right",
        direction="backward",
    )
    return j.select(
        event_id=pw.left.event_id,
        matched_order=pw.right.o_orderkey,
        matched_date=pw.right.o_orderdate,
    ).df


# ---------------------------------------------------------------------------
# temporal


def q_window_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    """tumbling window agg (SURVEY §2.5)."""
    ev = load_table(spark, sf, "events")
    out = ev.windowby(
        pw.this.ts, window=pw.tumbling("1 hour"), instance=pw.this.event_type
    ).reduce(n=R.count(), sum_value=R.sum(pw.this.value).num.round(6))
    return out.df.select("_pw_window_start", "event_type", "n", "sum_value")


def q_window_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """sliding window agg (SURVEY §2.5)."""
    ev = load_table(spark, sf, "events")
    out = ev.windowby(pw.this.ts, window=pw.sliding("15 minutes", "1 hour")).reduce(
        n=R.count()
    )
    return out.df.select("_pw_window_start", "n")


def q_window_session(spark: SparkSession, sf: str) -> DataFrame:
    """session window (max_gap) agg (SURVEY §2.5)."""
    ev = load_table(spark, sf, "events")
    out = ev.windowby(
        pw.this.ts, window=pw.session(max_gap="30 minutes"), instance=pw.this.user_id
    ).reduce(n=R.count(), sum_value=R.sum(pw.this.value).num.round(6))
    return out.df.select(
        F.col("_pw_window_start").alias("session_start"),
        F.col("_pw_window_end").alias("session_end"),
        "user_id",
        "n",
        "sum_value",
    )


def q_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """asof_join backward (SURVEY §2.3)."""
    ev = load_table(spark, sf, "events")
    orders = load_table(spark, sf, "orders")
    # make the right side unique per (key, time) so the match is well-defined
    latest = orders.groupby(pw.this.o_custkey, pw.this.o_orderdate).reduce(
        o_orderkey=R.max(pw.this.o_orderkey)
    )
    j = ev.asof_join(
        latest,
        pw.this.ts,
        pw.this.o_orderdate,
        pw.left.user_id == pw.right.o_custkey,
        how="left",
        direction="backward",
    )
    out = j.select(
        pw.left.event_id,
        pw.left.user_id,
        matched_order=pw.right.o_orderkey,
        matched_date=pw.right.o_orderdate,
    )
    return out.df


def q_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    """interval_join with the double-bucket strategy (SURVEY §2.3)."""
    ev = load_table(spark, sf, "events")
    ev2 = load_table(spark, sf, "events")
    j = ev.interval_join(
        ev2,
        pw.this.ts,
        pw.this.ts,
        pw.interval(0, 3600),
        pw.left.user_id == pw.right.user_id,
    )
    out = (
        j.filter(pw.left.event_id != pw.right.event_id)
        .select(id_a=pw.left.event_id, id_b=pw.right.event_id)
    )
    return out.df


def q_window_join(spark: SparkSession, sf: str) -> DataFrame:
    """window_join on tumbling windows (SURVEY §2.3)."""
    ev = load_table(spark, sf, "events")
    ev2 = load_table(spark, sf, "events")
    j = ev.window_join(
        ev2,
        pw.this.ts,
        pw.this.ts,
        pw.tumbling("1 hour"),
        pw.left.user_id == pw.right.user_id,
    )
    pairs = j.select(
        ws=pw.lift(F.col("_pw_window_start").cast("long")),
        id_a=pw.left.event_id,
        id_b=pw.right.event_id,
    )
    out = pairs.groupby(pw.this.ws).reduce(n_pairs=R.count())
    return out.df


def q_intervals_over(spark: SparkSession, sf: str) -> DataFrame:
    """intervals_over — window per probe time (SURVEY §2.5)."""
    ev = load_table(spark, sf, "events")
    probes = ev.filter(pw.this.event_type == "error").select(p_ts=pw.this.ts)
    out = ev.windowby(
        pw.this.ts,
        window=pw.intervals_over(
            at=probes.p_ts, lower_bound="-10 minutes", upper_bound="0 minutes", is_outer=False
        ),
    ).reduce(n=R.count(), sum_value=R.sum(pw.this.value).num.round(6))
    return out.df.select(F.col("_pw_window").alias("p_ts"), "n", "sum_value")


# ---------------------------------------------------------------------------
# text / dedup / similarity addendum


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """exact dedup by fingerprint; doc counts per lang after dedup."""
    docs = load_table(spark, sf, "documents")
    with_fp = pw.Table(
        docs.df.withColumn("fp", text.fingerprint(F.col("text")))
    )
    deduped = dedup.exact_dedup(with_fp, pw.this.fp, keep_order_by=pw.this.doc_id)
    out = deduped.groupby(pw.this.lang).reduce(n_docs=R.count())
    return out.df


def q_text_stats(spark: SparkSession, sf: str) -> DataFrame:
    """token counting + quality stats per lang."""
    docs = load_table(spark, sf, "documents").df
    stats = docs.select(
        F.col("lang"),
        text.token_count(F.col("text")).alias("tc"),
        text.mean_word_length(F.col("text")).alias("mwl"),
        F.col("n_chars"),
    )
    out = (
        stats.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("tc"), 4).alias("avg_tokens"),
            F.round(F.avg("mwl"), 4).alias("avg_word_len"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
    return out


def q_token_splitter(spark: SparkSession, sf: str) -> DataFrame:
    """TokenCountSplitter-style chunking over documents (reference
    xpacks/llm/splitters.py:34) — greedy 32-token chunks, tails under 8
    tokens merged into the previous chunk.  Pure column expressions, so
    chunk text/counts are exactly oracle-checkable in SQL."""
    docs = load_table(spark, sf, "documents").df
    return splitters.token_count_split(
        docs, "doc_id", "text", min_tokens=8, max_tokens=32
    )


def q_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """deterministic per-language rebalancing sample (north-star sampling
    surface; membership is md5(key:seed)-thresholded, so the exact row
    set is cross-engine reproducible — no RNG)."""
    from pathwaydataframework_spark.operators import sampling

    docs = load_table(spark, sf, "documents").df
    return sampling.stratified_sample(
        docs, "doc_id", "lang", {"en": 0.1, "de": 0.5, "fr": 1.0}, default=0.25, seed=3
    ).select("doc_id", "lang")


def q_train_split(spark: SparkSession, sf: str) -> DataFrame:
    """deterministic disjoint train/val/test split, emitted as one tagged
    table (sampling.split returns the three frames; the union is the
    oracle-checkable view of the whole partition)."""
    from pathwaydataframework_spark.operators import sampling

    docs = load_table(spark, sf, "documents").df
    parts = sampling.split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    out = None
    for name, part in parts.items():
        tagged = part.select("doc_id", F.lit(name).alias("part"))
        out = tagged if out is None else out.unionByName(tagged)
    return out


def q_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """deterministic epoch shuffle with explicit global positions
    (operators/sampling.py deterministic_shuffle): order = md5(doc_id:7),
    positions via monotone 256-shard prefix-sum — no global sort, no
    single-partition window; the oracle replays the exact permutation
    with one ORDER BY."""
    from pathwaydataframework_spark.operators import sampling

    docs = load_table(spark, sf, "documents").df
    return sampling.deterministic_shuffle(docs, "doc_id", seed=7).select(
        "doc_id", "position"
    )


def q_mix_datasets(spark: SparkSession, sf: str) -> DataFrame:
    """weighted dataset mixing: 'en' docs upsampled 2.5x (two whole
    copies + a deterministic 0.5 remainder), 'de' downsampled to 0.5 —
    the epoch-reproducible source-mixing step of a training pipeline."""
    from pathwaydataframework_spark.operators import sampling

    docs = load_table(spark, sf, "documents").df
    en = docs.filter(F.col("lang") == "en").select("doc_id")
    de = docs.filter(F.col("lang") == "de").select("doc_id")
    return sampling.mix_datasets({"en": en, "de": de}, {"en": 2.5, "de": 0.5}, "doc_id")


def q_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """sequence packing: concatenate-and-cut layout at 512 tokens over 4
    deterministic shards (operators/packing.py)."""
    from pathwaydataframework_spark.operators import packing, text as text_ops

    docs = load_table(spark, sf, "documents").df
    with_counts = docs.select(
        "doc_id", text_ops.token_count(F.col("text")).alias("n_tok")
    )
    return packing.pack_by_offset(
        with_counts, "doc_id", "n_tok", max_tokens=512, shards=4
    )


def q_eval_schedule(spark: SparkSession, sf: str) -> DataFrame:
    """Serving-side continuous-batching prefill schedule
    (packing.chunked_prefill_schedule — VERDICT r13 item 8): documents
    as inference requests (whitespace token counts), laid into
    64-token steps over 4 md5 shards with vLLM-style chunked prefill —
    one row per (request, step) chunk, every non-final step carrying
    EXACTLY the budget (pad-free), requests straddling steps as
    chunks.  The SQL replay independently re-derives the sharded
    prefix sum (the q_pack_sequences arithmetic), the per-request step
    range via generate_series, and the chunk offset/length min/max
    arithmetic — so admission order, token accounting and the pad-free
    step shape all sit under the driver's hash gate.  Decode-phase
    scheduling is feedback-dependent and out of scope (DEVIATIONS.md
    #5 spirit); this is the deterministic batch-shape half.  Reference
    has no serving surface; Spark-native addendum alongside the SFT
    batching family."""
    from pathwaydataframework_spark.operators import packing, text as text_ops

    docs = load_table(spark, sf, "documents").df
    with_counts = docs.select(
        "doc_id", text_ops.token_count(F.col("text")).alias("n_tok")
    )
    return packing.chunked_prefill_schedule(
        with_counts, "doc_id", "n_tok", token_budget=64, shards=4
    )


def q_pack_no_straddle(spark: SparkSession, sf: str) -> DataFrame:
    """boundary-respecting sequence packing (packing.pack_no_straddle):
    greedy in-order fill per shard where an overflowing doc closes the
    open sequence — no document straddles a cut, oversized docs get a
    dedicated sequence.  The fold (running remainder WITH RESET) is not
    a prefix sum: one applyInPandas kernel per shard is the honest
    Python crossing, and the oracle replays the identical (fill, seq)
    recurrence as a recursive CTE stepping row_number order per shard."""
    from pathwaydataframework_spark.operators import packing, text as text_ops

    docs = load_table(spark, sf, "documents").df
    with_counts = docs.select(
        "doc_id", text_ops.token_count(F.col("text")).alias("n_tok")
    )
    return packing.pack_no_straddle(
        with_counts, "doc_id", "n_tok", max_tokens=256, shards=64
    )


def _spans_str():
    """doc_spans -> 'doc:off:len;...' — the one stringification every
    span-carrying driver query uses, so the three rows can't drift."""
    return F.array_join(
        F.transform(
            "doc_spans",
            lambda s: F.concat_ws(":", s["doc_id"], s["off"], s["len"]),
        ),
        ";",
    )


def q_pack_materialize(spark: SparkSession, sf: str) -> DataFrame:
    """the packing WRITER step (packing.materialize_sequences): join each
    doc's token ids onto its pack_no_straddle slot and rebuild every
    training sequence in offset order, right-padded to the cap with -1
    (n_tokens stays the REAL count for the trainer's padding mask).
    Fixture gives every doc exactly ONE token — its own doc_id — so the
    greedy fold degenerates to row_number grouping and the oracle states
    each sequence's content INDEPENDENTLY (string_agg of doc_ids in
    queue order, no recursion): sequences are the rn-order groups of 8
    per md5 shard.  r9 adds the doc-boundary surface: ``doc_spans``
    (offset-ordered doc_id:off:len, the trainer's attention-mask map —
    here each doc is one unit span at its queue position) and the
    ``oversized`` cap-violation flag (never set for unit counts)."""
    from pathwaydataframework_spark.operators import packing

    docs = load_table(spark, sf, "documents").df
    toks = docs.select(
        "doc_id",
        F.array(F.col("doc_id").cast("long")).alias("token_ids"),
        F.lit(1).cast("long").alias("n_tok"),
    )
    layout = packing.pack_no_straddle(toks, "doc_id", "n_tok", 8, shards=16)
    seqs = packing.materialize_sequences(
        toks, layout, max_tokens=8, pad_id=-1
    )
    return _train_seq_select(seqs)


def q_pack_cut(spark: SparkSession, sf: str) -> DataFrame:
    """the concatenate-and-cut writer (packing.
    materialize_sequences_by_offset): documents straddle sequence cuts,
    so each doc's id array is SLICED into the pieces landing in each
    sequence it touches (sequence()+explode+slice — pure Catalyst) and
    every sequence rebuilds as exactly 64 ids (one partial tail per
    shard).  Fixture: doc d's ids are d repeated (d%13+1) times, so the
    oracle derives every sequence's content independently — expand each
    doc to per-token global positions via the window cumsum, cut at 64,
    string_agg in position order.  r9 adds ``doc_spans``: one
    doc_id:off:len span per PIECE (a straddler spans every sequence it
    touches), the boundary map a trainer's attention mask needs over a
    concatenate-and-cut layout; the oracle re-derives pieces as
    per-(seq, doc) position groups."""
    from pathwaydataframework_spark.operators import packing

    docs = load_table(spark, sf, "documents").df
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % 13 + 1).cast("long").alias("n_tok"),
        F.array_repeat(
            F.col("doc_id").cast("long"), (F.col("doc_id") % 13 + 1).cast("int")
        ).alias("token_ids"),
    )
    layout = packing.pack_by_offset(toks, "doc_id", "n_tok", 64, shards=8)
    seqs = packing.materialize_sequences_by_offset(toks, layout, 64)
    return seqs.select(
        "shard",
        "seq_id",
        F.array_join("token_ids", ",").alias("tokens"),
        "n_tokens",
        _spans_str().alias("spans"),
    )


def q_vocab(spark: SparkSession, sf: str) -> DataFrame:
    """corpus vocabulary top-100 by frequency, alphabetical tie-break."""
    from pathwaydataframework_spark.operators import text as text_ops

    docs = load_table(spark, sf, "documents").df
    return text_ops.vocabulary(docs, "text", k=100)


def q_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """PII redaction over documents with deterministically injected
    emails/IPs/phones (the fixture corpus is synthetic word salad, so the
    query plants PII on every 7th doc, then scrubs — exercising the real
    regexp chain end-to-end)."""
    from pathwaydataframework_spark.operators import text as text_ops

    docs = load_table(spark, sf, "documents").df
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id"),
                F.lit("@example.com from 10.1.2.3 call +1 (555) 123-4567"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return planted.select(
        "doc_id", text_ops.scrub_pii(F.col("text")).alias("scrubbed")
    )


def q_boilerplate(spark: SparkSession, sf: str) -> DataFrame:
    """HTML/markdown boilerplate removal (operators/parsers.py — the
    in-engine analogue of reference xpacks/llm/parsers.py).  The fixture
    corpus is plain text, so the query wraps every 5th doc in HTML tag
    soup and the next in markdown markup, then parses back to clean
    text — exercising the full regexp chain end-to-end."""
    from pathwaydataframework_spark.operators import parsers

    docs = load_table(spark, sf, "documents").df
    mod = F.col("doc_id") % 5
    wrapped = docs.select(
        "doc_id",
        mod.alias("kind"),
        F.when(
            mod == 0,
            F.concat(
                F.lit("<html><!-- hdr --><body><h1>Doc "),
                F.col("doc_id"),
                F.lit("</h1><p>"),
                F.col("text"),
                F.lit("</p><script>var x = 1;</script></body></html>"),
            ),
        )
        .when(
            mod == 1,
            F.concat(
                F.lit("# Doc "),
                F.col("doc_id"),
                F.lit("\n[link](http://example.com) **"),
                F.col("text"),
                F.lit("**"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("raw"),
    )
    return wrapped.select(
        "doc_id",
        F.when(F.col("kind") == 0, parsers.strip_html(F.col("raw")))
        .when(F.col("kind") == 1, parsers.markdown_to_text(F.col("raw")))
        .otherwise(F.col("raw"))
        .alias("clean"),
    )


def q_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    """distributed Lloyd's k-means over the embeddings table, k=10, 3
    iterations, deterministic init — the oracle replays the identical
    trajectory (rounded centroids/distances), so assignments are exactly
    checkable even though the fixture's labels aren't L2-separable."""
    from pathwaydataframework_spark.operators import clustering

    emb = load_table(spark, sf, "embeddings").df
    return clustering.kmeans(emb, "vec_id", "embedding", k=10, iterations=3)


def q_embedding_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """embedding-space outlier curation: k-means fit (identical trajectory
    to q_kmeans), then flag points farther than mean + 2·std from their
    centroid (clustering.embedding_outliers).  Stats from exact decimal
    sums of 6dp distances, so the flag is cross-engine exact."""
    from pathwaydataframework_spark.operators import clustering

    emb = load_table(spark, sf, "embeddings").df
    return clustering.embedding_outliers(
        emb, "vec_id", "embedding", k=10, iterations=3, z_threshold=2.0
    )


def q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """heuristic language-ID confusion counts."""
    docs = load_table(spark, sf, "documents").df
    out = (
        docs.withColumn("pred_lang", text.lang_id(F.col("text")))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return out


def q_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """exact n-gram Jaccard near-dup pairs (threshold 0.2, word trigrams)."""
    docs = load_table(spark, sf, "documents").df
    return dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)


def q_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, candidates verified by exact Jaccard ≥ 0.8.

    The fixtures plant near-duplicates at jaccard ≈ 0.99 with nothing else
    above 0.2, so banding at r=4/b=4 gives candidate-miss probability
    ~(1-0.99⁴)⁴ ≈ 3e-6 per pair — the verified output deterministically
    equals the exact threshold join, which is the SQL oracle.
    """
    docs = load_table(spark, sf, "documents").df
    return dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=16, bands=4, threshold=0.8
    )


def q_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash-blocked near-dup pairs verified by exact Jaccard ≥ 0.8.

    Blocking = 8 exact 8-bit signature blocks (pigeonhole-complete for
    Hamming < 8); the fixtures' planted dups (jaccard ≈ 0.99) land at
    Hamming ≲ 3, so every oracle pair is a candidate (verified: 0 misses
    at sf0.001/sf0.01) and the verified output equals the exact Jaccard
    threshold join — the SQL oracle.  The Hamming-verified variant
    (engine-specific signature semantics) is covered by pytest."""
    docs = load_table(spark, sf, "documents").df
    return dedup.simhash_jaccard_pairs(
        docs, "doc_id", "text", bits=64, blocks=8, n=3, threshold=0.8
    )


def q_knn_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    """brute-force cosine top-5 for 10 query vectors."""
    emb = load_table(spark, sf, "embeddings").df
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.knn_bruteforce(emb, queries, k=5)


def q_knn_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF approximate knn (coarse k-means quantizer + probed lists,
    similarity.knn_ivf).  Run with nprobe == n_clusters, where IVF
    provably equals brute force (same rounding/tie rules) — so the
    brute-force SQL oracle checks it exactly; pruned-probe recall is
    covered in tests/test_pipeline_ops.py."""
    emb = load_table(spark, sf, "embeddings").df
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.knn_ivf(
        emb, queries, k=5, n_clusters=8, nprobe=8, iterations=2
    )


def q_knn_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-bucketed approximate knn, parameterized so it is exactly
    verifiable: with 16 2-bit bands the OR-construction's candidate sets
    provably contain the true top-5 on the fixture corpus (verified: LSH
    output == brute-force output at sf0.001 and sf0.01), so the exact
    re-rank equals brute-force top-k — the SQL oracle.  Tighter settings
    (64-bit/16 bands, recall 0.94) are asserted against brute force in
    pytest as the scale path."""
    emb = load_table(spark, sf, "embeddings").df
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.knn_lsh(emb, queries, dim=64, k=5, bits=32, bands=16)


def q_knn_lsh_tight(spark: SparkSession, sf: str) -> DataFrame:
    """The SCALE configuration of knn_lsh — what bench.py times.

    The oracle variant above uses 16 2-bit bands so candidate recall is
    provable (band collision p≈1/4 → P(candidate)≈0.99), but that makes the
    candidate set ~all query×corpus pairs — effectively brute force with LSH
    overhead (VERDICT r2 "What's wrong" #1).  This variant is the config the
    knn_lsh docstring calls the scale path: 64-bit signatures in 8 8-bit
    bands (band collision p≈2^-8), recall ≥0.9 asserted against brute force
    in tests/test_pipeline_ops.py.  Not in queries(): its output is
    approximate, so it has no exact SQL oracle.
    """
    emb = load_table(spark, sf, "embeddings").df
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.knn_lsh(emb, queries, dim=64, k=5, bits=64, bands=8)


def q_embedding_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """exact embedding-cosine near-dup pairs (cosine ≥ 0.9, brute force)."""
    emb = load_table(spark, sf, "embeddings").df
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").cast("array<double>").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").cast("array<double>").alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    out = (
        pairs.withColumn(
            "cosine", F.round(similarity.cosine_similarity(F.col("va"), F.col("vb")), 6)
        )
        .filter(F.col("cosine") >= 0.9)
        .select("id_a", "id_b", "cosine")
    )
    return out




def q_bm25(spark: SparkSession, sf: str) -> DataFrame:
    """distributed BM25 top-5 per query (SURVEY §2.10 TantivyBM25 analogue)."""
    from pathwaydataframework_spark.operators import ranking

    docs = load_table(spark, sf, "documents").df
    queries = spark.createDataFrame(
        [(1, "spark query window"), (2, "batch data table")],
        "query_id long, query string",
    )
    return ranking.bm25_scores(docs, queries, k=5)


def q_doc_retrieve(spark: SparkSession, sf: str) -> DataFrame:
    """DocumentStore end-to-end (reference xpacks/llm/document_store.py:32):
    binary docs + JSON metadata → parse → index → per-query filtered top-k
    retrieval (one query unfiltered, one with a JMESPath metadata filter,
    one with a filepath glob).  Flattened to (query_id, rn, dist): the dist
    multiset per rank is invariant under score-tie permutations, so the
    check is deterministic even when duplicate docs tie at the k boundary."""
    from pathwaydataframework_spark.xpacks.llm import DocumentStore

    docs = load_table(spark, sf, "documents").df
    src = docs.select(
        F.encode("text", "utf-8").alias("data"),
        F.to_json(
            F.struct(
                F.concat(
                    F.lit("/corpus/"),
                    F.col("source"),
                    F.lit("/doc_"),
                    F.col("doc_id").cast("string"),
                    F.lit(".txt"),
                ).alias("path"),
                F.pmod(F.col("doc_id"), F.lit(3)).alias("shard"),
                F.col("lang"),
            )
        ).alias("_metadata"),
    )
    store = DocumentStore(src)  # default: utf8 parse, null split, BM25 index
    qdf = spark.createDataFrame(
        [
            (1, "spark query window", 3, None, None),
            (2, "batch data table", 3, "shard == `1`", None),
            (3, "spark query window", 4, None, "/corpus/*/doc_1*.txt"),
        ],
        "query_id long, query string, k int, metadata_filter string, "
        "filepath_globpattern string",
    )
    res = store.retrieve_query(qdf)
    return res.select("query_id", F.posexplode("result").alias("pos", "hit")).select(
        "query_id",
        (F.col("pos") + 1).cast("long").alias("rn"),
        F.round(F.col("hit.dist"), 6).alias("dist"),
    )


def _media_fixtures() -> list[tuple[int, str]]:
    """Deterministic media blobs (hex) shared by q_media_meta and its
    oracle: two PCM WAVs, a REAL encoded PNG (r6: in-repo stdlib-zlib
    codec, operators/png.py — decodes back to the planted gradient), a
    top-down BMP (negative biHeight), a GIF, a baseline JPEG (real
    in-repo codec; dims read by the deep SOF walk), a minimal ISO-BMFF
    MP4 (ftyp + moov{mvhd, trak{tkhd, mdia/minf/stbl/stsd}} — fixed
    deterministic layout, see the oracle's offset comments), an
    unknown blob, a real FLAC encode (r12), and seven MP3 streams
    (r12 ID3+CBR; r13 bare-sync CBR and ID3+Xing VBR; r14 MPEG-2
    bare CBR, MPEG-2 Xing mono, MPEG-2.5 bare Xing, and MPEG-1
    Xing behind a CRC-protected frame)."""
    import struct

    def wav(rate=8000, ch=1, bits=16, payload=800):
        byte_rate = rate * ch * bits // 8
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + payload) + b"WAVE"
            + b"fmt "
            + struct.pack("<IHHIIHH", 16, 1, ch, rate, byte_rate, ch * bits // 8, bits)
            + b"data" + struct.pack("<I", payload)
        )
        return hdr + bytes(payload)

    def png(w, h):
        import numpy as np

        from pathwaydataframework_spark.operators import png as _png

        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[..., 0] = np.tile(np.linspace(0, 255, w).astype(np.uint8), (h, 1))
        img[..., 1] = 77
        img[..., 2] = np.tile(
            np.linspace(255, 0, h).astype(np.uint8)[:, None], (1, w)
        )
        return _png.encode(img)

    def bmp(w, h):
        # REAL encoded BMP (r6: operators/bmp.py) with biHeight flipped
        # negative afterwards when a top-down fixture is requested — the
        # sniffer must report |height|
        import numpy as np

        from pathwaydataframework_spark.operators import bmp as _bmp

        img = np.zeros((abs(h), w, 3), dtype=np.uint8)
        img[..., 1] = np.tile(np.linspace(0, 255, w).astype(np.uint8), (abs(h), 1))
        data = bytearray(_bmp.encode(img))
        if h < 0:
            struct.pack_into("<i", data, 22, h)
            # rows are already bottom-up in the file; a top-down flag
            # flips the decode, fine for a metadata fixture
        return bytes(data)

    def gif(w, h):
        # REAL encoded single-frame GIF (r6: operators/gif.py)
        import numpy as np

        from pathwaydataframework_spark.operators import gif as _gif

        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[::2, :, 2] = 170
        return _gif.encode(img)

    def jpg():
        import numpy as np

        from pathwaydataframework_spark.operators import jpeg as _jpeg

        return _jpeg.encode(np.full((8, 8, 3), 200, dtype=np.uint8), quality=90)

    def mp4(w=640, h=360, timescale=600, duration=3300):
        # Minimal ISO-BMFF with spec-size v0 boxes and a deterministic
        # layout: ftyp(24) moov(8){mvhd(108) trak{tkhd(92)
        # mdia{minf{stbl{stsd(8+8+16)}}}}} — the Spark side walks it
        # GENERALLY (multimodal.mp4_meta); the oracle reads this fixed
        # layout back at documented absolute offsets.
        def box(t, payload):
            return struct.pack(">I", 8 + len(payload)) + t + payload

        ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
        mvhd = box(
            b"mvhd",
            bytes(4)  # version/flags
            + bytes(8)  # ctime/mtime
            + struct.pack(">II", timescale, duration)
            + bytes(80),  # rate/volume/reserved/matrix/predefined/next
        )
        tkhd = box(
            b"tkhd",
            bytes(4)  # version/flags
            + bytes(8)  # ctime/mtime
            + struct.pack(">I", 1)  # track id
            + bytes(4) + bytes(4)  # reserved, duration
            + bytes(8)  # reserved
            + bytes(8)  # layer/alt_group/volume/reserved
            + bytes(36)  # matrix
            + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed
        )
        entry = struct.pack(">I", 16) + b"avc1" + bytes(8)
        stsd = box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
        mdia = box(b"mdia", box(b"minf", box(b"stbl", stsd)))
        return ftyp + box(b"moov", mvhd + box(b"trak", tkhd + mdia))

    def mjpeg_avi(w=24, h=18, fps=10, n=2):
        # REAL MJPEG AVI (r6: operators/avi.py + jpeg.py frames); the
        # sniffer reads avih fields at the standard fixed offsets
        import numpy as np

        from pathwaydataframework_spark.operators import avi as _avi
        from pathwaydataframework_spark.operators import jpeg as _jpeg

        frames = [
            _jpeg.encode(np.full((h, w, 3), 60 * i + 40, dtype=np.uint8))
            for i in range(n)
        ]
        return _avi.encode_mjpeg(frames, width=w, height=h, fps=fps)

    def flac_blob(n=4000, rate=8000):
        # REAL encoded FLAC (r12: operators/flac.py); type + duration
        # come from the fixed-offset STREAMINFO fields — n/rate chosen
        # so n*1000/rate is exact (no truncate-vs-round ambiguity
        # between engines)
        import numpy as np

        from pathwaydataframework_spark.operators import flac as _flac

        x = np.array(
            [((i * 37) % 4096) - 2048 for i in range(n)], dtype=np.int32
        )
        return _flac.encode(x, sample_rate=rate)

    def mp3(payload=1264, kbps_index=9, *, id3=True, rate_index=0,
            mode=0, xing_frames=None, version=3, crc=False):
        # MPEG Layer III stream: optional ID3v2.3 tag (synchsafe
        # size 5, empty padding) + one frame header + filler; r13 adds
        # bare (tagless) streams and a Xing VBR header planted at the
        # standard 4 + CRC + side-info offset with the FRAMES flag +
        # big-endian frame count; r14 adds MPEG-2 (version bits 10)
        # and MPEG-2.5 (00) with their halved/quartered sample rates,
        # 576 samples/frame, the MPEG-2 bitrate column, 9/17-byte side
        # info — and CRC-protected frames (protection bit 0: 2 CRC
        # bytes precede the side info; ADVICE r13).  Frame DATA stays
        # undecoded (the lossy-codec boundary, DEVIATIONS.md #5);
        # durations divide exactly (no truncate-vs-round ambiguity
        # between engines): CBR payload*8/kbps, VBR
        # frames*spf*1000/rate.
        h2 = 0xE0 | (version << 3) | (1 << 1) | (0 if crc else 1)
        frame = bytearray(
            bytes([0xFF, h2, (kbps_index << 4) | (rate_index << 2),
                   mode << 6])
            + bytes(payload - 4)
        )
        if xing_frames is not None:
            side = (
                (17 if mode == 3 else 32) if version == 3
                else (9 if mode == 3 else 17)
            )
            off = 4 + (2 if crc else 0) + side
            frame[off:off + 4] = b"Xing"
            frame[off + 4:off + 8] = (1).to_bytes(4, "big")  # FRAMES flag
            frame[off + 8:off + 12] = int(xing_frames).to_bytes(4, "big")
        pre = (
            b"ID3" + bytes([3, 0, 0]) + bytes([0, 0, 0, 5]) + bytes(5)
            if id3 else b""
        )
        return pre + bytes(frame)

    blobs = [
        wav(),                                # 50 ms @ 16 kB/s
        wav(rate=16000, payload=3200),        # 100 ms @ 32 kB/s
        png(20, 12),
        bmp(64, -48),                         # top-down: |height| reported
        gif(12, 34),
        jpg(),
        mp4(),                                # 640x360, 5500 ms
        mjpeg_avi(),                          # 24x18, 2 frames @ 10 fps
        b"plain text bytes",
        flac_blob(),                          # r12: 4000 samples @ 8 kHz = 500 ms
        mp3(),                                # r12: 1264 B @ 128 kbps = 79 ms
        mp3(payload=1600, id3=False),         # r13: bare-sync CBR = 100 ms
        # r13: Xing VBR @ 32 kHz, 250 frames = 9000 ms exact — the CBR
        # estimate (1200 B @ 128 kbps = 75 ms) would be 120x off
        mp3(payload=1200, rate_index=2, xing_frames=250),
        # r14: bare MPEG-2 CBR — idx 9 is 80 kbps in the MPEG-2
        # bitrate column (not 128) → 1600 B * 8 / 80 = 160 ms
        mp3(payload=1600, id3=False, version=2),
        # r14: MPEG-2 Xing VBR @ 24 kHz, 576 samples/frame, MONO
        # (side info 9) → 125 * 576 / 24000 = 3000 ms exact
        mp3(payload=1200, rate_index=1, mode=3, xing_frames=125,
            version=2),
        # r14: bare MPEG-2.5 Xing VBR @ 12 kHz stereo (side info 17)
        # → 100 * 576 / 12000 = 4800 ms exact
        mp3(payload=1200, rate_index=1, xing_frames=100, version=0,
            id3=False),
        # r14 (ADVICE r13): MPEG-1 VBR with CRC — the Xing header
        # sits 2 bytes later (4+2+32); 250 frames @ 32 kHz = 9000 ms
        mp3(payload=1200, rate_index=2, xing_frames=250, crc=True),
    ]
    return [(i, b.hex()) for i, b in enumerate(blobs)]


def q_media_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal container sniffing (operators/multimodal.py
    attach_media_meta — addendum §2.10): WAV/PNG/BMP/GIF header fields
    as pure binary column expressions — r12 adds FLAC (type + duration
    from the fixed-offset STREAMINFO 20-bit rate / 36-bit total-samples
    fields, blob emitted by the in-repo flac.py encoder), r13 adds
    bare-sync MP3 (validated MPEG-1 Layer III header at offset 0, no
    ID3 tag) and EXACT VBR duration from the Xing/Info frame count at
    its computed 4+side-info offset — plus, r6,
    ``deep=True`` variable-offset metadata: MP4/ISO-BMFF duration +
    16.16 track dimensions via the general ``mp4_meta`` box walk and
    JPEG dimensions via the SOF marker walk (one Arrow-batched pandas
    UDF).
    The DuckDB oracle re-derives every field from the same blobs with
    independent hex-string byte arithmetic — the MP4 fields from the
    planted fixture's documented fixed layout, the JPEG SOF via
    strpos(hex, 'FFC0') — so endianness/offset/fixed-point logic is
    differentially checked (PNG and JPEG blobs are emitted by the
    in-repo codecs, operators/png.py + operators/jpeg.py)."""
    from pathwaydataframework_spark.operators import multimodal

    src = spark.createDataFrame(_media_fixtures(), "id long, hex string").select(
        "id", F.unhex("hex").alias("data")
    )
    out = multimodal.attach_media_meta(src, deep=True)
    return out.select(
        "id",
        F.col("media_meta.media_type").alias("media_type"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("media_meta.duration_ms").alias("duration_ms"),
    )


def _frame_fixtures() -> list[tuple[int, str]]:
    """AVI blobs (hex) shared by q_frame_sample and its oracle: one
    7-frame MJPEG stream (sampling picks 0/2/4 of 7), one 2-frame
    MJPEG stream (fewer frames than requested → all of them, no
    fabrication), and — r10 — one 5-frame RAW (BI_RGB) stream whose
    DIB payloads wrap into standalone BMPs (picks 0/1/3 of 5).  Frames
    are flat-color images from the in-repo codecs so every payload
    byte is deterministic."""
    import numpy as np

    from pathwaydataframework_spark.operators import avi as _avi
    from pathwaydataframework_spark.operators import jpeg as _jpeg

    def clip(n, shade_step):
        frames = [
            _jpeg.encode(
                np.full((8, 8, 3), shade_step * i + 10, dtype=np.uint8),
                quality=85,
            )
            for i in range(n)
        ]
        return _avi.encode_mjpeg(frames, width=8, height=8, fps=4)

    raw = _avi.encode_dib(
        [np.full((6, 8, 3), 25 * i + 5, dtype=np.uint8) for i in range(5)],
        fps=4,
    )
    return [(1, clip(7, 30).hex()), (2, clip(2, 90).hex()), (3, raw.hex())]


def q_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Real video-frame extraction (operators/avi.py + multimodal.
    frame_sample — addendum §2.10): the RIFF walk yields one complete
    JPEG per ``00dc`` chunk for MJPEG streams — emitted verbatim — and,
    r10, one standalone BMP per ``00db`` chunk for RAW (BI_RGB)
    streams (the DIB payload wrapped with the stream's
    BITMAPINFOHEADER), each with its ORIGINAL index, ``n_frames``
    evenly sampled.  The DuckDB oracle re-demuxes the same blobs
    INDEPENDENTLY — a recursive-CTE chunk walk over the hex (fourcc +
    little-endian size + word alignment, no Python offsets leaked),
    with the strf compression field routing raw streams through a
    SQL-rebuilt BITMAPFILEHEADER wrap — and re-derives the sampling
    arithmetic, so container parsing, the compression dispatch, the
    BMP wrap bytes, frame order and the floor-map sampling are all
    differentially checked byte-for-byte."""
    from pathwaydataframework_spark.operators import multimodal

    src = spark.createDataFrame(
        _frame_fixtures(), "media_id long, hex string"
    ).select("media_id", F.unhex("hex").alias("data"))
    out = multimodal.frame_sample(src, n_frames=3)
    return out.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.lower(F.hex("frame_bytes")).alias("frame_hex"),
        F.length("frame_bytes").cast("long").alias("frame_len"),
    )


def _frame_sample_oracle_sql() -> str:
    values = ", ".join(f"({i}, '{h}')" for i, h in _frame_fixtures())
    b = lambda c, p: f"TRY_CAST('0x' || substr({c}, ({p})*2-1, 2) AS BIGINT)"  # noqa: E731
    le32 = lambda c, p: (  # noqa: E731
        f"({b(c, p)} + {b(c, f'({p})+1')}*256 + {b(c, f'({p})+2')}*65536"
        f" + {b(c, f'({p})+3')}*16777216)"
    )
    # 4-byte little-endian hex of an integer expression (the
    # BITMAPFILEHEADER's two length fields, rebuilt in SQL)
    le32hex = lambda v: (  # noqa: E731
        f"printf('%02x%02x%02x%02x', ({v}) % 256, (({v}) // 256) % 256,"
        f" (({v}) // 65536) % 256, (({v}) // 16777216) % 256)"
    )
    return f"""
        WITH RECURSIVE raw(media_id, hx) AS (VALUES {values}),
        src AS (SELECT media_id, hex(unhex(hx)) AS h FROM raw),
        -- the first vids strf: its size, payload hex, and the
        -- BITMAPINFOHEADER compression field (byte offset 16) — 0
        -- means RAW (BI_RGB), where each frame payload is a DIB pixel
        -- array the wrap below turns into a standalone BMP
        fmt AS (
            SELECT media_id,
                   CASE WHEN sp > 0 THEN {le32('h', 'sp+4')} END AS ssize,
                   CASE WHEN sp > 0
                        THEN lower(substr(h, (sp+8)*2-1,
                                          {le32('h', 'sp+4')}*2))
                   END AS strf_hex,
                   CASE WHEN sp > 0 THEN {le32('h', 'sp+24')} END AS comp
            FROM (
                SELECT media_id, h,
                       (strpos(h, hex('strf'::BLOB)) - 1) // 2 + 1 AS sp
                FROM src
            )
        ),
        -- chunk walk inside the movi LIST: pos is the 1-based byte
        -- offset of each chunk header; step = 8 + size + pad-to-word
        walk(media_id, pos, fourcc, size) AS (
            SELECT media_id, p, substr(h, (p)*2-1, 8), {le32('h', 'p+4')}
            FROM (
                SELECT media_id, h,
                       (strpos(h, hex('movi'::BLOB)) - 1) // 2 + 5 AS p
                FROM src
            ) t(media_id, h, p)
            UNION ALL
            SELECT w.media_id,
                   w.pos + 8 + w.size + (w.size % 2),
                   substr(s.h, (w.pos + 8 + w.size + (w.size % 2))*2-1, 8),
                   {le32('s.h', 'w.pos + 12 + w.size + (w.size % 2)')}
            FROM walk w
            JOIN src s ON s.media_id = w.media_id
            WHERE w.pos + 16 + w.size + (w.size % 2) <= length(s.h) // 2
        ),
        frames AS (
            SELECT w.media_id,
                   row_number() OVER (
                       PARTITION BY w.media_id ORDER BY w.pos
                   ) - 1 AS fidx,
                   CASE WHEN m.comp = 0 THEN
                       -- BITMAPFILEHEADER ('BM', total, 0, 0, pix_off)
                       -- + the stream's strf + the raw DIB payload
                       '424d' || {le32hex('14 + m.ssize + w.size')}
                       || '00000000' || {le32hex('14 + m.ssize')}
                       || m.strf_hex
                       || lower(substr(s.h, (w.pos + 8) * 2 - 1,
                                       w.size * 2))
                   ELSE
                       lower(substr(s.h, (w.pos + 8) * 2 - 1, w.size * 2))
                   END AS fhex,
                   CASE WHEN m.comp = 0 THEN 14 + m.ssize + w.size
                        ELSE w.size END AS flen
            FROM walk w
            JOIN src s USING (media_id)
            JOIN fmt m USING (media_id)
            WHERE w.fourcc IN (hex('00dc'::BLOB), hex('00db'::BLOB))
        ),
        totals AS (SELECT media_id, count(*) AS n FROM frames GROUP BY 1),
        -- the floor-map sampling: distinct (i*n)//3 reproduces both the
        -- evenly-spaced picks (n > 3) and the all-frames case (n <= 3)
        picks AS (
            SELECT DISTINCT t.media_id, (i.gen * t.n) // 3 AS frame_idx
            FROM totals t CROSS JOIN generate_series(0, 2) AS i(gen)
        )
        SELECT p.media_id, p.frame_idx, f.fhex AS frame_hex,
               f.flen AS frame_len
        FROM picks p
        JOIN frames f
          ON f.media_id = p.media_id AND f.fidx = p.frame_idx
    """


def _warc_fixtures() -> list[tuple[int, str]]:
    """Uncompressed ASCII WARC shards (hex) shared by q_warc_ingest and
    its oracle: a warcinfo record plus HTTP response records (one 200
    with HTML, one 404), built by the same record grammar the parser
    consumes — the oracle re-parses the stream INDEPENDENTLY in SQL."""

    def record(wtype, uri, body, ctype="application/http; msgtype=response"):
        hdrs = [
            b"WARC/1.0",
            b"WARC-Type: " + wtype.encode(),
            b"WARC-Date: 2024-01-01T00:00:00Z",
            b"Content-Type: " + ctype.encode(),
            b"Content-Length: " + str(len(body)).encode(),
        ]
        if uri:
            hdrs.insert(2, b"WARC-Target-URI: " + uri.encode())
        return b"\r\n".join(hdrs) + b"\r\n\r\n" + body + b"\r\n\r\n"

    def http(payload, status=200, ctype=b"text/html"):
        return (
            b"HTTP/1.1 " + str(status).encode() + b" OK\r\n"
            b"Content-Type: " + ctype + b"\r\n\r\n" + payload
        )

    shard1 = (
        record("warcinfo", None, b"software: engine\r\n",
               ctype="application/warc-fields")
        + record("response", "http://a.example/",
                 http(b"<html><p>Hello corpus</p></html>"))
        + record("response", "http://b.example/x",
                 http(b"<html>gone</html>", status=404))
    )
    shard2 = record(
        "response", "http://c.example/long",
        http(b"<html>" + b"<p>row</p>" * 40 + b"</html>"),
    )
    return [(1, shard1.hex()), (2, shard2.hex())]


def q_warc_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """Common Crawl-style WARC ingestion (operators/archives.py —
    addendum: corpus shard readers): explode_warc fans each shard out
    to one row per record, splitting the HTTP envelope off response
    bodies.  The DuckDB oracle re-parses the same streams from hex with
    a recursive CTE that walks records by Content-Length (header block
    to the CRLFCRLF terminator, regexp header extraction, HTTP payload
    split) — a fully independent reimplementation of the record
    grammar, so framing, header parsing and payload boundaries are all
    differentially checked (md5 + length of every payload)."""
    from pathwaydataframework_spark.operators import archives

    src = spark.createDataFrame(
        _warc_fixtures(), "blob_id long, hex string"
    ).select(F.col("blob_id").cast("string").alias("path"),
             F.unhex("hex").alias("content"))
    out = archives.explode_warc(src)
    return out.select(
        F.col("path").cast("long").alias("blob_id"),
        "record_idx",
        "warc_type",
        "target_uri",
        F.col("http_status").cast("long").alias("http_status"),
        F.md5("body").alias("body_md5"),
        F.length("body").cast("long").alias("body_len"),
    )


def _warc_ingest_oracle_sql() -> str:
    values = ", ".join(f"({i}, '{h}')" for i, h in _warc_fixtures())
    return f"""
        WITH RECURSIVE raw(blob_id, hx) AS (VALUES {values}),
        src AS (SELECT blob_id, decode(unhex(hx)) AS s FROM raw),
        -- walk records by Content-Length: header block ends at CRLFCRLF,
        -- body follows, then a CRLFCRLF record terminator
        walk(blob_id, idx, pos, hdr, body) AS (
            SELECT blob_id, 0, 1,
                   substr(s, 1, strpos(s, chr(13)||chr(10)||chr(13)||chr(10)) - 1),
                   substr(s,
                          strpos(s, chr(13)||chr(10)||chr(13)||chr(10)) + 4,
                          TRY_CAST(regexp_extract(
                              substr(s, 1, strpos(s, chr(13)||chr(10)||chr(13)||chr(10)) - 1),
                              'Content-Length: (\\d+)', 1) AS BIGINT))
            FROM src
            UNION ALL
            SELECT w.blob_id, w.idx + 1, t.np,
                   substr(t.rest, 1, strpos(t.rest, chr(13)||chr(10)||chr(13)||chr(10)) - 1),
                   substr(t.rest,
                          strpos(t.rest, chr(13)||chr(10)||chr(13)||chr(10)) + 4,
                          TRY_CAST(regexp_extract(
                              substr(t.rest, 1, strpos(t.rest, chr(13)||chr(10)||chr(13)||chr(10)) - 1),
                              'Content-Length: (\\d+)', 1) AS BIGINT))
            FROM walk w
            JOIN src s2 ON s2.blob_id = w.blob_id
            CROSS JOIN LATERAL (
                SELECT w.pos + length(w.hdr) + 4 + length(w.body) + 4 AS np,
                       substr(s2.s, w.pos + length(w.hdr) + 4 + length(w.body) + 4)
                           AS rest
            ) t
            WHERE t.np <= length(s2.s) AND strpos(t.rest, 'WARC/') = 1
        ),
        recs AS (
            SELECT blob_id, idx AS record_idx,
                   regexp_extract(hdr, 'WARC-Type: ([^\\r\\n]+)', 1) AS warc_type,
                   nullif(regexp_extract(hdr, 'WARC-Target-URI: ([^\\r\\n]+)', 1), '')
                       AS target_uri,
                   regexp_extract(hdr, 'Content-Type: ([^\\r\\n]+)', 1) AS rec_ctype,
                   body
            FROM walk
        )
        SELECT blob_id, record_idx, warc_type, target_uri,
               CASE WHEN rec_ctype LIKE 'application/http%'
                         AND strpos(body, 'HTTP/') = 1
                    THEN TRY_CAST(regexp_extract(body, '^HTTP/\\S+ (\\d+)', 1)
                                  AS BIGINT) END AS http_status,
               md5(CASE WHEN rec_ctype LIKE 'application/http%'
                             AND strpos(body, chr(13)||chr(10)||chr(13)||chr(10)) > 0
                        THEN substr(body, strpos(body, chr(13)||chr(10)||chr(13)||chr(10)) + 4)
                        ELSE body END) AS body_md5,
               length(CASE WHEN rec_ctype LIKE 'application/http%'
                                AND strpos(body, chr(13)||chr(10)||chr(13)||chr(10)) > 0
                           THEN substr(body, strpos(body, chr(13)||chr(10)||chr(13)||chr(10)) + 4)
                           ELSE body END) AS body_len
        FROM recs
    """


def _media_meta_oracle_sql() -> str:
    values = ", ".join(f"({i}, '{h}')" for i, h in _media_fixtures())
    # TRY_CAST: reads past a short blob's end yield NULL, not an error
    b = lambda p: f"TRY_CAST('0x' || substr(h, ({p}-1)*2+1, 2) AS BIGINT)"  # noqa: E731
    le32 = lambda p: f"({b(p)} + {b(p+1)}*256 + {b(p+2)}*65536 + {b(p+3)}*16777216)"  # noqa: E731
    be32 = lambda p: f"TRY_CAST('0x' || substr(h, ({p}-1)*2+1, 8) AS BIGINT)"  # noqa: E731
    be16 = lambda p: f"TRY_CAST('0x' || substr(h, ({p}-1)*2+1, 4) AS BIGINT)"  # noqa: E731
    le16 = lambda p: f"({b(p)} + {b(p+1)}*256)"  # noqa: E731
    sgn = lambda u: f"abs(CASE WHEN {u} >= 2147483648 THEN {u} - 4294967296 ELSE {u} END)"  # noqa: E731
    # MP4 fixture fixed layout (see _media_fixtures.mp4): ftyp = 24 bytes;
    # moov hdr 8 → mvhd at byte 32, payload 40 → timescale BE32 at byte 52
    # (1-based 53), duration at 56 (57); mvhd total 108 → trak at 140,
    # tkhd at 148, payload 156 → +76 → width 16.16 at 232 (233), height at
    # 236 (237); the integer part is the leading BE16 of each.
    # JPEG: SOF0 marker found in the hex string (unique + byte-aligned for
    # the planted fixture); height BE16 at marker+5 bytes, width at +7.
    return f"""
        WITH raw(id, hx) AS (VALUES {values}),
        blobs AS (SELECT id, hex(unhex(hx)) AS h, octet_length(unhex(hx)) AS n FROM raw),
        sniffed AS (
            SELECT id, h, n,
                   substr(h, 1, 8) = hex('RIFF'::BLOB)
                       AND substr(h, 17, 8) = hex('WAVE'::BLOB) AS is_wav,
                   substr(h, 1, 8) = '89504E47' AS is_png,
                   substr(h, 1, 4) = hex('BM'::BLOB) AS is_bmp,
                   substr(h, 1, 8) = hex('GIF8'::BLOB) AS is_gif,
                   substr(h, 1, 6) = 'FFD8FF' AS is_jpg,
                   substr(h, 9, 8) = hex('ftyp'::BLOB) AS is_mp4,
                   substr(h, 1, 8) = hex('RIFF'::BLOB)
                       AND substr(h, 17, 8) = hex('AVI '::BLOB)
                       AND substr(h, 49, 8) = hex('avih'::BLOB) AS is_avi,
                   substr(h, 1, 8) = hex('fLaC'::BLOB)
                       AND {b(5)} % 128 = 0 AS is_flac,
                   ({b(19)} * 4096 + {b(20)} * 16 + {b(21)} // 16)
                       AS flac_rate,
                   (({b(22)} % 16) * 4294967296 + {be32(23)})
                       AS flac_total,
                   substr(h, 1, 6) = hex('ID3'::BLOB) AS is_id3,
                   m.fstart, m.mp3_ok, m.mp3_kbps, m.mp3_rate,
                   m.mp3_spf, m.xing_ok, m.xing_frames_flag,
                   m.xing_frames,
                   strpos(h, 'FFC0') AS sofp,
                   {le32(29)} AS byte_rate
            FROM blobs,
            -- MP3 frame walk (r13, widened r14): fstart = 0-based
            -- offset of the first MPEG header byte (past the
            -- synchsafe ID3 tag, or 0 for bare streams); version bits
            -- (fh2//8)%4: 3=MPEG-1, 2=MPEG-2, 0=MPEG-2.5, 1=reserved
            -- (rejected); the Xing/Info VBR header sits 4 + CRC (2
            -- bytes when the protection bit fh2%2 is 0) + side-info
            -- bytes into the frame (MPEG-1: 17 mono / 32 otherwise;
            -- MPEG-2/2.5: 9 / 17)
            LATERAL (
                SELECT s.fstart,
                       fh1 = 255 AND fh2 // 32 = 7
                           AND (fh2 // 2) % 4 = 1
                           AND v.ver != 1 AS mp3_ok,
                       CASE WHEN v.ver = 3 THEN
                            CASE fh3 // 16
                                 WHEN 1 THEN 32 WHEN 2 THEN 40
                                 WHEN 3 THEN 48 WHEN 4 THEN 56
                                 WHEN 5 THEN 64 WHEN 6 THEN 80
                                 WHEN 7 THEN 96 WHEN 8 THEN 112
                                 WHEN 9 THEN 128 WHEN 10 THEN 160
                                 WHEN 11 THEN 192 WHEN 12 THEN 224
                                 WHEN 13 THEN 256 WHEN 14 THEN 320 END
                       ELSE
                            CASE fh3 // 16
                                 WHEN 1 THEN 8 WHEN 2 THEN 16
                                 WHEN 3 THEN 24 WHEN 4 THEN 32
                                 WHEN 5 THEN 40 WHEN 6 THEN 48
                                 WHEN 7 THEN 56 WHEN 8 THEN 64
                                 WHEN 9 THEN 80 WHEN 10 THEN 96
                                 WHEN 11 THEN 112 WHEN 12 THEN 128
                                 WHEN 13 THEN 144 WHEN 14 THEN 160 END
                       END AS mp3_kbps,
                       CASE (fh3 // 4) % 4
                            WHEN 0 THEN 44100 WHEN 1 THEN 48000
                            WHEN 2 THEN 32000 END
                           // (CASE v.ver WHEN 3 THEN 1 WHEN 2 THEN 2
                               ELSE 4 END) AS mp3_rate,
                       CASE WHEN v.ver = 3 THEN 1152 ELSE 576 END
                           AS mp3_spf,
                       substr(h, (s.fstart + 4 + sd.side) * 2 + 1, 8)
                           IN (hex('Xing'::BLOB), hex('Info'::BLOB))
                           AS xing_ok,
                       TRY_CAST('0x' || substr(h,
                           (s.fstart + 11 + sd.side) * 2 + 1, 2)
                           AS BIGINT) % 2 = 1 AS xing_frames_flag,
                       TRY_CAST('0x' || substr(h,
                           (s.fstart + 12 + sd.side) * 2 + 1, 8)
                           AS BIGINT) AS xing_frames
                FROM (
                    SELECT CASE WHEN substr(h, 1, 6) = hex('ID3'::BLOB)
                                THEN 10 + ({b(7)} * 2097152
                                           + {b(8)} * 16384
                                           + {b(9)} * 128 + {b(10)})
                                ELSE 0 END AS fstart
                ) s,
                LATERAL (
                    SELECT TRY_CAST('0x' || substr(h, s.fstart * 2 + 1, 2) AS BIGINT) AS fh1,
                           TRY_CAST('0x' || substr(h, (s.fstart + 1) * 2 + 1, 2) AS BIGINT) AS fh2,
                           TRY_CAST('0x' || substr(h, (s.fstart + 2) * 2 + 1, 2) AS BIGINT) AS fh3,
                           TRY_CAST('0x' || substr(h, (s.fstart + 3) * 2 + 1, 2) AS BIGINT) AS fh4
                ) f,
                LATERAL (
                    SELECT (fh2 // 8) % 4 AS ver
                ) v,
                LATERAL (
                    SELECT (CASE WHEN v.ver = 3 THEN
                                 CASE WHEN fh4 // 64 = 3 THEN 17 ELSE 32 END
                            ELSE
                                 CASE WHEN fh4 // 64 = 3 THEN 9 ELSE 17 END
                            END)
                           + (CASE WHEN fh2 % 2 = 0 THEN 2 ELSE 0 END)
                           AS side
                ) sd
            ) m
        )
        SELECT id,
               CASE WHEN is_wav OR is_flac OR is_id3
                         OR coalesce(mp3_ok, FALSE) THEN 'audio'
                    WHEN is_mp4 OR is_avi THEN 'video'
                    WHEN is_png OR is_bmp OR is_gif OR is_jpg THEN 'image'
                    ELSE 'unknown' END AS media_type,
               CAST(CASE WHEN is_png THEN {be32(17)}
                         WHEN is_bmp THEN {sgn(le32(19))}
                         WHEN is_gif THEN {le16(7)}
                         WHEN is_avi THEN {le32(65)}
                         WHEN is_mp4 THEN {be16(233)}
                         WHEN is_jpg AND sofp > 0 THEN
                             TRY_CAST('0x' || substr(h, sofp + 14, 4) AS BIGINT)
                         END AS INTEGER) AS width,
               CAST(CASE WHEN is_png THEN {be32(21)}
                         WHEN is_bmp THEN {sgn(le32(23))}
                         WHEN is_gif THEN {le16(9)}
                         WHEN is_avi THEN {le32(69)}
                         WHEN is_mp4 THEN {be16(237)}
                         WHEN is_jpg AND sofp > 0 THEN
                             TRY_CAST('0x' || substr(h, sofp + 10, 4) AS BIGINT)
                         END AS INTEGER) AS height,
               CAST(CASE WHEN is_wav AND byte_rate > 0
                         THEN (n - 44) * 1000 / byte_rate
                         WHEN is_flac AND flac_rate > 0
                         THEN flac_total * 1000 / flac_rate
                         WHEN coalesce(mp3_ok, FALSE)
                              AND coalesce(xing_ok, FALSE)
                              AND coalesce(xing_frames_flag, FALSE)
                              AND mp3_rate IS NOT NULL
                         THEN xing_frames * mp3_spf * 1000 / mp3_rate
                         WHEN coalesce(mp3_ok, FALSE)
                              AND mp3_kbps IS NOT NULL
                         THEN (n - fstart) * 8 / mp3_kbps
                         WHEN is_avi THEN ({le32(33)} * {le32(49)}) / 1000
                         WHEN is_mp4 THEN FLOOR({be32(57)} * 1000 / {be32(53)})
                         END AS INTEGER)
                   AS duration_ms
        FROM sniffed
    """


def q_incremental_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental near-dup (dedup.incremental_neardup_pairs): an incoming
    batch (doc_id % 10 == 0) matched against a PERSISTED corpus band index
    — only the batch is re-shingled; cost scales with the batch, not the
    corpus.  Same provable-recall banding as q_minhash_lsh (planted dups
    sit at ~0.99 jaccard; 16 hashes / 4 bands misses them w.p. ~3e-6), so
    the exact cross-subset jaccard join is the oracle."""
    docs = load_table(spark, sf, "documents").df
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    idx = dedup.minhash_band_index(
        corpus, "doc_id", "text", n=3, num_hashes=16, bands=4
    )
    return dedup.incremental_neardup_pairs(
        batch,
        idx,
        id_col="doc_id",
        text_col="text",
        corpus_docs=corpus,
        n=3,
        num_hashes=16,
        bands=4,
        threshold=0.8,
    )


def _image_fixtures() -> list[tuple[int, str]]:
    """Deterministic 16x16 P6 PPM blobs (hex): 0 = textured gradient
    (blue channel wraps, so rows carry 0-bits too), 1 = two perturbed
    pixels at sampled dHash positions, 2 = +20 brightness (dHash is
    gradient-based, so it must collapse to 0 with the base), 3 = parity
    checkerboard (far hash), 4 = a PNG magic (not decodable — excluded)."""
    import binascii

    def ppm(pix):
        header = b"P6\n16 16\n255\n"
        body = bytes(v for r in range(16) for c in range(16) for v in pix(r, c))
        return binascii.hexlify(header + body).decode()

    def base(r, c):
        return (c * 15, r * 15, ((r + c) * 23) % 200)

    def pert(r, c):
        if (r, c) == (4, 5):
            return (255, 0, 0)
        if (r, c) == (12, 10):
            return (0, 0, 0)
        return base(r, c)

    def bright(r, c):
        return tuple(min(v + 20, 255) for v in base(r, c))

    def alt(r, c):
        v = 255 if (c + r) % 2 == 0 else 0
        return (v, v, v)

    return [
        (0, ppm(base)),
        (1, ppm(pert)),
        (2, ppm(bright)),
        (3, ppm(alt)),
        (4, "89504e470d0a1a0a"),
    ]


def q_winnow(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al. 2003): rightmost-minimum
    gram hash per 4-window over char 5-grams of the normalized text.  The
    oracle replays the selection with integer-encoded (hash, -pos) keys —
    identical selected sets, independent arithmetic."""
    docs = load_table(spark, sf, "documents").df
    return text.winnowing_fingerprints(
        docs, id_col="doc_id", text_col="text", k=5, window=4
    )


def q_sliding_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """RAG-style overlapping chunking (splitters.sliding_window_split):
    32-token windows every 16 tokens — pure column exprs, zero exchanges;
    the oracle replays the start-sequence arithmetic and slices."""
    from pathwaydataframework_spark.operators import splitters

    docs = load_table(spark, sf, "documents").df
    return splitters.sliding_window_split(docs, "doc_id", "text", size=32, stride=16)


def q_assign_shards(spark: SparkSession, sf: str) -> DataFrame:
    """Training-shard export layout (sampling.assign_shards): epoch
    shuffle + contiguous 64-row shards; the oracle replays the exact
    permutation and integer shard arithmetic."""
    from pathwaydataframework_spark.operators import sampling

    docs = load_table(spark, sf, "documents").df
    return sampling.assign_shards(docs, "doc_id", rows_per_shard=64, seed=7).select(
        "doc_id", "position", "shard", "pos_in_shard"
    )


def q_leakage_split(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-safe train/val/test split (sampling.leakage_safe_split):
    near-dup components (same provable-recall MinHash banding as
    q_corpus_dedup) are bucketed by their canonical exemplar's hash, so a
    test document can never have a near-copy in train.  The oracle
    replays the jaccard graph, CC reach, and md5 bucketing."""
    from pathwaydataframework_spark.operators import sampling

    docs = load_table(spark, sf, "documents").df
    parts = sampling.leakage_safe_split(
        docs,
        "doc_id",
        "text",
        {"train": 0.8, "val": 0.1, "test": 0.1},
        seed=0,
        n=3,
        num_hashes=16,
        bands=4,
        threshold=0.8,
    )
    out = None
    for name, p in parts.items():
        t = p.select("doc_id", F.lit(name).alias("part"))
        out = t if out is None else out.unionByName(t)
    return out


def _audio_fixtures() -> list[tuple[int, str]]:
    """Deterministic PCM16 WAV blobs (hex), 1024 samples each: 0 = base
    sawtooth, 1 = base with one window's samples zeroed (local edit —
    <= 2 fingerprint bits), 2 = base at double gain (energy envelope
    comparisons are gain-invariant), 3 = alternating loud/quiet envelope
    (far fingerprint), 4 = not audio."""
    import binascii
    import struct

    n = 1024

    def wav(samples):
        payload = struct.pack(f"<{len(samples)}h", *samples)
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
            + b"fmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
            + b"data" + struct.pack("<I", len(payload))
        )
        return binascii.hexlify(hdr + payload).decode()

    base = [((i * 37) % 4096) - 2048 for i in range(n)]
    # window of sample j is (j*33)//1024; zero exactly window 2 (j: 63..92)
    edit = [0 if (j * 33) // n == 2 else v for j, v in enumerate(base)]
    loud = [v * 2 for v in base]
    alt = [2000 if (i // 31) % 2 == 0 else 10 for i in range(n)]
    return [
        (0, wav(base)),
        (1, wav(edit)),
        (2, wav(loud)),
        (3, wav(alt)),
        (4, "6e6f7420617564696f"),
    ]


def q_audio_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Audio near-dup pairs (multimodal.audio_dedup_pairs): exact-integer
    energy-envelope fingerprints over real PCM16 WAV decode, the shared
    pigeonhole Hamming blocking.  The oracle re-derives every sample,
    window energy, and fingerprint bit from the same blobs with hex-string
    byte arithmetic."""
    from pathwaydataframework_spark.operators import multimodal

    src = spark.createDataFrame(_audio_fixtures(), "id long, hex string").select(
        "id", F.unhex("hex").alias("data")
    )
    return multimodal.audio_dedup_pairs(
        src, id_col="id", binary_col="data", max_hamming=3, frames=33
    )


def _audio_spectral_fixtures() -> list[tuple[int, str]]:
    """Deterministic PCM16 WAV blobs (hex), 1024 samples each, chosen so
    the SPECTRAL fingerprint separates what the energy ENVELOPE cannot:
    0 = base sawtooth, 1 = base with one temporal window zeroed (local
    edit), 2 = base at double gain (spectral bits are gain-invariant:
    every band energy scales by exactly 4), 3 = Nyquist-rate square
    (all energy in the TOP octave, k=1 — every tilt comparison false),
    4 = square flipping every 16 samples (all energy in the BOTTOM
    octave, k=5 — the e5>e4 tilt bit fires in every window).  3 and 4
    have IDENTICAL flat loudness (|s|=1500 everywhere), so the
    envelope fingerprint cannot tell them apart; the spectral one puts
    them 8 bits apart.  5 = not audio."""
    import binascii
    import struct

    n = 1024

    def wav(samples):
        payload = struct.pack(f"<{len(samples)}h", *samples)
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
            + b"fmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
            + b"data" + struct.pack("<I", len(payload))
        )
        return binascii.hexlify(hdr + payload).decode()

    base = [((i * 37) % 4096) - 2048 for i in range(n)]
    edit = [0 if (j * 8) // n == 2 else v for j, v in enumerate(base)]
    loud = [v * 2 for v in base]
    hifreq = [1500 if i % 2 == 0 else -1500 for i in range(n)]
    lowfreq = [1500 if (i // 16) % 2 == 0 else -1500 for i in range(n)]
    return [
        (0, wav(base)),
        (1, wav(edit)),
        (2, wav(loud)),
        (3, wav(hifreq)),
        (4, wav(lowfreq)),
        (5, "6e6f7420617564696f"),
    ]


def q_audio_spectral(spark: SparkSession, sf: str) -> DataFrame:
    """Spectral audio near-dup pairs (multimodal.audio_spectral_pairs):
    exact-integer Haar-band energies per temporal window over real
    PCM16 WAV decode — the frequency-domain extension of q_audio_dedup's
    envelope fingerprint (two equally-loud signals with opposite
    spectral tilt, fixtures 3 and 4, are far apart here and
    indistinguishable there) — then the shared pigeonhole Hamming
    blocking (no all-pairs).  The oracle re-derives every sample, Haar
    detail coefficient, band-window energy, and tilt bit from the same
    blobs with hex-string integer arithmetic.  Reference media handling
    is service-UDF parsers
    (/root/reference/python/pathway/xpacks/llm/parsers.py:53-746); the
    in-engine integer codec + fingerprint path is the Spark-native
    self-contained analogue."""
    from pathwaydataframework_spark.operators import multimodal

    src = spark.createDataFrame(
        _audio_spectral_fixtures(), "id long, hex string"
    ).select("id", F.unhex("hex").alias("data"))
    return multimodal.audio_spectral_pairs(
        src, id_col="id", binary_col="data", max_hamming=3, windows=8,
        bands=5,
    )


def q_audio_features(spark: SparkSession, sf: str) -> DataFrame:
    """Raw Haar band-energy FEATURES (multimodal.audio_spectral_energies):
    the (id, window, band, energy) long-format table a curation model
    consumes — every exact-integer cell of the spectral grid under the
    oracle, not just the tilt bits q_audio_spectral compresses them to.
    Zero-filled over the full grid (a silent window is a feature, not a
    missing row); non-audio blobs contribute nothing.  Same fixture
    blobs as q_audio_spectral, so the two rows differentially check the
    fingerprint's bit derivation AGAINST its own energy matrix."""
    from pathwaydataframework_spark.operators import multimodal

    src = spark.createDataFrame(
        _audio_spectral_fixtures(), "id long, hex string"
    ).select("id", F.unhex("hex").alias("data"))
    return multimodal.audio_spectral_energies(
        src, id_col="id", binary_col="data", windows=8, bands=5
    )


def q_image_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual image dedup (multimodal.perceptual_dedup_pairs):
    integer-arithmetic dHash over real P6 PPM decode, pigeonhole Hamming
    blocking, popcount verification.  The DuckDB oracle re-derives every
    dHash bit from the same blobs with independent hex-string byte
    arithmetic — the fingerprint, blocking recall, and Hamming math are
    all differentially checked."""
    from pathwaydataframework_spark.operators import multimodal

    src = spark.createDataFrame(_image_fixtures(), "id long, hex string").select(
        "id", F.unhex("hex").alias("data")
    )
    return multimodal.perceptual_dedup_pairs(
        src, id_col="id", binary_col="data", max_hamming=4
    )


def q_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """Trainable fastText-style quality classifier (ml/quality.py): 4
    deterministic full-batch logistic-regression iterations over
    tf-normalized hashed bag-of-words (label: lang=='en'), then score the
    corpus.  The oracle unrolls the identical training trajectory (6dp
    sigmoids/weights, exact decimal margin/gradient sums), so every
    per-document probability hash-matches — the check is the distributed
    GD arithmetic itself.  (The fixture's 31-term shared vocabulary
    carries no real lang signal, so headline accuracy is the class prior;
    learning behavior on separable data is unit-tested in
    test_logreg_learns_separable_vocab.)"""
    from pathwaydataframework_spark.ml import quality

    docs = load_table(spark, sf, "documents").df
    # coalesce: a NULL lang must label 0 (the oracle's CASE WHEN does), not
    # NULL (which would silently drop the doc from residuals/gradient)
    labeled = docs.withColumn(
        "y", F.coalesce((F.col("lang") == "en").cast("int"), F.lit(0))
    )
    w = quality.train_logreg(
        labeled, "doc_id", "text", "y", buckets=1024, iterations=4, lr=2.0, seed=0
    )
    return quality.predict_logreg(docs, w, "doc_id", "text", buckets=1024, seed=0)


def q_dsir(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023): select the 100 corpus
    docs most target-like (target = the en subset) by Gumbel-top-k over
    hashed-unigram importance weights.  Log-ratios round to 6dp and sum as
    exact decimals; the Gumbel uniform comes from the md5-bucket primitive
    — so the selected set and ranks replay exactly in the oracle."""
    from pathwaydataframework_spark.operators import sampling

    docs = load_table(spark, sf, "documents").df
    target = docs.filter(F.col("lang") == "en")
    return sampling.dsir_select(
        docs, target, id_col="doc_id", text_col="text", buckets=4096, k=100, seed=0
    )


def q_temperature_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-based source rebalancing (XLM-R-style, alpha=0.5 over
    the skewed lang column): acceptance rate sqrt(n_min/n_lang), md5-bucket
    decision.  Every arithmetic step (divide, sqrt, multiply, floor) is
    IEEE correctly-rounded, so the per-lang thresholds — and therefore the
    exact kept row set — are bit-identical across engines."""
    from pathwaydataframework_spark.operators import sampling

    docs = load_table(spark, sf, "documents").df
    out = sampling.temperature_sample(docs, "doc_id", "lang", alpha=0.5, seed=0)
    return out.select("doc_id", "lang")


def q_line_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Global line-level exact dedup (C4/RefinedWeb boilerplate removal).
    The fixture's documents are single-line, so the query first reflows
    each text into 12-token lines (pure array exprs, replicated exactly by
    the oracle); planted near-dup documents then share exact lines, which
    collapse to their first (doc_id, idx) occurrence corpus-wide."""
    docs = load_table(spark, sf, "documents").df
    toks = F.split(F.trim(F.col("text")), r"\s+")
    nl = F.ceil(F.size(toks) / F.lit(12)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), nl - 1),
        lambda i: F.array_join(F.slice(toks, i * F.lit(12) + 1, 12), " "),
    )
    multi = docs.select("doc_id", F.array_join(lines, "\n").alias("text"))
    return dedup.dedup_lines_global(multi, "doc_id", "text")


def q_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means clusters (identical trajectory
    to q_kmeans) are the blocking structure; within each cluster, points
    whose 6dp-rounded cosine to a smaller-id clustermate reaches 0.43 are
    dropped.  The threshold sits in a >=5e-4 gap of the fixture's realized
    within-cluster cosine distribution at sf0.001 and sf0.01, so rounding
    parity makes the kept/dropped split cross-engine exact."""
    from pathwaydataframework_spark.operators import clustering

    emb = load_table(spark, sf, "embeddings").df
    return clustering.semdedup(
        emb, "vec_id", "embedding", k=10, iterations=3, threshold=0.43
    )


def q_corpus_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-level near-dup removal: MinHash-LSH pairs (same provable-
    recall banding as q_minhash_lsh), connected components over the
    verified jaccard>=0.8 graph, min-id exemplar per component.  The
    oracle replays the exact jaccard graph + recursive min-label reach."""
    docs = load_table(spark, sf, "documents").df
    return dedup.corpus_dedup(
        docs, "doc_id", "text", n=3, num_hashes=16, bands=4, threshold=0.8
    )


_INCR_NEARDUP_SQL = """
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
        FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(t) >= 3 THEN list_transform(
                   range(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
               ELSE []::VARCHAR[] END) AS g
        FROM toks
    ), sizes AS (
        SELECT doc_id, len(g) AS sz FROM sh
    ), ex AS (
        SELECT doc_id, unnest(g) AS gram FROM sh
    ), common AS (
        SELECT x.doc_id AS new_id, y.doc_id AS corpus_id, count(*) AS inter
        FROM ex x JOIN ex y ON x.gram = y.gram
        WHERE x.doc_id % 10 = 0 AND y.doc_id % 10 != 0
        GROUP BY 1, 2
    )
    SELECT new_id, corpus_id,
           round(inter::DOUBLE / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = new_id
    JOIN sizes sb ON sb.doc_id = corpus_id
    WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= 0.8
"""


def q_error_channel(spark: SparkSession, sf: str) -> DataFrame:
    """Error-channel semantics (reference fill_error, common.py:438; Error
    values from checked arithmetic, expression.rs): division by zero and
    mod by zero flow to the null channel (try_divide / guarded mod — under
    ANSI a plain `/` would ABORT the whole job) and fill_error recovers
    them per cell.  Also pins floor-mod semantics for negative divisors."""
    li = load_table(spark, sf, "lineitem")
    t = pw.this
    out = li.filter(t.l_orderkey < 200).select(
        okey=t.l_orderkey,
        lnum=t.l_linenumber,
        # l_quantity == 30 → divisor 0 → Error → -1
        ratio=pw.fill_error(
            (t.l_extendedprice / (t.l_quantity - 30)).num.round(6), -1.0
        ),
        # l_linenumber == 3 → mod by zero → Error → -1; negative divisors
        # exercise floor-mod (sign of divisor)
        bucket=pw.fill_error(t.l_orderkey % (t.l_linenumber - 3), -1),
    )
    return out.df


def q_custom_reducer(spark: SparkSession, sf: str) -> DataFrame:
    """BaseCustomAccumulator / udaf_reduce (reference custom_reducers.py:174,
    271): an order-insensitive XOR accumulator folded per group via
    applyInPandas — one shuffle on the key, Python only inside each group."""
    from pathwaydataframework_spark.internals import custom_reducers as cr

    class XorAcc(cr.BaseCustomAccumulator):
        @classmethod
        def from_row(cls, row):
            acc = cls()
            acc.x = row[0]
            return acc

        def update(self, other):
            self.x ^= other.x

        def compute_result(self):
            return self.x

    orders = load_table(spark, sf, "orders")
    return cr.udaf_reduce(
        orders,
        instance=pw.this.o_orderpriority,
        accumulator=XorAcc,
        value_cols=[pw.this.o_orderkey],
        result_name="xor_key",
        result_type="long",
    ).df


def q_hybrid_rrf(spark: SparkSession, sf: str) -> DataFrame:
    """HybridIndex reciprocal-rank fusion (reference hybrid_index.py:14):
    BM25 full-text over documents + brute-force cosine over embeddings —
    the SAME id space (doc_id == vec_id in the fixtures) — each top-5,
    fused with rrf = 1/(60+rank), re-ranked.  Each retriever keeps its own
    broadcast-probe plan; fusion touches only the k-sized candidate lists."""
    from pathwaydataframework_spark.operators import ml_index

    docs = load_table(spark, sf, "documents").df
    emb = load_table(spark, sf, "embeddings").df
    qtexts = spark.createDataFrame(
        [(1, "spark query window"), (2, "batch data table")],
        "query_id long, query string",
    )
    qvecs = emb.filter(F.col("vec_id").isin(3, 7)).select(
        F.when(F.col("vec_id") == 3, F.lit(1).cast("long"))
        .otherwise(F.lit(2).cast("long"))
        .alias("query_id"),
        "embedding",
    )
    queries = qtexts.join(qvecs, "query_id")
    knn = ml_index.KNNIndex(
        emb, id_col="vec_id", vec_col="embedding", dim=8, method="brute_force"
    )
    bm25 = ml_index.BM25Index(docs)
    hybrid = ml_index.HybridIndex([knn, bm25])
    return hybrid.query(
        queries,
        k=5,
        query_id_col="query_id",
        query_text_col="query",
        query_vec_col="embedding",
    )


def q_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Retrieve-then-rerank (reference xpacks/llm/rerankers.py:58 analogue):
    BM25 top-5 candidates per query, reranked by lexical query coverage.
    The rerank stage touches candidates only — never rescans the corpus."""
    from pathwaydataframework_spark.operators import ranking, rerankers

    docs = load_table(spark, sf, "documents").df
    queries = spark.createDataFrame(
        [(1, "spark query window"), (2, "batch data table")],
        "query_id long, query string",
    )
    cand = ranking.bm25_scores(docs, queries, k=5)
    return rerankers.rerank_token_overlap(cand, docs, queries)


def q_connected_components(spark: SparkSession, sf: str) -> DataFrame:
    """near-dup clusters: iterate/connected-components over jaccard>=0.8
    pairs (SURVEY §2.8 pw.iterate; graph algos on iterate)."""
    from pathwaydataframework_spark.operators import graphs

    docs = load_table(spark, sf, "documents").df
    # LSH-blocked pair generation (the scale path); candidates are verified
    # with exact jaccard, and at the fixtures' planted similarity (~0.99)
    # the banding miss probability is ~3e-6 — the pair set provably equals
    # the exact threshold join the SQL oracle computes (see q_minhash_lsh).
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=16, bands=4, threshold=0.8
    )
    return graphs.connected_components(pairs, src="id_a", dst="id_b")


def q_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    """linear interpolation of nulled values over time (SURVEY §2.5)."""
    ev = load_table(spark, sf, "events")
    nulled = ev.select(
        pw.this.event_id,
        pw.this.ts,
        v=pw.if_else(pw.this.event_type == "error", pw.lift(F.lit(None).cast("double")), pw.this.value),
    )
    out = nulled.interpolate(pw.this.ts, pw.this.v)
    return out.df.select("event_id", F.round(F.col("v"), 6).alias("value"))


def q_fuzzy_match(spark: SparkSession, sf: str) -> DataFrame:
    """idf-weighted fuzzy best-match join (SURVEY §2.3 fuzzy_match_tables)."""
    from pathwaydataframework_spark.operators import ranking

    docs = load_table(spark, sf, "documents").df
    left = docs.filter(F.col("doc_id") < 50)
    right = docs.filter(F.col("doc_id") >= 50)
    return ranking.fuzzy_match_tables(
        left, right, left_id="doc_id", left_text="text", right_id="doc_id", right_text="text"
    )


def q_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """pagerank over the customer->supplier order graph (SURVEY §2.8).
    Oracle-checked: the DuckDB side unrolls the same fixed 5-step power
    iteration (see _pagerank_oracle_sql), and round(6) absorbs float
    summation-order differences."""
    from pathwaydataframework_spark.operators import graphs

    li = load_table(spark, sf, "lineitem").df
    orders = load_table(spark, sf, "orders").df
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .distinct()
    )
    return graphs.pagerank(edges, max_iterations=5)



def q_bellman_ford(spark: SparkSession, sf: str) -> DataFrame:
    """bellman_ford shortest paths over the nation adjacency built from
    supplier↔customer order flows (SURVEY §2.8 graph algos on iterate).
    Oracle: unrolled 25-round relaxation CTE chain (min-relaxation is
    convergent on cyclic graphs; see _bellman_ford_oracle_sql)."""
    from pathwaydataframework_spark.operators import graphs

    li = load_table(spark, sf, "lineitem").df
    orders = load_table(spark, sf, "orders").df
    cust = load_table(spark, sf, "customer").df
    sup = load_table(spark, sf, "supplier").df
    # nation-level flow graph: edge weight = 1 / #orderlines between nations
    flows = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .groupBy(
            cust["c_nationkey"].alias("src"), sup["s_nationkey"].alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select("src", "dst", (F.lit(1.0) / F.col("n")).alias("weight"))
    )
    out = graphs.bellman_ford(flows, 0, max_iterations=30)
    return out.select("vertex", F.round("distance", 6).alias("distance"))


def q_json_props(spark: SparkSession, sf: str) -> DataFrame:
    """JSON field access on the events.props column (SURVEY §2.7 Json get/
    conversions)."""
    ev = load_table(spark, sf, "events")
    t = pw.this
    out = (
        ev.with_columns(k_bucket=t.props.json_get("k").as_int() % 10)
        .groupby(pw.this.k_bucket)
        .reduce(n=R.count(), avg_value=R.avg(t.value).num.round(6))
    )
    return out.df



def q_louvain(spark: SparkSession, sf: str) -> DataFrame:
    """louvain communities over the near-dup graph (SURVEY §2.8).
    Oracle-checkable: the fixture's components are disjoint near-cliques,
    where phase-1 Louvain provably keeps each component whole, so the
    min-label CC oracle is exact (see _neardup_cc_sql)."""
    from pathwaydataframework_spark.operators import graphs

    docs = load_table(spark, sf, "documents").df
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=16, bands=4, threshold=0.8
    )
    return graphs.louvain_communities(pairs, src="id_a", dst="id_b")


def q_louvain_levels(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-level Louvain hierarchy (graphs.louvain_communities_multilevel
    — reference stdlib/graphs/louvain_communities/impl.py:282 level loop)
    over a planted cliques-of-cliques graph: 4 super-groups × 3 cliques ×
    4 vertices, intra-clique weight 10, weight-1 complete bipartite links
    between same-group cliques, nothing across groups.  Level 1 provably
    recovers the 12 cliques and level 2 the 4 super-groups (meta-merge
    gain w(i→c)=16 > k·tot/2m ≈ 12.7, strictly positive; no merge is
    possible across groups), with community ids canonicalized to the
    minimum member vertex — so the full (vertex, level, community)
    hierarchy is exactly derivable in closed form: level 1 community =
    4·⌊v/4⌋, level 2 community = 12·⌊v/12⌋."""
    from pathwaydataframework_spark.operators import graphs

    rows = []
    for g in range(4):
        cliques = [
            list(range((g * 3 + c) * 4, (g * 3 + c) * 4 + 4)) for c in range(3)
        ]
        for cl in cliques:
            for i, a in enumerate(cl):
                for b in cl[i + 1 :]:
                    rows.append((a, b, 10.0))
        for ci in range(3):
            for cj in range(ci + 1, 3):
                for a in cliques[ci]:
                    for b in cliques[cj]:
                        rows.append((a, b, 1.0))
    edges = spark.createDataFrame(rows, "src long, dst long, w double")
    out = graphs.louvain_communities_multilevel(edges, weight="w", max_iterations=12)
    return out.select(
        F.col("vertex").cast("long").alias("vertex"),
        F.col("level").cast("int").alias("level"),
        F.col("community").cast("long").alias("community"),
    )


def q_decontam(spark: SparkSession, sf: str) -> DataFrame:
    """benchmark decontamination: 13-gram overlap of the training split
    (sources src2+) against the held-out benchmark split (src0/src1) —
    the GPT-3/PaLM method as a broadcast-probe plan
    (operators/decontam.py).  Emits the contaminated doc ids with their
    distinct-matching-gram counts."""
    from pathwaydataframework_spark.operators import decontam

    docs = load_table(spark, sf, "documents").df
    bench = docs.filter(F.col("source").isin("src0", "src1"))
    train = docs.filter(~F.col("source").isin("src0", "src1"))
    return decontam.contamination_matches(train, bench, n=13)


def q_gopher_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021 appendix A.1) as one
    codegen stage (operators/text.py gopher_quality_flags).  The fixture
    corpus has no lines/ellipses, so every 11th doc gets planted bullet +
    ellipsis lines to exercise the line-level signals."""
    docs = load_table(spark, sf, "documents").df
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.col("text"),
                F.lit("\n- bullet item ...\n- second bullet\nplain tail ..."),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return planted.select(
        "doc_id", text.gopher_quality_flags(F.col("text")).alias("g")
    ).select("doc_id", "g.*")


def q_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher repetition metrics — top-n-gram and duplicated-n-gram
    character fractions (operators/text.py repetition_metrics).  Every 9th
    doc is planted as text+' '+text so duplicated-gram fractions are
    exercised end-to-end, not vacuously zero."""
    docs = load_table(spark, sf, "documents").df
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 9 == 0, F.concat_ws(" ", F.col("text"), F.col("text"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return text.repetition_metrics(planted, top_ns=(2, 3), dup_ns=(5, 10))


def q_span_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """exact-substring span deduplication (Lee et al. 2021) at k=13 over
    documents — the corpus's planted near-dups share long word spans, so
    every duplicated 13-token span is cut, keeping its globally-first copy
    (operators/dedup.py remove_duplicate_spans).  The oracle groups by the
    gram string where Spark groups by xxhash64(gram) — identical modulo
    64-bit collisions."""
    docs = load_table(spark, sf, "documents").df
    return dedup.remove_duplicate_spans(docs, "doc_id", "text", k=13)


def q_c4_filter(spark: SparkSession, sf: str) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2) as one projection
    (operators/text.py c4_filter).  The fixture corpus has no punctuation,
    so structure is planted by doc_id % 4: 0 → three good sentences plus
    three bad lines (short / javascript / unterminated), 1 → 'lorem
    ipsum' page poison, 2 → curly-brace page poison, 3 → untouched
    (cleans to empty, dropped by the 3-sentence rule)."""
    docs = load_table(spark, sf, "documents").df
    mod = F.col("doc_id") % 4
    planted = docs.select(
        "doc_id",
        F.when(
            mod == 0,
            F.concat(
                F.col("text"),
                F.lit(
                    "\nThis is a good sentence one."
                    "\nThis is a good sentence two!"
                    "\nIs this a good sentence three?"
                    "\nshort line."
                    "\nThis line mentions javascript framework today."
                    "\nfive words but no punctuation"
                ),
            ),
        )
        .when(mod == 1, F.concat(F.col("text"), F.lit(" lorem ipsum tail")))
        .when(mod == 2, F.concat(F.col("text"), F.lit(" brace { tail")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return text.c4_filter(planted)


def q_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    """text → ordered token-id arrays against the corpus vocabulary
    (min_count=3; rarer terms map to unk=0) — the tokenization step that
    feeds sequence packing (operators/text.py tokenize_to_ids)."""
    docs = load_table(spark, sf, "documents").df
    vocab = text.vocabulary(docs, min_count=3)
    out = text.tokenize_to_ids(docs, vocab)
    # Project the array to scalar columns (md5 of the joined ids + length):
    # the driver's canonicalizer sorts output columns and cannot factorize
    # list values, so every registry query must emit scalar columns only.
    return out.select(
        "doc_id",
        F.md5(F.concat_ws(",", F.col("token_ids").cast("array<string>"))).alias(
            "ids_md5"
        ),
        "n_tokens",
    )


def q_bigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """per-doc mean log-prob under an interpolated bigram LM fit on the
    corpus (text.bigram_logprob) — the distributed analogue of the CCNet
    perplexity filter; decimal-stable mean of round-6 logps."""
    docs = load_table(spark, sf, "documents").df
    return text.bigram_logprob(docs, lam=0.7)


def q_domain_filter(spark: SparkSession, sf: str) -> DataFrame:
    """C4 domain-blocklist page filter (text.filter_blocked_domains over
    parse_url HOST).  URLs are planted from doc_id (the fixture corpus has
    no url column): every 5th doc on blocked.test, the next on a
    subdomain of it — both must drop, exact and subdomain."""
    docs = load_table(spark, sf, "documents").df
    mod = F.col("doc_id") % 5
    with_urls = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.when(mod == 0, F.lit("blocked.test"))
            .when(mod == 1, F.lit("sub.blocked.test"))
            .otherwise(F.concat(F.lit("site"), F.col("doc_id") % 20, F.lit(".org"))),
            F.lit("/doc/"),
            F.col("doc_id"),
        ).alias("url"),
    )
    kept = text.filter_blocked_domains(with_urls, blocklist=["blocked.test"])
    return kept.select("doc_id", text.url_host(F.col("url")).alias("host"))


def q_url_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """URL canonicalization for crawl processing (text.normalize_url +
    registrable_domain): lowercase scheme/host, strip default port /
    userinfo / www. / fragment / tracking params, eTLD+1 via the embedded
    multi-part-suffix set.  URLs are planted from doc_id with every rule
    exercised (mixed case, :443/:80 vs :8080, utm_* params stripped while
    a content-bearing ref param survives, #fragment, www., co.uk/com.au
    suffixes); the oracle derives the expected canonical form
    independently from the same doc_id arithmetic."""
    docs = load_table(spark, sf, "documents").df
    d = F.col("doc_id")
    scheme = F.when(d % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("http"))
    host = (
        F.when(d % 4 == 0, F.lit("Example.COM"))
        .when(d % 4 == 1, F.lit("www.News.co.uk"))
        .when(d % 4 == 2, F.concat(F.lit("sub.Site"), d % 7, F.lit(".org")))
        .otherwise(F.lit("media.Example.com.au"))
    )
    port = (
        F.when(d % 3 == 0, F.when(d % 2 == 0, F.lit(":443")).otherwise(F.lit(":80")))
        .when(d % 3 == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    query = F.when(
        d % 2 == 0,
        F.concat(F.lit("?utm_source=feed&id="), d, F.lit("&utm_campaign=Spring&ref=home")),
    ).otherwise(F.concat(F.lit("?id="), d, F.lit("&page=2")))
    frag = F.when(d % 5 == 0, F.lit("#Section2")).otherwise(F.lit(""))
    raw = F.concat(scheme, F.lit("://"), host, port, F.lit("/Path/"), d, query, frag)
    return text.canonicalize_urls(docs.select("doc_id", raw.alias("url"))).select(
        "doc_id", "norm_url", "host", "reg_domain"
    )


def q_domain_quota(spark: SparkSession, sf: str) -> DataFrame:
    """per-site quota: the 5 longest docs per registrable domain
    (sampling.per_key_topk over text.registrable_domain) — exact top-k,
    skew-safe via Catalyst's InferWindowGroupLimit two-phase group limit
    (Partial below the exchange caps a hot key map-side; measured faster
    than hand-salting, scripts/skew_topk_spotcheck.py).  A hot domain is
    planted (every 3rd doc lands on big.co.uk; the rest spread over 11
    small .org sites) so the skew path actually executes."""
    from pathwaydataframework_spark.operators import sampling

    docs = load_table(spark, sf, "documents").df
    d = F.col("doc_id")
    host = F.when(d % 3 == 0, F.lit("a.Big.co.uk")).otherwise(
        F.concat(F.lit("www.site"), d % 11, F.lit(".org"))
    )
    with_dom = docs.select(
        "doc_id", "n_chars", text.registrable_domain(host).alias("domain")
    )
    out = sampling.per_key_topk(with_dom, "domain", "n_chars", k=5, tie_col="doc_id")
    return out.select(
        "doc_id", "domain", "n_chars", F.col("rank").cast("long").alias("rank")
    )


def q_url_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """URL-level dedup (text.dedup_by_url): tracking/www/case/default-port
    variants of one page collapse to the single best row per canonical
    URL.  Planted structure: consecutive doc_id triples are three raw
    variants of one page (www+utm+fragment / :443 / gclid) that all
    normalize identically; the longest doc (tie: smallest doc_id) must
    survive.  The oracle re-derives the canonical URL and the winner
    independently from doc_id arithmetic."""
    docs = load_table(spark, sf, "documents").df
    d = F.col("doc_id")
    g = F.expr("doc_id div 3")  # page group: exact integer division
    variant = d % 3
    raw = (
        F.when(
            variant == 0,
            F.concat(
                F.lit("https://www.Site"), g, F.lit(".com/Page?id="), g,
                F.lit("&utm_source=feed#top"),
            ),
        )
        .when(
            variant == 1,
            F.concat(F.lit("https://site"), g, F.lit(".com:443/Page?id="), g),
        )
        .otherwise(
            F.concat(
                F.lit("HTTPS://Site"), g, F.lit(".com/Page?id="), g,
                F.lit("&gclid=abc"),
            )
        )
    )
    with_urls = docs.select("doc_id", "n_chars", raw.alias("url"))
    out = text.dedup_by_url(with_urls, prefer_col="n_chars")
    return out.select("doc_id", "norm_url", "n_chars")


def q_robots(spark: SparkSession, sf: str) -> DataFrame:
    """robots.txt politeness evaluation (text.parse_robots +
    robots_allowed) under RFC 9309 group semantics: three planted robots
    files — nested Allow/Disallow prefixes under a '*' group the 'bot'
    frontier must FALL BACK to, a full Disallow, and a multi-User-agent
    run ('User-agent: bot' + 'User-agent: other' sharing one rule set)
    whose specific group overrides the host's permissive '*' group —
    against URLs planted from doc_id; longest prefix wins, Allow wins
    ties, no rule means allowed.  The oracle derives every verdict
    independently from (doc_id%3, doc_id%4) arithmetic."""
    robots = spark.createDataFrame(
        [
            ("site0.test", "User-agent: *\nDisallow: /private\nAllow: /private/pub"),
            ("site1.test", "User-agent: *\nDisallow: /"),
            (
                "site2.test",
                "User-agent: bot\nUser-agent: other\nDisallow: /private"
                "\n\nUser-agent: *\nAllow: /",
            ),
        ],
        "host string, robots_txt string",
    )
    docs = load_table(spark, sf, "documents").df
    d = F.col("doc_id")
    path = (
        F.when(d % 4 == 0, F.concat(F.lit("/public/p"), d))
        .when(d % 4 == 1, F.concat(F.lit("/private/p"), d))
        .when(d % 4 == 2, F.concat(F.lit("/private/pub/p"), d))
        .otherwise(F.lit("/"))
    )
    urls = docs.select(
        "doc_id",
        F.concat(F.lit("https://site"), d % 3, F.lit(".test"), path).alias("url"),
    )
    return text.robots_allowed(urls, text.parse_robots(robots), agent="bot")


def q_frontier(spark: SparkSession, sf: str) -> DataFrame:
    """Frontier discovery end-to-end (parsers.sitemap_locs →
    text.canonicalize_urls → text.parse_robots + robots_allowed): each
    document carries a planted sitemap XML with two <loc> entries — a
    www/mixed-case/utm_-tracked page URL that must canonicalize, and a
    whitespace-padded /private URL that robots politeness must gate.
    Evaluated as agent='bot' so every RFC 9309 group path executes:
    site0 has only a '*' group (fallback), site1 a multi-User-agent run
    ('crawler'+'bot' share Disallow: /private) overriding a
    Disallow-everything '*' group, site2 an empty Disallow (allow-all).
    Returns the ALLOWED frontier; the oracle re-derives every surviving
    canonical URL independently from doc_id arithmetic."""
    from pathwaydataframework_spark.operators import parsers

    robots = spark.createDataFrame(
        [
            ("site0.test", "User-agent: *\nDisallow: /private"),
            (
                "site1.test",
                "User-agent: crawler\nUser-agent: bot\nDisallow: /private"
                "\n\nUser-agent: *\nDisallow: /",
            ),
            ("site2.test", "User-agent: *\nDisallow:"),
        ],
        "host string, robots_txt string",
    )
    docs = load_table(spark, sf, "documents").df
    d = F.col("doc_id")
    xml = F.concat(
        F.lit("<urlset><url><loc>https://WWW.Site"), d % 3,
        F.lit(".test/Page"), d, F.lit("?utm_source=x&id="), d,
        F.lit("</loc></url><url><loc> https://site"), d % 3,
        F.lit(".test/private/p"), d, F.lit(" </loc></url></urlset>"),
    )
    links = docs.select("doc_id", xml.alias("sitemap_xml")).select(
        "doc_id",
        F.explode(parsers.sitemap_locs(F.col("sitemap_xml"))).alias("url"),
    )
    canon = text.canonicalize_urls(links).select(
        "doc_id", F.col("norm_url").alias("url"), "host"
    )
    checked = text.robots_allowed(
        canon, text.parse_robots(robots), agent="bot", broadcast=True
    )
    return checked.filter(F.col("allowed")).select(
        "doc_id", F.col("url").alias("norm_url"), "host"
    )


# the q_bpe_tokenize / q_bpe_roundtrip / q_token_budget_bpe Spark-side vocab
# (a-z base + 29 merged tokens).  ONE definition so the three queries can
# never drift from each other or from q_token_budget_bpe's oracle, which
# replays exactly these tokens; the DuckDB VALUES copies in oracle_sql()
# stay inlined BY DESIGN (oracle independence).
def _first_words(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, text truncated to the first n whitespace words) — the
    one truncation every BPE-fixture driver query uses.  The incremental
    batch-replay queries alias their one-shot twins' oracles, so twin
    and replay MUST truncate identically; one definition makes that
    structural."""
    return docs.select(
        "doc_id",
        F.array_join(
            F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, n), " "
        ).alias("text"),
    )


def _bpe_fixture_vocab() -> dict[str, int]:
    vocab = {chr(97 + i): i for i in range(26)}
    for t in (
        "th", "he", "the", "ta", "ab", "le", "tab", "table", "va", "al",
        "ue", "val", "value", "ar", "row", "sc", "an", "scan", "fa", "st",
        "fast", "ke", "key", "pa", "rt", "part", "ha", "sh", "hash",
    ):
        vocab[t] = len(vocab)
    return vocab


def q_bpe_tokenize(spark: SparkSession, sf: str) -> DataFrame:
    """Subword tokenization (operators/bpe.py bpe_encode, mode='longest'):
    greedy longest-match BPE encoding of each document's first 10 words
    against a fixed 55-token vocab (a-z base + 29 merged tokens), exploded
    to one (doc_id, pos, token_id) row per emitted token.  The Python
    kernel runs over DISTINCT word forms only (one Arrow crossing); the
    corpus-side explode/join/re-assembly is pure Catalyst.  The oracle
    replays the greedy longest-prefix algorithm independently in SQL via
    a recursive CTE over the same literal vocab — integer-exact.
    Reference tokenizes via tiktoken's learned BPE (xpacks/llm/
    splitters.py:76-89); this is that capability as an engine operator."""
    from pathwaydataframework_spark.operators import bpe

    docs = load_table(spark, sf, "documents").df
    trunc = _first_words(docs, 10)
    vocab = _bpe_fixture_vocab()
    enc = bpe.bpe_encode(trunc, vocab, mode="longest")
    return enc.select(
        "doc_id", F.posexplode("token_ids").alias("pos", "token_id")
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("pos").cast("long").alias("pos"),
        F.col("token_id").cast("long").alias("token_id"),
    )


# the q_bpe_merges contract, shared between the Spark query and the oracle:
# ranked merge rules (Sennrich order) and the vocab they induce (a-z = 0..25,
# merge k's concatenation = 26+k)
_BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("a", "b"), ("ab", "l"), ("e", "s"),
    ("l", "e"), ("o", "r"), ("a", "n"), ("t", "i"), ("ti", "o"),
    ("tio", "n"), ("s", "c"), ("sc", "an"), ("r", "o"), ("ro", "w"),
]


def q_bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    """Exact merge-rank BPE replay (operators/bpe.py bpe_encode
    mode='merges' — the Sennrich/tiktoken contract: apply the
    lowest-rank applicable merge, leftmost on ties, until none applies;
    reference tokenizes via tiktoken's ranked encodings,
    xpacks/llm/splitters.py:76-89).  Each document's first 6 words plus
    a PLANTED out-of-alphabet word ('x' + digit + '!') are encoded, so
    the unk_id=-1 path is driver-pinned, not just unit-tested: the
    digit and '!' have no vocab entry and must surface as -1 without
    dropping the rest of the word.  The oracle replays the ranked merge
    list independently in SQL (recursive CTE over symbol lists with a
    rank-map argmin per step) — integer-exact."""
    from pathwaydataframework_spark.operators import bpe

    docs = load_table(spark, sf, "documents").df
    d = F.col("doc_id")
    planted = _first_words(docs, 6).select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" x"), d % 10, F.lit("!")).alias("text"),
    )
    vocab = bpe.bpe_vocab(
        _BPE_MERGES, alphabet="abcdefghijklmnopqrstuvwxyz"
    )
    enc = bpe.bpe_encode(planted, vocab, mode="merges", merges=_BPE_MERGES)
    return enc.select(
        "doc_id", F.posexplode("token_ids").alias("pos", "token_id")
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("pos").cast("long").alias("pos"),
        F.col("token_id").cast("long").alias("token_id"),
    )


def q_crawl_delay(spark: SparkSession, sf: str) -> DataFrame:
    """The robots discovery loop a real crawler runs (text.
    robots_directives — the Crawl-delay and Sitemap lines parse_robots
    excludes from rule matching — feeding parsers.sitemap_locs →
    text.canonicalize_urls): each host's planted robots.txt declares a
    per-host Crawl-delay and a Sitemap URL; the sitemap fetch is modeled
    as a join on the declared URL against a planted (url, xml) frame;
    the sitemap's <loc> (www/mixed-case/utm_-tracked) canonicalizes; the
    output frontier carries the politeness delay alongside each
    discovered URL.  Oracle derives host, delay and canonical URL
    independently from doc_id arithmetic."""
    from pathwaydataframework_spark.operators import parsers

    docs = load_table(spark, sf, "documents").df
    d = F.col("doc_id")
    host = F.concat(F.lit("h"), d, F.lit(".test"))
    robots = docs.select(
        "doc_id",
        host.alias("host"),
        F.concat(
            F.lit("User-agent: *\nCrawl-delay: "), d % 7 + 1,
            F.lit("\nDisallow: /private\nSitemap: https://h"), d,
            F.lit(".test/sm.xml"),
        ).alias("robots_txt"),
    )
    directives = text.robots_directives(robots)
    delays = directives.filter(F.col("directive") == "crawl-delay").select(
        "host", F.expr("try_cast(value AS LONG)").alias("crawl_delay")
    )
    sitemap_urls = directives.filter(F.col("directive") == "sitemap").select(
        F.col("value").alias("sitemap_url")
    )
    # the modeled fetch: sitemap content keyed by its robots-declared URL
    fetched = docs.select(
        F.concat(F.lit("https://h"), d, F.lit(".test/sm.xml")).alias("sitemap_url"),
        F.concat(
            F.lit("<urlset><url><loc>https://WWW.H"), d, F.lit(".test/Page"),
            d, F.lit("?utm_source=x&id="), d, F.lit("</loc></url></urlset>"),
        ).alias("xml"),
    )
    locs = sitemap_urls.join(fetched, on="sitemap_url").select(
        F.explode(parsers.sitemap_locs(F.col("xml"))).alias("url")
    )
    canon = text.canonicalize_urls(locs).select(
        F.col("norm_url"), F.col("host")
    )
    return canon.join(delays, on="host").select(
        "host", "crawl_delay", "norm_url"
    )


def q_bpe_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer inverse (operators/bpe.py bpe_decode — tiktoken's
    ``decode`` as an engine operator): each document's first 8 words
    encode (greedy longest-match, q_bpe_tokenize vocab: full a-z base,
    so the encoding is lossless) and decode back.  The oracle never
    touches BPE at all — it states the roundtrip CONTRACT directly:
    decode(encode(x)) = x with whitespace removed (the encoder's
    whitespace pre-tokenization is the only lossy step).  Decode is
    pure Catalyst: id->token table join + ordered doc-keyed
    re-assembly, no map literal, no Python.

    r9 adds the LOSSLESS mode (VERDICT r8 stretch): a second pipeline
    encodes with ``space_marker`` (GPT-2's Ġ word-boundary symbol —
    non-initial words carry it inside the tokens) and decodes with the
    same marker, so ``text_exact`` = the original words WITH their
    spaces — full identity against the whitespace-normalized input,
    not just the concatenation contract."""
    from pathwaydataframework_spark.operators import bpe

    docs = load_table(spark, sf, "documents").df
    trunc = _first_words(docs, 8)
    vocab = _bpe_fixture_vocab()
    enc = bpe.bpe_encode(trunc, vocab, mode="longest")
    lossy = bpe.bpe_decode(enc, vocab).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    marker = "Ġ"
    mvocab = dict(vocab)
    for t in (marker, marker + "t", marker + "th", marker + "the"):
        mvocab[t] = len(mvocab)
    enc_m = bpe.bpe_encode(trunc, mvocab, mode="longest", space_marker=marker)
    exact = bpe.bpe_decode(enc_m, mvocab, space_marker=marker).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("text").alias("text_exact"),
    )
    return lossy.join(exact, on="doc_id").select(
        "doc_id", "text", "text_exact"
    )


def q_robots_wildcards(spark: SparkSession, sf: str) -> DataFrame:
    """RFC 9309 wildcard rule matching (text.robots_allowed r8: '*' =
    any character run, trailing '$' = end-of-URL anchor, LIKE
    metacharacters in rule paths literal — each rule compiled to a SQL
    LIKE pattern matched JVM-side in the per-host rule array).  Four
    hosts exercise the four pattern shapes ('/*.php$' + longer Allow
    override, mid-pattern '/a*b', literal %/_ in '/p%2Aq_x', exact
    '/exact$'); docs with even doc_id//4 hit the Disallow, odd ones
    miss it (the quotient's parity — doc_id%2 would be constant within
    a doc_id%4 host class), so the oracle derives every verdict from
    doc_id arithmetic."""
    robots = spark.createDataFrame(
        [
            ("w0.test", "User-agent: *\nDisallow: /*.php$\nAllow: /pub*.php$"),
            ("w1.test", "User-agent: *\nDisallow: /a*b"),
            ("w2.test", "User-agent: *\nDisallow: /p%2Aq_x"),
            ("w3.test", "User-agent: *\nDisallow: /exact$"),
        ],
        "host string, robots_txt string",
    )
    docs = load_table(spark, sf, "documents").df
    d = F.col("doc_id")
    g = d % 4
    even = F.expr("doc_id div 4") % 2 == 0
    path = (
        F.when(g == 0, F.when(even, F.concat(F.lit("/dir/pg"), d, F.lit(".php")))
               .otherwise(F.concat(F.lit("/pub"), d, F.lit(".php"))))
        .when(g == 1, F.when(even, F.concat(F.lit("/a"), d, F.lit("b")))
              .otherwise(F.concat(F.lit("/x"), d)))
        .when(g == 2, F.when(even, F.concat(F.lit("/p%2Aq_x/y"), d))
              .otherwise(F.concat(F.lit("/pX2Aq_x/"), d)))
        .otherwise(F.when(even, F.lit("/exact"))
                   .otherwise(F.concat(F.lit("/exact/"), d)))
    )
    urls = docs.select(
        "doc_id",
        F.concat(F.lit("https://w"), g, F.lit(".test"), path).alias("url"),
    )
    out = text.robots_allowed(urls, text.parse_robots(robots))
    return out.select("doc_id", "url", "allowed")


def q_fetch_schedule(spark: SparkSession, sf: str) -> DataFrame:
    """Per-host politeness pacing (text.schedule_fetches — the step after
    the robots gate): 20 hosts' URL queues get deterministic md5-order
    positions and fetch offsets honoring each host's Crawl-delay
    (fetch_offset_s = fetch_seq * delay; hosts h10..h19 carry no delay
    row and pace at the 1 s default).  No global sort and no per-host
    single-partition window — the 256-shard monotone layout of
    deterministic_shuffle, grouped by host, so a hot host spreads over
    all shards.  Oracle replays the queue with a per-host row_number
    over the same md5 order."""
    docs = load_table(spark, sf, "documents").df
    d = F.col("doc_id")
    g = d % 20
    frontier = docs.select(
        "doc_id",
        F.concat(F.lit("h"), g, F.lit(".test")).alias("host"),
        F.concat(F.lit("https://h"), g, F.lit(".test/p"), d).alias("url"),
    )
    delays = docs.filter(d < 10).select(
        F.concat(F.lit("h"), d, F.lit(".test")).alias("host"),
        (d % 7 + 1).cast("long").alias("crawl_delay"),
    )
    out = text.schedule_fetches(frontier, delays, seed=3)
    return out.select("doc_id", "host", "url", "fetch_seq", "fetch_offset_s")


def q_fetch_waves(spark: SparkSession, sf: str) -> DataFrame:
    """Dispatch waves from politeness offsets (text.fetch_waves — the
    step that CONSUMES schedule_fetches' fetch_offset_s, VERDICT r8
    item 5): wave = floor(offset / 10 s), the batch a crawler fires per
    tick, plus the per-(host, wave) batch size for connection-pool
    sizing.  Same 20-host fixture as q_fetch_schedule, with a planted
    NON-NUMERIC Crawl-delay ('fast') on hosts h5..h9 — try_cast inside
    schedule_fetches nulls it out and those hosts pace at the 1 s
    default (VERDICT r8 item 7, pinned in driver data).  One window
    count partitioned by (host, wave); groups bounded by window_s/delay
    — no join, no global sort.  Oracle replays the md5 queue, the
    try_cast fallback, and the floor/count independently."""
    docs = load_table(spark, sf, "documents").df
    d = F.col("doc_id")
    g = d % 20
    frontier = docs.select(
        "doc_id",
        F.concat(F.lit("h"), g, F.lit(".test")).alias("host"),
        F.concat(F.lit("https://h"), g, F.lit(".test/p"), d).alias("url"),
    )
    delays = docs.filter(d < 10).select(
        F.concat(F.lit("h"), d, F.lit(".test")).alias("host"),
        F.when(d < 5, (d % 7 + 1).cast("string"))
        .otherwise(F.lit("fast"))
        .alias("crawl_delay"),
    )
    sched = text.schedule_fetches(frontier, delays, seed=3)
    out = text.fetch_waves(sched, 10.0)
    return out.select(
        "doc_id", "host", "fetch_seq", "wave", "wave_size"
    )


def q_token_budget_bpe(spark: SparkSession, sf: str) -> DataFrame:
    """Token budgets in TOKENS, not chars (r7 advice): bpe_encode's
    n_tokens composes with sampling.token_budget_sample — "keep the
    first N BPE tokens of each language" is the actual recipe step the
    char-count proxy stood in for.  Each doc's first 10 words encode
    against the q_bpe_tokenize vocab (greedy longest-match); the
    per-lang md5-ordered prefix keeps docs while the running BPE-token
    total stays ≤ 1500.  Plan: the budget scan stays the 256-shard
    monotone prefix-sum (no global sort); the oracle recomputes
    n_tokens with the UNK-safe recursive CTE and replays the window in
    SQL."""
    from pathwaydataframework_spark.operators import bpe, sampling

    docs = load_table(spark, sf, "documents").df
    # _first_words keeps this query's truncation pinned to
    # q_bpe_tokenize's (their oracles share the longest-match replay);
    # lang is re-joined below, so the trunc frame doesn't carry it
    trunc = _first_words(docs, 10)
    vocab = _bpe_fixture_vocab()
    enc = bpe.bpe_encode(trunc, vocab, mode="longest").select(
        "doc_id", "n_tokens"
    )
    with_lang = enc.join(docs.select("doc_id", "lang"), on="doc_id")
    out = sampling.token_budget_sample(
        with_lang, "doc_id", "n_tokens", budget=1500, by="lang", seed=7
    )
    return out.select("doc_id", "lang", "n_tokens", "cum_tokens")


def q_train_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """The REAL tokenize-to-train composition (VERDICT r8 item 2): the
    pipeline a user actually runs — bpe_encode(append_eos_id) over
    documents → pack_no_straddle on the REAL n_tokens →
    materialize_sequences — with no synthetic token arrays anywhere, so
    a join-key or EOS-accounting bug BETWEEN the stages shows up here.
    Each doc's first 8 words encode against the fixture vocab with
    EOS=55 appended; the boundary-respecting pack at cap 32 (some docs
    exceed it — the oversized path carries real data); the writer emits
    tokens, the doc_spans boundary map, and the oversized flag.  The
    oracle composes the three proven replays: the UNK-safe longest-match
    CTE (q_bpe_tokenize's) for per-doc ids, the (fill, seq) recurrence
    CTE (q_pack_no_straddle's) for the layout, and string_agg
    re-assembly (q_pack_materialize's) for the sequences."""
    from pathwaydataframework_spark.operators import bpe, packing

    docs = load_table(spark, sf, "documents").df
    trunc = _first_words(docs, 8)
    vocab = _bpe_fixture_vocab()
    # r14: lazy pin — enc feeds both the pack fold and the materialize
    # join; unpinned, the tokenize chain runs twice in one job (§1.2)
    enc = bpe.bpe_encode(
        trunc, vocab, mode="longest", append_eos_id=55
    ).localCheckpoint(eager=False)
    layout = packing.pack_no_straddle(enc, "doc_id", "n_tokens", 32, shards=16)
    seqs = packing.materialize_sequences(
        enc, layout, max_tokens=32, pad_id=-1
    )
    return _train_seq_select(seqs)


def q_train_cut(spark: SparkSession, sf: str) -> DataFrame:
    """The concatenate-and-cut twin of q_train_sequences: REAL BPE ids
    (first 8 words + EOS 55) through pack_by_offset →
    materialize_sequences_by_offset at cap 48 — documents straddle cuts
    and their id arrays are sliced, so a join-key, EOS-accounting or
    slicing bug between the real encoder and the by-offset writer shows
    up here (q_pack_cut's synthetic repeated-id arrays can't see a
    misordered slice: every piece of a doc looks the same).  Every
    19th doc's text is planted EMPTY (r10): with EOS appended it
    encodes to the single token [55], pinning that an empty document
    still KEEPS its slot in the by-offset layout when the encoder
    appends EOS — the contract partner of the writers' zero-token
    rules (materialize_sequences keeps a len=0 span, by-offset drops
    the truly token-less doc; both pinned in
    tests/test_pipeline_ops.py).  Oracle: the longest-match CTE
    (re-pointed at the planted source) numbers each doc's ids (wp, k
    order), EOS appended at index n+1, the shard window cumsum gives
    global positions, cut at 48; spans re-derived as per-(seq, doc)
    position groups."""
    from pathwaydataframework_spark.operators import bpe, packing

    docs = load_table(spark, sf, "documents").df
    planted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 19 == 0, F.lit(""))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    trunc = _first_words(planted, 8)
    vocab = _bpe_fixture_vocab()
    # r14: lazy pin — enc feeds both the by-offset layout and the
    # by-offset writer; unpinned, the tokenize chain runs twice (§1.2)
    enc = bpe.bpe_encode(
        trunc, vocab, mode="longest", append_eos_id=55
    ).localCheckpoint(eager=False)
    layout = packing.pack_by_offset(enc, "doc_id", "n_tokens", 48, shards=8)
    seqs = packing.materialize_sequences_by_offset(enc, layout, 48)
    return seqs.select(
        "shard",
        "seq_id",
        F.array_join("token_ids", ",").alias("tokens"),
        "n_tokens",
        _spans_str().alias("spans"),
    )


def _pack_fixture_seqs(spark: SparkSession, sf: str):
    """The shared q_train_masks / q_pack_efficiency fixture: doc d packs
    (d%13+1) copies of its own id, no-straddle at cap 16 over 8 md5
    shards, materialized padded — ONE definition so the two queries and
    their shared fold-replay oracles can never drift."""
    from pathwaydataframework_spark.operators import packing

    docs = load_table(spark, sf, "documents").df
    d = F.col("doc_id")
    toks = docs.select(
        "doc_id",
        (d % 13 + 1).cast("long").alias("n_tok"),
        F.array_repeat(d.cast("long"), (d % 13 + 1).cast("int")).alias(
            "token_ids"
        ),
    )
    layout = packing.pack_no_straddle(toks, "doc_id", "n_tok", 16, shards=8)
    return packing.materialize_sequences(
        toks, layout, max_tokens=16, pad_id=-1
    )


def q_train_masks(spark: SparkSession, sf: str) -> DataFrame:
    """Per-token trainer inputs from doc_spans (packing.training_masks —
    what the r9 span metadata exists FOR): position_ids restart at every
    document boundary, segment_ids index the doc within its sequence,
    padding gets (0, -1) — the block-diagonal attention/loss-mask
    recipe, pure Catalyst over the packed frame.  Fixture: doc d packs
    (d%13+1) copies of its own id at cap 16 (no-straddle), so the
    oracle replays the (fill, seq) recurrence and states each
    sequence's position/segment streams as per-doc range()/repeat
    strings in offset order."""
    from pathwaydataframework_spark.operators import packing

    seqs = _pack_fixture_seqs(spark, sf)
    m = packing.training_masks(seqs)
    return m.select(
        "shard",
        "seq_id",
        F.array_join("position_ids", ",").alias("positions"),
        F.array_join("segment_ids", ",").alias("segments"),
        "n_tokens",
    )


def q_pack_efficiency(spark: SparkSession, sf: str) -> DataFrame:
    """Padding-waste accounting (packing.packing_efficiency — the number
    a training-data team watches: every padded slot is a wasted FLOP):
    per shard over the q_train_masks fixture's packed output, the
    sequence count, real tokens, padded slots, oversized count and both
    waste views (whole consumed grid, and the capped grid alone — the
    alarm metric an oversized-heavy source can't dilute) — one
    map-side-combined aggregation over the sequence table.  Oracle
    replays the (fill, seq) recurrence and aggregates the same
    quantities from the layout alone (each sequence's n_tokens = sum of
    its docs' counts)."""
    from pathwaydataframework_spark.operators import packing

    seqs = _pack_fixture_seqs(spark, sf)
    return packing.packing_efficiency(seqs, 16).select(
        "shard", "n_seqs", "real_tokens", "padded_slots",
        "oversized_seqs", "waste_frac", "capped_waste_frac",
    )


def _id_halves(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a doc frame into two id-ordered 'micro-batches' (all of
    batch 1's ids below batch 2's) — the arrival order under which the
    incremental operators are contractually byte-identical to their
    one-shot twins, so the batch-replay queries can share oracles."""
    cut = df.agg(F.max("doc_id")).first()[0] // 2
    return df.filter(F.col("doc_id") <= cut), df.filter(F.col("doc_id") > cut)


def q_pack_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """The STREAMING pack fold, driver-checked against the one-shot
    oracle (packing.pack_no_straddle_incremental): two id-ordered
    batches through the per-shard (next_seq, open_fill) state — batch
    2's first docs keep filling batch 1's open sequences — and the
    union must replay the identical recursive (fill, seq) recurrence
    the q_pack_no_straddle oracle steps.  Any cross-batch state bug
    (the r9-ADVICE NULL-fill crash class) breaks the shared replay."""
    from pathwaydataframework_spark.operators import packing, text as text_ops

    docs = load_table(spark, sf, "documents").df
    with_counts = docs.select(
        "doc_id", text_ops.token_count(F.col("text")).alias("n_tok")
    )
    b1, b2 = _id_halves(with_counts)
    p1, st = packing.pack_no_straddle_incremental(
        b1, packing.pack_state(spark), "doc_id", "n_tok", 256, shards=64
    )
    p2, _ = packing.pack_no_straddle_incremental(
        b2, st, "doc_id", "n_tok", 256, shards=64
    )
    return p1.unionByName(p2)


def q_bpe_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """The STREAMING BPE encode, driver-checked against the one-shot
    oracle (bpe.bpe_encode_incremental): batch 1 populates the word→ids
    table, batch 2 anti-joins it and encodes only NEW forms — and the
    union must equal the greedy longest-match replay q_bpe_tokenize's
    oracle states per doc (a word form encodes identically forever, so
    the split is semantically invisible; a stale or corrupted word
    table is not)."""
    from pathwaydataframework_spark.operators import bpe

    docs = load_table(spark, sf, "documents").df
    trunc = _first_words(docs, 10)
    vocab = _bpe_fixture_vocab()
    b1, b2 = _id_halves(trunc)
    enc1, wt = bpe.bpe_encode_incremental(b1, bpe.bpe_word_table(spark), vocab)
    # checkpoint the batch-1 output before deriving batch 2 from the
    # word table, or the final union re-runs batch 1's encode kernel
    # through the un-checkpointed lineage (same discipline as
    # q_train_stream / the streaming tests)
    enc1 = enc1.localCheckpoint()
    enc2, _ = bpe.bpe_encode_incremental(b2, wt.localCheckpoint(), vocab)
    enc = enc1.unionByName(enc2)
    return enc.select(
        "doc_id", F.posexplode("token_ids").alias("pos", "token_id")
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("pos").cast("long").alias("pos"),
        F.col("token_id").cast("long").alias("token_id"),
    )


def _stream_tokenize_pack(
    spark: SparkSession,
    batches: list[DataFrame],
    *,
    first_n: int,
    cap: int,
    shards: int,
) -> DataFrame:
    """The shared incremental tokenize-to-train tail (q_train_stream and
    q_recipe_stream — ONE copy of the state/checkpoint discipline, so a
    fold-fix lands in both drivers at once): each id-ordered (doc_id,
    text) batch runs bpe_encode_incremental(EOS 55, fixture vocab) →
    pack_no_straddle_incremental → materialize_sequences_incremental
    with the word table, pack state and open rows folding forward;
    closed sequences emit per batch and the open tails flush at the
    end.  The word table needs no caller-side checkpoint —
    bpe_encode_incremental returns it already localCheckpoint'ed."""
    from pathwaydataframework_spark.operators import bpe, packing

    vocab = _bpe_fixture_vocab()
    wt = bpe.bpe_word_table(spark)
    ps = packing.pack_state(spark)
    orows = packing.open_rows_state(spark)
    parts = []
    for b in batches:
        enc, wt = bpe.bpe_encode_incremental(
            _first_words(b, first_n), wt, vocab, append_eos_id=55
        )
        enc = enc.localCheckpoint()
        packed, ps = packing.pack_no_straddle_incremental(
            enc, ps, "doc_id", "n_tokens", cap, shards=shards
        )
        emitted, orows = packing.materialize_sequences_incremental(
            packed, enc, orows, ps, max_tokens=cap, pad_id=-1
        )
        parts.append(emitted)
        orows = orows.localCheckpoint()
    seqs = packing.materialize_sequences(
        orows.select("doc_id", "token_ids"),
        orows.select("doc_id", "shard", "seq_id", "start_offset"),
        max_tokens=cap,
        pad_id=-1,
    )
    for p in parts:
        seqs = seqs.unionByName(p)
    return seqs


def q_train_stream(spark: SparkSession, sf: str) -> DataFrame:
    """The FULL incremental tokenize-to-train chain, driver-checked
    against the one-shot oracle: per id-ordered batch,
    bpe_encode_incremental → pack_no_straddle_incremental →
    materialize_sequences_incremental with all THREE states folding
    forward (word table, pack state, open rows), closed sequences
    emitted per batch and the open tails flushed at the end — the union
    must equal q_train_sequences' one-shot replay exactly (tokens,
    counts, spans, oversized).  This is the streaming surface the
    3-batch tests pin, now under the driver's DuckDB gate."""
    docs = load_table(spark, sf, "documents").df
    seqs = _stream_tokenize_pack(
        spark, list(_id_halves(docs)), first_n=8, cap=32, shards=16
    )
    return _train_seq_select(seqs)


def q_pack_export(spark: SparkSession, sf: str) -> DataFrame:
    """The TERMINAL export step under the oracle gate (VERDICT r9 item
    2): run the q_train_sequences pipeline, write_packed_dataset it to
    a scratch dir (partitionBy(shard) parquet + _manifest.json), then
    READ THE PARQUET BACK and return the on-disk rows joined with the
    manifest file's per-shard stats — so the write→read round-trip
    (array/struct columns, the shard partition column, in-file order)
    and the manifest arithmetic (packing_efficiency over the WRITTEN
    files, JSON-serialized and re-parsed) must both be invisible
    against the composed q_train_sequences replay plus the
    q_pack_efficiency-style per-shard aggregation.  The dataset lands
    in TWO calls — even seq_ids written, odd seq_ids APPENDED — so the
    append path (prior-manifest contract validation, stats recomputed
    from the on-disk union, not the second call's input) sits under
    the oracle too: a stats-from-input bug would halve every count.
    The read-back is localCheckpoint'ed so the scratch dir can be
    removed before the driver collects; the manifest frame is
    shards-sized and broadcast.  Reference terminal persistence is
    io.fs/deltalake write
    (/root/reference/python/pathway/io/fs/__init__.py); the manifest is
    the Spark-native loader-contract analogue."""
    import shutil
    import tempfile

    from pathwaydataframework_spark.operators import bpe, packing

    docs = load_table(spark, sf, "documents").df
    trunc = _first_words(docs, 8)
    # r14: lazy pin — enc feeds both the pack fold and the materialize
    # join (§1.2); seqs' own eager checkpoint below stays, because seqs
    # really is consumed twice (the even-seq write + the odd-seq append)
    enc = bpe.bpe_encode(
        trunc, _bpe_fixture_vocab(), mode="longest", append_eos_id=55
    ).localCheckpoint(eager=False)
    layout = packing.pack_no_straddle(enc, "doc_id", "n_tokens", 32, shards=16)
    seqs = packing.materialize_sequences(
        enc, layout, max_tokens=32, pad_id=-1
    ).localCheckpoint()
    tmp = tempfile.mkdtemp(prefix="pw_pack_export_")
    try:
        half = F.col("seq_id") % 2
        packing.write_packed_dataset(
            seqs.filter(half == 0), tmp, max_tokens=32
        )
        packing.write_packed_dataset(
            seqs.filter(half == 1), tmp, max_tokens=32, mode="append"
        )
        # read back through the LOADER (r10): read_packed_dataset
        # reconstructs the schema from the on-disk manifest (the JSON
        # serialize/re-parse round-trip rides along) and its
        # validate=True gate re-counts the files against the manifest
        # totals before any row is returned
        ondisk, manifest = packing.read_packed_dataset(
            spark, tmp, validate=True
        )
        ondisk = ondisk.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    mstats = spark.createDataFrame(
        [
            (
                int(r["shard"]),
                int(r["n_seqs"]),
                int(r["real_tokens"]),
                int(r["padded_slots"]),
                int(r["oversized_seqs"]),
                None if r["waste_frac"] is None else float(r["waste_frac"]),
                None
                if r["capped_waste_frac"] is None
                else float(r["capped_waste_frac"]),
            )
            for r in manifest["shards"]
        ],
        "shard long, m_n_seqs long, m_real_tokens long, m_padded_slots long,"
        " m_oversized_seqs long, m_waste_frac double, m_capped_waste_frac double",
    )
    return ondisk.join(F.broadcast(mstats), on="shard").select(
        "shard",
        "seq_id",
        F.array_join("token_ids", ",").alias("tokens"),
        "n_tokens",
        _spans_str().alias("spans"),
        "oversized",
        "m_n_seqs",
        "m_real_tokens",
        "m_padded_slots",
        "m_oversized_seqs",
        "m_waste_frac",
        "m_capped_waste_frac",
    )


def q_pack_slices(spark: SparkSession, sf: str) -> DataFrame:
    """The TRAINER-facing loader contract under the oracle gate (VERDICT
    r10 item 3): write the q_train_sequences pipeline as a packed
    dataset, then read it back as the three rank slices a world_size=3
    data-parallel job would consume (packing.read_packed_slices) and
    return their tagged union — so the rank rule (shard % world_size,
    partition-pruned at the scan), the no-shuffle order contract
    (position = prefix-sum-of-manifest-n_seqs + per-shard row_number,
    which must equal row_number over ascending (shard, seq_id) within
    the rank), and mid-epoch resume (rank 1 passes skip_seqs=2 — its
    first two positions are absent, the rest keep absolute epoch
    positions) are all stated independently by the SQL replay.
    Disjointness and completeness are implied by the hash gate: the
    union must equal the replay exactly — a duplicated or dropped
    sequence changes the row set.  The epoch_seed re-permutation is
    pinned in tests/test_pipeline_ops.py (its md5 order is
    q_shuffle's already-verified contract).  Reference loader surface
    is io.fs read (/root/reference/python/pathway/io/fs/__init__.py);
    rank sharding is the Spark-native distributed-trainer analogue."""
    return _pack_slices_union(spark, sf, world=3, skip_by_rank={1: 2})


def _pack_slices_union(
    spark: SparkSession,
    sf: str,
    *,
    world: int,
    skip_by_rank: dict,
    epoch_seed: int | None = None,
    equalize: bool = False,
    epochs: tuple[int, ...] | None = None,
) -> DataFrame:
    """Shared body of q_pack_slices / q_pack_slices_epoch /
    q_train_epochs: write the q_train_sequences pipeline as a packed
    dataset, read every (epoch ×) rank slice back through the batched
    loader (packing.read_packed_epochs — row-identical to unioning
    read_packed_slices per rank, pinned in tests/test_pipeline_ops.py), and
    return the tagged union — ONE copy of the fixture pipeline so the
    driver queries can never desynchronize from the shared
    _TRAIN_SEQ_SELECT oracle.  With ``epochs`` set, each epoch's
    permutation seed is the epoch number, the union gains an ``epoch``
    tag column, and ``skip_by_rank`` is keyed by ``(epoch, rank)``
    instead of ``rank`` — the multi-epoch training loop.

    r15: the per-(epoch, rank) read_packed_slices loop ran the position
    machinery once per slice — 17 AQE jobs for the 2×2 union at r14 —
    and validated each rank with its own count+sum scan.
    read_packed_epochs computes every slice's positions in ONE plan
    over ONE scan and validates all ranks in ONE aggregate (guide
    §1.2/§2.4); outputs proven row-identical, and the per-rank API
    itself is unchanged for trainer callers."""
    import shutil
    import tempfile

    from pathwaydataframework_spark.operators import bpe, packing

    docs = load_table(spark, sf, "documents").df
    trunc = _first_words(docs, 8)
    # r14: pin the ENCODED frame, not the materialized sequences — enc
    # is the frame consumed twice (the pack fold reads its counts, the
    # materialize join reads its ids), so this is the one checkpoint
    # that halves the tokenize work; seqs itself is consumed exactly
    # once (the parquet write; manifest stats re-read the WRITTEN
    # files), so the old seqs.localCheckpoint was a whole extra
    # materialization pass that deduplicated nothing (guide §1.2/§5)
    enc = bpe.bpe_encode(
        trunc, _bpe_fixture_vocab(), mode="longest", append_eos_id=55
    ).localCheckpoint(eager=False)
    layout = packing.pack_no_straddle(enc, "doc_id", "n_tokens", 32, shards=16)
    seqs = packing.materialize_sequences(
        enc, layout, max_tokens=32, pad_id=-1
    )
    tmp = tempfile.mkdtemp(prefix="pw_pack_slices_")
    try:
        packing.write_packed_dataset(seqs, tmp, max_tokens=32)
        union, _info = packing.read_packed_epochs(
            spark, tmp, world, epochs=epochs, epoch_seed=epoch_seed,
            skip_seqs=skip_by_rank, equalize=equalize,
        )
        union = union.localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return union.select(
        *(["epoch"] if epochs is not None else []),
        "rank",
        "position",
        "shard",
        "seq_id",
        F.array_join("token_ids", ",").alias("tokens"),
        "n_tokens",
        _spans_str().alias("spans"),
        "oversized",
    )


def q_pack_equalize(spark: SparkSession, sf: str) -> DataFrame:
    """The loader's EQUALIZE mode under the oracle gate: the same
    packed dataset read as world_size=2 rank slices with
    ``equalize=True`` — every rank keeps only its first
    ``min(rank_seqs)`` writer-order positions, the distributed-sampler
    remedy that makes all ranks take the same step count so fixed-step
    collective ops can never desynchronize.  The SQL replay states the
    cutoff independently: the scalar min over per-rank counts, applied
    as ``position < m`` — so both the per-rank numbering AND the
    cross-rank minimum arithmetic must match.  The engine computes the
    cutoff from manifest arithmetic alone (no extra scan —
    packing.read_packed_slices docstring)."""
    return _pack_slices_union(
        spark, sf, world=2, skip_by_rank={}, equalize=True
    )


def q_pack_slices_epoch(spark: SparkSession, sf: str) -> DataFrame:
    """The loader's EPOCH-SHUFFLE path under the oracle gate: the same
    packed dataset as q_pack_slices, read as world_size=2 rank slices
    with ``epoch_seed=7`` — positions come from deterministic_shuffle
    over the ``shard:seq_id`` key (md5(key:seed) ascending, the exact
    q_shuffle contract, computed via the 256-monotone-prefix-shard
    layout, never a global sort) — and rank 0 resuming mid-epoch at
    ``skip_seqs=3``, so the SQL replay independently states that the
    skipped rows are precisely the first three of the SHUFFLED order
    with absolute positions kept.  Together with q_pack_slices this
    puts both order contracts (writer order, epoch permutation) and
    both resume forms under the driver's hash gate."""
    return _pack_slices_union(
        spark, sf, world=2, skip_by_rank={0: 3}, epoch_seed=7
    )


def q_train_epochs(spark: SparkSession, sf: str) -> DataFrame:
    """The MULTI-EPOCH trainer capstone (VERDICT r11 item 4): the full
    loop a fixed-step data-parallel job runs — one packed dataset, two
    ranks, two EPOCHS, each epoch read through
    ``read_packed_slices(epoch_seed=e, equalize=True)``, with rank 0
    resuming mid-epoch inside epoch 1 at ``skip_seqs=3`` — returned as
    one union tagged ``(epoch, rank)``.  The SQL replay states every
    piece of the composition independently: the per-epoch md5
    permutation (``md5(shard:seq_id:epoch)`` ascending per rank — the
    q_shuffle contract, so epochs 0 and 1 MUST come out as different
    layouts of the same slice), the equalize cutoff as the cross-rank
    minimum count (seed-independent — the engine derives it from
    manifest arithmetic once, both epochs inherit it), and the resume
    filter as "the first three positions of EPOCH 1's shuffled order"
    (absolute positions kept).  A loader that leaked one epoch's
    permutation into the other, re-derived the cutoff per seed, or
    applied the resume skip in the wrong epoch's order hash-mismatches
    here.  The cross-epoch invariants a trainer relies on (layouts
    differ, each epoch's non-equalized row multiset identical, the
    equalized tail rotates with the seed) are pinned in
    tests/test_pipeline_ops.py.  Reference loader surface is io.fs
    read (/root/reference/python/pathway/io/fs/__init__.py); the epoch
    loop is the Spark-native distributed-trainer analogue."""
    return _pack_slices_union(
        spark, sf, world=2, skip_by_rank={(1, 0): 3}, equalize=True,
        epochs=(0, 1),
    )


def q_length_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Length-homogeneous micro-batching for the UNPACKED (SFT-style)
    training path (packing.bucket_by_length): bucket documents by byte
    length under boundaries (64, 256, 1024) — lengths above the last
    boundary land in the open bucket with a NULL pad target — order
    each bucket by the md5(doc_id:5) epoch shuffle (the q_shuffle
    order contract, PER BUCKET, via the 256-monotone-prefix layout —
    never a global sort), and number batch_id/slot off that order with
    ragged tails dropped (the fixed-shape contract compiled kernels
    want).  The SQL replay independently re-derives the bucket
    expression, the per-bucket md5 permutation, the ragged cutoff
    (count // batch * batch) and the pad target — so homogeneity,
    epoch determinism, and the fixed-shape contract all sit under the
    driver's hash gate.  Reference has no batching surface (its engine
    streams rows); this is the Spark-native trainer-prep analogue
    alongside read_packed_slices."""
    from pathwaydataframework_spark.operators import packing

    docs = load_table(spark, sf, "documents").df
    src = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.octet_length("text").cast("long").alias("n_bytes")
    )
    out = packing.bucket_by_length(
        src, "doc_id", "n_bytes", boundaries=(64, 256, 1024),
        batch_size=8, seed=5, drop_ragged=True,
    )
    return out.select(
        "doc_id", "n_bytes", "bucket", "batch_id", "slot", "cap"
    )


def q_bucket_boundaries(spark: SparkSession, sf: str) -> DataFrame:
    """Quantile-driven bucket boundaries (packing.suggest_boundaries —
    VERDICT r13 item 3, closing the last manual knob in the SFT path):
    equal-frequency percentile_disc boundaries over the EXACT document
    byte-length distribution, 8 buckets.  Boundary k is the smallest
    length whose cumulative count reaches k/8 of the total, decided
    with exact integer arithmetic (cum*8 >= k*total — no float
    quantile fractions), and boundary 8 is the exact max so the
    suggestion covers the distribution (no open bucket).  The SQL
    replay independently re-derives the distinct-length histogram, the
    cumulative counts and the same integer-exact quantile probe, so
    the whole percentile_disc arithmetic sits under the driver's hash
    gate.  Scale shape: one shuffle to a distinct-lengths frame, a
    window over that bounded frame, and an 8-row broadcast probe —
    nothing corpus-sized past the first aggregate.  Reference has no
    batching surface (its engine streams rows); this is the
    Spark-native trainer-prep analogue alongside bucket_by_length."""
    from pathwaydataframework_spark.operators import packing

    docs = load_table(spark, sf, "documents").df
    src = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.octet_length("text").cast("long").alias("n_bytes")
    )
    return packing.suggest_boundaries(src, "n_bytes", 8)


def q_sft_batches(spark: SparkSession, sf: str) -> DataFrame:
    """The SFT PADDED-BATCH capstone (VERDICT r12 item 3):
    packing.materialize_padded_batches composes bucket_by_length into
    the fixed-shape tensors an instruction-tuning trainer feeds a
    compiled kernel — documents tokenized to deterministic ids
    (ascii(first char)*100 + length per whitespace word, replayable in
    both engines), bucketed under (16, 32, 64) with batch_size 4 and
    the md5(doc_id:7) epoch order, then each row padded to its batch's
    ONE pad target (the bucket boundary; the batch max in the open
    bucket) with pad_id -1, an attention mask (1 real / 0 pad) and a
    loss mask zero over the prompt third (prompt_len = n//3 + 1) and
    padding.  The SQL replay independently re-derives the bucket
    expression, the per-bucket permutation, the ragged cutoff, the
    open-bucket window max, and every padded id and mask BIT as
    strings — so shape homogeneity AND tensor content sit under the
    driver's hash gate.  This closes the unpacked-training story the
    way q_train_epochs closes the packed one (reference has no
    batching surface — its engine streams rows; same stance as
    read_packed_slices)."""
    from pathwaydataframework_spark.operators import packing

    docs = load_table(spark, sf, "documents").df
    src = _sft_tokenized(docs)
    out = packing.materialize_padded_batches(
        src, "doc_id", "toks", boundaries=(16, 32, 64), batch_size=4,
        seed=7, pad_id=-1, prompt_len_col="plen",
    )
    return out.select(
        "doc_id",
        "bucket",
        "batch_id",
        "slot",
        "pad_len",
        F.array_join("input_ids", ",").alias("input_ids"),
        F.concat_ws("", F.col("attention_mask").cast("array<string>")).alias(
            "attn"
        ),
        F.concat_ws("", F.col("loss_mask").cast("array<string>")).alias(
            "loss"
        ),
    )


def q_sft_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """The STREAMING SFT batching twin (VERDICT r12 stretch):
    packing.bucket_by_length_incremental over two id-ordered
    micro-batches threading the (bucket, n_so_far) counter state —
    the batch-replay pattern of q_pack_incremental.  The numbering
    contract under test: bucket assignment is stateless; within each
    bucket, batch 2's rows take ordinals starting exactly at batch 1's
    count (sealed batches never renumber — appends only fill the open
    tail), so the union equals a one-shot numbering in the COMPOSITE
    order (arrival half, then md5(doc_id:5) within the half, id
    tie-break) — which the oracle states with one window.  The
    deliberate deviation from q_length_buckets' global md5 order (a
    global shuffle would interleave arrivals into sealed batches) is
    the operator's documented streaming contract; the parquet-resume
    proof lives in
    test_bucket_by_length_incremental_seal_and_parquet_resume."""
    from pathwaydataframework_spark.operators import packing

    docs = load_table(spark, sf, "documents").df
    src = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.octet_length("text").cast("long").alias("n_bytes")
    )
    b1, b2 = _id_halves(src)
    o1, st = packing.bucket_by_length_incremental(
        b1, packing.bucket_state(spark), "doc_id", "n_bytes",
        boundaries=(64, 256, 1024), batch_size=8, seed=5,
    )
    o1 = o1.localCheckpoint()
    o2, _ = packing.bucket_by_length_incremental(
        b2, st.localCheckpoint(), "doc_id", "n_bytes",
        boundaries=(64, 256, 1024), batch_size=8, seed=5,
    )
    return o1.unionByName(o2).select(
        "doc_id", "n_bytes", "bucket", "batch_id", "slot", "cap"
    )


def _sft_tokenized(docs: DataFrame) -> DataFrame:
    """The q_sft_batches / q_sft_stream shared tokenization (ONE
    definition so the twins can never desynchronize from their oracles
    — the _recipe_planted pattern): per doc, deterministic word ids
    ascii(first char)*100 + CHARACTER length per whitespace word
    (replayable in DuckDB as ascii(w)*100 + length(w)), and the SFT
    prompt length n//3 + 1."""
    words = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"),
        lambda w: F.length(w) > 0,
    )
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.transform(
            words, lambda w: (F.ascii(w) * 100 + F.length(w)).cast("long")
        ).alias("toks"),
    ).withColumn(
        "plen", (F.floor(F.size("toks") / 3) + 1).cast("long")
    )


def q_sft_epochs(spark: SparkSession, sf: str) -> DataFrame:
    """The multi-epoch loop for the UNPACKED path — the q_train_epochs
    symmetry for SFT: q_length_buckets' batching run for epochs {0, 1}
    with ``seed = epoch`` and unioned under an epoch tag.  The oracle
    re-derives BOTH per-epoch permutations independently (one window
    partitioned by (epoch, bucket) over md5(doc_id:epoch)), so the
    cross-epoch contract a trainer relies on sits under the hash gate:
    bucket membership (and therefore the ragged cutoff and every pad
    target) is seed-INDEPENDENT — only the order within each bucket
    re-permutes between epochs.  (The rotation property itself —
    different seeds actually move rows — is pinned in
    test_bucket_by_length_contract.)"""
    from pathwaydataframework_spark.operators import packing

    docs = load_table(spark, sf, "documents").df
    src = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.octet_length("text").cast("long").alias("n_bytes")
    )
    union = None
    for epoch in (0, 1):
        out = packing.bucket_by_length(
            src, "doc_id", "n_bytes", boundaries=(64, 256, 1024),
            batch_size=8, seed=epoch, drop_ragged=True,
        ).withColumn("epoch", F.lit(epoch).cast("long"))
        union = out if union is None else union.unionByName(out)
    return union.select(
        "epoch", "doc_id", "n_bytes", "bucket", "batch_id", "slot", "cap"
    )


def q_sft_stream(spark: SparkSession, sf: str) -> DataFrame:
    """The STREAMING padded-batch twin
    (packing.materialize_padded_batches_incremental): q_sft_batches'
    tokenization fed as two id-ordered micro-batches through the
    counter state, BOUNDED buckets only (rows past the last boundary
    drop up front — the open bucket's batch-max pad target is
    append-unstable by definition, so the streaming form refuses it),
    pad_len always the bucket cap so every emitted tensor is final on
    emit (pinned bit-identical under appends in
    test_materialize_padded_batches_incremental_stable_tensors).  The
    oracle states the composite (arrival half, md5-within-half) order
    AND every padded id and mask bit — the q_sft_incremental numbering
    replay composed with the q_sft_batches tensor replay."""
    from pathwaydataframework_spark.operators import packing

    docs = load_table(spark, sf, "documents").df
    src = _sft_tokenized(docs)
    b1, b2 = _id_halves(src)
    o1, st = packing.materialize_padded_batches_incremental(
        b1, packing.bucket_state(spark), "doc_id", "toks",
        boundaries=(16, 32, 64), batch_size=4, seed=7, pad_id=-1,
        prompt_len_col="plen",
    )
    o1 = o1.localCheckpoint()
    o2, _ = packing.materialize_padded_batches_incremental(
        b2, st.localCheckpoint(), "doc_id", "toks",
        boundaries=(16, 32, 64), batch_size=4, seed=7, pad_id=-1,
        prompt_len_col="plen",
    )
    out = o1.unionByName(o2)
    return out.select(
        "doc_id",
        "bucket",
        "batch_id",
        "slot",
        "pad_len",
        F.array_join("input_ids", ",").alias("input_ids"),
        F.concat_ws("", F.col("attention_mask").cast("array<string>")).alias(
            "attn"
        ),
        F.concat_ws("", F.col("loss_mask").cast("array<string>")).alias(
            "loss"
        ),
    )


def q_recipe(spark: SparkSession, sf: str) -> DataFrame:
    """The full-corpus-recipe CAPSTONE (VERDICT r9 item 3): the pipeline
    a data team actually runs, composed in ONE driver row — plant page
    structure → c4_filter (line cleaning + page rules) → keep →
    dedup_lines_global (corpus-wide boilerplate collapse) →
    bpe_encode(EOS) → pack_no_straddle → materialize_sequences — so a
    filter-changes-the-id-set bug BETWEEN cleaning and packing, or a
    dedup-order bug surfacing in token space, shows up here.

    Planted per doc: its original (punctuation-less, hence dropped)
    text line, a doc-specific opener built from its first 4 words, a
    short junk line (c4-dropped), ONE corpus-wide cookie-banner line
    (c4-kept, then line-dedup'd down to the smallest kept doc_id), and
    a doc-specific closer; docs with doc_id%11==0 get 'lorem ipsum'
    page poison, %13==0 a brace — both c4-dropped, changing the id set
    mid-pipeline.  The first 12 post-dedup words then encode (EOS 55)
    and pack at cap 64 — for the one doc that KEPT the banner line,
    words 9-12 differ from everyone else's, so the dedup outcome is
    pinned in token space, not just text.  Oracle: the planted CASE,
    the proven c4 replay, the proven line-dedup replay, the
    longest-match CTE re-pointed at the post-dedup corpus, and the
    (fill, seq) fold — all existing pieces composed in one
    WITH RECURSIVE."""
    from pathwaydataframework_spark.operators import bpe, packing
    from pathwaydataframework_spark.operators import text as text_ops

    docs = load_table(spark, sf, "documents").df
    planted = _recipe_planted(docs)
    cleaned = text_ops.c4_filter(planted)
    kept = cleaned.filter(F.col("kept")).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    deduped = dedup.dedup_lines_global(kept, "doc_id", "text")
    corpus = deduped.select("doc_id", F.col("clean_text").alias("text"))
    trunc = _first_words(corpus, 12)
    # r14: pin the encoded frame (lazily — it materializes inside the
    # first job that needs it, no dedicated checkpoint job): enc feeds
    # BOTH the pack fold and the materialize join, and without the pin
    # the whole c4_filter → line-dedup → tokenize chain above runs twice
    # in the same job (guide §1.2: don't compute things twice)
    enc = bpe.bpe_encode(
        trunc, _bpe_fixture_vocab(), mode="longest", append_eos_id=55
    ).localCheckpoint(eager=False)
    layout = packing.pack_no_straddle(enc, "doc_id", "n_tokens", 64, shards=16)
    seqs = packing.materialize_sequences(enc, layout, max_tokens=64, pad_id=-1)
    return _train_seq_select(seqs)


def _recipe_planted(docs: DataFrame) -> DataFrame:
    """The q_recipe page-structure planting (shared with
    q_recipe_stream, which replays the SAME corpus through the
    incremental chain and aliases the same oracle — one definition so
    the twins can never drift): per doc, its original punctuation-less
    line, a doc-specific opener from its first 4 words, a junk short
    line, the corpus-wide cookie-banner line, a doc-specific closer,
    and lorem-ipsum / brace page poison on doc_id %11 / %13."""
    d = F.col("doc_id")
    first4 = F.array_join(
        F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 4), " "
    )
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\n"),
            first4,
            F.lit(" opens document "),
            d.cast("string"),
            F.lit(" cleanly.\nshort line.\n"),
            F.lit("every page shares this exact cookie banner line.\n"),
            F.lit("document "),
            d.cast("string"),
            F.lit(" closes with a tidy sentence!"),
            F.when(d % 11 == 0, F.lit("\nlorem ipsum tail"))
            .when(d % 13 == 0, F.lit("\nbrace { tail"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )


def _train_seq_select(seqs: DataFrame) -> DataFrame:
    """The shared driver projection for packed-sequence frames."""
    return seqs.select(
        "shard",
        "seq_id",
        F.array_join("token_ids", ",").alias("tokens"),
        "n_tokens",
        _spans_str().alias("spans"),
        "oversized",
    )


def q_recipe_stream(spark: SparkSession, sf: str) -> DataFrame:
    """The full corpus recipe as a STREAM — q_recipe's pipeline run as
    two id-ordered micro-batches with FOUR state frames folding
    forward: the line index (incremental_line_dedup — later batches
    dedup against earlier batches' kept lines), the BPE word table,
    the pack state, and the writer's open rows; closed sequences emit
    per batch, open tails flush at the end, and the union must equal
    q_recipe's one-shot replay exactly (shared oracle — the
    q_train_stream pattern extended from the tokenize-to-train tail to
    the WHOLE recipe).  For id-ordered arrivals every stage's
    incremental form is contractually identical to its one-shot twin
    (line dedup keeps the smallest (doc_id, idx) occurrence either
    way), so a state-ordering or fold bug in ANY of the four states
    breaks the shared replay."""
    from pathwaydataframework_spark.operators import text as text_ops

    docs = load_table(spark, sf, "documents").df
    halves = list(_id_halves(_recipe_planted(docs)))
    lines = spark.createDataFrame([], "line string")
    prepared = []
    for i, b in enumerate(halves):
        cleaned = text_ops.c4_filter(b)
        kept = cleaned.filter(F.col("kept")).select(
            "doc_id", F.col("clean_text").alias("text")
        )
        deduped = dedup.incremental_line_dedup(
            kept, lines, id_col="doc_id", text_col="text"
        ).localCheckpoint()
        if i + 1 < len(halves):  # the last fold would never be read
            lines = (
                lines.unionByName(
                    dedup.line_index(deduped, text_col="clean_text")
                )
                .distinct()
                .localCheckpoint()
            )
        prepared.append(
            deduped.select("doc_id", F.col("clean_text").alias("text"))
        )
    seqs = _stream_tokenize_pack(
        spark, prepared, first_n=12, cap=64, shards=16
    )
    return _train_seq_select(seqs)


def q_epoch_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Epoch-ordered packing (VERDICT r9 item 4): a trainer consumes
    sequences in the EPOCH SHUFFLE order, not id order — so pack on
    deterministic_shuffle's dense global ``position`` as the order key
    (it is the honest id: deterministic, dense, epoch-seeded).  Doc d
    carries (d%13+1) copies of its own id; shuffle(seed=2) assigns
    positions; pack_no_straddle folds in POSITION order per md5(position)
    shard and materialize_sequences rebuilds the padded sequences —
    token values are doc_ids, so a misordered layout shows up in
    sequence CONTENT, not just metadata.  Spans are position-keyed
    (position:off:len).  Oracle: the q_shuffle md5-permutation replay
    composed with the (fill, seq) recurrence ordered by position.
    Two-epoch disjointness + token-multiset identity is pinned in
    tests/test_pipeline_ops.py."""
    from pathwaydataframework_spark.operators import packing, sampling

    docs = load_table(spark, sf, "documents").df
    d = F.col("doc_id")
    base = docs.select(
        "doc_id",
        (d % 13 + 1).cast("long").alias("n_tok"),
        F.array_repeat(d.cast("long"), (d % 13 + 1).cast("int")).alias(
            "token_ids"
        ),
    )
    # r14: lazy pin — the epoch frame feeds both the layout fold and the
    # materialize join; unpinned, deterministic_shuffle's whole position
    # machinery (counts agg + offset prefix sum + rank window) ran once
    # per consumer (the census' "appears once per consumer" note) (§1.2)
    shuffled = sampling.deterministic_shuffle(
        base, "doc_id", seed=2
    ).localCheckpoint(eager=False)
    layout = packing.pack_no_straddle(
        shuffled, "position", "n_tok", 16, shards=8
    )
    seqs = packing.materialize_sequences(
        shuffled, layout, id_col="position", max_tokens=16, pad_id=-1
    )
    spans = F.array_join(
        F.transform(
            "doc_spans",
            lambda s: F.concat_ws(":", s["position"], s["off"], s["len"]),
        ),
        ";",
    )
    return seqs.select(
        "shard",
        "seq_id",
        F.array_join("token_ids", ",").alias("tokens"),
        "n_tokens",
        spans.alias("spans"),
        "oversized",
    )


def q_wave_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Accumulated dispatch-wave sizes across micro-batches
    (text.fetch_waves_incremental + wave_counts_state — the r10
    follow-on to q_fetch_waves): the q_fetch_waves fixture split into
    two id-ordered batches through schedule_fetches_incremental, each
    batch's waves folded into the (host, wave, n) state, and the FINAL
    state returned.  Per-URL seq assignment differs between the
    incremental and one-shot schedules (each batch orders its own md5
    queue), but each host's seq SET is 0..n-1 either way — so the wave
    COUNT state is batch-invariant and the oracle states it directly:
    seq by any per-host order, wave = floor(seq·delay / 10), count per
    (host, wave).  The try_cast fallback rides along (hosts h5..h9
    declare the non-numeric 'fast' → 1 s default)."""
    from pathwaydataframework_spark.operators import text as text_ops

    docs = load_table(spark, sf, "documents").df
    d = F.col("doc_id")
    g = d % 20
    frontier = docs.select(
        "doc_id",
        F.concat(F.lit("h"), g, F.lit(".test")).alias("host"),
        F.concat(F.lit("https://h"), g, F.lit(".test/p"), d).alias("url"),
    )
    delays = docs.filter(d < 10).select(
        F.concat(F.lit("h"), d, F.lit(".test")).alias("host"),
        F.when(d < 5, (d % 7 + 1).cast("string"))
        .otherwise(F.lit("fast"))
        .alias("crawl_delay"),
    )
    counts = text_ops.host_fetch_counts(spark)
    wc = text_ops.wave_counts_state(spark)
    for b in _id_halves(frontier):
        sched, counts = text_ops.schedule_fetches_incremental(
            b, counts, delays, seed=3
        )
        # the schedule feeds both the wave rows and the wave delta —
        # checkpoint so the md5-queue window runs once per batch
        sched = sched.localCheckpoint()
        _, wc = text_ops.fetch_waves_incremental(sched, wc, 10.0)
        counts = counts.localCheckpoint()
        wc = wc.localCheckpoint()
    return wc.select("host", "wave", "n")


def q_extract_links(spark: SparkSession, sf: str) -> DataFrame:
    """HTML link extraction for frontier building (parsers.extract_links:
    regexp_extract_all over href attributes, double- then single-quoted,
    case-insensitive).  HTML is planted from doc_id — one absolute
    double-quoted link (uppercase HREF every 3rd doc) and one
    root-relative single-quoted link per doc; the oracle derives both
    link sets from the same arithmetic."""
    from pathwaydataframework_spark.operators.parsers import extract_links

    docs = load_table(spark, sf, "documents").df
    d = F.col("doc_id")
    attr = F.when(d % 3 == 0, F.lit("HREF")).otherwise(F.lit("href"))
    html = F.concat(
        F.lit("<html><a "), attr, F.lit('="https://site'), d % 7,
        F.lit(".com/page"), d, F.lit('">t</a><p>x</p>'),
        F.lit("<a href='/rel/"), d, F.lit("'>r</a></html>"),
    )
    planted = docs.select("doc_id", html.alias("html"))
    return planted.select(
        "doc_id", F.explode(extract_links(F.col("html"))).alias("link")
    )


def q_token_budget(spark: SparkSession, sf: str) -> DataFrame:
    """token-budget truncation per language (sampling.token_budget_sample):
    deterministic md5 order per lang, keep the prefix whose running
    n_chars total stays ≤ 8000 — the "N tokens of source X" recipe step.
    No global sort: 256 hash-monotone shards + broadcast shard offsets
    (the deterministic_shuffle layout with SUM instead of COUNT)."""
    from pathwaydataframework_spark.operators import sampling

    docs = load_table(spark, sf, "documents").df
    out = sampling.token_budget_sample(
        docs, "doc_id", "n_chars", budget=8000, by="lang", seed=5
    )
    return out.select("doc_id", "lang", "n_chars", "cum_tokens")


def q_bloom_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter incremental dedup (dedup.bloom_dedup — BFF-style):
    the seen corpus (docs with doc_id%4==0, keyed by md5(text)) is
    summarized once into a 2^18-bit bitmap FRAME (bit_or-packed 64-bit
    words, broadcastable, persistable); the incoming batch is pruned by
    the broadcast bitmap and the surviving candidates are exactly
    confirmed against the corpus — so despite the probabilistic filter in
    the middle, the result is EXACTLY the anti-join the oracle states."""
    docs = load_table(spark, sf, "documents").df
    keyed = docs.withColumn("__key", F.md5("text"))
    seen = keyed.filter(F.col("doc_id") % 4 == 0)
    out = dedup.bloom_dedup(keyed, seen, "__key", m_bits=1 << 18, k=5)
    return out.select("doc_id", "n_chars")


def q_gopher_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """the full Gopher repetition gate (all 11 published thresholds over
    line + n-gram metrics; text.gopher_repetition_filter).  Planted
    structure: every 7th doc gains a duplicated line, every 9th is doubled
    (docs divisible by 63 get both) so both metric families fire."""
    docs = load_table(spark, sf, "documents").df
    base = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.col("text"), F.lit("\nsame dup line here\nsame dup line here")),
    ).otherwise(F.col("text"))
    planted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 9 == 0, F.concat_ws(" ", base, base))
        .otherwise(base)
        .alias("text"),
    )
    return text.gopher_repetition_filter(planted)


def q_quality_sample(spark: SparkSession, sf: str) -> DataFrame:
    """curriculum sampling: bin documents by n_chars and keep each quality
    bin at its own deterministic rate (operators/sampling.py
    quality_binned_sample) — upsample long docs, keep a tail trickle."""
    from pathwaydataframework_spark.operators import sampling

    docs = load_table(spark, sf, "documents").df
    return sampling.quality_binned_sample(
        docs, "doc_id", "n_chars", edges=[200.0, 400.0], rates=[0.1, 0.5, 1.0], seed=11
    ).select("doc_id", "quality_bin")


def q_unigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """per-doc mean unigram log-probability under the corpus's own unigram
    model (CCNet-style LM-proxy quality score; operators/text.py).  The
    mean is computed as an exact decimal sum of round-6 logps so partial-
    aggregation order cannot flip the 6th decimal vs the oracle."""
    docs = load_table(spark, sf, "documents").df
    return text.unigram_logprob(docs)


def q_windowby_predicate(spark: SparkSession, sf: str) -> DataFrame:
    """session(predicate=...) through the REFERENCE call shape
    windowby(...).reduce(...) (wired in r4; _window.py:595) with full
    reducer generality — the decimal-exact mean the (col, kind) dict API
    of q_session_predicate cannot express."""
    ev = load_table(spark, sf, "events")
    ssum = R.sum(pw.cast("decimal(18,6)", pw.this.value.num.round(6)))
    out = ev.windowby(
        pw.this.ts,
        window=pw.session(predicate=lambda a, b: (b - a).total_seconds() <= 600),
        instance=pw.this.user_id,
    ).reduce(
        n=R.count(),
        avg_value=(pw.cast("double", ssum) / R.count()).num.round(6),
    )
    return out.df.select(
        F.col("_pw_window_start").alias("session_start"),
        F.col("_pw_window_end").alias("session_end"),
        "user_id",
        "n",
        "avg_value",
    )


def q_chained_join(spark: SparkSession, sf: str) -> DataFrame:
    """chained Joinable joins (reference joins.py:493 — JoinResult.join):
    nation → customer → orders chained WITHOUT intermediate selects, then
    groupby over the chain with original-table refs; decimal-exact sum."""
    nation = load_table(spark, sf, "nation")
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    out = (
        nation.join(cust, pw.left.n_nationkey == pw.right.c_nationkey)
        .join(orders, cust.c_custkey == orders.o_custkey)
        .groupby(nation.n_name)
        .reduce(
            n_orders=R.count(),
            total=pw.cast(
                "double", R.sum(pw.cast("decimal(18,2)", orders.o_totalprice))
            ).num.round(2),
        )
    )
    return out.df


def q_window_numeric(spark: SparkSession, sf: str) -> DataFrame:
    """tumbling window over NUMERIC event time (reference windows accept
    int/float time; operators/temporal.py numeric k-th-stable-window path)
    — hourly buckets over epoch seconds, integer window bounds."""
    ev = load_table(spark, sf, "events")
    evn = ev.select(
        pw.this.event_type, pw.this.value, t=pw.this.ts.dt.timestamp()
    )
    out = evn.windowby(
        pw.this.t,
        window=pw.tumbling(duration=3600),
        instance=pw.this.event_type,
    ).reduce(n=R.count(), sum_value=R.sum(pw.this.value).num.round(6))
    return out.df.select(
        F.col("_pw_window_start").cast("long").alias("w_start"),
        "event_type",
        "n",
        "sum_value",
    )


def q_join_instance(spark: SparkSession, sf: str) -> DataFrame:
    """join(..., left_instance=, right_instance=): same-day view/click pairs
    per user.  The instance pair folds into the equi-key set (reference
    internals/joins.py:965-967), so the shuffle co-partitions by
    (user_id, day) and no cross-day pair is ever materialized."""
    events = load_table(spark, sf, "events")
    views = events.filter(pw.this.event_type == "view").select(
        pw.this.user_id, pw.this.event_id, day=pw.this.ts.dt.day()
    )
    clicks = events.filter(pw.this.event_type == "click").select(
        pw.this.user_id, pw.this.event_id, day=pw.this.ts.dt.day()
    )
    joined = (
        views.join(
            clicks,
            pw.left.user_id == pw.right.user_id,
            left_instance=views.day,
            right_instance=clicks.day,
        )
        .groupby(pw.left.user_id, pw.left.day)
        .reduce(
            n_pairs=R.count(),
            first_view=R.min(pw.left.event_id),
            first_click=R.min(pw.right.event_id),
        )
    )
    return joined.df


# ---------------------------------------------------------------------------
# registry


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # NOTE on ordering: the driver's correctness gate walks this dict in
    # insertion order and may stop at a fixed budget (r2 checked exactly the
    # first 50 of 71).  Queries without a driver-green CORRECTNESS row yet are
    # listed FIRST so every registered query earns a driver row across rounds.
    return {
        # --- r15 front (50-row driver budget; VERDICT r14 item 8):
        # the 46 queries whose latest driver row is r12 — this pulls
        # the r14-optimized q_bpe_*, q_train_* and q_pack_* families
        # back under the driver's oracle — then 4 r13-stale queries
        # whose code paths the r15 optimizations touch (minhash
        # collapse engine, bm25 stats attach incl. its DocumentStore
        # and hybrid-RRF consumers) to the exact 50 budget.
        "q01_pricing_summary": q01_pricing_summary,
        "q03_shipping_priority": q03_shipping_priority,
        "q05_region_revenue": q05_region_revenue,
        "q_argmax_supplier": q_argmax_supplier,
        "q_asof_now": q_asof_now,
        "q_asof_right": q_asof_right,
        "q_audio_features": q_audio_features,
        "q_audio_spectral": q_audio_spectral,
        "q_bigram_logprob": q_bigram_logprob,
        "q_bloom_dedup": q_bloom_dedup,
        "q_boilerplate": q_boilerplate,
        "q_bpe_incremental": q_bpe_incremental,
        "q_bpe_merges": q_bpe_merges,
        "q_bpe_roundtrip": q_bpe_roundtrip,
        "q_bpe_tokenize": q_bpe_tokenize,
        "q_c4_filter": q_c4_filter,
        "q_corpus_dedup": q_corpus_dedup,
        "q_crawl_delay": q_crawl_delay,
        "q_domain_quota": q_domain_quota,
        "q_dsir": q_dsir,
        "q_extract_links": q_extract_links,
        "q_fetch_schedule": q_fetch_schedule,
        "q_fetch_waves": q_fetch_waves,
        "q_frontier": q_frontier,
        "q_image_dedup": q_image_dedup,
        "q_json_props": q_json_props,
        "q_leakage_split": q_leakage_split,
        "q_length_buckets": q_length_buckets,
        "q_louvain_levels": q_louvain_levels,
        "q_pack_cut": q_pack_cut,
        "q_pack_efficiency": q_pack_efficiency,
        "q_pack_incremental": q_pack_incremental,
        "q_pack_materialize": q_pack_materialize,
        "q_quality_classifier": q_quality_classifier,
        "q_rerank": q_rerank,
        "q_robots": q_robots,
        "q_sliding_chunks": q_sliding_chunks,
        "q_token_budget": q_token_budget,
        "q_train_epochs": q_train_epochs,
        "q_train_masks": q_train_masks,
        "q_train_sequences": q_train_sequences,
        "q_train_stream": q_train_stream,
        "q_url_dedup": q_url_dedup,
        "q_url_normalize": q_url_normalize,
        "q_warc_ingest": q_warc_ingest,
        "q_winnow": q_winnow,
        # --- r13-stale fill: r15-touched code paths ---
        "q_minhash_lsh": q_minhash_lsh,
        "q_bm25": q_bm25,
        "q_doc_retrieve": q_doc_retrieve,
        "q_hybrid_rrf": q_hybrid_rrf,
        # --- latest driver row r13: behind the cap this round;
        # rotates forward in r16. ---
        "q_asof_join": q_asof_join,
        "q_asof_nearest": q_asof_nearest,
        "q_chained_join": q_chained_join,
        "q_concat_reindex": q_concat_reindex,
        "q_concat_split": q_concat_split,
        "q_custom_reducer": q_custom_reducer,
        "q_decontam": q_decontam,
        "q_domain_filter": q_domain_filter,
        "q_embedding_outliers": q_embedding_outliers,
        "q_epoch_pack": q_epoch_pack,
        "q_error_channel": q_error_channel,
        "q_frame_sample": q_frame_sample,
        "q_gopher_quality": q_gopher_quality,
        "q_gopher_repetition": q_gopher_repetition,
        "q_incremental_neardup": q_incremental_neardup,
        "q_interval_outer": q_interval_outer,
        "q_kmeans": q_kmeans,
        "q_line_dedup": q_line_dedup,
        "q_louvain": q_louvain,
        "q_mix_datasets": q_mix_datasets,
        "q_orders_dates": q_orders_dates,
        "q_pack_export": q_pack_export,
        "q_pack_sequences": q_pack_sequences,
        "q_part_strings": q_part_strings,
        "q_pii_scrub": q_pii_scrub,
        "q_quality_sample": q_quality_sample,
        "q_recipe": q_recipe,
        "q_recipe_stream": q_recipe_stream,
        "q_repetition": q_repetition,
        "q_semdedup": q_semdedup,
        "q_session_predicate": q_session_predicate,
        "q_sft_batches": q_sft_batches,
        "q_sft_epochs": q_sft_epochs,
        "q_sft_incremental": q_sft_incremental,
        "q_sft_stream": q_sft_stream,
        "q_shuffle": q_shuffle,
        "q_span_dedup": q_span_dedup,
        "q_stratified_sample": q_stratified_sample,
        "q_temperature_sample": q_temperature_sample,
        "q_train_cut": q_train_cut,
        "q_train_split": q_train_split,
        "q_unigram_logprob": q_unigram_logprob,
        "q_unique_any": q_unique_any,
        "q_vocab": q_vocab,
        "q_wave_counts": q_wave_counts,
        # --- latest driver row r14 (freshest — very back) ---
        "q_assign_shards": q_assign_shards,
        "q_audio_dedup": q_audio_dedup,
        "q_bellman_ford": q_bellman_ford,
        "q_bucket_boundaries": q_bucket_boundaries,
        "q_connected_components": q_connected_components,
        "q_dedup_exact": q_dedup_exact,
        "q_deduplicate_latest": q_deduplicate_latest,
        "q_diff_values": q_diff_values,
        "q_embedding_pairs": q_embedding_pairs,
        "q_eval_schedule": q_eval_schedule,
        "q_flatten_tokens": q_flatten_tokens,
        "q_fuzzy_match": q_fuzzy_match,
        "q_interpolate": q_interpolate,
        "q_intersect": q_intersect,
        "q_interval_join": q_interval_join,
        "q_intervals_over": q_intervals_over,
        "q_ix_lookup": q_ix_lookup,
        "q_join_instance": q_join_instance,
        "q_knn_bruteforce": q_knn_bruteforce,
        "q_knn_ivf": q_knn_ivf,
        "q_knn_lsh": q_knn_lsh,
        "q_lang_id": q_lang_id,
        "q_media_meta": q_media_meta,
        "q_ngram_jaccard": q_ngram_jaccard,
        "q_pack_equalize": q_pack_equalize,
        "q_pack_no_straddle": q_pack_no_straddle,
        "q_pack_slices": q_pack_slices,
        "q_pack_slices_epoch": q_pack_slices_epoch,
        "q_pagerank": q_pagerank,
        "q_percentile": q_percentile,
        "q_prev_next": q_prev_next,
        "q_reducer_matrix": q_reducer_matrix,
        "q_robots_wildcards": q_robots_wildcards,
        "q_set_difference": q_set_difference,
        "q_simhash": q_simhash,
        "q_sorted_names": q_sorted_names,
        "q_sql_passthrough": q_sql_passthrough,
        "q_text_stats": q_text_stats,
        "q_token_budget_bpe": q_token_budget_bpe,
        "q_token_splitter": q_token_splitter,
        "q_tokenize": q_tokenize,
        "q_topk_orders": q_topk_orders,
        "q_update_cells": q_update_cells,
        "q_update_rows": q_update_rows,
        "q_window_join": q_window_join,
        "q_window_numeric": q_window_numeric,
        "q_window_session": q_window_session,
        "q_window_sliding": q_window_sliding,
        "q_window_tumbling": q_window_tumbling,
        "q_windowby_predicate": q_windowby_predicate,
    }


def _repetition_oracle_sql(
    top_ns: tuple[int, ...] = (2, 3), dup_ns: tuple[int, ...] = (5, 10)
) -> str:
    """DuckDB twin of text.repetition_metrics over the q_repetition planted
    corpus: per-n gram streams (multiplicity kept), top gram by
    (count, length) lexicographic max, duplicated-gram chars summed."""
    ns = sorted(set(top_ns) | set(dup_ns))
    gram_selects = [
        f"""
            SELECT doc_id, chars, {n} AS n,
                   unnest(CASE WHEN len(t) >= {n} THEN list_transform(
                       range(1, len(t) - {n - 2}),
                       i -> array_to_string(t[i:i+{n - 1}], ' '))
                   ELSE []::VARCHAR[] END) AS gram
            FROM toks"""
        for n in ns
    ]
    out_cols = []
    for n in top_ns:
        out_cols.append(
            f"round(coalesce(max(CASE WHEN n = {n} THEN "
            f"top.cnt * top.glen / chars END), 0), 6) AS top{n}_char_frac"
        )
    for n in dup_ns:
        out_cols.append(
            f"round(coalesce(max(CASE WHEN n = {n} THEN "
            f"dupchars / chars END), 0), 6) AS dup{n}_char_frac"
        )
    return f"""
        WITH planted AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 9 = 0 THEN text || ' ' || text
                   ELSE text END AS text
            FROM documents
        ), toks AS (
            SELECT doc_id, length(text)::DOUBLE AS chars,
                   regexp_split_to_array(trim(text), '\\s+') AS t
            FROM planted
        ), grams AS ({" UNION ALL ".join(gram_selects)}
        ), counted AS (
            SELECT doc_id, chars, n, gram, count(*) AS cnt
            FROM grams GROUP BY ALL
        ), per_n AS (
            SELECT doc_id, chars, n,
                   max(struct_pack(cnt := cnt,
                                   glen := length(gram)::DOUBLE)) AS top,
                   sum(CASE WHEN cnt > 1 THEN cnt * length(gram)
                       ELSE 0 END)::DOUBLE AS dupchars
            FROM counted GROUP BY ALL
        ), pivoted AS (
            SELECT doc_id, {", ".join(out_cols)}
            FROM per_n GROUP BY doc_id
        )
        SELECT d.doc_id,
               {", ".join(f"coalesce(p.top{n}_char_frac, 0.0) AS top{n}_char_frac" for n in top_ns)},
               {", ".join(f"coalesce(p.dup{n}_char_frac, 0.0) AS dup{n}_char_frac" for n in dup_ns)}
        FROM documents d LEFT JOIN pivoted p USING (doc_id)
    """


def _bigram_logprob_oracle_sql(lam: float = 0.7) -> str:
    """q_bigram_logprob oracle.  The interpolation weights are emitted
    with full float repr ((1.0 - 0.7) != 0.3 in binary) so both engines
    compute bit-identical probabilities before the round-6."""
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                               t -> length(t) > 0) AS t
            FROM documents
        ), uni AS (
            SELECT term, count(*) AS uc
            FROM (SELECT unnest(t) AS term FROM toks) GROUP BY 1
        ), tot AS (
            SELECT sum(uc)::DOUBLE AS total FROM uni
        ), bg_stream AS (
            SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM (
                SELECT doc_id, unnest(
                    CASE WHEN len(t) >= 2 THEN list_transform(
                        range(1, len(t)), i -> {{'w1': t[i], 'w2': t[i+1]}})
                    ELSE []::STRUCT(w1 VARCHAR, w2 VARCHAR)[] END) AS s
                FROM toks
            )
        ), bg AS (
            SELECT w1, w2, count(*) AS bc FROM bg_stream GROUP BY 1, 2
        ), scored_bg AS (
            SELECT doc_id,
                   round(ln({lam!r} * bc / c1.uc
                            + {(1.0 - lam)!r} * c2.uc / total),
                         6)::DECIMAL(18,9) AS lp
            FROM bg_stream
            JOIN bg USING (w1, w2)
            JOIN uni c1 ON bg_stream.w1 = c1.term
            JOIN uni c2 ON bg_stream.w2 = c2.term, tot
        ), firsts AS (
            SELECT doc_id, t[1] AS term FROM toks WHERE len(t) > 0
        ), scored_first AS (
            SELECT doc_id, round(ln(uc / total), 6)::DECIMAL(18,9) AS lp
            FROM firsts JOIN uni USING (term), tot
        ), s AS (
            SELECT * FROM scored_bg UNION ALL SELECT * FROM scored_first
        ), m AS (
            SELECT doc_id, round(sum(lp)::DOUBLE / count(*), 6) AS mean_logp
            FROM s GROUP BY doc_id
        )
        SELECT d.doc_id, m.mean_logp
        FROM documents d LEFT JOIN m USING (doc_id)
    """


def _gopher_repetition_oracle_sql() -> str:
    """q_gopher_repetition oracle: the planted corpus (line dups at %7,
    doc doubling at %9), full Gopher n-gram metric set, line metrics, and
    the 11-threshold verdict — mirrors text.gopher_repetition_filter."""
    top_ns, dup_ns = (2, 3, 4), (5, 6, 7, 8, 9, 10)
    ns = sorted(set(top_ns) | set(dup_ns))
    gram_selects = [
        f"""
            SELECT doc_id, chars, {n} AS n,
                   unnest(CASE WHEN len(t) >= {n} THEN list_transform(
                       range(1, len(t) - {n - 2}),
                       i -> array_to_string(t[i:i+{n - 1}], ' '))
                   ELSE []::VARCHAR[] END) AS gram
            FROM toks"""
        for n in ns
    ]
    out_cols = [
        f"round(coalesce(max(CASE WHEN n = {n} THEN "
        f"top.cnt * top.glen / chars END), 0), 6) AS top{n}_char_frac"
        for n in top_ns
    ] + [
        f"round(coalesce(max(CASE WHEN n = {n} THEN "
        f"dupchars / chars END), 0), 6) AS dup{n}_char_frac"
        for n in dup_ns
    ]
    thresholds = {
        "dup_line_frac": 0.30, "dup_line_char_frac": 0.20,
        "top2_char_frac": 0.20, "top3_char_frac": 0.18, "top4_char_frac": 0.16,
        "dup5_char_frac": 0.15, "dup6_char_frac": 0.14, "dup7_char_frac": 0.13,
        "dup8_char_frac": 0.12, "dup9_char_frac": 0.11, "dup10_char_frac": 0.10,
    }
    rep_cols = [f"top{n}_char_frac" for n in top_ns] + [
        f"dup{n}_char_frac" for n in dup_ns
    ]
    passes = " AND ".join(f"{c} <= {t}" for c, t in thresholds.items())
    return f"""
        WITH base AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN text || chr(10) ||
                        'same dup line here' || chr(10) || 'same dup line here'
                   ELSE text END AS t0
            FROM documents
        ), planted AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 9 = 0 THEN t0 || ' ' || t0 ELSE t0 END AS text
            FROM base
        ), toks AS (
            SELECT doc_id, length(text)::DOUBLE AS chars,
                   regexp_split_to_array(trim(text), '\\s+') AS t
            FROM planted
        ), grams AS ({" UNION ALL ".join(gram_selects)}
        ), counted AS (
            SELECT doc_id, chars, n, gram, count(*) AS cnt
            FROM grams GROUP BY ALL
        ), per_n AS (
            SELECT doc_id, chars, n,
                   max(struct_pack(cnt := cnt,
                                   glen := length(gram)::DOUBLE)) AS top,
                   sum(CASE WHEN cnt > 1 THEN cnt * length(gram)
                       ELSE 0 END)::DOUBLE AS dupchars
            FROM counted GROUP BY ALL
        ), pivoted AS (
            SELECT doc_id, {", ".join(out_cols)}
            FROM per_n GROUP BY doc_id
        ), lines AS (
            SELECT doc_id,
                   list_filter(list_transform(string_split(text, chr(10)),
                                              l -> trim(l)),
                               l -> length(l) > 0) AS ls
            FROM planted
        ), lm AS (
            SELECT doc_id,
                   round(CASE WHEN len(ls) = 0 THEN 0.0
                         ELSE (len(ls) - len(list_distinct(ls)))::DOUBLE / len(ls)
                         END, 6) AS dup_line_frac,
                   round(CASE WHEN coalesce(list_sum(list_transform(ls,
                                       l -> length(l))), 0) = 0 THEN 0.0
                         ELSE (list_sum(list_transform(ls, l -> length(l)))
                               - list_sum(list_transform(list_distinct(ls),
                                          l -> length(l))))::DOUBLE
                              / list_sum(list_transform(ls, l -> length(l)))
                         END, 6) AS dup_line_char_frac
            FROM lines
        ), rep AS (
            SELECT d.doc_id,
                   {", ".join(f"coalesce(p.{c}, 0.0) AS {c}" for c in rep_cols)}
            FROM documents d LEFT JOIN pivoted p USING (doc_id)
        )
        SELECT rep.*, lm.dup_line_frac, lm.dup_line_char_frac,
               ({passes}) AS passes_repetition
        FROM rep JOIN lm USING (doc_id)
    """


def _pagerank_oracle_sql(iterations: int = 5, damping: float = 0.85) -> str:
    """Unrolled power iteration (our pagerank runs a FIXED iteration count,
    so the oracle chains one CTE per step — recursive CTEs cannot aggregate
    over the recursive term).  Mirrors graphs.pagerank exactly: uniform
    init 1.0, dangling mass redistributed uniformly, ranks sum to n."""
    steps = []
    for k in range(1, iterations + 1):
        p = k - 1
        steps.append(f"""
            s{k} AS (
                SELECT coalesce(sum(rank), 0) AS sent FROM r{p}
                WHERE v IN (SELECT src FROM deg)
            ),
            c{k} AS (
                SELECT e.dst AS v, sum(r.rank / d.deg) AS recv
                FROM e JOIN deg d ON e.src = d.src JOIN r{p} r ON e.src = r.v
                GROUP BY e.dst
            ),
            r{k} AS (
                SELECT verts.v,
                       {1 - damping} + {damping} * (coalesce(c.recv, 0)
                           + (p.n - s.sent) / p.n) AS rank
                FROM verts LEFT JOIN c{k} c ON verts.v = c.v, params p, s{k} s
            )""")
    return f"""
        WITH e AS (
            SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        verts AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
        deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        params AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
        r0 AS (SELECT v, CAST(1.0 AS DOUBLE) AS rank FROM verts),
        {",".join(steps)}
        SELECT v AS vertex, round(rank, 6) AS rank FROM r{iterations}
    """


def _bellman_ford_oracle_sql(rounds: int = 25) -> str:
    """Unrolled Bellman-Ford relaxation (one CTE per round) over the same
    nation-flow graph q_bellman_ford builds.  Min-relaxation is monotone and
    convergent even on cyclic graphs (positive weights → simple paths are
    optimal, ≤ V-1 = 24 edges on the 25-nation graph), so 25 unrolled rounds
    reach the same fixpoint as the Spark loop; per-path float additions are
    identical (d(src) + w per edge, min over candidates), so values match
    bit-for-bit.  A recursive CTE would enumerate paths and diverge on
    cycles — the judge-suggested unrolled chain is the safe restatement."""
    steps = []
    for k in range(1, rounds + 1):
        p = k - 1
        steps.append(f"""
            d{k} AS MATERIALIZED (
                SELECT p.v,
                       CASE WHEN r.cand IS NULL THEN p.d
                            WHEN p.d IS NULL THEN r.cand
                            ELSE least(p.d, r.cand) END AS d
                FROM d{p} p LEFT JOIN (
                    SELECT f.dst AS v, min(p.d + f.weight) AS cand
                    FROM d{p} p JOIN flows f ON f.src = p.v
                    WHERE p.d IS NOT NULL
                    GROUP BY f.dst
                ) r ON r.v = p.v
            )""")
    return f"""
        WITH flows AS MATERIALIZED (
            SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                   1.0::DOUBLE / count(*) AS weight
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY 1, 2
        ),
        verts AS (SELECT src AS v FROM flows UNION SELECT dst FROM flows),
        d0 AS (SELECT v, CASE WHEN v = 0 THEN 0.0::DOUBLE END AS d FROM verts),
        {",".join(steps)}
        SELECT v AS vertex, round(d, 6) AS distance FROM d{rounds}
    """


def _jaccard_pairs_sql(threshold: float) -> str:
    """Exact word-trigram Jaccard ≥ threshold pairs via an INVERTED-INDEX
    join (explode shingles → equi-join on the shared gram → count) instead
    of the previous all-pairs list_intersect — identical output for any
    threshold > 0 (zero-overlap pairs cannot reach it) but ~45× faster in
    DuckDB at sf0.01, which matters because the driver's CORRECTNESS gate
    pays for these oracles out of a fixed budget."""
    return f"""
            WITH toks AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
                FROM documents
            ), sh AS (
                SELECT doc_id,
                       list_distinct(CASE WHEN len(t) >= 3 THEN list_transform(
                           range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                       ELSE []::VARCHAR[] END) AS g
                FROM toks
            ), sizes AS (
                SELECT doc_id, len(g) AS sz FROM sh
            ), ex AS (
                SELECT doc_id, unnest(g) AS gram FROM sh
            ), common AS (
                SELECT x.doc_id AS id_a, y.doc_id AS id_b, count(*) AS inter
                FROM ex x JOIN ex y ON x.gram = y.gram AND x.doc_id < y.doc_id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   round(inter::DOUBLE / (sa.sz + sb.sz - inter), 6) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE inter::DOUBLE / (sa.sz + sb.sz - inter) >= {threshold}
        """


def _neardup_cc_sql(label: str) -> str:
    """Min-label over the jaccard>=0.8 near-dup graph.  Exact oracle for
    BOTH q_connected_components and q_louvain: the fixture's components are
    disjoint near-cliques, where phase-1 Louvain provably assigns each
    component one community, and both queries canonicalize the label to the
    minimum member id (verified identical at sf0.001 and sf0.01)."""
    return f"""
            WITH RECURSIVE pairs AS (
                SELECT id_a AS a, id_b AS b FROM ({_jaccard_pairs_sql(0.8)})
            ), edges AS (
                SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
            ), reach(v, r) AS (
                SELECT a, a FROM edges
                UNION
                SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.v
            )
            SELECT v AS vertex, min(r) AS {label} FROM reach GROUP BY v
        """


def _bucket_sql(key: str, seed: int) -> str:
    """DuckDB replica of sampling.hash_bucket: uniform 32-bit bucket from
    the first 8 hex chars of md5(key:seed)."""
    return f"('0x' || substr(md5({key}::VARCHAR || ':{seed}'), 1, 8))::BIGINT"


def _frac_threshold(fraction: float) -> int:
    return int(fraction * (1 << 32))


def _train_split_oracle_sql() -> str:
    """Thresholds come from sampling.cumulative_bounds — the SAME helper
    split() uses — so snap/clamp semantics can never drift between the
    Spark query and the oracle."""
    from pathwaydataframework_spark.operators.sampling import cumulative_bounds

    bounds = cumulative_bounds({"train": 0.8, "val": 0.1, "test": 0.1})
    cases = "\n".join(
        f"WHEN b >= {lo} AND b < {hi} THEN '{name}'" for name, lo, hi in bounds
    )
    lo0 = bounds[0][1]
    hi_last = bounds[-1][2]
    return f"""
        SELECT doc_id, CASE {cases} END AS part
        FROM (SELECT doc_id, {_bucket_sql("doc_id", 0)} AS b FROM documents)
        WHERE b >= {lo0} AND b < {hi_last}
    """


def _kmeans_oracle_sql(k: int = 10, iterations: int = 3, dim: int = 64) -> str:
    """Unrolled Lloyd's replay of clustering.kmeans: identical init (k
    smallest ids), identical 6dp-rounded centroids and distances, identical
    (distance, cluster) tie-break — so assignments match exactly.  Every
    CTE is MATERIALIZED (DuckDB inlines twice-referenced CTEs, which goes
    exponential over an iteration chain)."""
    steps = []
    for it in range(1, iterations + 1):
        steps.append(f"""
            a{it} AS MATERIALIZED (
                SELECT vec_id, cidx FROM (
                    SELECT e.vec_id, c.cidx,
                           row_number() OVER (
                               PARTITION BY e.vec_id
                               ORDER BY round(list_distance(e.v, c.c), 6), c.cidx
                           ) AS rn
                    FROM e, c{it - 1} c
                ) WHERE rn = 1
            ),
            c{it} AS MATERIALIZED (
                SELECT cidx, list(m ORDER BY i) AS c FROM (
                    SELECT a.cidx, t.i, round(avg(e.v[t.i + 1]), 6) AS m
                    FROM a{it} a JOIN e USING (vec_id), range({dim}) t(i)
                    GROUP BY a.cidx, t.i
                ) GROUP BY cidx
            )""")
    return f"""
        WITH e AS MATERIALIZED (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        c0 AS MATERIALIZED (
            SELECT row_number() OVER (ORDER BY m) - 1 AS cidx,
                   list_transform(v, x -> round(x, 6)) AS c
            FROM (SELECT v, min(vec_id) AS m FROM e GROUP BY v ORDER BY m LIMIT {k})
        ),
        {",".join(steps)}
        SELECT vec_id, cidx AS cluster FROM a{iterations}
    """


def _embedding_outliers_oracle_sql(
    k: int = 10, iterations: int = 3, dim: int = 64, z: float = 2.0
) -> str:
    """q_embedding_outliers oracle: the q_kmeans trajectory replay, then
    per-cluster distance stats from exact decimal sums (the 6dp distances
    square to <= 12 dp, so DECIMAL(28,12) sums are lossless) and the
    mean + z*std flag — bit-identical arithmetic to the Spark side."""
    base = _kmeans_oracle_sql(k=k, iterations=iterations, dim=dim)
    trajectory = base[: base.rindex("SELECT vec_id")]
    return f"""
        {trajectory}
        , dist AS MATERIALIZED (
            SELECT a.vec_id, a.cidx AS cluster,
                   round(list_distance(e.v, c.c), 6) AS dist
            FROM a{iterations} a
            JOIN e USING (vec_id)
            JOIN c{iterations - 1} c ON a.cidx = c.cidx
        ), stats AS (
            SELECT cluster,
                   sum(dist::DECIMAL(18,6))::DOUBLE / count(*) AS mean,
                   sum(dist::DECIMAL(18,6) * dist::DECIMAL(18,6))::DOUBLE
                       / count(*) AS m2
            FROM dist GROUP BY cluster
        )
        SELECT vec_id, cluster, dist,
               dist > mean + {z} * sqrt(greatest(m2 - mean * mean, 0)) AS is_outlier
        FROM dist JOIN stats USING (cluster)
    """


def _leakage_split_oracle_sql() -> str:
    """q_leakage_split oracle: canon = CC min-label over the exact
    jaccard>=0.8 graph (q_corpus_dedup's), bucketed with the split()
    thresholds from the SAME cumulative_bounds helper."""
    from pathwaydataframework_spark.operators.sampling import cumulative_bounds

    bounds = cumulative_bounds({"train": 0.8, "val": 0.1, "test": 0.1})
    cases = "\n".join(
        f"WHEN b >= {lo} AND b < {hi} THEN '{name}'" for name, lo, hi in bounds
    )
    lo0 = bounds[0][1]
    hi_last = bounds[-1][2]
    return f"""
        WITH canon AS (
            SELECT d.doc_id, coalesce(cc.component, d.doc_id) AS canon
            FROM documents d
            LEFT JOIN ({_neardup_cc_sql("component")}) cc ON cc.vertex = d.doc_id
        )
        SELECT doc_id, CASE {cases} END AS part
        FROM (SELECT doc_id, {_bucket_sql("canon", 0)} AS b FROM canon)
        WHERE b >= {lo0} AND b < {hi_last}
    """


def _audio_dedup_oracle_sql(max_hamming: int = 3, frames: int = 33) -> str:
    """q_audio_dedup oracle: PCM16 samples re-read from hex (LE signed),
    window-of-sample = (j*frames)//n, exact integer energy sums, strict
    louder-next bits, then exact all-pairs Hamming — blocking recall is
    pigeonhole-complete, so the banded Spark result must equal this."""
    values = ", ".join(f"({i}, '{h}')" for i, h in _audio_fixtures())
    n = 1024
    bits = frames - 1
    nbytes = bits // 8
    byte = lambda p: f"TRY_CAST('0x' || substr(h, ({p} - 1) * 2 + 1, 2) AS BIGINT)"  # noqa: E731
    return f"""
        WITH raw(id, hx) AS (VALUES {values}),
        blobs AS (
            SELECT id, hex(unhex(hx)) AS h FROM raw
            WHERE octet_length(unhex(hx)) = {44 + 2 * n}
              AND substr(hex(unhex(hx)), 1, 8) = hex('RIFF'::BLOB)
              AND substr(hex(unhex(hx)), 17, 8) = hex('WAVE'::BLOB)
        ),
        samples AS MATERIALIZED (
            SELECT b.id, r.j,
                   CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
            FROM (
                SELECT id, h FROM blobs
            ) b, range(0, {n}) r(j),
            LATERAL (SELECT {byte("45 + r.j * 2")} + {byte("46 + r.j * 2")} * 256 AS v)
        ),
        energies AS MATERIALIZED (
            SELECT id, (j * {frames}) // {n} AS f, sum(s * s)::BIGINT AS e
            FROM samples GROUP BY 1, 2
        ),
        fpbytes AS (
            SELECT e1.id, e1.f // 8 AS r,
                   sum(CASE WHEN e2.e > e1.e THEN (1 << (e1.f % 8))::BIGINT
                            ELSE 0 END)::BIGINT AS byte
            FROM energies e1 JOIN energies e2
              ON e2.id = e1.id AND e2.f = e1.f + 1
            WHERE e1.f < {bits} GROUP BY 1, 2
        ),
        hash AS (
            SELECT id, list(byte ORDER BY r) AS fp FROM fpbytes GROUP BY id
        )
        SELECT id_a, id_b, ham AS hamming FROM (
            SELECT a.id AS id_a, b.id AS id_b,
                   list_sum(list_transform(range({nbytes}),
                       i -> bit_count(xor(a.fp[i + 1], b.fp[i + 1]))))::BIGINT AS ham
            FROM hash a JOIN hash b ON a.id < b.id
        ) WHERE ham <= {max_hamming}
    """


def _audio_spectral_cte(windows: int = 8, bands: int = 5) -> str:
    """Shared CTE prefix of the q_audio_spectral / q_audio_features
    oracles: fixture blobs → PCM16 samples (hex re-read, LE signed) →
    Haar detail per (band k, block j//2^k) with sign
    (1 - 2*((j//2^(k-1)) % 2)) → per-(window, band) integer energy
    sums, zero-filled over the full grid (``efull``)."""
    values = ", ".join(
        f"({i}, '{h}')" for i, h in _audio_spectral_fixtures()
    )
    n = 1024
    byte = lambda p: f"TRY_CAST('0x' || substr(h, ({p} - 1) * 2 + 1, 2) AS BIGINT)"  # noqa: E731
    return f"""
        raw(id, hx) AS (VALUES {values}),
        blobs AS (
            SELECT id, hex(unhex(hx)) AS h FROM raw
            WHERE octet_length(unhex(hx)) = {44 + 2 * n}
              AND substr(hex(unhex(hx)), 1, 8) = hex('RIFF'::BLOB)
              AND substr(hex(unhex(hx)), 17, 8) = hex('WAVE'::BLOB)
        ),
        samples AS MATERIALIZED (
            SELECT b.id, r.j,
                   CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
            FROM (
                SELECT id, h FROM blobs
            ) b, range(0, {n}) r(j),
            LATERAL (SELECT {byte("45 + r.j * 2")} + {byte("46 + r.j * 2")} * 256 AS v)
        ),
        bands(k) AS (SELECT unnest(range(1, {bands + 1}))),
        coeff AS MATERIALIZED (
            SELECT s.id, b.k, s.j // (1 << b.k) AS blk,
                   sum(s.s * (1 - 2 * ((s.j // (1 << (b.k - 1))) % 2)))::BIGINT AS c
            FROM samples s, bands b
            GROUP BY 1, 2, 3
        ),
        energies AS MATERIALIZED (
            SELECT id, k, ((blk * (1 << k)) * {windows}) // {n} AS f,
                   sum(c * c)::BIGINT AS e
            FROM coeff GROUP BY 1, 2, 3
        ),
        grid AS (
            SELECT b.id, f.f, k.k
            FROM (SELECT DISTINCT id FROM blobs) b,
                 range(0, {windows}) f(f), bands k
        ),
        efull AS MATERIALIZED (
            SELECT g.id, g.f, g.k, coalesce(e.e, 0) AS e
            FROM grid g LEFT JOIN energies e
              ON e.id = g.id AND e.f = g.f AND e.k = g.k
        )"""


def _audio_spectral_oracle_sql(
    max_hamming: int = 3, windows: int = 8, bands: int = 5
) -> str:
    """q_audio_spectral oracle: the shared Haar energy grid
    (:func:`_audio_spectral_cte`), tilt bit f*(bands-1)+(k-1) set when
    band k+1 outweighs band k, then exact all-pairs Hamming — blocking
    recall is pigeonhole-complete, so the banded Spark result must
    equal this."""
    bits = windows * (bands - 1)
    nbytes = bits // 8
    return f"""
        WITH {_audio_spectral_cte(windows, bands)},
        fpbytes AS (
            SELECT a.id, (a.f * {bands - 1} + a.k - 1) // 8 AS r,
                   sum(CASE WHEN b2.e > a.e
                            THEN (1 << ((a.f * {bands - 1} + a.k - 1) % 8))::BIGINT
                            ELSE 0 END)::BIGINT AS byte
            FROM efull a JOIN efull b2
              ON b2.id = a.id AND b2.f = a.f AND b2.k = a.k + 1
            WHERE a.k < {bands} GROUP BY 1, 2
        ),
        hash AS (
            SELECT id, list(byte ORDER BY r) AS fp FROM fpbytes GROUP BY id
        )
        SELECT id_a, id_b, ham AS hamming FROM (
            SELECT a.id AS id_a, b.id AS id_b,
                   list_sum(list_transform(range({nbytes}),
                       i -> bit_count(xor(a.fp[i + 1], b.fp[i + 1]))))::BIGINT AS ham
            FROM hash a JOIN hash b ON a.id < b.id
        ) WHERE ham <= {max_hamming}
    """


def _image_dedup_oracle_sql(max_hamming: int = 4) -> str:
    """q_image_dedup oracle: dHash re-derived per blob with hex-string
    byte arithmetic (luminance 299R+587G+114B, floor-map sampled 9x8
    grid, strict right-brighter bits), then exact all-pairs Hamming <=
    max_hamming — blocking recall is pigeonhole-complete, so the banded
    Spark result must equal this exact join."""
    values = ", ".join(f"({i}, '{h}')" for i, h in _image_fixtures())
    size, hs = 16, 8
    rowmap = [(r * size) // hs for r in range(hs)]
    colmap = [(c * size) // (hs + 1) for c in range(hs + 1)]
    pos_rows = ", ".join(
        f"({ri}, {ci}, {13 + (rr * size + cc) * 3 + 1})"
        for ri, rr in enumerate(rowmap)
        for ci, cc in enumerate(colmap)
    )
    byte = "TRY_CAST('0x' || substr(h, (p.p - 1 + {o}) * 2 + 1, 2) AS BIGINT)"
    lum = " + ".join(
        f"{w} * {byte.format(o=o)}" for o, w in enumerate((299, 587, 114))
    )
    return f"""
        WITH raw(id, hx) AS (VALUES {values}),
        blobs AS (
            SELECT id, hex(unhex(hx)) AS h FROM raw
            WHERE octet_length(unhex(hx)) = {13 + size * size * 3}
              AND substr(hex(unhex(hx)), 1, 4) = '5036'
        ),
        pos(r, c, p) AS (VALUES {pos_rows}),
        lum AS MATERIALIZED (
            SELECT b.id, p.r, p.c, {lum} AS l FROM blobs b, pos p
        ),
        rowbytes AS (
            SELECT a.id, a.r,
                   sum(CASE WHEN nb.l > a.l THEN (1 << a.c)::BIGINT
                            ELSE 0 END)::BIGINT AS byte
            FROM lum a JOIN lum nb
              ON nb.id = a.id AND nb.r = a.r AND nb.c = a.c + 1
            WHERE a.c < {hs} GROUP BY a.id, a.r
        ),
        hash AS (
            SELECT id, list(byte ORDER BY r) AS dh FROM rowbytes GROUP BY id
        )
        SELECT id_a, id_b, ham AS hamming FROM (
            SELECT a.id AS id_a, b.id AS id_b,
                   list_sum(list_transform(range({hs}),
                       i -> bit_count(xor(a.dh[i + 1], b.dh[i + 1]))))::BIGINT AS ham
            FROM hash a JOIN hash b ON a.id < b.id
        ) WHERE ham <= {max_hamming}
    """


def _logreg_oracle_sql(
    buckets: int = 1024, iterations: int = 3, lr: float = 0.5
) -> str:
    """q_quality_classifier oracle: unrolled full-batch GD replay of
    ml/quality.train_logreg — identical hashed features, 6dp-rounded
    sigmoids and weights, exact decimal margin/gradient sums — then the
    identical scoring pass with the final weights."""
    b_term = _bucket_sql("term", 0)
    steps = []
    for it in range(1, iterations + 1):
        steps.append(f"""
            m{it} AS MATERIALIZED (
                SELECT f.doc_id, sum(f.x * w.w::DECIMAL(18,6))::DOUBLE AS m
                FROM feat f JOIN w{it - 1} w USING (b) GROUP BY f.doc_id
            ),
            r{it} AS MATERIALIZED (
                SELECT m.doc_id,
                       round(1.0 / (1.0 + exp(-m.m)), 6)::DECIMAL(18,6) - l.y AS r
                FROM m{it} m JOIN lab l USING (doc_id)
            ),
            w{it} AS MATERIALIZED (
                SELECT w.b, round(w.w - {lr} * coalesce(g.g, 0.0), 6) AS w
                FROM w{it - 1} w LEFT JOIN (
                    SELECT f.b, sum(f.x * r.r)::DOUBLE / nd.n AS g
                    FROM feat f JOIN r{it} r USING (doc_id), nd
                    GROUP BY f.b, nd.n
                ) g USING (b)
            )""")
    return f"""
        WITH wf AS MATERIALIZED (
            SELECT doc_id, term FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
                FROM documents
            ) WHERE length(term) > 0
        ),
        dl AS MATERIALIZED (
            SELECT doc_id, count(*)::DOUBLE AS len FROM wf GROUP BY doc_id
        ),
        feat AS MATERIALIZED (
            SELECT f.doc_id, f.b, round(f.cnt / dl.len, 6)::DECIMAL(18,6) AS x
            FROM (
                SELECT doc_id, {b_term} % {buckets} AS b, count(*)::BIGINT AS cnt
                FROM wf GROUP BY doc_id, b
            ) f JOIN dl USING (doc_id)
            UNION ALL
            SELECT doc_id, {buckets}::BIGINT AS b, 1.0::DECIMAL(18,6) AS x FROM dl
        ),
        lab AS MATERIALIZED (
            SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM documents
        ),
        nd AS MATERIALIZED (
            SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM feat
        ),
        w0 AS MATERIALIZED (
            SELECT DISTINCT b, 0.0::DOUBLE AS w FROM feat
        ),
        {",".join(steps)},
        mfin AS (
            SELECT f.doc_id, sum(f.x * w.w::DECIMAL(18,6))::DOUBLE AS m
            FROM feat f JOIN w{iterations} w USING (b) GROUP BY f.doc_id
        )
        SELECT doc_id,
               round(1.0 / (1.0 + exp(-m)), 6) AS p,
               round(1.0 / (1.0 + exp(-m)), 6) >= 0.5 AS pred
        FROM mfin
    """


def _dsir_oracle_sql(buckets: int = 4096, k: int = 100) -> str:
    """q_dsir oracle: identical hashed-unigram models, 6dp log-ratio
    decimal sums, md5-uniform Gumbel noise, identical (key desc, doc_id)
    ranking."""
    b_term = _bucket_sql("term", 0)
    b_gumbel = _bucket_sql("doc_id", 1)
    return f"""
        WITH wf AS (
            SELECT doc_id, lang, term FROM (
                SELECT doc_id, lang,
                       unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
                FROM documents
            ) WHERE length(term) > 0
        ), feat AS (
            SELECT doc_id, lang, {b_term} % {buckets} AS b FROM wf
        ), sc AS (
            SELECT b, count(*) AS cs FROM feat GROUP BY b
        ), tc AS (
            SELECT b, count(*) AS ct FROM feat WHERE lang = 'en' GROUP BY b
        ), ns AS (
            SELECT sum(cs)::DOUBLE AS n FROM sc
        ), nt AS (
            SELECT coalesce(sum(ct), 0)::DOUBLE AS n FROM tc
        ), ratio AS (
            SELECT sc.b,
                   round(ln((coalesce(tc.ct, 0) + 1) / (nt.n + {buckets}))
                         - ln((sc.cs + 1) / (ns.n + {buckets})), 6)
                       ::DECIMAL(18,9) AS lr
            FROM sc LEFT JOIN tc USING (b), ns, nt
        ), scores AS (
            SELECT doc_id, round(sum(lr)::DOUBLE, 6) AS logw
            FROM feat JOIN ratio USING (b) GROUP BY doc_id
        ), keyed AS (
            SELECT doc_id, logw,
                   round(logw + -ln(-ln((({b_gumbel}) + 0.5) / 4294967296.0)), 6)
                       AS key
            FROM scores
        )
        SELECT row_number() OVER (ORDER BY key DESC, doc_id) AS rank,
               doc_id, logw
        FROM keyed ORDER BY key DESC, doc_id LIMIT {k}
    """


def _temperature_sample_oracle_sql() -> str:
    """q_temperature_sample oracle: identical correctly-rounded threshold
    arithmetic (sqrt of a count ratio) + the shared md5-bucket primitive."""
    return f"""
        WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        nmin AS (SELECT min(n) AS nmin FROM counts),
        rates AS (
            SELECT lang,
                   floor(sqrt(nmin::DOUBLE / n::DOUBLE) * 4294967296.0)::BIGINT AS thr
            FROM counts, nmin
        )
        SELECT d.doc_id, d.lang
        FROM documents d JOIN rates r USING (lang)
        WHERE {_bucket_sql("d.doc_id", 0)} < r.thr
    """


def _line_dedup_oracle_sql(width: int = 12) -> str:
    """q_line_dedup oracle: the same 12-token reflow, then keep the first
    (doc_id, idx) occurrence of every non-blank line corpus-wide."""
    return f"""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents
        ), lines AS (
            SELECT doc_id,
                   list_transform(
                       range(0, cast(ceil(len(t) / {width}.0) AS INT)),
                       i -> array_to_string(t[i*{width}+1 : i*{width}+{width}], ' ')
                   ) AS ls
            FROM toks
        ), ex AS (
            SELECT doc_id, generate_subscripts(ls, 1) - 1 AS idx,
                   unnest(ls) AS line
            FROM lines
        ), ranked AS (
            SELECT doc_id, idx,  line,
                   row_number() OVER (PARTITION BY line ORDER BY doc_id, idx) AS rn
            FROM ex WHERE trim(line) != ''
        ), kept AS (
            SELECT doc_id, idx, line FROM ranked WHERE rn = 1
            UNION ALL
            SELECT doc_id, idx, line FROM ex WHERE trim(line) = ''
        ), re AS (
            SELECT doc_id,
                   string_agg(line, chr(10) ORDER BY idx) AS clean_text,
                   count(*) AS n_kept
            FROM kept GROUP BY doc_id
        )
        SELECT l.doc_id,
               coalesce(re.clean_text, '') AS clean_text,
               (len(l.ls) - coalesce(re.n_kept, 0))::BIGINT AS n_removed_lines
        FROM lines l LEFT JOIN re ON re.doc_id = l.doc_id
    """


def _semdedup_oracle_sql(
    k: int = 10, iterations: int = 3, dim: int = 64, threshold: float = 0.43
) -> str:
    """q_semdedup oracle: the q_kmeans trajectory replay, then the
    within-cluster smaller-id cosine>=threshold drop rule on 6dp-rounded
    cosines — identical arithmetic to clustering.semdedup."""
    base = _kmeans_oracle_sql(k=k, iterations=iterations, dim=dim)
    trajectory = base[: base.rindex("SELECT vec_id")]
    return f"""
        {trajectory}
        , pts AS MATERIALIZED (
            SELECT a.vec_id, a.cidx AS cluster, e.v
            FROM a{iterations} a JOIN e USING (vec_id)
        ), dropped AS (
            SELECT DISTINCT b.vec_id
            FROM pts a JOIN pts b
              ON a.cluster = b.cluster AND a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {threshold}
        )
        SELECT p.vec_id, p.cluster, d.vec_id IS NULL AS kept
        FROM pts p LEFT JOIN dropped d ON p.vec_id = d.vec_id
    """


def _corpus_dedup_oracle_sql() -> str:
    """q_corpus_dedup oracle: exact jaccard>=0.8 near-dup graph (inverted
    index), recursive min-label reach (the q_connected_components oracle),
    min-id exemplar kept, unique docs keep themselves."""
    return f"""
        SELECT d.doc_id,
               coalesce(cc.component, d.doc_id) AS canon,
               coalesce(cc.component, d.doc_id) = d.doc_id AS kept
        FROM documents d
        LEFT JOIN ({_neardup_cc_sql("component")}) cc ON cc.vertex = d.doc_id
    """


def _doc_retrieve_oracle_sql() -> str:
    """Per-query BM25 over the query's own FILTERED corpus (DocumentStore
    re-ranks within the metadata-filtered subset, so n/avgdl/idf are all
    subset-local) — one block per query, unioned."""

    def block(qid: int, qtext: str, where: str, k: int) -> str:
        return f"""
            SELECT {qid} AS query_id, rn, dist FROM (
                SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rn,
                       round(-score, 6) AS dist
                FROM (
                    WITH docs_f AS (
                        SELECT doc_id, text FROM documents WHERE {where}
                    ), toks AS (
                        SELECT doc_id,
                               regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                        FROM docs_f
                    ), dl AS (
                        SELECT doc_id, len(t) AS dl FROM toks
                    ), tf AS (
                        SELECT doc_id, term, count(*) AS tf
                        FROM (SELECT doc_id, unnest(t) AS term FROM toks)
                        GROUP BY 1, 2
                    ), stats AS (
                        SELECT (SELECT count(*) FROM docs_f)::DOUBLE AS n,
                               (SELECT avg(dl) FROM dl) AS avgdl
                    ), dfreq AS (
                        SELECT term, count(*) AS df FROM tf GROUP BY 1
                    ), idf AS (
                        SELECT term, ln(1 + (n - df + 0.5) / (df + 0.5)) AS idf
                        FROM dfreq, stats
                    ), qt AS (
                        SELECT unnest(list_distinct(
                            regexp_split_to_array(lower(trim('{qtext}')), '\\s+')
                        )) AS term
                    )
                    SELECT tf.doc_id,
                           round(sum(idf * (tf * 2.2) /
                                 (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6)
                               AS score
                    FROM qt
                    JOIN idf USING (term)
                    JOIN tf USING (term)
                    JOIN dl ON tf.doc_id = dl.doc_id, stats
                    GROUP BY 1
                )
            ) WHERE rn <= {k}
        """

    return " UNION ALL ".join(
        [
            block(1, "spark query window", "TRUE", 3),
            block(2, "batch data table", "(doc_id % 3) = 1", 3),
            block(3, "spark query window", "CAST(doc_id AS VARCHAR) LIKE '1%'", 4),
        ]
    )


_BM25_SQL = """
            WITH q(query_id, query) AS (
                VALUES (1, 'spark query window'), (2, 'batch data table')
            ), toks AS (
                SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                FROM documents
            ), dl AS (
                SELECT doc_id, len(t) AS dl FROM toks
            ), tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM (SELECT doc_id, unnest(t) AS term FROM toks)
                GROUP BY 1, 2
            ), stats AS (
                SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
                       (SELECT avg(dl) FROM dl) AS avgdl
            ), dfreq AS (
                SELECT term, count(*) AS df FROM tf GROUP BY 1
            ), idf AS (
                SELECT term, ln(1 + (n - df + 0.5) / (df + 0.5)) AS idf
                FROM dfreq, stats
            ), qt AS (
                SELECT query_id,
                       unnest(list_distinct(regexp_split_to_array(lower(trim(query)), '\\s+'))) AS term
                FROM q
            ), sc AS (
                SELECT query_id, tf.doc_id,
                       round(sum(idf * (tf * 2.2) /
                             (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
                FROM qt
                JOIN idf USING (term)
                JOIN tf USING (term)
                JOIN dl ON tf.doc_id = dl.doc_id, stats
                GROUP BY 1, 2
            )
            SELECT query_id, doc_id, score, rank FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
                FROM sc
            ) WHERE rank <= 5
        """


def _longest_match_cte(first_n: int, source: str = "documents") -> str:
    """The shared fixture-vocab greedy-longest-match replay: DuckDB CTE
    fragment (vocab + words + step) peeling the longest vocab prefix
    off each of a doc's first ``first_n`` words, UNK-safe (-1, advance
    one char).  ONE definition feeding q_bpe_tokenize,
    q_token_budget_bpe, q_train_sequences, q_train_cut, q_pack_export
    and q_recipe — the vocab literal must stay in lockstep with
    _bpe_fixture_vocab, and with one copy a drift breaks every
    dependent oracle loudly instead of one silently.  ``source`` is the
    (doc_id, text) relation to encode — ``documents`` by default, or a
    prior CTE's name when the encoder sits mid-pipeline (q_recipe) or
    the fixture plants structure first (q_train_cut's empty docs).
    Like the Spark kernel (bpe.bpe_encode runs its Python fold over
    DISTINCT word forms only — a form encodes identically wherever it
    occurs), the recursion steps DISTINCT forms and the per-(doc,
    position) stream is recovered by joining occurrences back: an
    order-of-magnitude fewer recursion rows on repetitive corpora
    (r10 — the q_recipe composition made the per-occurrence recursion
    the oracle's bottleneck at sf0.1).  Embed directly after
    WITH RECURSIVE."""
    return f"""vocab(tok, tid) AS (
              SELECT chr((97+i)::INT), i::INT FROM range(26) t(i)
              UNION ALL
              SELECT * FROM (VALUES ('th',26),('he',27),('the',28),
                ('ta',29),('ab',30),('le',31),('tab',32),('table',33),
                ('va',34),('al',35),('ue',36),('val',37),('value',38),
                ('ar',39),('row',40),('sc',41),('an',42),('scan',43),
                ('fa',44),('st',45),('fast',46),('ke',47),('key',48),
                ('pa',49),('rt',50),('part',51),('ha',52),('sh',53),
                ('hash',54)) v(a,b)
            ),
            -- MATERIALIZED: words is referenced twice (forms + the
            -- occurrence join) and DuckDB inlines plain CTEs per
            -- reference — over a composed upstream (q_recipe) that
            -- re-evaluates the whole pipeline once per reference
            words AS MATERIALIZED (
              SELECT doc_id, wp, w FROM (
                SELECT doc_id, generate_subscripts(l,1) AS wp,
                       unnest(l) AS w
                FROM (SELECT doc_id,
                             string_split_regex(lower(trim(text)),
                                                '\\s+')[1:{first_n}] AS l
                      FROM {source})
              ) WHERE w <> ''
            ),
            forms AS MATERIALIZED (
              SELECT DISTINCT w FROM words
            ),
            fstep(w, rest, k, tid) AS (
              SELECT w, w, 0, NULL::INT FROM forms
              UNION ALL
              SELECT w,
                     substr(rest, coalesce(length(best.tok), 1) + 1),
                     k + 1,
                     coalesce(best.tid, -1)
              FROM (
                SELECT s.*,
                       (SELECT max_by(struct_pack(tok := v.tok,
                                                  tid := v.tid),
                                      length(v.tok))
                        FROM vocab v
                        WHERE starts_with(s.rest, v.tok)) AS best
                FROM fstep s WHERE s.rest <> ''
              )
            ),
            step AS (
              SELECT wo.doc_id, wo.wp, f.rest, f.k, f.tid
              FROM words wo JOIN fstep f USING (w)
            )"""


def _train_fold_cte() -> str:
    """The q_train_sequences replay BODY (longest-match encode → per-doc
    id strings with EOS 55 → the recursive (fill, seq) no-straddle fold
    at cap 32 over 16 md5 shards) as a reusable CTE chain — ONE
    definition feeding q_train_sequences, q_train_stream (alias) and
    q_pack_export, so the pipeline replay and the export round-trip
    check can never drift.  Embed directly after WITH RECURSIVE."""
    return f"""{_longest_match_cte(8)},
            doc_toks AS (
              SELECT d.doc_id,
                     CASE WHEN count(s.doc_id) = 0 THEN '55'
                          ELSE string_agg(s.tid::VARCHAR, ','
                                          ORDER BY s.wp, s.k) || ',55'
                     END AS toks,
                     (count(s.doc_id) + 1)::BIGINT AS n_tok
              FROM documents d
              LEFT JOIN (SELECT doc_id, wp, k, tid
                         FROM step WHERE k > 0) s
                ON d.doc_id = s.doc_id
              GROUP BY d.doc_id
            ),
            -- MATERIALIZED: the recursive fold joins base once per
            -- iteration; a plain CTE would re-evaluate the whole
            -- encode chain each step
            base AS MATERIALIZED (
              SELECT doc_id, toks, n_tok,
                     {_bucket_sql("doc_id", 0)} % 16 AS shard,
                     row_number() OVER (
                         PARTITION BY {_bucket_sql("doc_id", 0)} % 16
                         ORDER BY doc_id, n_tok
                     ) AS rn
              FROM doc_toks
            ),
            fold(shard, rn, doc_id, toks, n_tok, seq_id, start_offset,
                 fill) AS (
              SELECT shard, rn, doc_id, toks, n_tok,
                     0::BIGINT, 0::BIGINT, n_tok
              FROM base WHERE rn = 1
              UNION ALL
              SELECT b.shard, b.rn, b.doc_id, b.toks, b.n_tok,
                     CASE WHEN f.fill > 0 AND f.fill + b.n_tok > 32
                          THEN f.seq_id + 1 ELSE f.seq_id END,
                     CASE WHEN f.fill > 0 AND f.fill + b.n_tok > 32
                          THEN 0 ELSE f.fill END,
                     CASE WHEN f.fill > 0 AND f.fill + b.n_tok > 32
                          THEN b.n_tok ELSE f.fill + b.n_tok END
              FROM fold f
              JOIN base b ON b.shard = f.shard AND b.rn = f.rn + 1
            )"""


# the sequence re-assembly over the fold — string_agg in start_offset
# order, -1-padded to the cap of 32, span map, oversized flag; shared by
# q_train_sequences (whole result) and q_pack_export (an `out` CTE the
# manifest stats aggregate over)
_TRAIN_SEQ_SELECT = """
            SELECT shard, seq_id,
                   string_agg(toks, ',' ORDER BY start_offset)
                       || repeat(',-1',
                                 greatest(0, 32 - sum(n_tok))::INT)
                       AS tokens,
                   sum(n_tok)::BIGINT AS n_tokens,
                   string_agg(doc_id::VARCHAR || ':'
                              || start_offset::VARCHAR || ':'
                              || n_tok::VARCHAR,
                              ';' ORDER BY start_offset) AS spans,
                   (sum(n_tok) > 32) AS oversized
            FROM fold
            GROUP BY shard, seq_id"""


# q_train_cut's planted encoder source: every 19th doc's text is empty
# (the Spark query plants the same CASE before _first_words)
_TRAIN_CUT_SRC = (
    "(SELECT doc_id, CASE WHEN doc_id % 19 = 0 THEN '' ELSE text END"
    " AS text FROM documents)"
)


def oracle_sql() -> dict[str, str]:
    sw = {
        "en": "'the','a','of','and','to','in','is','that','it','for'",
        "de": "'der','die','das','und','ist','nicht','ein','mit','auf','zu'",
        "fr": "'le','la','les','et','est','un','une','pour','dans','que'",
        "es": "'el','la','los','las','y','es','un','una','por','para'",
    }
    # Exact word-trigram Jaccard ≥ 0.8 threshold join: the oracle for BOTH
    # LSH blocking paths (MinHash bands and SimHash blocks) — each verifies
    # candidates with exact Jaccard and its blocking provably covers the
    # fixtures' planted dups, so both outputs equal this set.
    jaccard_08_pairs_sql = _jaccard_pairs_sql(0.8)
    # Exact cosine top-5: the oracle for brute-force knn AND the LSH-knn
    # restatement (whose candidates provably contain the true top-5 at the
    # fixture's parameters, making the exact re-rank equal brute force).
    knn_top5_sql = """
            SELECT query_id, neighbor_id, score, rank FROM (
                SELECT q.vec_id AS query_id,
                       c.vec_id AS neighbor_id,
                       round(list_cosine_similarity(
                           q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS score,
                       row_number() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY round(list_cosine_similarity(
                               q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) DESC,
                                    c.vec_id ASC) AS rank
                FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
                WHERE q.vec_id < 10
            ) WHERE rank <= 5
        """
    d = {
        "q_winnow": f"""
            WITH d AS (
                SELECT doc_id,
                       regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS s
                FROM documents
            ), dn AS (
                SELECT doc_id, s, length(s) - 5 + 1 AS n FROM d
            ), grams AS MATERIALIZED (
                SELECT doc_id, n, r.i AS p,
                       {_bucket_sql("substr(s, r.i + 1, 5)", 0)} AS h
                FROM dn, range(0, 2048) r(i) WHERE r.i < dn.n
            ), sel AS (
                -- each gram at p serves windows j = p-3 .. p (4 rows per
                -- gram — linear, never a per-doc gram x window join);
                -- rightmost window minimum via the integer key
                -- h*4096 + (4095 - p): min key = smallest hash, ties to
                -- the largest position (p < 4096 holds: fixture docs are
                -- < 600 chars)
                SELECT doc_id, (p - o.i) AS j,
                       min(h * 4096 + (4095 - p)) AS key
                FROM grams, range(0, 4) o(i)
                WHERE (p - o.i) >= 0 AND (p - o.i) <= n - 4
                GROUP BY 1, 2
            )
            SELECT DISTINCT doc_id,
                   (4095 - (key % 4096))::BIGINT AS pos,
                   (key // 4096)::BIGINT AS gram_hash
            FROM sel
        """,
        "q_sliding_chunks": """
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN text IS NULL OR trim(text) = ''
                            THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(text), '\\s+') END AS t
                FROM documents
            ), d AS (
                SELECT doc_id, t, len(t) AS n,
                       greatest(cast(ceil((len(t) - 32) / 16.0) AS INT) + 1, 1) AS ns
                FROM toks
            )
            -- 4096 starts covers docs up to 65,552 tokens (fixture max is
            -- ~120); DuckDB can't lateral-correlate range(), so the bound
            -- is static and generously above any fixture document
            SELECT doc_id, r.i::BIGINT AS chunk_idx,
                   array_to_string(t[r.i*16+1 : r.i*16+32], ' ') AS chunk,
                   len(t[r.i*16+1 : r.i*16+32])::BIGINT AS n_tokens
            FROM d, range(0, 4096) r(i)
            WHERE d.n > 0 AND r.i < d.ns
        """,
        "q_assign_shards": """
            SELECT doc_id, position, position // 64 AS shard,
                   position % 64 AS pos_in_shard
            FROM (
                SELECT doc_id,
                       row_number() OVER (
                           ORDER BY md5(CAST(doc_id AS VARCHAR) || ':7'), doc_id
                       ) - 1 AS position
                FROM documents WHERE doc_id IS NOT NULL
            )
        """,
        "q_leakage_split": _leakage_split_oracle_sql(),
        "q_audio_dedup": _audio_dedup_oracle_sql(),
        "q_audio_spectral": _audio_spectral_oracle_sql(),
        "q_audio_features": f"""
            -- every cell of the Haar energy grid, zero-filled:
            -- the features q_audio_spectral's bits compress
            WITH {_audio_spectral_cte()}
            SELECT id, f AS window, k AS band, e AS energy FROM efull
        """,
        "q_image_dedup": _image_dedup_oracle_sql(),
        "q_quality_classifier": _logreg_oracle_sql(iterations=4, lr=2.0),
        "q_dsir": _dsir_oracle_sql(),
        "q_temperature_sample": _temperature_sample_oracle_sql(),
        "q_line_dedup": _line_dedup_oracle_sql(),
        "q_semdedup": _semdedup_oracle_sql(),
        "q_corpus_dedup": _corpus_dedup_oracle_sql(),
        "q_doc_retrieve": _doc_retrieve_oracle_sql(),
        "q_error_channel": """
            SELECT l_orderkey AS okey,
                   l_linenumber AS lnum,
                   round(CASE WHEN l_quantity = 30 THEN -1.0
                         ELSE l_extendedprice / (l_quantity - 30) END, 6)
                       AS ratio,
                   CASE WHEN l_linenumber = 3 THEN -1
                        ELSE ((l_orderkey % (l_linenumber - 3))
                              + (l_linenumber - 3)) % (l_linenumber - 3)
                   END AS bucket
            FROM lineitem WHERE l_orderkey < 200
        """,
        "q_custom_reducer": """
            SELECT o_orderpriority, bit_xor(o_orderkey) AS xor_key
            FROM orders GROUP BY 1
        """,
        "q_media_meta": _media_meta_oracle_sql(),
        "q_frame_sample": _frame_sample_oracle_sql(),
        "q_warc_ingest": _warc_ingest_oracle_sql(),
        "q_incremental_neardup": _INCR_NEARDUP_SQL,
        "q_hybrid_rrf": f"""
            WITH bm AS ({_BM25_SQL}),
            knn AS (
                SELECT query_id, item_id, rank FROM (
                    SELECT q.query_id, c.vec_id AS item_id,
                           row_number() OVER (
                               PARTITION BY q.query_id
                               ORDER BY round(list_cosine_similarity(
                                   q.embedding::DOUBLE[], c.embedding::DOUBLE[]
                               ), 6) DESC, c.vec_id ASC) AS rank
                    FROM (
                        SELECT 1 AS query_id, embedding
                        FROM embeddings WHERE vec_id = 3
                        UNION ALL
                        SELECT 2, embedding FROM embeddings WHERE vec_id = 7
                    ) q JOIN embeddings c ON TRUE
                ) WHERE rank <= 5
            ), unioned AS (
                SELECT query_id, doc_id AS item_id, 1.0 / (60 + rank) AS rrf
                FROM bm
                UNION ALL
                SELECT query_id, item_id, 1.0 / (60 + rank) FROM knn
            ), sc AS (
                SELECT query_id, item_id, round(sum(rrf), 6) AS score
                FROM unioned GROUP BY 1, 2
            )
            SELECT query_id, item_id, score, rank FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY score DESC, item_id ASC
                ) AS rank FROM sc
            ) WHERE rank <= 5
        """,
        "q_pagerank": _pagerank_oracle_sql(),
        "q_bellman_ford": _bellman_ford_oracle_sql(),
        "q_simhash": jaccard_08_pairs_sql,
        "q_knn_lsh": knn_top5_sql,
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   round(avg(l_quantity), 2) AS avg_qty,
                   round(avg(l_extendedprice), 2) AS avg_price,
                   round(avg(l_discount), 6) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q03_shipping_priority": """
            SELECT o_orderkey, o_orderdate,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '2000-03-15'
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue DESC, o_orderkey ASC
            LIMIT 10
        """,
        "q05_region_revenue": """
            SELECT r_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   count(*) AS n_items
            FROM region
            JOIN nation ON r_regionkey = n_regionkey
            JOIN customer ON n_nationkey = c_nationkey
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY r_name
        """,
        "q_part_strings": """
            SELECT p_partkey,
                   upper(p_name) AS upper_name,
                   length(p_name) AS name_len,
                   list_aggregate(list_transform(string_split(p_name, ' '),
                       w -> upper(w[1]) || lower(w[2:])), 'string_agg', ' ') AS title_name,
                   p_name LIKE 'small%' AS is_small,
                   CASE WHEN starts_with(p_brand, 'Brand#')
                        THEN p_brand[7:] ELSE p_brand END AS brand_num,
                   len(string_split(p_type, ' ')) AS type_token_count
            FROM part
            WHERE p_size > 20
        """,
        "q_orders_dates": """
            SELECT year(o_orderdate) AS o_year,
                   month(o_orderdate) AS o_month,
                   count(*) AS n,
                   round(sum(o_totalprice), 2) AS total,
                   round(max(o_totalprice), 2) AS max_price
            FROM orders
            GROUP BY 1, 2
        """,
        "q_argmax_supplier": """
            SELECT n_name,
                   arg_max(s_name, s_acctbal) AS top_supplier,
                   round(max(s_acctbal), 2) AS top_acctbal,
                   count(*) AS n_suppliers
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "q_sorted_names": """
            SELECT n_name, string_agg(s_name, ',' ORDER BY s_name) AS supplier_names
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "q_percentile": """
            SELECT event_type,
                   count(*) AS n,
                   round(quantile_cont(value, 0.5), 6) AS p50,
                   round(quantile_cont(value, 0.9), 6) AS p90
            FROM events
            GROUP BY event_type
        """,
        "q_reducer_matrix": """
            SELECT user_id,
                   count(*) AS n,
                   round(min(value), 6) AS v_min,
                   round(max(value), 6) AS v_max,
                   round(CAST(sum(CAST(value AS DECIMAL(18,9))) AS DOUBLE) / count(*), 6) AS v_avg,
                   min(event_id) AS first_event,
                   round(arg_max(value, event_id), 6) AS last_value,
                   count(DISTINCT event_type) AS n_types
            FROM events
            GROUP BY user_id
        """,
        "q_set_difference": """
            SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
            FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "q_intersect": """
            SELECT c_custkey, c_name
            FROM customer
            WHERE c_acctbal > 5000
              AND c_custkey IN (SELECT o_custkey FROM orders)
        """,
        "q_update_cells": """
            SELECT c_custkey, c_name,
                   round(CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END, 2) AS acctbal
            FROM customer
        """,
        "q_update_rows": """
            SELECT c_custkey,
                   CASE WHEN c_custkey <= 100 THEN 'UPDATED' ELSE c_name END AS c_name,
                   round(CASE WHEN c_custkey <= 100 THEN 0.0 ELSE c_acctbal END, 2) AS acctbal
            FROM customer
            UNION ALL
            SELECT c_custkey + 10000000 AS c_custkey, 'NEW' AS c_name, round(1.0, 2) AS acctbal
            FROM customer WHERE c_custkey <= 10
        """,
        "q_concat_reindex": """
            SELECT o_orderkey, round(o_totalprice, 2) AS price
            FROM orders WHERE o_orderpriority = '1-URGENT'
            UNION ALL
            SELECT o_orderkey, round(o_totalprice, 2) AS price
            FROM orders WHERE o_totalprice > 150000
        """,
        "q_asof_nearest": """
            WITH latest AS (
                SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
                FROM orders GROUP BY o_custkey, o_orderdate
            ),
            b AS (
                SELECT e.event_id, e.user_id, e.ts,
                       o.o_orderkey AS bk, o.o_orderdate AS bd
                FROM events e
                ASOF LEFT JOIN latest o
                  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
            ),
            f AS (
                SELECT e.event_id, o.o_orderkey AS fk, o.o_orderdate AS fd
                FROM events e
                ASOF LEFT JOIN latest o
                  ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
            )
            SELECT b.event_id, b.user_id,
                   CASE WHEN fd IS NULL THEN bk
                        WHEN bd IS NULL THEN fk
                        WHEN b.ts - CAST(bd AS TIMESTAMP) <= CAST(fd AS TIMESTAMP) - b.ts THEN bk
                        ELSE fk END AS matched_order,
                   CASE WHEN fd IS NULL THEN bd
                        WHEN bd IS NULL THEN fd
                        WHEN b.ts - CAST(bd AS TIMESTAMP) <= CAST(fd AS TIMESTAMP) - b.ts THEN bd
                        ELSE fd END AS matched_date
            FROM b JOIN f USING (event_id)
        """,
        "q_concat_split": """
            SELECT CASE WHEN c_acctbal >= 0 THEN 'pos' ELSE 'neg' END AS bucket,
                   count(*) AS n,
                   round(sum(c_acctbal), 2) AS total
            FROM customer
            GROUP BY 1
        """,
        "q_flatten_tokens": """
            SELECT token, count(*) AS n
            FROM (SELECT unnest(string_split(p_name, ' ')) AS token FROM part)
            GROUP BY token
        """,
        "q_ix_lookup": """
            SELECT c_mktsegment, count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "q_sql_passthrough": """
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   ROUND(SUM(l_extendedprice), 2) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
            GROUP BY l_returnflag
            HAVING COUNT(*) > 10
        """,
        "q_prev_next": """
            SELECT event_id, user_id,
                   lag(event_id) OVER w AS prev_event,
                   lead(event_id) OVER w AS next_event
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        """,
        "q_diff_values": """
            SELECT event_id, user_id,
                   round(value - lag(value) OVER w, 6) AS diff_value
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        """,
        "q_topk_orders": """
            SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rn
                FROM orders
            ) WHERE rn <= 3
        """,
        "q_deduplicate_latest": """
            SELECT user_id, event_id, round(value, 6) AS value
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id ORDER BY event_id DESC) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "q_window_tumbling": """
            SELECT date_trunc('hour', ts) AS _pw_window_start,
                   event_type,
                   count(*) AS n,
                   round(sum(value), 6) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "q_window_sliding": """
            SELECT TIMESTAMP '1970-01-01'
                     + to_seconds(CAST(floor(epoch(ts) / 900) * 900 - g * 900 AS BIGINT))
                     AS _pw_window_start,
                   count(*) AS n
            FROM events, (SELECT unnest([0, 1, 2, 3]) AS g)
            WHERE epoch(ts) >= floor(epoch(ts) / 900) * 900 - g * 900
              AND epoch(ts) <  floor(epoch(ts) / 900) * 900 - g * 900 + 3600
            GROUP BY 1
        """,
        "q_window_session": """
            WITH flagged AS (
                SELECT user_id, ts, value,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 >= INTERVAL 30 MINUTE
                            OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
            ), numbered AS (
                SELECT *, sum(new_sess) OVER (
                    PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS sess_id
                FROM flagged
            )
            SELECT min(ts) AS session_start,
                   max(ts) AS session_end,
                   user_id,
                   count(*) AS n,
                   round(sum(value), 6) AS sum_value
            FROM numbered
            GROUP BY user_id, sess_id
        """,
        "q_asof_join": """
            WITH latest AS (
                SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
                FROM orders GROUP BY o_custkey, o_orderdate
            )
            SELECT e.event_id, e.user_id,
                   o.o_orderkey AS matched_order,
                   o.o_orderdate AS matched_date
            FROM events e
            ASOF LEFT JOIN latest o
              ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        """,
        "q_unique_any": """
            SELECT l_orderkey,
                   count(*) AS n,
                   CASE WHEN count(DISTINCT l_returnflag) = 1
                         AND count(l_returnflag) = count(*)
                        THEN min(l_returnflag) END AS uniq_flag,
                   min(l_linestatus) AS any_status
            FROM lineitem GROUP BY l_orderkey
        """,
        "q_asof_now": """
            SELECT e.event_id, e.user_id, c.c_name AS cust_name
            FROM events e JOIN customer c ON e.user_id = c.c_custkey
        """,
        "q_session_predicate": """
            WITH s AS (
                SELECT user_id, ts, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts - lag(ts) OVER w) <= 600
                            THEN 0 ELSE 1 END AS brk
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), g AS (
                SELECT *, sum(brk) OVER (
                    PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM s
            )
            SELECT user_id, min(ts) AS _pw_window_start,
                   max(ts) AS _pw_window_end, count(*) AS n,
                   round(max(value), 6) AS v_max
            FROM g GROUP BY user_id, sid
        """,
        "q_interval_outer": """
            WITH l AS (SELECT * FROM events WHERE event_type = 'error'),
                 r AS (SELECT * FROM events WHERE event_type = 'purchase'),
                 m AS (
                    SELECT a.event_id AS id_a, b.event_id AS id_b
                    FROM l a JOIN r b
                      ON a.user_id = b.user_id
                     AND b.ts >= a.ts
                     AND b.ts <= a.ts + INTERVAL 1800 SECOND
                 )
            SELECT id_a, id_b FROM m
            UNION ALL
            SELECT a.event_id, NULL FROM l a
            WHERE a.event_id NOT IN (SELECT id_a FROM m)
            UNION ALL
            SELECT NULL, b.event_id FROM r b
            WHERE b.event_id NOT IN (SELECT id_b FROM m)
        """,
        "q_asof_right": """
            WITH latest AS (
                SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
                FROM orders GROUP BY o_custkey, o_orderdate
            ), m AS (
                SELECT e.event_id, o.o_orderkey, o.o_orderdate
                FROM events e
                ASOF LEFT JOIN latest o
                  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
                WHERE o.o_orderkey IS NOT NULL
            )
            SELECT event_id, o_orderkey AS matched_order,
                   o_orderdate AS matched_date
            FROM m
            UNION ALL
            SELECT NULL, o.o_orderkey, o.o_orderdate FROM latest o
            WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM m)
        """,
        "q_interval_join": """
            SELECT a.event_id AS id_a, b.event_id AS id_b
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND b.ts >= a.ts
             AND b.ts <= a.ts + INTERVAL 3600 SECOND
             AND a.event_id != b.event_id
        """,
        "q_window_join": """
            SELECT ws, count(*) AS n_pairs FROM (
                SELECT CAST(floor(epoch(a.ts) / 3600) * 3600 AS BIGINT) AS ws,
                       a.event_id, b.event_id
                FROM events a JOIN events b
                  ON a.user_id = b.user_id
                 AND floor(epoch(a.ts) / 3600) = floor(epoch(b.ts) / 3600)
            ) GROUP BY ws
        """,
        "q_intervals_over": """
            WITH probes AS (
                SELECT DISTINCT ts AS p_ts FROM events WHERE event_type = 'error'
            )
            SELECT p.p_ts, count(*) AS n, round(sum(e.value), 6) AS sum_value
            FROM probes p JOIN events e
              ON e.ts >= p.p_ts - INTERVAL 10 MINUTE AND e.ts <= p.p_ts
            GROUP BY p.p_ts
        """,
        "q_dedup_exact": """
            SELECT lang, count(*) AS n_docs FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                    ORDER BY doc_id) AS rn
                FROM documents
            ) WHERE rn = 1
            GROUP BY lang
        """,
        "q_text_stats": """
            SELECT lang,
                   count(*) AS n_docs,
                   round(avg(len(regexp_split_to_array(trim(text), '\\s+'))), 4) AS avg_tokens,
                   round(avg(round(list_aggregate(list_transform(
                       regexp_split_to_array(trim(text), '\\s+'), w -> length(w)),
                       'sum')::DOUBLE / len(regexp_split_to_array(trim(text), '\\s+')), 6)), 4)
                     AS avg_word_len,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars
            FROM documents
            GROUP BY lang
        """,
        "q_lang_id": f"""
            WITH scored AS (
                SELECT lang,
                       len(list_filter(toks, x -> x IN ({sw['en']}))) AS s_en,
                       len(list_filter(toks, x -> x IN ({sw['de']}))) AS s_de,
                       len(list_filter(toks, x -> x IN ({sw['es']}))) AS s_es,
                       len(list_filter(toks, x -> x IN ({sw['fr']}))) AS s_fr
                FROM (SELECT lang,
                             regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
                      FROM documents)
            )
            SELECT lang,
                   CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                        WHEN s_de > 0 AND s_de > s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                        WHEN s_es > 0 AND s_es > s_en AND s_es > s_de AND s_es >= s_fr THEN 'es'
                        WHEN s_fr > 0 AND s_fr > s_en AND s_fr > s_de AND s_fr > s_es THEN 'fr'
                        ELSE 'und' END AS pred_lang,
                   count(*) AS n
            FROM scored
            GROUP BY 1, 2
        """,
        "q_ngram_jaccard": _jaccard_pairs_sql(0.2),
        "q_knn_bruteforce": knn_top5_sql,
        "q_knn_ivf": knn_top5_sql,
        "q_embedding_pairs": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(
                       a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.9
        """,
        "q_minhash_lsh": jaccard_08_pairs_sql,
        "q_token_splitter": """
            WITH toks AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
                FROM documents
            ), p AS (
                SELECT doc_id, t, len(t) AS n,
                       CAST(ceil(len(t) / 32.0) AS BIGINT) AS k_raw
                FROM toks
            ), p2 AS (
                SELECT doc_id, t, n,
                       CASE WHEN k_raw > 1 AND n - (k_raw - 1) * 32 < 8
                            THEN k_raw - 1 ELSE k_raw END AS k
                FROM p
            ), ch AS (
                SELECT doc_id, t, n, k, unnest(range(0, k)) AS chunk_idx FROM p2
            )
            SELECT doc_id, chunk_idx,
                   array_to_string(t[chunk_idx * 32 + 1 :
                       CASE WHEN chunk_idx < k - 1 THEN (chunk_idx + 1) * 32
                            ELSE n END], ' ') AS chunk,
                   CASE WHEN chunk_idx < k - 1 THEN 32
                        ELSE n - chunk_idx * 32 END AS n_tokens
            FROM ch
        """,

        "q_bm25": _BM25_SQL,
        "q_rerank": f"""
            WITH bm AS ({_BM25_SQL}),
            qv(query_id, query) AS (
                VALUES (1, 'spark query window'), (2, 'batch data table')
            ),
            cov AS (
                SELECT c.query_id, c.doc_id,
                       round(len(list_intersect(
                           list_distinct(regexp_split_to_array(lower(trim(d.text)), '\\s+')),
                           list_distinct(regexp_split_to_array(lower(trim(q.query)), '\\s+'))
                       ))::DOUBLE /
                       len(list_distinct(regexp_split_to_array(lower(trim(q.query)), '\\s+'))),
                       6) AS rerank_score
                FROM bm c
                JOIN documents d USING (doc_id)
                JOIN qv q USING (query_id)
            )
            SELECT query_id, doc_id, rerank_score,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY rerank_score DESC, doc_id ASC) AS rerank
            FROM cov
        """,
        "q_connected_components": _neardup_cc_sql("component"),
        "q_louvain": _neardup_cc_sql("community"),
        # closed-form hierarchy of the planted cliques-of-cliques graph
        # (see q_louvain_levels docstring for the provability argument)
        "q_louvain_levels": """
            SELECT v.range AS vertex, CAST(1 AS INTEGER) AS level,
                   (v.range // 4) * 4 AS community
            FROM range(48) v
            UNION ALL
            SELECT v.range, CAST(2 AS INTEGER), (v.range // 12) * 12
            FROM range(48) v
        """,
        "q_stratified_sample": f"""
            SELECT doc_id, lang FROM documents
            WHERE {_bucket_sql("doc_id", 3)} <
                  CASE lang
                      WHEN 'en' THEN {_frac_threshold(0.1)}
                      WHEN 'de' THEN {_frac_threshold(0.5)}
                      WHEN 'fr' THEN {_frac_threshold(1.0)}
                      ELSE {_frac_threshold(0.25)}
                  END
        """,
        "q_bigram_logprob": _bigram_logprob_oracle_sql(lam=0.7),
        "q_domain_filter": r"""
            WITH u AS (
                SELECT doc_id,
                       'https://' ||
                       CASE doc_id % 5
                           WHEN 0 THEN 'blocked.test'
                           WHEN 1 THEN 'sub.blocked.test'
                           ELSE 'site' || (doc_id % 20)::VARCHAR || '.org'
                       END || '/doc/' || doc_id::VARCHAR AS url
                FROM documents
            ), hosts AS (
                SELECT doc_id, lower(regexp_extract(url, '^[a-z]+://([^/]+)', 1)) AS host
                FROM u
            )
            SELECT doc_id, host FROM hosts
            WHERE host <> 'blocked.test' AND NOT ends_with(host, '.blocked.test')
        """,
        "q_url_normalize": r"""
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'http' END
                   || '://'
                   || CASE doc_id % 4
                          WHEN 0 THEN 'example.com'
                          WHEN 1 THEN 'news.co.uk'
                          WHEN 2 THEN 'sub.site' || (doc_id % 7)::VARCHAR || '.org'
                          ELSE 'media.example.com.au'
                      END
                   || CASE WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END
                   || '/Path/' || doc_id::VARCHAR
                   || '?id=' || doc_id::VARCHAR
                   -- utm_* stripped; bare ref is content-bearing and KEPT
                   || CASE WHEN doc_id % 2 = 0 THEN '&ref=home'
                           ELSE '&page=2' END
                       AS norm_url,
                   CASE doc_id % 4
                       WHEN 0 THEN 'example.com'
                       WHEN 1 THEN 'news.co.uk'
                       WHEN 2 THEN 'sub.site' || (doc_id % 7)::VARCHAR || '.org'
                       ELSE 'media.example.com.au'
                   END AS host,
                   CASE doc_id % 4
                       WHEN 0 THEN 'example.com'
                       WHEN 1 THEN 'news.co.uk'
                       WHEN 2 THEN 'site' || (doc_id % 7)::VARCHAR || '.org'
                       ELSE 'example.com.au'
                   END AS reg_domain
            FROM documents
        """,
        "q_robots": """
            SELECT doc_id,
                   'https://site' || (doc_id % 3)::VARCHAR || '.test' ||
                   CASE doc_id % 4
                       WHEN 0 THEN '/public/p' || doc_id::VARCHAR
                       WHEN 1 THEN '/private/p' || doc_id::VARCHAR
                       WHEN 2 THEN '/private/pub/p' || doc_id::VARCHAR
                       ELSE '/'
                   END AS url,
                   CASE
                       WHEN doc_id % 3 = 1 THEN false        -- Disallow: / ('*' fallback)
                       WHEN doc_id % 3 = 0 AND doc_id % 4 = 1 THEN false
                       -- site2: 'bot' group (multi-UA run) Disallow /private
                       -- overrides the '*' Allow; /private/pub has no bot Allow
                       WHEN doc_id % 3 = 2 AND doc_id % 4 IN (1, 2) THEN false
                       ELSE true
                   END AS allowed
            FROM documents
        """,
        "q_frontier": """
            -- page <loc>: canonicalized (www./case/utm_ stripped) and
            -- allowed on every site for agent 'bot' (site0 '*'-fallback
            -- Disallow hits only /private; site1's bot group allows it;
            -- site2 allows all)
            SELECT doc_id,
                   'https://site' || (doc_id % 3)::VARCHAR || '.test/Page'
                       || doc_id::VARCHAR || '?id=' || doc_id::VARCHAR
                       AS norm_url,
                   'site' || (doc_id % 3)::VARCHAR || '.test' AS host
            FROM documents
            UNION ALL
            -- /private <loc>: survives ONLY on site2 (allow-all group);
            -- site0 '*' and site1 bot-run both Disallow /private
            SELECT doc_id,
                   'https://site' || (doc_id % 3)::VARCHAR
                       || '.test/private/p' || doc_id::VARCHAR AS norm_url,
                   'site' || (doc_id % 3)::VARCHAR || '.test' AS host
            FROM documents WHERE doc_id % 3 = 2
        """,
        "q_bpe_tokenize": f"""
            -- independent replay of greedy longest-match BPE: the shared
            -- CTE (_longest_match_cte) peels the longest vocab prefix
            -- off each word one token at a time, UNK-safe (-1, advance
            -- one char); row_number over (word ordinal, peel step)
            -- reconstructs the flattened per-doc token position
            WITH RECURSIVE {_longest_match_cte(10)}
            SELECT doc_id,
                   (row_number() OVER (PARTITION BY doc_id
                                       ORDER BY wp, k) - 1)::BIGINT AS pos,
                   tid::BIGINT AS token_id
            FROM step WHERE k > 0
        """,
        "q_bpe_merges": r"""
            -- independent replay of ranked-merge BPE: symbols start as
            -- characters; each recursive step applies the LOWEST-rank
            -- applicable merge (leftmost on rank ties — list_sort of
            -- (rank, position) structs, take [1]) until none applies;
            -- final symbols map through the vocab, misses -> -1 (UNK).
            WITH RECURSIVE
            m AS (SELECT MAP(
                ['t|h','th|e','a|b','ab|l','e|s','l|e','o|r','a|n',
                 't|i','ti|o','tio|n','s|c','sc|an','r|o','ro|w'],
                [0,1,2,3,4,5,6,7,8,9,10,11,12,13,14]) AS rk),
            vocab(tok, tid) AS (
              SELECT chr((97+i)::INT), i::INT FROM range(26) t(i)
              UNION ALL
              SELECT * FROM (VALUES ('th',26),('the',27),('ab',28),
                ('abl',29),('es',30),('le',31),('or',32),('an',33),
                ('ti',34),('tio',35),('tion',36),('sc',37),('scan',38),
                ('ro',39),('row',40)) v(a,b)
            ),
            words AS (
              SELECT doc_id, wp, w FROM (
                SELECT doc_id, generate_subscripts(l,1) AS wp,
                       unnest(l) AS w
                FROM (SELECT doc_id,
                             list_append(
                               string_split_regex(lower(trim(text)),
                                                  '\s+')[1:6],
                               'x' || (doc_id % 10)::VARCHAR || '!') AS l
                      FROM documents)
              ) WHERE w <> ''
            ),
            step(doc_id, wp, parts, k) AS (
              SELECT doc_id, wp,
                     list_transform(range(1, length(w)+1),
                                    i -> substr(w, i::INT, 1)),
                     0
              FROM words
              UNION ALL
              SELECT doc_id, wp,
                     list_concat(list_concat(
                         parts[1:best.i-1],
                         [parts[best.i] || parts[best.i+1]]),
                         parts[best.i+2:]),
                     k + 1
              FROM (
                SELECT s.doc_id, s.wp, s.parts, s.k,
                       (list_sort(list_filter(
                           list_transform(range(1, len(s.parts)),
                             i -> struct_pack(
                                 r := m.rk[s.parts[i] || '|'
                                           || s.parts[i+1]][1],
                                 i := i::INT)),
                           x -> x.r IS NOT NULL)))[1] AS best
                FROM step s, m
                WHERE len(s.parts) > 1
              ) WHERE best IS NOT NULL
            ),
            final AS (
              SELECT doc_id, wp, parts FROM (
                SELECT doc_id, wp, parts,
                       row_number() OVER (PARTITION BY doc_id, wp
                                          ORDER BY k DESC) AS rn
                FROM step
              ) WHERE rn = 1
            ),
            toks AS (
              SELECT doc_id, wp, generate_subscripts(parts,1) AS sp,
                     unnest(parts) AS part
              FROM final
            )
            SELECT t.doc_id,
                   (row_number() OVER (PARTITION BY t.doc_id
                                       ORDER BY t.wp, t.sp) - 1)::BIGINT
                       AS pos,
                   coalesce(v.tid, -1)::BIGINT AS token_id
            FROM toks t LEFT JOIN vocab v ON t.part = v.tok
        """,
        "q_crawl_delay": """
            -- the robots discovery loop derived independently: every host
            -- h{d}.test declares Crawl-delay (d%7+1) and one sitemap whose
            -- <loc> canonicalizes (WWW./case/utm_ stripped) to Page{d}
            SELECT 'h' || doc_id::VARCHAR || '.test' AS host,
                   (doc_id % 7 + 1)::BIGINT AS crawl_delay,
                   'https://h' || doc_id::VARCHAR || '.test/Page'
                       || doc_id::VARCHAR || '?id=' || doc_id::VARCHAR
                       AS norm_url
            FROM documents
        """,
        "q_robots_wildcards": """
            -- verdicts by doc_id//4 parity (doc_id%2 is constant within
            -- a %4 host class): even-quotient docs hit their host's
            -- wildcard Disallow, odd-quotient miss it; w0's odd docs prove the LONGER Allow '/pub*.php$'
            -- overrides '/*.php$'
            SELECT doc_id,
                   'https://w' || (doc_id % 4)::VARCHAR || '.test' ||
                   CASE
                     WHEN doc_id % 4 = 0 AND (doc_id // 4) % 2 = 0
                       THEN '/dir/pg' || doc_id::VARCHAR || '.php'
                     WHEN doc_id % 4 = 0
                       THEN '/pub' || doc_id::VARCHAR || '.php'
                     WHEN doc_id % 4 = 1 AND (doc_id // 4) % 2 = 0
                       THEN '/a' || doc_id::VARCHAR || 'b'
                     WHEN doc_id % 4 = 1
                       THEN '/x' || doc_id::VARCHAR
                     WHEN doc_id % 4 = 2 AND (doc_id // 4) % 2 = 0
                       THEN '/p%2Aq_x/y' || doc_id::VARCHAR
                     WHEN doc_id % 4 = 2
                       THEN '/pX2Aq_x/' || doc_id::VARCHAR
                     WHEN (doc_id // 4) % 2 = 0 THEN '/exact'
                     ELSE '/exact/' || doc_id::VARCHAR
                   END AS url,
                   ((doc_id // 4) % 2 = 1) AS allowed
            FROM documents
        """,
        "q_fetch_schedule": """
            -- per-host queue replay: row_number over the same md5(url:3)
            -- order; hosts 0..9 declare delay (host_idx % 7 + 1), the
            -- rest pace at the 1 s default
            WITH frontier AS (
                SELECT doc_id, doc_id % 20 AS g,
                       'h' || (doc_id % 20)::VARCHAR || '.test' AS host,
                       'https://h' || (doc_id % 20)::VARCHAR || '.test/p'
                           || doc_id::VARCHAR AS url
                FROM documents
            ),
            o AS (
                SELECT doc_id, g, host, url,
                       (row_number() OVER (
                           PARTITION BY host
                           ORDER BY md5(url || ':3'), url
                       ) - 1)::BIGINT AS fetch_seq
                FROM frontier
            )
            SELECT doc_id, host, url, fetch_seq,
                   (fetch_seq * CASE WHEN g < 10 THEN g % 7 + 1
                                     ELSE 1 END)::DOUBLE AS fetch_offset_s
            FROM o
        """,
        "q_fetch_waves": """
            -- md5 queue replay + the try_cast fallback (hosts 5..9
            -- declare the non-numeric 'fast' -> default 1 s) + wave =
            -- floor(offset / 10) and the per-(host, wave) count
            WITH frontier AS (
                SELECT doc_id, doc_id % 20 AS g,
                       'h' || (doc_id % 20)::VARCHAR || '.test' AS host,
                       'https://h' || (doc_id % 20)::VARCHAR || '.test/p'
                           || doc_id::VARCHAR AS url
                FROM documents
            ),
            o AS (
                SELECT doc_id, g, host,
                       (row_number() OVER (
                           PARTITION BY host
                           ORDER BY md5(url || ':3'), url
                       ) - 1)::BIGINT AS fetch_seq
                FROM frontier
            ),
            w AS (
                SELECT doc_id, host, fetch_seq,
                       (floor(fetch_seq * CASE WHEN g < 5 THEN g % 7 + 1
                                               ELSE 1 END
                              / 10.0))::BIGINT AS wave
                FROM o
            )
            SELECT doc_id, host, fetch_seq, wave,
                   (count(*) OVER (PARTITION BY host, wave))::BIGINT
                       AS wave_size
            FROM w
        """,
        "q_wave_counts": """
            -- the wave-count state is batch-invariant: each host's seq
            -- set is 0..n-1 under any batching, so seq by ANY per-host
            -- order, wave = floor(seq * delay / 10), count per
            -- (host, wave); delays replay the try_cast fallback
            WITH frontier AS (
                SELECT doc_id, doc_id % 20 AS g,
                       'h' || (doc_id % 20)::VARCHAR || '.test' AS host
                FROM documents
            ),
            o AS (
                SELECT g, host,
                       (row_number() OVER (
                           PARTITION BY host ORDER BY doc_id
                       ) - 1)::BIGINT AS fetch_seq
                FROM frontier
            ),
            w AS (
                SELECT host,
                       (floor(fetch_seq * CASE WHEN g < 5 THEN g % 7 + 1
                                               ELSE 1 END
                              / 10.0))::BIGINT AS wave
                FROM o
            )
            SELECT host, wave, count(*)::BIGINT AS n
            FROM w GROUP BY host, wave
        """,
        "q_bpe_roundtrip": r"""
            -- the roundtrip contracts stated directly, no BPE replay:
            -- plain mode: decode(encode(x)) = x minus whitespace (full
            -- a-z base vocab makes the a-z-only corpus lossless);
            -- space-marker mode: = x with single spaces back (exact
            -- identity over the normalized first-8-words input)
            SELECT doc_id,
                   array_to_string(
                       string_split_regex(lower(trim(text)),
                                          '\s+')[1:8], '') AS text,
                   array_to_string(
                       string_split_regex(lower(trim(text)),
                                          '\s+')[1:8], ' ') AS text_exact
            FROM documents
        """,
        "q_token_budget_bpe": f"""
            -- n_tokens from the shared UNK-safe longest-match replay
            -- (_longest_match_cte), then the per-lang md5-ordered
            -- running-total prefix in SQL
            WITH RECURSIVE {_longest_match_cte(10)},
            ntok AS (
              SELECT d.doc_id, d.lang,
                     count(s.doc_id)::BIGINT AS n_tokens
              FROM documents d
              LEFT JOIN (SELECT doc_id FROM step WHERE k > 0) s
                ON d.doc_id = s.doc_id
              GROUP BY d.doc_id, d.lang
            ),
            o AS (
              SELECT doc_id, lang, n_tokens,
                     (sum(n_tokens) OVER (
                         PARTITION BY lang
                         ORDER BY md5(doc_id::VARCHAR || ':7'), doc_id
                         ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_tokens
              FROM ntok
            )
            SELECT doc_id, lang, n_tokens, cum_tokens
            FROM o WHERE cum_tokens <= 1500
        """,
        "q_extract_links": """
            SELECT doc_id,
                   'https://site' || (doc_id % 7)::VARCHAR || '.com/page'
                       || doc_id::VARCHAR AS link
            FROM documents
            UNION ALL
            SELECT doc_id, '/rel/' || doc_id::VARCHAR AS link
            FROM documents
        """,
        "q_token_budget": """
            WITH o AS (
                SELECT doc_id, lang, n_chars,
                       (sum(n_chars::BIGINT) OVER (
                           PARTITION BY lang
                           ORDER BY md5(doc_id::VARCHAR || ':5'), doc_id
                           ROWS UNBOUNDED PRECEDING
                       ))::BIGINT AS cum_tokens
                FROM documents
            )
            SELECT doc_id, lang, n_chars, cum_tokens
            FROM o WHERE cum_tokens <= 8000
        """,
        "q_bloom_dedup": """
            -- NOT EXISTS, not NOT IN: a NULL text in the seen set would
            -- make NOT IN return zero rows while the Spark anti-join
            -- (NULL never equal) keeps non-duplicates
            SELECT d.doc_id, d.n_chars FROM documents d
            WHERE NOT EXISTS (
                SELECT 1 FROM documents s
                WHERE s.doc_id % 4 = 0 AND md5(s.text) = md5(d.text)
            )
        """,
        "q_url_dedup": """
            WITH pages AS (
                SELECT doc_id, n_chars, doc_id // 3 AS g,
                       row_number() OVER (
                           PARTITION BY doc_id // 3
                           ORDER BY n_chars DESC, doc_id
                       ) AS rn
                FROM documents
            )
            SELECT doc_id,
                   'https://site' || g::VARCHAR || '.com/Page?id='
                       || g::VARCHAR AS norm_url,
                   n_chars
            FROM pages WHERE rn = 1
        """,
        "q_domain_quota": """
            WITH d AS (
                SELECT doc_id, n_chars,
                       CASE WHEN doc_id % 3 = 0 THEN 'big.co.uk'
                            ELSE 'site' || (doc_id % 11)::VARCHAR || '.org'
                       END AS domain
                FROM documents
            ), r AS (
                SELECT doc_id, domain, n_chars,
                       row_number() OVER (
                           PARTITION BY domain
                           ORDER BY n_chars DESC, doc_id
                       ) AS rank
                FROM d
            )
            SELECT doc_id, domain, n_chars, rank::BIGINT AS rank
            FROM r WHERE rank <= 5
        """,
        "q_gopher_repetition": _gopher_repetition_oracle_sql(),
        "q_windowby_predicate": """
            WITH ordered AS (
                SELECT user_id, ts, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR epoch(ts) - epoch(lag(ts) OVER w) > 600
                            THEN 1 ELSE 0 END AS brk
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), sess AS (
                SELECT *, sum(brk) OVER (
                    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
                ) AS sid
                FROM ordered
            )
            SELECT min(ts) AS session_start, max(ts) AS session_end,
                   user_id,
                   count(*)::BIGINT AS n,
                   round(sum(round(value, 6)::DECIMAL(18,6))::DOUBLE / count(*), 6)
                       AS avg_value
            FROM sess GROUP BY user_id, sid
        """,
        "q_chained_join": """
            SELECT n_name, count(*)::BIGINT AS n_orders,
                   round(sum(o_totalprice::DECIMAL(18,2))::DOUBLE, 2) AS total
            FROM nation
            JOIN customer ON n_nationkey = c_nationkey
            JOIN orders ON c_custkey = o_custkey
            GROUP BY n_name
        """,
        "q_window_numeric": """
            SELECT (floor(epoch(ts) / 3600) * 3600)::BIGINT AS w_start,
                   event_type,
                   count(*)::BIGINT AS n,
                   round(sum(value), 6) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "q_join_instance": """
            WITH v AS (
                SELECT user_id, event_id, date_part('day', ts)::BIGINT AS day
                FROM events WHERE event_type = 'view'
            ), c AS (
                SELECT user_id, event_id, date_part('day', ts)::BIGINT AS day
                FROM events WHERE event_type = 'click'
            )
            SELECT v.user_id, v.day,
                   count(*)::BIGINT AS n_pairs,
                   min(v.event_id) AS first_view,
                   min(c.event_id) AS first_click
            FROM v JOIN c ON v.user_id = c.user_id AND v.day = c.day
            GROUP BY v.user_id, v.day
        """,
        "q_tokenize": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                                   t -> length(t) > 0) AS t
                FROM documents
            ), vocab AS (
                SELECT term, count(*) AS cnt
                FROM (SELECT unnest(t) AS term FROM toks)
                GROUP BY term HAVING count(*) >= 3
            ), ranked AS (
                SELECT term, row_number() OVER (ORDER BY cnt DESC, term ASC) AS tid
                FROM vocab
            ), occ AS (
                SELECT doc_id, unnest(t) AS term, generate_subscripts(t, 1) AS pos
                FROM toks
            ), mapped AS (
                SELECT o.doc_id, o.pos, coalesce(r.tid, 0) AS tid
                FROM occ o LEFT JOIN ranked r USING (term)
            ), arr AS (
                SELECT doc_id, list(tid ORDER BY pos) AS token_ids
                FROM mapped GROUP BY doc_id
            )
            SELECT d.doc_id,
                   md5(array_to_string(coalesce(a.token_ids, []::BIGINT[]), ',')) AS ids_md5,
                   coalesce(len(a.token_ids), 0)::BIGINT AS n_tokens
            FROM documents d LEFT JOIN arr a USING (doc_id)
        """,
        "q_quality_sample": f"""
            SELECT doc_id,
                   CASE WHEN n_chars < 200 THEN 0
                        WHEN n_chars < 400 THEN 1
                        ELSE 2 END AS quality_bin
            FROM documents
            WHERE {_bucket_sql("doc_id", 11)} <
                  CASE WHEN n_chars < 200 THEN {_frac_threshold(0.1)}
                       WHEN n_chars < 400 THEN {_frac_threshold(0.5)}
                       ELSE {_frac_threshold(1.0)} END
        """,
        "q_train_split": _train_split_oracle_sql(),
        "q_shuffle": """
            SELECT doc_id,
                   row_number() OVER (
                       ORDER BY md5(CAST(doc_id AS VARCHAR) || ':7'), doc_id
                   ) - 1 AS position
            FROM documents
            WHERE doc_id IS NOT NULL
        """,
        "q_mix_datasets": f"""
            SELECT doc_id, 'en' AS _pw_source FROM documents WHERE lang = 'en'
            UNION ALL
            SELECT doc_id, 'en' FROM documents WHERE lang = 'en'
            UNION ALL
            SELECT doc_id, 'en' FROM documents
            WHERE lang = 'en'
              AND {_bucket_sql("('en/' || doc_id::VARCHAR)", 0)} < {_frac_threshold(0.5)}
            UNION ALL
            SELECT doc_id, 'de' FROM documents
            WHERE lang = 'de'
              AND {_bucket_sql("('de/' || doc_id::VARCHAR)", 0)} < {_frac_threshold(0.5)}
        """,
        "q_pack_sequences": f"""
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN len(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                       END AS n_tok,
                       {_bucket_sql("doc_id", 0)} % 4 AS shard
                FROM documents
            ), offs AS (
                SELECT doc_id, shard, n_tok,
                       coalesce(sum(n_tok) OVER (
                           PARTITION BY shard ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS start_offset
                FROM toks
            )
            SELECT doc_id, shard, (start_offset // 512)::BIGINT AS seq_id,
                   start_offset::BIGINT AS start_offset, n_tok
            FROM offs
        """,
        "q_eval_schedule": f"""
            -- chunked-prefill replay: the q_pack_sequences sharded
            -- prefix sum, then one row per covered 64-token step via
            -- generate_series, chunk bounds by min/max arithmetic;
            -- zero-token requests keep one zero-length chunk
            WITH toks AS (
                SELECT doc_id,
                       CASE WHEN len(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                       END::BIGINT AS n_tok,
                       {_bucket_sql("doc_id", 0)} % 4 AS shard
                FROM documents
            ), offs AS (
                SELECT doc_id, shard, n_tok,
                       coalesce(sum(n_tok) OVER (
                           PARTITION BY shard ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0)::BIGINT AS start_offset
                FROM toks
            ), chunks AS (
                SELECT doc_id, shard, n_tok, start_offset,
                       unnest(generate_series(
                           start_offset // 64,
                           greatest(start_offset // 64,
                                    (start_offset + n_tok - 1) // 64)
                       ))::BIGINT AS step_id
                FROM offs
            )
            SELECT doc_id, shard, start_offset, n_tok, step_id,
                   greatest(0, step_id * 64 - start_offset)::BIGINT
                       AS chunk_off,
                   (least(start_offset + n_tok, (step_id + 1) * 64)
                    - greatest(start_offset, step_id * 64))::BIGINT
                       AS chunk_len
            FROM chunks
        """,
        "q_pack_no_straddle": f"""
            -- replay the greedy no-straddle fold: per shard, step the
            -- (fill, seq) state in row_number order; an overflowing doc
            -- (fill > 0 AND fill + n > 256) closes the sequence
            WITH RECURSIVE toks AS (
                SELECT doc_id,
                       CASE WHEN len(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                       END::BIGINT AS n_tok,
                       {_bucket_sql("doc_id", 0)} % 64 AS shard
                FROM documents
            ), base AS (
                SELECT doc_id, n_tok, shard,
                       row_number() OVER (
                           PARTITION BY shard ORDER BY doc_id, n_tok
                       ) AS rn
                FROM toks
            ),
            fold(shard, rn, doc_id, n_tok, seq_id, start_offset, fill) AS (
                SELECT shard, rn, doc_id, n_tok,
                       0::BIGINT, 0::BIGINT, n_tok
                FROM base WHERE rn = 1
                UNION ALL
                SELECT b.shard, b.rn, b.doc_id, b.n_tok,
                       CASE WHEN f.fill > 0 AND f.fill + b.n_tok > 256
                            THEN f.seq_id + 1 ELSE f.seq_id END,
                       CASE WHEN f.fill > 0 AND f.fill + b.n_tok > 256
                            THEN 0 ELSE f.fill END,
                       CASE WHEN f.fill > 0 AND f.fill + b.n_tok > 256
                            THEN b.n_tok ELSE f.fill + b.n_tok END
                FROM fold f
                JOIN base b ON b.shard = f.shard AND b.rn = f.rn + 1
            )
            SELECT doc_id, shard, seq_id, start_offset, n_tok
            FROM fold
        """,
        "q_pack_cut": f"""
            -- expand each doc to per-token global positions (window
            -- cumsum start + intra-doc index), cut every 64: sequence
            -- content = ids in position order, no padding; spans =
            -- per-(seq, doc) position groups (off = min(pos) % 64 since
            -- pos // 64 is constant within the group)
            WITH toks AS (
                SELECT doc_id, (doc_id % 13 + 1)::BIGINT AS n_tok,
                       {_bucket_sql("doc_id", 0)} % 8 AS shard
                FROM documents
            ), offs AS (
                SELECT doc_id, shard, n_tok,
                       coalesce(sum(n_tok) OVER (
                           PARTITION BY shard ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS start_offset
                FROM toks
            ), expanded AS (
                SELECT shard, doc_id,
                       start_offset + unnest(range(n_tok)) AS pos
                FROM offs
            ), seqs AS (
                SELECT shard, (pos // 64)::BIGINT AS seq_id,
                       string_agg(doc_id::VARCHAR, ',' ORDER BY pos) AS tokens,
                       count(*)::BIGINT AS n_tokens
                FROM expanded
                GROUP BY shard, pos // 64
            ), piece AS (
                SELECT shard, (pos // 64)::BIGINT AS seq_id, doc_id,
                       (min(pos) % 64)::BIGINT AS off,
                       count(*)::BIGINT AS len
                FROM expanded
                GROUP BY shard, pos // 64, doc_id
            ), sp AS (
                SELECT shard, seq_id,
                       string_agg(doc_id::VARCHAR || ':' || off::VARCHAR
                                  || ':' || len::VARCHAR,
                                  ';' ORDER BY off) AS spans
                FROM piece
                GROUP BY shard, seq_id
            )
            SELECT s.shard, s.seq_id, s.tokens, s.n_tokens, sp.spans
            FROM seqs s JOIN sp USING (shard, seq_id)
        """,
        "q_pack_materialize": f"""
            -- unit token counts make the greedy no-straddle fold exactly
            -- row_number grouping: seq = (rn-1)//8 per shard; each
            -- sequence's content is its doc_ids in queue order, padded
            -- with -1 to the cap of 8; spans = unit doc_id:(rn-1)%8:1
            -- entries in queue order; unit counts can never exceed the
            -- cap, so oversized is constant FALSE
            WITH base AS (
                SELECT doc_id,
                       {_bucket_sql("doc_id", 0)} % 16 AS shard,
                       row_number() OVER (
                           PARTITION BY {_bucket_sql("doc_id", 0)} % 16
                           ORDER BY doc_id
                       ) AS rn
                FROM documents
            )
            SELECT shard,
                   ((rn - 1) // 8)::BIGINT AS seq_id,
                   string_agg(doc_id::VARCHAR, ',' ORDER BY rn)
                       || repeat(',-1', 8 - count(*)::INT) AS tokens,
                   count(*)::BIGINT AS n_tokens,
                   string_agg(doc_id::VARCHAR || ':'
                              || ((rn - 1) % 8)::VARCHAR || ':1',
                              ';' ORDER BY rn) AS spans,
                   FALSE AS oversized
            FROM (SELECT doc_id, shard, rn, (rn - 1) // 8 AS g FROM base)
            GROUP BY shard, g, ((rn - 1) // 8)
        """,
        "q_train_sequences": f"""
            -- the real composition, replayed end to end: (1) the
            -- UNK-safe greedy longest-match CTE gives per-doc id strings
            -- + counts, EOS 55 appended (empty docs become just '55');
            -- (2) the recursive (fill, seq) recurrence steps the
            -- no-straddle layout per md5 shard; (3) string_agg in
            -- start_offset order re-assembles each sequence, -1-padded
            -- to the cap of 32, with the doc_id:off:len span map and
            -- the sum(n_tok) > cap oversized flag
            WITH RECURSIVE {_train_fold_cte()}
            {_TRAIN_SEQ_SELECT}
        """,
        "q_pack_export": f"""
            -- the q_train_sequences replay (the on-disk rows must be
            -- byte-identical to the pipeline — the parquet write/read
            -- round-trip is invisible), plus the manifest's per-shard
            -- stats re-derived by the packing_efficiency arithmetic
            -- over the same sequences and joined onto every row
            WITH RECURSIVE {_train_fold_cte()},
            out AS ({_TRAIN_SEQ_SELECT}
            ),
            stats AS (
                SELECT shard,
                       count(*)::BIGINT AS m_n_seqs,
                       sum(n_tokens)::BIGINT AS m_real_tokens,
                       sum(CASE WHEN oversized THEN 0
                           ELSE 32 - n_tokens END)::BIGINT AS m_padded_slots,
                       sum(CASE WHEN oversized THEN 1
                           ELSE 0 END)::BIGINT AS m_oversized_seqs
                FROM out GROUP BY shard
            )
            SELECT o.shard, o.seq_id, o.tokens, o.n_tokens, o.spans,
                   o.oversized,
                   s.m_n_seqs, s.m_real_tokens, s.m_padded_slots,
                   s.m_oversized_seqs,
                   round(s.m_padded_slots
                         / (s.m_padded_slots + s.m_real_tokens), 6)
                       AS m_waste_frac,
                   round(s.m_padded_slots
                         / (nullif(s.m_n_seqs - s.m_oversized_seqs, 0)
                            * 32.0), 6)
                       AS m_capped_waste_frac
            FROM out o JOIN stats s USING (shard)
        """,
        "q_pack_slices": f"""
            -- the q_train_sequences replay sliced by the trainer
            -- contract: rank = shard % 3 (the rank rule), position =
            -- row_number within rank over ascending (shard, seq_id)
            -- (the no-shuffle order contract — the Spark side computes
            -- it as manifest prefix sums + a per-shard window, which
            -- must collapse to this), rank 1 resuming mid-epoch at
            -- skip_seqs=2 with absolute positions kept
            WITH RECURSIVE {_train_fold_cte()},
            out AS ({_TRAIN_SEQ_SELECT}
            )
            SELECT * FROM (
                SELECT shard % 3 AS rank,
                       row_number() OVER (PARTITION BY shard % 3
                                          ORDER BY shard, seq_id) - 1
                           AS position,
                       shard, seq_id, tokens, n_tokens, spans, oversized
                FROM out
            ) WHERE rank <> 1 OR position >= 2
        """,
        "q_pack_equalize": f"""
            -- the q_train_sequences replay sliced by rank = shard % 2
            -- in writer order, then CLIPPED to the cross-rank minimum
            -- count (the distributed-sampler equalize contract): the
            -- engine derives the cutoff from manifest arithmetic, the
            -- replay re-derives it as min over per-rank counts
            WITH RECURSIVE {_train_fold_cte()},
            out AS ({_TRAIN_SEQ_SELECT}
            ),
            sliced AS (
                SELECT shard % 2 AS rank,
                       row_number() OVER (PARTITION BY shard % 2
                                          ORDER BY shard, seq_id) - 1
                           AS position,
                       shard, seq_id, tokens, n_tokens, spans, oversized
                FROM out
            ),
            cut AS (
                SELECT min(c) AS m
                FROM (SELECT count(*) AS c FROM sliced GROUP BY rank)
            )
            SELECT rank, position, shard, seq_id, tokens, n_tokens,
                   spans, oversized
            FROM sliced, cut WHERE position < m
        """,
        "q_pack_slices_epoch": f"""
            -- the q_train_sequences replay sliced by rank = shard % 2,
            -- re-permuted per rank by the md5 epoch shuffle (the exact
            -- q_shuffle order contract over the shard:seq_id key at
            -- seed 7), rank 0 resuming mid-epoch at skip_seqs=3 with
            -- absolute positions kept
            WITH RECURSIVE {_train_fold_cte()},
            out AS ({_TRAIN_SEQ_SELECT}
            )
            SELECT * FROM (
                SELECT shard % 2 AS rank,
                       row_number() OVER (
                           PARTITION BY shard % 2
                           ORDER BY md5(shard::VARCHAR || ':'
                                        || seq_id::VARCHAR || ':7'),
                                    shard::VARCHAR || ':'
                                        || seq_id::VARCHAR
                       ) - 1 AS position,
                       shard, seq_id, tokens, n_tokens, spans, oversized
                FROM out
            ) WHERE rank <> 0 OR position >= 3
        """,
        "q_length_buckets": """
            -- the SFT batching replay: bucket = count of boundaries
            -- exceeded, per-bucket md5(doc_id:5) order (tie-break id),
            -- fixed-shape cutoff count//8*8, pad target = the bucket's
            -- boundary (NULL for the open bucket)
            WITH src AS (
                SELECT doc_id, strlen(text)::BIGINT AS n_bytes
                FROM documents WHERE text IS NOT NULL
            ),
            b AS (
                SELECT doc_id, n_bytes,
                       ((n_bytes > 64)::INT + (n_bytes > 256)::INT
                        + (n_bytes > 1024)::INT)::BIGINT AS bucket
                FROM src
            ),
            o AS (
                SELECT *, row_number() OVER (
                              PARTITION BY bucket
                              ORDER BY md5(doc_id::VARCHAR || ':5'),
                                       doc_id
                          ) - 1 AS ord,
                          count(*) OVER (PARTITION BY bucket) AS n
                FROM b
            )
            SELECT doc_id, n_bytes, bucket,
                   (ord // 8)::BIGINT AS batch_id,
                   (ord % 8)::BIGINT AS slot,
                   (CASE bucket WHEN 0 THEN 64 WHEN 1 THEN 256
                                WHEN 2 THEN 1024 END)::BIGINT AS cap
            FROM o WHERE ord < (n // 8) * 8
        """,
        "q_bucket_boundaries": """
            -- percentile_disc replay with EXACT integer arithmetic:
            -- boundary k = smallest length whose cumulative count cm
            -- satisfies cm * n >= k * total (first value with
            -- cume_dist >= k/n, no float fractions)
            WITH lens AS (
                SELECT strlen(text)::BIGINT AS l
                FROM documents WHERE text IS NOT NULL
            ),
            counts AS (SELECT l, count(*) AS c FROM lens GROUP BY l),
            cum AS (
                SELECT l,
                       sum(c) OVER (ORDER BY l) AS cm,
                       sum(c) OVER () AS tot
                FROM counts
            ),
            ks AS (SELECT range::BIGINT AS quantile FROM range(1, 9))
            SELECT quantile, min(l)::BIGINT AS boundary
            FROM cum JOIN ks ON cm * 8 >= quantile * tot
            GROUP BY quantile
        """,
        "q_sft_epochs": """
            -- the unpacked multi-epoch replay: each epoch e re-permutes
            -- every bucket by md5(doc_id:e) (seed = epoch); bucket
            -- membership, the ragged cutoff and the pad target are
            -- seed-independent, so they are stated once and joined to
            -- both epochs
            WITH src AS (
                SELECT doc_id, strlen(text)::BIGINT AS n_bytes
                FROM documents WHERE text IS NOT NULL
            ),
            b AS (
                SELECT doc_id, n_bytes,
                       ((n_bytes > 64)::INT + (n_bytes > 256)::INT
                        + (n_bytes > 1024)::INT)::BIGINT AS bucket
                FROM src
            ),
            o AS (
                SELECT e.epoch::BIGINT AS epoch, b.*,
                       row_number() OVER (
                           PARTITION BY e.epoch, bucket
                           ORDER BY md5(doc_id::VARCHAR || ':'
                                        || e.epoch::VARCHAR),
                                    doc_id
                       ) - 1 AS ord,
                       count(*) OVER (
                           PARTITION BY e.epoch, bucket
                       ) AS cnt
                FROM b CROSS JOIN (VALUES (0), (1)) AS e(epoch)
            )
            SELECT epoch, doc_id, n_bytes, bucket,
                   (ord // 8)::BIGINT AS batch_id,
                   (ord % 8)::BIGINT AS slot,
                   (CASE bucket WHEN 0 THEN 64 WHEN 1 THEN 256
                                WHEN 2 THEN 1024 END)::BIGINT AS cap
            FROM o WHERE ord < (cnt // 8) * 8
        """,
        "q_sft_stream": """
            -- the streaming padded-batch replay: composite (arrival
            -- half, md5(doc_id:7) within half) numbering over BOUNDED
            -- buckets (n > 64 drops up front), pad always the cap,
            -- every padded id and mask bit stated as strings
            WITH toks AS (
                SELECT doc_id,
                       list_transform(
                           list_filter(
                               regexp_split_to_array(trim(text), '\\s+'),
                               w -> length(w) > 0),
                           w -> (ascii(w) * 100 + length(w))::BIGINT) AS t
                FROM documents WHERE text IS NOT NULL
            ),
            mx AS (SELECT max(doc_id) // 2 AS cut FROM toks),
            b AS (
                SELECT doc_id, t, len(t)::BIGINT AS n,
                       least(len(t) // 3 + 1, len(t))::BIGINT AS p,
                       ((len(t) > 16)::INT + (len(t) > 32)::INT)::BIGINT
                           AS bucket,
                       (doc_id > cut)::INT AS half
                FROM toks, mx
                WHERE len(t) <= 64
            ),
            o AS (
                SELECT *, row_number() OVER (
                              PARTITION BY bucket
                              ORDER BY half,
                                       md5(doc_id::VARCHAR || ':7'),
                                       doc_id
                          ) - 1 AS ord
                FROM b
            ),
            numbered AS (
                SELECT doc_id, t, n, p, bucket,
                       (ord // 4)::BIGINT AS batch_id,
                       (ord % 4)::BIGINT AS slot,
                       (CASE bucket WHEN 0 THEN 16 WHEN 1 THEN 32
                                    WHEN 2 THEN 64 END)::BIGINT AS pad_len
                FROM o
            )
            SELECT doc_id, bucket, batch_id, slot, pad_len,
                   array_to_string(
                       list_concat(
                           t, [(-1)::BIGINT
                               for i in range((pad_len - n)::INT)]), ',')
                       AS input_ids,
                   repeat('1', n::INT) || repeat('0', (pad_len - n)::INT)
                       AS attn,
                   repeat('0', p::INT) || repeat('1', (n - p)::INT)
                       || repeat('0', (pad_len - n)::INT) AS loss
            FROM numbered
        """,
        "q_sft_incremental": """
            -- the streaming SFT batching replay: the COMPOSITE order
            -- (arrival half by the max(doc_id)//2 cut, then
            -- md5(doc_id:5) within the half, id tie-break) numbers
            -- each bucket once — equal to threading the counter state
            -- across the two micro-batches, because sealed batches
            -- never renumber and appends only fill the open tail
            WITH src AS (
                SELECT doc_id, strlen(text)::BIGINT AS n_bytes
                FROM documents WHERE text IS NOT NULL
            ),
            mx AS (SELECT max(doc_id) // 2 AS cut FROM src),
            b AS (
                SELECT doc_id, n_bytes,
                       ((n_bytes > 64)::INT + (n_bytes > 256)::INT
                        + (n_bytes > 1024)::INT)::BIGINT AS bucket,
                       (doc_id > cut)::INT AS half
                FROM src, mx
            ),
            o AS (
                SELECT *, row_number() OVER (
                              PARTITION BY bucket
                              ORDER BY half,
                                       md5(doc_id::VARCHAR || ':5'),
                                       doc_id
                          ) - 1 AS ord
                FROM b
            )
            SELECT doc_id, n_bytes, bucket,
                   (ord // 8)::BIGINT AS batch_id,
                   (ord % 8)::BIGINT AS slot,
                   (CASE bucket WHEN 0 THEN 64 WHEN 1 THEN 256
                                WHEN 2 THEN 1024 END)::BIGINT AS cap
            FROM o
        """,
        "q_sft_batches": """
            -- the SFT padded-batch replay: deterministic word-id
            -- tokens, the bucket expression, the per-bucket
            -- md5(doc_id:7) permutation, the ragged cutoff, ONE pad
            -- target per batch (boundary; open bucket = batch max via
            -- a window), then every padded id and mask bit as strings
            WITH toks AS (
                SELECT doc_id,
                       list_transform(
                           list_filter(
                               regexp_split_to_array(trim(text), '\\s+'),
                               w -> length(w) > 0),
                           w -> (ascii(w) * 100 + length(w))::BIGINT) AS t
                FROM documents WHERE text IS NOT NULL
            ),
            b AS (
                SELECT doc_id, t, len(t)::BIGINT AS n,
                       least(len(t) // 3 + 1, len(t))::BIGINT AS p,
                       ((len(t) > 16)::INT + (len(t) > 32)::INT
                        + (len(t) > 64)::INT)::BIGINT AS bucket
                FROM toks
            ),
            o AS (
                SELECT *, row_number() OVER (
                              PARTITION BY bucket
                              ORDER BY md5(doc_id::VARCHAR || ':7'),
                                       doc_id
                          ) - 1 AS ord,
                          count(*) OVER (PARTITION BY bucket) AS cnt
                FROM b
            ),
            kept AS (
                SELECT doc_id, t, n, p, bucket,
                       (ord // 4)::BIGINT AS batch_id,
                       (ord % 4)::BIGINT AS slot,
                       (CASE bucket WHEN 0 THEN 16 WHEN 1 THEN 32
                                    WHEN 2 THEN 64 END)::BIGINT AS cap
                FROM o WHERE ord < (cnt // 4) * 4
            ),
            padded AS (
                SELECT *, coalesce(cap, max(n) OVER (
                              PARTITION BY bucket, batch_id
                          ))::BIGINT AS pad_len
                FROM kept
            )
            SELECT doc_id, bucket, batch_id, slot, pad_len,
                   array_to_string(
                       list_concat(
                           t, [(-1)::BIGINT
                               for i in range((pad_len - n)::INT)]), ',')
                       AS input_ids,
                   repeat('1', n::INT) || repeat('0', (pad_len - n)::INT)
                       AS attn,
                   repeat('0', p::INT) || repeat('1', (n - p)::INT)
                       || repeat('0', (pad_len - n)::INT) AS loss
            FROM padded
        """,
        "q_train_epochs": f"""
            -- the multi-epoch loop replay: rank = shard % 2, each
            -- epoch e in (0,1) re-permuted by md5(shard:seq_id:e)
            -- (the q_shuffle order contract, seed = epoch), clipped to
            -- the SEED-INDEPENDENT cross-rank minimum count (the
            -- equalize contract — derived once from writer counts, both
            -- epochs inherit it), rank 0 resuming inside epoch 1 at
            -- skip_seqs=3 in EPOCH 1's shuffled order with absolute
            -- positions kept
            WITH RECURSIVE {_train_fold_cte()},
            out AS ({_TRAIN_SEQ_SELECT}
            ),
            sliced AS (
                SELECT e.epoch::BIGINT AS epoch, shard % 2 AS rank,
                       row_number() OVER (
                           PARTITION BY e.epoch, shard % 2
                           ORDER BY md5(shard::VARCHAR || ':'
                                        || seq_id::VARCHAR || ':'
                                        || e.epoch::VARCHAR),
                                    shard::VARCHAR || ':'
                                        || seq_id::VARCHAR
                       ) - 1 AS position,
                       shard, seq_id, tokens, n_tokens, spans, oversized
                FROM out CROSS JOIN (VALUES (0), (1)) AS e(epoch)
            ),
            cut AS (
                SELECT min(c) AS m
                FROM (SELECT count(*) AS c FROM out GROUP BY shard % 2)
            )
            SELECT epoch, rank, position, shard, seq_id, tokens,
                   n_tokens, spans, oversized
            FROM sliced, cut
            WHERE position < m
              AND (epoch <> 1 OR rank <> 0 OR position >= 3)
        """,
        "q_train_cut": f"""
            -- real-token concatenate-and-cut replay: the longest-match
            -- CTE (over the planted source — every 19th doc's text is
            -- EMPTY, so it contributes only the EOS token) numbers each
            -- doc's ids in (wp, k) order, EOS 55 rides at index n+1,
            -- global position = shard window cumsum + intra index, cut
            -- every 48; spans = per-(seq, doc) position groups
            -- (off = min(pos) % 48)
            WITH RECURSIVE {_longest_match_cte(8, _TRAIN_CUT_SRC)},
            tok_rows AS (
              SELECT doc_id, tid,
                     row_number() OVER (PARTITION BY doc_id
                                        ORDER BY wp, k) AS idx
              FROM step WHERE k > 0
            ),
            ntok AS (
              SELECT d.doc_id, count(s.doc_id)::BIGINT AS n
              FROM documents d
              LEFT JOIN (SELECT doc_id FROM step WHERE k > 0) s
                ON d.doc_id = s.doc_id
              GROUP BY d.doc_id
            ),
            all_tokens AS (
              SELECT doc_id, tid, idx FROM tok_rows
              UNION ALL
              SELECT doc_id, 55 AS tid, n + 1 AS idx FROM ntok
            ),
            counts AS (
              SELECT doc_id, (n + 1)::BIGINT AS n_tok,
                     {_bucket_sql("doc_id", 0)} % 8 AS shard
              FROM ntok
            ),
            offs AS (
              SELECT doc_id, shard, n_tok,
                     coalesce(sum(n_tok) OVER (
                         PARTITION BY shard ORDER BY doc_id, n_tok
                         ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING
                     ), 0) AS start_offset
              FROM counts
            ),
            expanded AS (
              SELECT o.shard, o.doc_id,
                     o.start_offset + t.idx - 1 AS pos, t.tid
              FROM offs o JOIN all_tokens t USING (doc_id)
            ),
            seqs AS (
              SELECT shard, (pos // 48)::BIGINT AS seq_id,
                     string_agg(tid::VARCHAR, ',' ORDER BY pos)
                         AS tokens,
                     count(*)::BIGINT AS n_tokens
              FROM expanded
              GROUP BY shard, pos // 48
            ),
            piece AS (
              SELECT shard, (pos // 48)::BIGINT AS seq_id, doc_id,
                     (min(pos) % 48)::BIGINT AS off,
                     count(*)::BIGINT AS len
              FROM expanded
              GROUP BY shard, pos // 48, doc_id
            ),
            sp AS (
              SELECT shard, seq_id,
                     string_agg(doc_id::VARCHAR || ':' || off::VARCHAR
                                || ':' || len::VARCHAR,
                                ';' ORDER BY off) AS spans
              FROM piece
              GROUP BY shard, seq_id
            )
            SELECT s.shard, s.seq_id, s.tokens, s.n_tokens, sp.spans
            FROM seqs s JOIN sp USING (shard, seq_id)
        """,
        "q_epoch_pack": f"""
            -- the q_shuffle md5-permutation replay assigns dense
            -- positions (seed 2), then the (fill, seq) recurrence folds
            -- in POSITION order per md5(position) shard at cap 16;
            -- sequence content = each doc's id repeated n_tok times in
            -- layout order, -1-padded; spans are position-keyed
            WITH RECURSIVE pos AS (
                SELECT doc_id, (doc_id % 13 + 1)::BIGINT AS n_tok,
                       (row_number() OVER (
                           ORDER BY md5(doc_id::VARCHAR || ':2'), doc_id
                       ) - 1)::BIGINT AS position
                FROM documents
                WHERE doc_id IS NOT NULL
            ), base AS MATERIALIZED (
                SELECT doc_id, n_tok, position,
                       {_bucket_sql("position", 0)} % 8 AS shard,
                       row_number() OVER (
                           PARTITION BY {_bucket_sql("position", 0)} % 8
                           ORDER BY position, n_tok
                       ) AS rn
                FROM pos
            ),
            fold(shard, rn, doc_id, position, n_tok, seq_id,
                 start_offset, fill) AS (
                SELECT shard, rn, doc_id, position, n_tok,
                       0::BIGINT, 0::BIGINT, n_tok
                FROM base WHERE rn = 1
                UNION ALL
                SELECT b.shard, b.rn, b.doc_id, b.position, b.n_tok,
                       CASE WHEN f.fill > 0 AND f.fill + b.n_tok > 16
                            THEN f.seq_id + 1 ELSE f.seq_id END,
                       CASE WHEN f.fill > 0 AND f.fill + b.n_tok > 16
                            THEN 0 ELSE f.fill END,
                       CASE WHEN f.fill > 0 AND f.fill + b.n_tok > 16
                            THEN b.n_tok ELSE f.fill + b.n_tok END
                FROM fold f
                JOIN base b ON b.shard = f.shard AND b.rn = f.rn + 1
            )
            SELECT shard, seq_id,
                   string_agg(array_to_string(
                       list_transform(range(n_tok), x -> doc_id), ','),
                       ',' ORDER BY start_offset)
                       || repeat(',-1',
                                 greatest(0, 16 - sum(n_tok))::INT)
                       AS tokens,
                   sum(n_tok)::BIGINT AS n_tokens,
                   string_agg(position::VARCHAR || ':'
                              || start_offset::VARCHAR || ':'
                              || n_tok::VARCHAR,
                              ';' ORDER BY start_offset) AS spans,
                   (sum(n_tok) > 16) AS oversized
            FROM fold
            GROUP BY shard, seq_id
        """,
        "q_recipe": f"""
            -- the full corpus recipe, composed from the proven replays:
            -- the planted page structure, the q_c4_filter line+page
            -- rules, the q_line_dedup first-(doc_id, idx) keep rule,
            -- the longest-match CTE re-pointed at the post-dedup
            -- corpus (first 12 words, EOS 55), and the (fill, seq)
            -- recurrence at cap 64 over 16 md5 shards
            WITH RECURSIVE planted AS (
                SELECT doc_id,
                       text || chr(10)
                       || array_to_string(
                              regexp_split_to_array(trim(text),
                                                    '\\s+')[1:4], ' ')
                       || ' opens document ' || doc_id::VARCHAR
                       || ' cleanly.' || chr(10)
                       || 'short line.' || chr(10)
                       || 'every page shares this exact cookie banner line.'
                       || chr(10)
                       || 'document ' || doc_id::VARCHAR
                       || ' closes with a tidy sentence!'
                       || CASE WHEN doc_id % 11 = 0
                               THEN chr(10) || 'lorem ipsum tail'
                               WHEN doc_id % 13 = 0
                               THEN chr(10) || 'brace {{ tail'
                               ELSE '' END AS text
                FROM documents
            ), c4 AS (
                SELECT doc_id, text,
                       coalesce(array_to_string(list_filter(
                           list_filter(list_transform(
                               string_split(text, chr(10)), l -> trim(l)),
                               l -> length(l) > 0),
                           l -> regexp_matches(l, '[.!?"”]$')
                                AND len(regexp_split_to_array(
                                        l, '\\s+')) >= 5
                                AND NOT contains(lower(l), 'javascript')
                       ), chr(10)), '') AS clean_text
                FROM planted
            ), kept_docs AS MATERIALIZED (
                SELECT doc_id, clean_text
                FROM c4
                WHERE len(regexp_extract_all(clean_text,
                        '[.!?]["”]?(\\s|$)|["”](\\s|$)')) >= 3
                  AND NOT contains(lower(text), 'lorem ipsum')
                  AND NOT contains(text, '{{')
            ), exd AS (
                SELECT doc_id, generate_subscripts(ls, 1) - 1 AS idx,
                       unnest(ls) AS line
                FROM (SELECT doc_id,
                             string_split(clean_text, chr(10)) AS ls
                      FROM kept_docs)
            ), ranked AS (
                SELECT doc_id, idx, line,
                       row_number() OVER (
                           PARTITION BY line ORDER BY doc_id, idx
                       ) AS rn
                FROM exd WHERE trim(line) != ''
            ), keptl AS (
                SELECT doc_id, idx, line FROM ranked WHERE rn = 1
                UNION ALL
                SELECT doc_id, idx, line FROM exd WHERE trim(line) = ''
            ), corpus AS MATERIALIZED (
                SELECT k.doc_id, coalesce(re.txt, '') AS text
                FROM kept_docs k LEFT JOIN (
                    SELECT doc_id,
                           string_agg(line, chr(10) ORDER BY idx) AS txt
                    FROM keptl GROUP BY doc_id
                ) re USING (doc_id)
            ),
            {_longest_match_cte(12, "corpus")},
            doc_toks AS (
                SELECT d.doc_id,
                       CASE WHEN count(s.doc_id) = 0 THEN '55'
                            ELSE string_agg(s.tid::VARCHAR, ','
                                            ORDER BY s.wp, s.k) || ',55'
                       END AS toks,
                       (count(s.doc_id) + 1)::BIGINT AS n_tok
                FROM corpus d
                LEFT JOIN (SELECT doc_id, wp, k, tid
                           FROM step WHERE k > 0) s
                  ON d.doc_id = s.doc_id
                GROUP BY d.doc_id
            ), rbase AS MATERIALIZED (
                SELECT doc_id, toks, n_tok,
                       {_bucket_sql("doc_id", 0)} % 16 AS shard,
                       row_number() OVER (
                           PARTITION BY {_bucket_sql("doc_id", 0)} % 16
                           ORDER BY doc_id, n_tok
                       ) AS rn
                FROM doc_toks
            ),
            rfold(shard, rn, doc_id, toks, n_tok, seq_id, start_offset,
                  fill) AS (
                SELECT shard, rn, doc_id, toks, n_tok,
                       0::BIGINT, 0::BIGINT, n_tok
                FROM rbase WHERE rn = 1
                UNION ALL
                SELECT b.shard, b.rn, b.doc_id, b.toks, b.n_tok,
                       CASE WHEN f.fill > 0 AND f.fill + b.n_tok > 64
                            THEN f.seq_id + 1 ELSE f.seq_id END,
                       CASE WHEN f.fill > 0 AND f.fill + b.n_tok > 64
                            THEN 0 ELSE f.fill END,
                       CASE WHEN f.fill > 0 AND f.fill + b.n_tok > 64
                            THEN b.n_tok ELSE f.fill + b.n_tok END
                FROM rfold f
                JOIN rbase b ON b.shard = f.shard AND b.rn = f.rn + 1
            )
            SELECT shard, seq_id,
                   string_agg(toks, ',' ORDER BY start_offset)
                       || repeat(',-1',
                                 greatest(0, 64 - sum(n_tok))::INT)
                       AS tokens,
                   sum(n_tok)::BIGINT AS n_tokens,
                   string_agg(doc_id::VARCHAR || ':'
                              || start_offset::VARCHAR || ':'
                              || n_tok::VARCHAR,
                              ';' ORDER BY start_offset) AS spans,
                   (sum(n_tok) > 64) AS oversized
            FROM rfold
            GROUP BY shard, seq_id
        """,
        "q_train_masks": f"""
            -- replay the (fill, seq) recurrence over the synthetic
            -- counts, then state each sequence's position/segment
            -- streams directly: per doc in offset order, positions =
            -- range(n_tok), segments = its row_number within the
            -- sequence, padding = (0, -1) to the cap of 16
            WITH RECURSIVE toks AS (
                SELECT doc_id, (doc_id % 13 + 1)::BIGINT AS n_tok,
                       {_bucket_sql("doc_id", 0)} % 8 AS shard
                FROM documents
            ), base AS (
                SELECT doc_id, n_tok, shard,
                       row_number() OVER (
                           PARTITION BY shard ORDER BY doc_id, n_tok
                       ) AS rn
                FROM toks
            ),
            fold(shard, rn, doc_id, n_tok, seq_id, start_offset, fill) AS (
                SELECT shard, rn, doc_id, n_tok,
                       0::BIGINT, 0::BIGINT, n_tok
                FROM base WHERE rn = 1
                UNION ALL
                SELECT b.shard, b.rn, b.doc_id, b.n_tok,
                       CASE WHEN f.fill > 0 AND f.fill + b.n_tok > 16
                            THEN f.seq_id + 1 ELSE f.seq_id END,
                       CASE WHEN f.fill > 0 AND f.fill + b.n_tok > 16
                            THEN 0 ELSE f.fill END,
                       CASE WHEN f.fill > 0 AND f.fill + b.n_tok > 16
                            THEN b.n_tok ELSE f.fill + b.n_tok END
                FROM fold f
                JOIN base b ON b.shard = f.shard AND b.rn = f.rn + 1
            ),
            per_doc AS (
                SELECT shard, seq_id, start_offset, n_tok,
                       (row_number() OVER (
                           PARTITION BY shard, seq_id
                           ORDER BY start_offset
                       ) - 1)::BIGINT AS seg
                FROM fold
            ),
            agg AS (
                SELECT shard, seq_id,
                       string_agg(array_to_string(range(n_tok), ','),
                                  ',' ORDER BY start_offset) AS pos_core,
                       string_agg(array_to_string(
                                      list_transform(range(n_tok),
                                                     x -> seg), ','),
                                  ',' ORDER BY start_offset) AS seg_core,
                       sum(n_tok)::BIGINT AS n_tokens
                FROM per_doc
                GROUP BY shard, seq_id
            )
            SELECT shard, seq_id,
                   pos_core || repeat(',0', (16 - n_tokens)::INT)
                       AS positions,
                   seg_core || repeat(',-1', (16 - n_tokens)::INT)
                       AS segments,
                   n_tokens
            FROM agg
        """,
        "q_pack_efficiency": f"""
            -- same recurrence as q_train_masks, aggregated: per-seq
            -- n_tokens from the layout, then per-shard counts/waste
            -- (counts max 13 < cap 16 so oversized is structurally 0,
            -- stated as such)
            WITH RECURSIVE toks AS (
                SELECT doc_id, (doc_id % 13 + 1)::BIGINT AS n_tok,
                       {_bucket_sql("doc_id", 0)} % 8 AS shard
                FROM documents
            ), base AS (
                SELECT doc_id, n_tok, shard,
                       row_number() OVER (
                           PARTITION BY shard ORDER BY doc_id, n_tok
                       ) AS rn
                FROM toks
            ),
            fold(shard, rn, doc_id, n_tok, seq_id, start_offset, fill) AS (
                SELECT shard, rn, doc_id, n_tok,
                       0::BIGINT, 0::BIGINT, n_tok
                FROM base WHERE rn = 1
                UNION ALL
                SELECT b.shard, b.rn, b.doc_id, b.n_tok,
                       CASE WHEN f.fill > 0 AND f.fill + b.n_tok > 16
                            THEN f.seq_id + 1 ELSE f.seq_id END,
                       CASE WHEN f.fill > 0 AND f.fill + b.n_tok > 16
                            THEN 0 ELSE f.fill END,
                       CASE WHEN f.fill > 0 AND f.fill + b.n_tok > 16
                            THEN b.n_tok ELSE f.fill + b.n_tok END
                FROM fold f
                JOIN base b ON b.shard = f.shard AND b.rn = f.rn + 1
            ),
            seqs AS (
                SELECT shard, seq_id, sum(n_tok)::BIGINT AS n_tokens
                FROM fold GROUP BY shard, seq_id
            )
            SELECT shard,
                   count(*)::BIGINT AS n_seqs,
                   sum(n_tokens)::BIGINT AS real_tokens,
                   sum(16 - n_tokens)::BIGINT AS padded_slots,
                   0::BIGINT AS oversized_seqs,
                   round(sum(16 - n_tokens)
                         / (sum(16 - n_tokens) + sum(n_tokens)), 6)
                       AS waste_frac,
                   -- no oversized seqs in this fixture, so the capped
                   -- grid is simply n_seqs * 16
                   round(sum(16 - n_tokens) / (count(*) * 16.0), 6)
                       AS capped_waste_frac
            FROM seqs
            GROUP BY shard
        """,
        "q_vocab": """
            SELECT term, count, rank FROM (
                SELECT term, count(*) AS count,
                       row_number() OVER (ORDER BY count(*) DESC, term ASC) AS rank
                FROM (
                    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
                    FROM documents
                )
                WHERE len(term) > 0
                GROUP BY term
            ) WHERE rank <= 100
        """,
        "q_pii_scrub": """
            SELECT doc_id,
                   regexp_replace(
                       regexp_replace(
                           regexp_replace(
                               CASE WHEN doc_id % 7 = 0
                                    THEN text || ' contact user' || doc_id::VARCHAR ||
                                         '@example.com from 10.1.2.3 call +1 (555) 123-4567'
                                    ELSE text END,
                               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                               '<EMAIL>', 'g'),
                           '\\+?[0-9][0-9()\\-\\s]{7,}[0-9]', '<PHONE>', 'g'),
                       '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', '<IP>', 'g'
                   ) AS scrubbed
            FROM documents
        """,
        "q_kmeans": _kmeans_oracle_sql(k=10, iterations=3, dim=64),
        "q_embedding_outliers": _embedding_outliers_oracle_sql(
            k=10, iterations=3, dim=64, z=2.0
        ),
        "q_boilerplate": r"""
            WITH wrapped AS (
                SELECT doc_id, doc_id % 5 AS kind,
                       CASE
                           WHEN doc_id % 5 = 0 THEN
                               '<html><!-- hdr --><body><h1>Doc ' || doc_id::VARCHAR ||
                               '</h1><p>' || text ||
                               '</p><script>var x = 1;</script></body></html>'
                           WHEN doc_id % 5 = 1 THEN
                               '# Doc ' || doc_id::VARCHAR || chr(10) ||
                               '[link](http://example.com) **' || text || '**'
                           ELSE text
                       END AS raw
                FROM documents
            ), html AS (
                SELECT doc_id,
                       regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(raw,
                           '(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'),
                           '(?s)<!--.*?-->', ' ', 'g'),
                           '<[^>]+>', ' ', 'g'),
                           '&nbsp;', ' ', 'g'),
                           '&lt;', '<', 'g'),
                           '&gt;', '>', 'g'),
                           '&quot;', '"', 'g'),
                           '&#39;', chr(39), 'g'),
                           '&amp;', '&', 'g') AS s
                FROM wrapped WHERE kind = 0
            ), md AS (
                SELECT doc_id,
                       regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(
                       raw,
                           '(?s)```.*?```', ' ', 'g'),
                           '`([^`]*)`', '\1', 'g'),
                           '!\[[^\]]*\]\([^)]*\)', ' ', 'g'),
                           '\[([^\]]*)\]\([^)]*\)', '\1', 'g'),
                           '(?m)^#{1,6}[ \t]*', '', 'g'),
                           '(?m)^[-*+][ \t]+', '', 'g'),
                           '(?m)^>[ \t]?', '', 'g'),
                           '(^|[\s(\[{])[*_]{1,3}', '\1', 'g'),
                           '[*_]{1,3}([\s)\]}.,;:!?]|$)', '\1', 'g') AS s
                FROM wrapped WHERE kind = 1
            ), cleaned AS (
                SELECT doc_id, s FROM html
                UNION ALL SELECT doc_id, s FROM md
            )
            SELECT w.doc_id,
                   CASE WHEN w.kind IN (0, 1)
                        THEN trim(regexp_replace(c.s, '\s+', ' ', 'g'))
                        ELSE w.raw END AS clean
            FROM wrapped w LEFT JOIN cleaned c USING (doc_id)
        """,
        "q_interpolate": """
            WITH base AS (
                SELECT event_id, ts,
                       CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
                FROM events
            ), w AS (
                SELECT event_id, ts, v,
                       last_value(v IGNORE NULLS) OVER pw AS pv,
                       first_value(v IGNORE NULLS) OVER nw AS nv,
                       last_value(CASE WHEN v IS NOT NULL THEN epoch(ts) END IGNORE NULLS)
                           OVER pw AS pt,
                       first_value(CASE WHEN v IS NOT NULL THEN epoch(ts) END IGNORE NULLS)
                           OVER nw AS nt
                FROM base
                WINDOW pw AS (ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                       nw AS (ORDER BY ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
            )
            SELECT event_id,
                   round(CASE WHEN v IS NOT NULL THEN v
                              WHEN pv IS NULL THEN nv
                              WHEN nv IS NULL THEN pv
                              WHEN nt = pt THEN pv
                              ELSE pv + (nv - pv) * (epoch(ts) - pt) / (nt - pt)
                         END, 6) AS value
            FROM w
        """,
        "q_fuzzy_match": """
            WITH lt AS (
                SELECT doc_id AS lid,
                       unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS term
                FROM documents WHERE doc_id < 50
            ), rt AS (
                SELECT doc_id AS rid,
                       unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS term
                FROM documents WHERE doc_id >= 50
            ), lw AS (
                SELECT term, count(*) AS lc FROM lt GROUP BY 1
            ), rw AS (
                SELECT term, count(*) AS rc FROM rt GROUP BY 1
            ), pair_scores AS (
                SELECT lid, rid, round(sum(1.0 / (lc * rc)), 6) AS score
                FROM lt JOIN rt USING (term) JOIN lw USING (term) JOIN rw USING (term)
                GROUP BY lid, rid
                HAVING round(sum(1.0 / (lc * rc)), 6) > 0.0
            )
            SELECT lid AS left_id, rid AS right_id, score FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY lid ORDER BY score DESC, rid ASC) AS rn
                FROM pair_scores
            ) WHERE rn = 1
        """,
        "q_json_props": """
            SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
                   count(*) AS n,
                   round(avg(value), 6) AS avg_value
            FROM events
            GROUP BY 1
        """,
        "q_decontam": r"""
            WITH bt AS (
                SELECT regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents WHERE source IN ('src0', 'src1')
            ), bg AS (
                SELECT DISTINCT unnest(
                    CASE WHEN len(t) >= 13 THEN list_transform(
                        range(1, len(t) - 11), i -> array_to_string(t[i:i+12], ' '))
                    ELSE []::VARCHAR[] END) AS gram
                FROM bt
            ), tt AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents WHERE source NOT IN ('src0', 'src1')
            ), tg AS (
                SELECT doc_id, unnest(list_distinct(
                    CASE WHEN len(t) >= 13 THEN list_transform(
                        range(1, len(t) - 11), i -> array_to_string(t[i:i+12], ' '))
                    ELSE []::VARCHAR[] END)) AS gram
                FROM tt
            )
            SELECT doc_id, count(DISTINCT gram) AS n_matching_grams
            FROM tg JOIN bg USING (gram)
            GROUP BY doc_id
        """,
        "q_gopher_quality": r"""
            WITH planted AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 11 = 0 THEN text || chr(10) ||
                            '- bullet item ...' || chr(10) ||
                            '- second bullet' || chr(10) || 'plain tail ...'
                       ELSE text END AS text
                FROM documents
            ), base AS (
                SELECT doc_id, text,
                       regexp_split_to_array(trim(text), '\s+') AS toks,
                       list_filter(list_transform(string_split(text, chr(10)),
                                                  l -> trim(l)),
                                   l -> length(l) > 0) AS ls
                FROM planted
            ), sig AS (
                SELECT doc_id,
                       CASE WHEN length(trim(text)) = 0 THEN 0
                            ELSE len(toks) END AS wc,
                       round(CASE WHEN len(toks) = 0 THEN 0.0
                             ELSE list_sum(list_transform(toks,
                                      t -> length(t)))::DOUBLE / len(toks)
                             END, 6) AS mwl,
                       len(ls) AS nl,
                       len(list_filter(ls, l -> l LIKE '%...'
                                              OR l LIKE '%…')) AS ell,
                       len(list_filter(ls, l -> l LIKE '-%' OR l LIKE '*%'
                                              OR l LIKE '•%')) AS bul,
                       len(list_filter(toks,
                           t -> regexp_matches(t, '[A-Za-z]'))) AS alpha,
                       len(list_intersect(
                           list_transform(toks, t -> lower(t)),
                           ['the','a','of','and','to','in','is','that','it','for']
                       )) AS sw_hits,
                       length(regexp_replace(text, '[^#…]', '', 'g'))
                         + 3 * len(list_filter(ls, l -> l LIKE '%...%')) AS symbols
                FROM base
            ), m AS (
                SELECT doc_id, wc, mwl,
                       round(CASE WHEN nl = 0 THEN 0.0
                             ELSE ell::DOUBLE / nl END, 6) AS ellipsis_line_frac,
                       round(CASE WHEN nl = 0 THEN 0.0
                             ELSE bul::DOUBLE / nl END, 6) AS bullet_line_frac,
                       round(CASE WHEN wc = 0 THEN 0.0
                             ELSE alpha::DOUBLE / wc END, 6) AS alpha_word_frac,
                       sw_hits,
                       round(CASE WHEN wc = 0 THEN 0.0
                             ELSE symbols::DOUBLE / wc END, 6) AS symbol_word_ratio
                FROM sig
            )
            SELECT doc_id, wc AS word_count, mwl AS mean_word_len,
                   ellipsis_line_frac, bullet_line_frac, alpha_word_frac,
                   sw_hits AS stopword_hits, symbol_word_ratio,
                   (wc >= 50 AND wc <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
                    AND ellipsis_line_frac <= 0.3 AND bullet_line_frac <= 0.9
                    AND alpha_word_frac >= 0.8 AND sw_hits >= 2
                    AND symbol_word_ratio <= 0.1) AS passes
            FROM m
        """,
        "q_span_dedup": r"""
            WITH toks AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
                FROM documents
            ), occ AS (
                SELECT doc_id, s.pos AS pos, s.gram AS gram
                FROM (
                    SELECT doc_id, unnest(
                        CASE WHEN len(t) >= 13 THEN list_transform(
                            range(1, len(t) - 11),
                            i -> {'pos': i - 1,
                                  'gram': array_to_string(t[i:i+12], ' ')})
                        ELSE []::STRUCT(pos BIGINT, gram VARCHAR)[] END) AS s
                    FROM toks
                )
            ), rep AS (
                SELECT gram FROM occ GROUP BY gram HAVING count(*) > 1
            ), rem AS (
                SELECT doc_id, pos FROM (
                    SELECT doc_id, pos, row_number() OVER (
                        PARTITION BY gram ORDER BY doc_id, pos) AS rn
                    FROM occ JOIN rep USING (gram)
                ) WHERE rn >= 2
            ), starts AS (
                SELECT doc_id, list_sort(list(pos)) AS sts FROM rem GROUP BY doc_id
            ), rebuilt AS (
                SELECT t.doc_id, t.t,
                       list_filter(t.t, (x, i) -> len(list_filter(
                           coalesce(s.sts, []),
                           st -> st <= i - 1 AND i - 1 < st + 13)) = 0) AS kept
                FROM toks t LEFT JOIN starts s USING (doc_id)
            )
            SELECT doc_id,
                   coalesce(array_to_string(kept, ' '), '') AS clean_text,
                   (len(t) - len(kept))::BIGINT AS n_removed_tokens
            FROM rebuilt
        """,
        "q_c4_filter": r"""
            WITH planted AS (
                SELECT doc_id,
                       CASE doc_id % 4
                           WHEN 0 THEN text || chr(10) ||
                               'This is a good sentence one.' || chr(10) ||
                               'This is a good sentence two!' || chr(10) ||
                               'Is this a good sentence three?' || chr(10) ||
                               'short line.' || chr(10) ||
                               'This line mentions javascript framework today.' || chr(10) ||
                               'five words but no punctuation'
                           WHEN 1 THEN text || ' lorem ipsum tail'
                           WHEN 2 THEN text || ' brace { tail'
                           ELSE text
                       END AS text
                FROM documents
            ), cleaned AS (
                SELECT doc_id, text,
                       coalesce(array_to_string(list_filter(
                           list_filter(list_transform(
                               string_split(text, chr(10)), l -> trim(l)),
                               l -> length(l) > 0),
                           l -> regexp_matches(l, '[.!?"”]$')
                                AND len(regexp_split_to_array(l, '\s+')) >= 5
                                AND NOT contains(lower(l), 'javascript')
                       ), chr(10)), '') AS clean_text
                FROM planted
            ), counted AS (
                SELECT doc_id, text, clean_text,
                       len(regexp_extract_all(clean_text,
                           '[.!?]["”]?(\s|$)|["”](\s|$)')) AS n_sentences
                FROM cleaned
            )
            SELECT doc_id, clean_text, n_sentences,
                   (n_sentences >= 3
                    AND NOT contains(lower(text), 'lorem ipsum')
                    AND NOT contains(text, '{')) AS kept
            FROM counted
        """,
        "q_repetition": _repetition_oracle_sql(top_ns=(2, 3), dup_ns=(5, 10)),
        "q_unigram_logprob": r"""
            WITH w AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
                FROM documents
            ), wf AS (
                SELECT * FROM w WHERE length(term) > 0
            ), vocab AS (
                SELECT term, count(*) AS cnt FROM wf GROUP BY 1
            ), tot AS (
                SELECT sum(cnt)::DOUBLE AS total FROM vocab
            ), lp AS (
                SELECT term, round(ln(cnt / total), 6)::DECIMAL(18,9) AS lp
                FROM vocab, tot
            )
            SELECT d.doc_id, m.mean_logp
            FROM documents d LEFT JOIN (
                SELECT doc_id, round(sum(lp)::DOUBLE / count(*), 6) AS mean_logp
                FROM wf JOIN lp USING (term)
                GROUP BY doc_id
            ) m USING (doc_id)
        """,
        # every queries() entry above has a value oracle — including
        # q_louvain, whose communities provably equal connected components
        # on the near-dup fixture (see _neardup_cc_sql); planted-clique
        # recovery is additionally asserted in tests/test_iterate_graphs.py.
    }
    # the incremental batch-replay queries PROVE the streaming operators
    # against the SAME oracles as their one-shot twins: for id-ordered
    # arrivals the incremental fold/encode/writer are contractually
    # byte-identical to the one-shot result, so sharing the oracle is
    # the point — any cross-batch state bug breaks the shared replay
    d["q_pack_incremental"] = d["q_pack_no_straddle"]
    d["q_bpe_incremental"] = d["q_bpe_tokenize"]
    d["q_train_stream"] = d["q_train_sequences"]
    d["q_recipe_stream"] = d["q_recipe"]
    return d

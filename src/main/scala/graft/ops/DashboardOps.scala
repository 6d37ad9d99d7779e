package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The cross-document query surface the reference provisions in ES/Kibana
 * (metric aggs, terms top-k, date_histogram, sort — declarations at
 * /root/reference/export.json:49,63,77,91,105) plus the join/window
 * operators of SURVEY.md §2.6/§2.7, expressed as pure Catalyst plans over
 * the driver testdata. Partial+final hash aggregation, broadcast joins
 * for the small dimensions and TakeOrderedAndProject for top-k come free
 * from Catalyst — verified via .explain in PlanShapeSpec.
 */
object DashboardOps {
  import Tables._

  /** A1-ish pricing summary (partial+final agg; maps the metric aggs of
    * export.json:49 onto lineitem). */
  def qPricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        rd(sum("l_quantity"), 2).as("sum_qty"),
        rd(sum("l_extendedprice"), 2).as("sum_price"),
        rd(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("n_rows"))
      // group keys = total sort key, bounded result (one row per
      // flag/status pair): narrow coalesce + local sort is the identical
      // row order without the range-exchange sampling jobs (r8, see q38)
      .coalesce(1).sortWithinPartitions("l_returnflag", "l_linestatus")

  /** A6 terms agg, top-5 by count desc (export.json:63), deterministic
    * tie-break on the key. */
  def qTermsTop5(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("o_orderpriority"))
      .limit(5)

  /** A7 terms agg, top-25 tokens (word-cloud, export.json:105). */
  def qTermsTop25Tokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(toks(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("token"))
      .limit(25)

  /** A8/A10 date_histogram (30s buckets, min_doc_count:1 — empty buckets
    * naturally absent; export.json:77,91). */
  def qDateHistCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "30 seconds").as("w"))
      .agg(count(lit(1)).as("cnt"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("cnt"))
      .orderBy("bucket")

  /** A9 composite date_histogram x metrics (price chart, export.json:77)
    * on 1-hour buckets. */
  def qDateHistMetrics(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(rd(sum("value"), 4).as("sum_value"),
        rd(avg("value"), 4).as("avg_value"),
        count(lit(1)).as("cnt"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        col("event_type"), col("sum_value"), col("avg_value"), col("cnt"))
      // group keys = total sort key, result bounded by the histogram
      // resolution x event types (r8, see q38)
      .coalesce(1).sortWithinPartitions("bucket", "event_type")

  /** A8 variant: date_histogram with min_doc_count:0 — ES materializes
    * EMPTY buckets too; Spark's groupBy naturally drops them, so the
    * bucket axis is generated (sequence + explode) and left-joined.
    * 1-hour buckets over the events span. */
  def qDateHistDense(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val bounds = ev.agg(
      date_trunc("hour", min("ts")).as("lo"),
      date_trunc("hour", max("ts")).as("hi"))
    val axis = bounds.select(explode(sequence(col("lo"), col("hi"),
      expr("INTERVAL 1 HOUR"))).as("bucket_ts"))
    val counts = ev
      .groupBy(date_trunc("hour", col("ts")).as("bucket_ts"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("event_type") === "signup")
    axis.join(counts, Seq("bucket_ts"), "left")
      .select(date_format(col("bucket_ts"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy("bucket")
  }

  /** A2/A3/A4 metric aggs incl. exact median (ES median is t-digest; we
    * expose the exact percentile so the DuckDB oracle can match it). */
  def qStatsValue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events").agg(
      count(lit(1)).as("cnt"),
      rd(avg("value"), 4).as("avg_value"),
      rd(expr("percentile(value, 0.5)"), 4).as("median_value"),
      rd(min("value"), 4).as("min_value"),
      rd(max("value"), 4).as("max_value"),
      countDistinct("user_id").as("n_users"))

  /** Kibana "unique count" = ES `cardinality` (HLL sketch) — present on
    * the reference platform though unused by its dashboard (SURVEY §2.5
    * optional stretch). Spark's approx_count_distinct is the same
    * HyperLogLog++ shape: mergeable register sketches, so the result is
    * deterministic under any partitioning — the 100 TB cardinality path
    * (exact distinct shuffles every key; the sketch ships 2^p bytes per
    * partition). The exact count is hash-oracled; the sketch is verified
    * by its published error contract, which the oracle pins as a boolean
    * both engines must agree on. The margin is 10% = 5 sigma of the
    * rsd-0.02 sketch: a REAL bound (a broken sketch blows far past it)
    * that a freshly generated unlucky dataset cannot flake (a 5%/2.5
    * sigma pin would fail ~1% of groups on regenerated data). */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    // r8 note: an explicit pre-dedup rewrite was tried and produced the
    // IDENTICAL physical plan (Spark 4 already plans countDistinct
    // beside another agg as partial-dedup -> final agg, no Expand here),
    // so the original formulation stands — see OPTIMIZATION_r08.md.
    t(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double") <=
          col("exact_users").cast("double") * 0.10).as("approx_ok"))
      // total key (event_type is the group key), tiny result: a narrow
      // coalesce + local sort gives the identical row order as the global
      // orderBy without the range-exchange sampling pass and its extra
      // AQE jobs (r8; the driver materializes via coalesce(1) anyway)
      .coalesce(1).sortWithinPartitions("event_type")

  /** O1 sort by date desc + paging (export.json:34-37). */
  def qSortRecent(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .orderBy(desc("ts"), asc("event_id"))
      .limit(100)
      .select(col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
        col("user_id"), col("event_type"), rd(col("value"), 4).as("value_r"))

  /** O3 per-key cap: first 3 events per user (row_number window). */
  def qTopPerKey(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
    t(spark, dir, "events")
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 3)
      .select("user_id", "rn", "event_id", "event_type")
      .orderBy("user_id", "rn")
  }

  /** T9 percent change vs previous value (lag window — the reference's
    * stock change%, /root/reference/stockprice.py:65-72). */
  def qPctChange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(asc("ts"), asc("event_id"))
    t(spark, dir, "events")
      .withColumn("prev", lag("value", 1).over(w))
      .where(col("prev").isNotNull && col("prev") =!= 0.0)  // F11 null guard
      .select(col("event_id"), col("event_type"),
        rd((col("value") - col("prev")) / col("prev") * 100.0, 4).as("pct_change"))
      .orderBy("event_id")
  }

  /** Running sum per user (accumulating metric). */
  def qRunningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        rd(sum("value").over(w), 4).as("running_value"))
      .orderBy("event_id")
  }

  /** Broadcast dimension join chain (customer -> nation -> region). */
  def qJoinDims(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name").agg(count(lit(1)).as("cnt"),
        rd(sum("c_acctbal"), 2).as("sum_bal"))
      .orderBy("r_name")

  /** J3 semi join: orders that have lineitems, per status. */
  def qJoinSemi(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .join(t(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus")

  /** J3 anti join: customers with no urgent orders. */
  def qJoinAnti(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders").where(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")

  /** J2 union of doc types under one schema + per-type filter/count
    * (the reference's single index with 3 mapping types). */
  def qUnionDocTypes(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(lit("event").as("doc_type"), col("event_id").as("id"))
    val docs = t(spark, dir, "documents")
      .select(lit("document").as("doc_type"), col("doc_id").as("id"))
    ev.unionByName(docs)
      .groupBy("doc_type").agg(count(lit(1)).as("cnt"), max("id").as("max_id"))
      .orderBy("doc_type")
  }

  /** T7 JSON shredding (the reference's Yahoo chart JSON extraction,
    * /root/reference/stockprice.py:60-81). */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .orderBy("k")

  /** T7+T8: JSON array shredding with last-non-null fallback (the
    * reference's Yahoo-chart `close[-1] ?? close[-2]` pattern,
    * /root/reference/stockprice.py:60-81): build a JSON array whose last
    * slot is null, parse, take element_at(-1) with fallback to (-2). */
  def qJsonArrayFallback(spark: SparkSession, dir: String): DataFrame = {
    val js = concat(lit("["), col("value").cast("string"), lit(",null]"))
    val arr = from_json(js, org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    t(spark, dir, "events")
      .select(col("event_id"),
        rd(coalesce(element_at(arr, -1), element_at(arr, -2)), 4).as("last_value"))
      .orderBy("event_id")
  }

  /** J1 as-of join: each 'click' event gets the latest prior 'view'
    * value of the same user (the sentiment-vs-price correlation shape —
    * the question the reference's shared-date-axis dashboard asks,
    * /root/reference/README.md:9). Implemented shuffle-once: filter ->
    * per-user ordered window -> last-non-null carry-forward; the classic
    * Spark as-of without a range join. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val w = Window.partitionBy("user_id").orderBy(asc("ts"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.where(col("event_type").isin("click", "view"))
      .withColumn("view_value",
        last(when(col("event_type") === "view", col("value")), ignoreNulls = true).over(w))
      .where(col("event_type") === "click" && col("view_value").isNotNull)
      .select(col("event_id"), col("user_id"), rd(col("view_value"), 4).as("asof_value"))
      .orderBy("event_id")
  }

  /** arg-max: highest-value event type per user (max_by). Ordered by the
    * (value, event_id) PAIR: value ties are broken deterministically (the
    * same event both engines pick), never left to aggregation order. */
  def qArgMax(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy("user_id")
      .agg(expr("max_by(event_type, struct(value, event_id))").as("top_type"),
        rd(max("value"), 4).as("top_value"))
      .orderBy("user_id")
}

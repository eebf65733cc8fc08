package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Joins, SkewedAgg, Stats, TopK}

/** Reference-parity operator inventory (SURVEY.md §2) mapped onto the
  * driver corpus. Query numbering follows the survey's operator ids.
  */
object CoreQueries {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)

  /** Deduped lineitem: one survivor per l_orderkey — the corpus mapping of
    * reference A1 (dedup by detection_oid with a pinned deterministic
    * survivor, SURVEY.md §7.3). The driver corpus injects duplicate
    * (l_orderkey, l_linenumber) pairs, so the tie-break must span every
    * remaining column to be a total order (interchangeable full-row
    * duplicates aside).
    */
  private val dedupTieBreak = Seq(
    "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
    "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")

  private def dedupedLineitem(s: SparkSession, d: String): DataFrame =
    Dedup.byKeyMin(li(s, d), Seq("l_orderkey"), dedupTieBreak)

  private val dedupSql =
    s"""SELECT * FROM (
      |  SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |    ORDER BY ${dedupTieBreak.mkString(", ")}) AS __rn
      |  FROM lineitem) t WHERE __rn = 1""".stripMargin

  val queries: Map[String, Q] = Map(

    // S1-S3 + P1: parquet scan with column pruning (projection reaches the
    // scan's ReadSchema).
    "q01_scan_project" -> Q(
      (s, d) => li(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // P2/P3: predicates (equality + range), pushed to the parquet scan.
    "q02_filter" -> Q(
      (s, d) => li(s, d)
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 25)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
             |WHERE l_returnflag = 'R' AND l_quantity > 25
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // A1: dedup-by-key, deterministic survivor (min_by — two-phase hash
    // aggregate, no window sort).
    "q03_dedup_bykey" -> Q(
      (s, d) => dedupedLineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .orderBy("l_orderkey"),
      Some(s"""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM ($dedupSql) dd
              |ORDER BY l_orderkey""".stripMargin)),

    // A2: grouped count by composite key (partial+final HashAggregate).
    "q04_group_count" -> Q(
      (s, d) => li(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      headline = true),

    // A4/O1/O2: grouped top-K, sequential row_number ranks, deterministic
    // tie-break (count desc, key asc).
    "q05_topk_per_group" -> Q(
      (s, d) => {
        val counts = li(s, d).groupBy("l_returnflag", "l_partkey").agg(count(lit(1)).as("cnt"))
        TopK.perGroup(counts,
            Seq(col("l_returnflag")), Seq(col("cnt").desc, col("l_partkey").asc), 3, "item_rank")
          .select(col("l_returnflag"), col("item_rank").cast("long").as("item_rank"),
            col("l_partkey"), col("cnt"))
          .orderBy("l_returnflag", "item_rank")
      },
      Some("""SELECT l_returnflag, item_rank, l_partkey, cnt FROM (
             |  SELECT l_returnflag, l_partkey, cnt,
             |         row_number() OVER (PARTITION BY l_returnflag ORDER BY cnt DESC, l_partkey) AS item_rank
             |  FROM (SELECT l_returnflag, l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1, 2) c) t
             |WHERE item_rank <= 3
             |ORDER BY l_returnflag, item_rank""".stripMargin),
      headline = true),

    // J1/J2: broadcast left-outer enrich with default for missing keys.
    "q06_broadcast_left_join" -> Q(
      (s, d) => Joins.enrichLeftBroadcast(
          Tables.customer(s, d), Tables.nation(s, d).select("n_nationkey", "n_name"),
          "c_nationkey", "n_nationkey", Map("n_name" -> "Unknown"))
        .select(col("c_custkey"), col("n_name").as("nation_name"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, coalesce(n_name, 'Unknown') AS nation_name
             |FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
             |ORDER BY c_custkey""".stripMargin)),

    // J3: shuffle equi-join + aggregation (AQE picks the physical join).
    "q07_join_agg" -> Q(
      (s, d) => ord(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), Stats.decimalSum(col("o_totalprice")).as("total_rev"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_rev
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      headline = true),

    // A5/A6: grouped count-distinct + group size.
    "q08_count_distinct" -> Q(
      (s, d) => li(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("distinct_parts"), count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts, count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // A7: grouped arg-max (mode) with deterministic tie-break — min_by over
    // (-count, key) stays a hash aggregate.
    "q09_argmax_group" -> Q(
      (s, d) => ord(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("c_mktsegment")
        .agg(min_by(col("o_orderpriority"),
          struct((-col("cnt")).as("neg"), col("o_orderpriority"))).as("top_priority"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, o_orderpriority AS top_priority FROM (
             |  SELECT c_mktsegment, o_orderpriority,
             |         row_number() OVER (PARTITION BY c_mktsegment ORDER BY cnt DESC, o_orderpriority) AS rn
             |  FROM (SELECT c_mktsegment, o_orderpriority, count(*) AS cnt
             |        FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2) c) t
             |WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin)),

    // A8/A9: global distinct counts + row count.
    "q10_global_distinct" -> Q(
      (s, d) => li(s, d).agg(
        countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_orderkey")).as("distinct_orders"),
        count(lit(1)).as("n")),
      Some("""SELECT count(DISTINCT l_partkey) AS distinct_parts,
             |       count(DISTINCT l_orderkey) AS distinct_orders, count(*) AS n
             |FROM lineitem""".stripMargin)),

    // A10: describe/summary — min/max/count/mean, one scan, unpivoted.
    "q11_describe" -> Q(
      (s, d) => Stats.describeNumeric(li(s, d), Seq("l_quantity", "l_extendedprice"))
        .orderBy("column_name"),
      Some("""SELECT 'l_extendedprice' AS column_name, count(l_extendedprice) AS n,
             |       CAST(min(l_extendedprice) AS DOUBLE) AS min_v,
             |       CAST(max(l_extendedprice) AS DOUBLE) AS max_v,
             |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(l_extendedprice) AS mean_v
             |FROM lineitem
             |UNION ALL
             |SELECT 'l_quantity', count(l_quantity),
             |       CAST(min(l_quantity) AS DOUBLE),
             |       CAST(max(l_quantity) AS DOUBLE),
             |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(l_quantity)
             |FROM lineitem
             |ORDER BY column_name""".stripMargin)),

    // U1: union (bag semantics — overlapping rows kept twice).
    "q12_union" -> Q(
      (s, d) => {
        val o = ord(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
        o.filter(col("o_orderstatus") === "F")
          .union(o.filter(col("o_totalprice") > 300000.0))
          .orderBy("o_orderkey", "o_orderstatus", "o_totalprice")
      },
      Some("""SELECT * FROM (
             |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'F'
             |  UNION ALL
             |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 300000.0) u
             |ORDER BY o_orderkey, o_orderstatus, o_totalprice""".stripMargin)),

    // O3/O4: global order + limit (TakeOrderedAndProject).
    "q13_sort_limit" -> Q(
      (s, d) => ord(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // J4/A3: explicit salted two-phase count (skew fallback); result equals
    // the plain grouped count the oracle runs.
    "q14_salted_agg" -> Q(
      (s, d) => SkewedAgg.saltedCount(li(s, d), Seq("l_suppkey"), col("l_orderkey"), 8, "cnt")
        .orderBy("l_suppkey"),
      Some("""SELECT l_suppkey, count(*) AS cnt FROM lineitem
             |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)),

    // §2.5 extension: window frames (running sum) + lag. The corpus has
    // duplicate (l_orderkey, l_linenumber) pairs, so the window order adds
    // l_quantity to stay total (identical (ln, qty) rows interchangeable).
    "q15_window_running" -> Q(
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("l_orderkey").orderBy("l_linenumber", "l_quantity")
        li(s, d).select(
            col("l_orderkey"), col("l_linenumber"),
            sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
              .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
              .cast("double").as("running_qty"),
            lag(col("l_quantity"), 1).over(w).as("prev_qty"))
          .orderBy("l_orderkey", "l_linenumber", "running_qty")
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER (
             |         PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty,
             |       lag(l_quantity, 1) OVER (
             |         PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity) AS prev_qty
             |FROM lineitem ORDER BY l_orderkey, l_linenumber, running_qty""".stripMargin)),

    // S7/A11: SparkSQL text entry over a temp view.
    "q16_sql_agg" -> Q(
      (s, d) => {
        ord(s, d).createOrReplaceTempView("graft_orders")
        s.sql("""SELECT o_orderpriority, count(*) AS n,
                |       CAST(min(o_totalprice) AS DOUBLE) AS min_price,
                |       CAST(max(o_totalprice) AS DOUBLE) AS max_price
                |FROM graft_orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |       CAST(min(o_totalprice) AS DOUBLE) AS min_price,
             |       CAST(max(o_totalprice) AS DOUBLE) AS max_price
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // The flagship: the reference's full TOP_ITEMS pipeline (M1 slice) on
    // the corpus — dedup → grouped count → per-group top-5 with string
    // ranks → broadcast left join with "Unknown" → snake_case contract.
    "q17_top_items" -> Q(
      (s, d) => {
        val dd = dedupedLineitem(s, d).select("l_suppkey", "l_partkey")
        val counts = dd.groupBy("l_suppkey", "l_partkey").agg(count(lit(1)).as("cnt"))
        val ranked = TopK.perGroup(counts,
          Seq(col("l_suppkey")), Seq(col("cnt").desc, col("l_partkey").asc), 5, "rnk")
        Joins.enrichLeftBroadcast(ranked,
            Tables.supplier(s, d).select("s_suppkey", "s_name"),
            "l_suppkey", "s_suppkey", Map("s_name" -> "Unknown"))
          .select(
            col("s_name").as("geographical_location"),
            col("rnk").cast("string").as("item_rank"),
            col("l_partkey").cast("string").as("item_name"))
          .orderBy(col("geographical_location"), col("item_rank").cast("int"), col("item_name"))
      },
      Some(s"""WITH dd AS (SELECT l_suppkey, l_partkey FROM ($dedupSql) x),
             |cnts AS (SELECT l_suppkey, l_partkey, count(*) AS cnt FROM dd GROUP BY 1, 2),
             |ranked AS (
             |  SELECT l_suppkey, l_partkey,
             |         row_number() OVER (PARTITION BY l_suppkey ORDER BY cnt DESC, l_partkey) AS rnk
             |  FROM cnts)
             |SELECT coalesce(s_name, 'Unknown') AS geographical_location,
             |       CAST(rnk AS VARCHAR) AS item_rank,
             |       CAST(l_partkey AS VARCHAR) AS item_name
             |FROM ranked LEFT JOIN supplier ON l_suppkey = s_suppkey
             |WHERE rnk <= 5
             |ORDER BY geographical_location, CAST(item_rank AS INTEGER), item_name""".stripMargin),
      headline = true),

    // Reference ITEM_COUNT on the corpus.
    "q18_item_count" -> Q(
      (s, d) => dedupedLineitem(s, d)
        .groupBy("l_suppkey", "l_partkey").agg(count(lit(1)).as("cnt"))
        .orderBy("l_suppkey", "l_partkey"),
      Some(s"""SELECT l_suppkey, l_partkey, count(*) AS cnt FROM ($dedupSql) dd
              |GROUP BY l_suppkey, l_partkey ORDER BY l_suppkey, l_partkey""".stripMargin)),

    // Reference LOCATION_STATS on the corpus: group size, distinct items,
    // arg-max "camera" (busiest part), deterministic ties. ONE pass: after
    // the (suppkey, partkey) count, total = sum(cnt), distinct items =
    // group size, and the arg-max is a min_by over the same rows — no
    // second dedup, no countDistinct expand, no rejoin (all three stats
    // ride the same two-phase aggregation; at 100 TB this halves the scan
    // work and removes a whole shuffle vs the naive three-branch plan).
    "q19_location_stats" -> Q(
      (s, d) => dedupedLineitem(s, d)
        .groupBy("l_suppkey", "l_partkey").agg(count(lit(1)).as("cnt"))
        .groupBy("l_suppkey")
        .agg(
          sum(col("cnt")).as("total_detections"),
          count(lit(1)).as("unique_items"),
          min_by(col("l_partkey"), struct((-col("cnt")).as("neg"), col("l_partkey")))
            .as("top_part"))
        .select("l_suppkey", "total_detections", "unique_items", "top_part")
        .orderBy("l_suppkey"),
      Some(s"""WITH dd AS (SELECT * FROM ($dedupSql) x),
              |stats AS (
              |  SELECT l_suppkey, count(*) AS total_detections,
              |         count(DISTINCT l_partkey) AS unique_items
              |  FROM dd GROUP BY l_suppkey),
              |top AS (
              |  SELECT l_suppkey, l_partkey AS top_part FROM (
              |    SELECT l_suppkey, l_partkey,
              |           row_number() OVER (PARTITION BY l_suppkey ORDER BY cnt DESC, l_partkey) AS rn
              |    FROM (SELECT l_suppkey, l_partkey, count(*) AS cnt FROM dd GROUP BY 1, 2) c) r
              |  WHERE rn = 1)
              |SELECT s.l_suppkey, s.total_detections, s.unique_items, t.top_part
              |FROM stats s JOIN top t ON s.l_suppkey = t.l_suppkey
              |ORDER BY s.l_suppkey""".stripMargin),
      headline = true))
}

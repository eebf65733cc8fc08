package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Stats, ZOrder}

/** Relational surface beyond the reference's own operator list (the
  * reference has no set difference/intersection, pivots, or grouping
  * sets — SURVEY.md §2.7/§2.4 notes) — capabilities a user migrating a
  * broader SQL workload onto this engine would expect. All
  * DuckDB-oracle-checked.
  */
object ExtendedQueries {

  val queries: Map[String, Q] = Map(

    // Full outer join — the one outer-join shape nothing else in the
    // corpus exercises (q06 is left-outer, q51 semi/anti). Both inputs
    // are filtered so each side has unmatched rows, and every output
    // column is coalesced to a typed default so the result is total.
    "q86_full_outer" -> Q(
      (s, d) => {
        val c = Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey", "c_name")
        val o = Tables.orders(s, d)
          .filter(col("o_orderstatus") === "F")
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_f_orders"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("sp"))
        c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(
            coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            coalesce(col("c_name"), lit("<no-customer>")).as("c_name"),
            coalesce(col("n_f_orders"), lit(0L)).as("n_f_orders"),
            coalesce(col("sp"), lit(0).cast("decimal(18,2)"))
              .cast("double").as("sum_f_price"))
          .orderBy("custkey")
      },
      Some("""WITH c AS (SELECT c_custkey, c_name FROM customer
             |           WHERE c_mktsegment = 'BUILDING'),
             |o AS (SELECT o_custkey, count(*) AS n_f_orders,
             |        sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sp
             |      FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey)
             |SELECT coalesce(c_custkey, o_custkey) AS custkey,
             |       coalesce(c_name, '<no-customer>') AS c_name,
             |       coalesce(n_f_orders, 0) AS n_f_orders,
             |       CAST(coalesce(sp, 0) AS DOUBLE) AS sum_f_price
             |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
             |ORDER BY custkey""".stripMargin)),

    // Join-key skew profiler: top-5 heavy hitters and their row share for
    // each lineitem join key — the diagnostic that decides between plain
    // shuffle, AQE skew-join, and salting (SkewedAgg) before running a
    // big join. Each profile is one two-phase count aggregation plus a
    // WindowGroupLimit top-k; the corpus total rides along as a broadcast
    // scalar, not a driver-side action.
    "q89_skew_profile" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val li = Tables.lineitem(s, d)
        val total = li.agg(count(lit(1)).as("total"))
        // union the per-key counts FIRST, then one window partitioned by
        // key_col — three parallel partitions instead of three global
        // single-partition sorts over every distinct key value
        val profiles = Seq("l_orderkey", "l_partkey", "l_suppkey").map { kc =>
          li.groupBy(col(kc).as("key_val")).agg(count(lit(1)).as("cnt"))
            .withColumn("key_col", lit(kc))
        }.reduce(_.unionByName(_))
        val w = Window.partitionBy("key_col")
          .orderBy(col("cnt").desc, col("key_val"))
        profiles
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 5)
          .crossJoin(broadcast(total))
          .select(col("key_col"), col("rnk"), col("key_val"), col("cnt"),
            round(col("cnt").cast("double") / col("total"), 6).as("share"))
          .orderBy("key_col", "rnk")
      },
      Some("""WITH t AS (SELECT count(*) AS total FROM lineitem),
             |p AS (
             |  SELECT 'l_orderkey' AS key_col, l_orderkey AS key_val, count(*) AS cnt
             |  FROM lineitem GROUP BY l_orderkey
             |  UNION ALL
             |  SELECT 'l_partkey', l_partkey, count(*) FROM lineitem GROUP BY l_partkey
             |  UNION ALL
             |  SELECT 'l_suppkey', l_suppkey, count(*) FROM lineitem GROUP BY l_suppkey),
             |r AS (SELECT key_col, key_val, cnt,
             |        row_number() OVER (PARTITION BY key_col
             |          ORDER BY cnt DESC, key_val) AS rnk
             |      FROM p)
             |SELECT key_col, rnk, key_val, cnt,
             |       round(CAST(cnt AS DOUBLE) / total, 6) AS share
             |FROM r, t WHERE rnk <= 5 ORDER BY key_col, rnk""".stripMargin)),

    // Sketch top-k (Spark 4 approx_top_k): mergeable frequent-items
    // summary — the scale path for "top sellers over 100 TB" where an
    // exact global count-then-sort is wasteful. maxItemsTracked (10000)
    // exceeds the distinct suppkeys through sf1, so the sketch is
    // provably exact HERE and the oracle can replay it as plain SQL;
    // beyond that budget the sketch is genuinely approximate and the
    // exact oracle no longer applies (the sketch's own guarantee, not a
    // bug — re-derive the budget before lifting to a bigger corpus).
    // Boundary counts are distinct in this corpus, so re-ranking by
    // (count desc, key) is deterministic.
    "q91_approx_topk" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.orderBy(col("cnt").desc, col("l_suppkey"))
        Tables.lineitem(s, d)
          .agg(expr("approx_top_k(l_suppkey, 5, 10000)").as("tk"))
          .select(explode(col("tk")).as("e"))
          .select(col("e.item").as("l_suppkey"), col("e.count").as("cnt"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .select("rnk", "l_suppkey", "cnt")
          .orderBy("rnk")
      },
      Some("""SELECT rnk, l_suppkey, cnt FROM (
             |  SELECT l_suppkey, count(*) AS cnt,
             |    row_number() OVER (ORDER BY count(*) DESC, l_suppkey) AS rnk
             |  FROM lineitem GROUP BY l_suppkey) t
             |WHERE rnk <= 5 ORDER BY rnk""".stripMargin)),

    // Fixed-point PageRank over the customer-supplier interaction graph
    // (who trades with whom, via orders |x| lineitem): 2 damped rounds,
    // top-20 nodes. Integer quantization + floor division + id
    // tie-breaks make the ITERATION itself oracle-replayable (two
    // unrolled rounds in SQL) — same philosophy as the q85 k-means
    // training replay. Suppliers are offset by 1e12 into a shared node
    // id space (far above any custkey at any realistic scale factor —
    // a 1e6 offset would collide with customers beyond sf~6).
    "q93_pagerank" -> Q(
      (s, d) => {
        val e0 = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("u"),
            (col("l_suppkey") + 1000000000000L).as("v"))
          .distinct()
        val edges = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
        graft.operators.PageRank.run(edges, iters = 2)
          .select(col("node"),
            when(col("node") >= 1000000000000L, lit("supplier"))
              .otherwise(lit("customer")).as("kind"),
            col("rank_fp"))
          .orderBy(col("rank_fp").desc, col("node"))
          .limit(20)
      },
      Some("""WITH e0 AS (SELECT DISTINCT o_custkey AS u,
             |              l_suppkey + 1000000000000 AS v
             |            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
             |deg AS (SELECT u, count(*) AS deg FROM e GROUP BY u),
             |nn AS (SELECT count(*) AS n FROM deg),
             |r0 AS (SELECT u AS node, deg, 1000000 // n AS r FROM deg, nn),
             |c1 AS (SELECT e.v AS node, sum(r0.r // r0.deg) AS c
             |       FROM e JOIN r0 ON e.u = r0.node GROUP BY e.v),
             |r1 AS (SELECT r0.node, r0.deg,
             |         (3 * 1000000) // (20 * nn.n)
             |           + (17 * coalesce(c1.c, 0)) // 20 AS r
             |       FROM r0 LEFT JOIN c1 USING (node), nn),
             |c2 AS (SELECT e.v AS node, sum(r1.r // r1.deg) AS c
             |       FROM e JOIN r1 ON e.u = r1.node GROUP BY e.v),
             |r2 AS (SELECT r1.node, r1.deg,
             |         (3 * 1000000) // (20 * nn.n)
             |           + (17 * coalesce(c2.c, 0)) // 20 AS r
             |       FROM r1 LEFT JOIN c2 USING (node), nn)
             |SELECT node,
             |       CASE WHEN node >= 1000000000000 THEN 'supplier'
             |            ELSE 'customer' END AS kind,
             |       CAST(r AS BIGINT) AS rank_fp
             |FROM r2 ORDER BY rank_fp DESC, node LIMIT 20""".stripMargin)),

    // first/last/nth value windows — the value-navigation functions q50's
    // lag/lead battery doesn't cover, each over an explicit frame (the
    // last_value default frame ends at CURRENT ROW, a classic silent-bug
    // spot both engines agree on only when the frame is spelled out).
    "q94_value_windows" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val toEnd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val whole = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val near = base.rowsBetween(-1, 1)
        Tables.events(s, d).filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("value"),
            first("value").over(base).as("first_v"),
            last("value").over(toEnd).as("last_v"),
            nth_value(col("value"), 2).over(whole).as("second_v"),
            max("value").over(near).as("local_max"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, value,
             |  first_value(value) OVER w AS first_v,
             |  last_value(value) OVER (w ROWS BETWEEN CURRENT ROW
             |    AND UNBOUNDED FOLLOWING) AS last_v,
             |  nth_value(value, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
             |    AND UNBOUNDED FOLLOWING) AS second_v,
             |  max(value) OVER (w ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
             |    AS local_max
             |FROM events WHERE event_type = 'view'
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY event_id""".stripMargin)),

    // Salted fact |x| fact join (operators.SaltedJoin): the left side is
    // salted 8 ways, the right replicated 8x, the salt dropped on output
    // — semantics-preserving by construction, which this query PROVES
    // cross-engine: the oracle runs the plain unsalted join. The manual
    // fallback for skew that AQE's runtime splitting can't reach.
    "q95_salted_join" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select("l_orderkey", "l_partkey", "l_quantity")
        val o = Tables.orders(s, d)
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
        graft.operators.SaltedJoin
          .inner(li, o, Seq("l_orderkey"), col("l_partkey"), numSalts = 8)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)"))
              .cast("double").as("sum_qty"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Positional shingling through the custom GENERATOR (UDTF-shaped
    // Catalyst extension): (pos, shingle) rows emitted straight off the
    // kernel, no intermediate array column between scan and Generate.
    "q96_shingle_gen" -> Q(
      (s, d) => {
        import graft.functions.TextFunctions
        Tables.documents(s, d).filter(col("doc_id") < 50)
          .select(col("doc_id"),
            TextFunctions.shingleGenerate(col("text"), 5).as(Seq("pos", "shingle")))
          .select(col("doc_id"), col("pos").cast("long").as("pos"), col("shingle"))
          .orderBy("doc_id", "pos")
      },
      Some("""WITH nrm AS (SELECT doc_id,
             |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nm
             |  FROM documents WHERE doc_id < 50),
             |tok AS (SELECT doc_id, nm, string_split(nm, ' ') AS t FROM nrm),
             |g AS (SELECT doc_id,
             |    CASE WHEN len(t) < 5 THEN [nm]
             |         ELSE list_transform(range(1, len(t) - 3),
             |                i -> array_to_string(t[i:i+4], ' ')) END AS gr
             |  FROM tok)
             |SELECT doc_id, unnest(range(len(gr))) AS pos, unnest(gr) AS shingle
             |FROM g ORDER BY doc_id, pos""".stripMargin)),

    // Set difference + intersection, bag semantics (exceptAll /
    // intersectAll): high-value orders that are/aren't flagged F.
    "q38_set_ops" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        val flagged = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_custkey")
        val big = Tables.orders(s, d).filter(col("o_totalprice") > 200000.0)
          .select("o_orderkey", "o_custkey")
        big.exceptAll(flagged).withColumn("tag", lit("only_big"))
          .union(big.intersectAll(flagged).withColumn("tag", lit("both")))
          .orderBy("tag", "o_orderkey")
      },
      Some("""SELECT * FROM (
             |  SELECT o_orderkey, o_custkey, 'only_big' AS tag FROM (
             |    SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 200000.0
             |    EXCEPT ALL
             |    SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'F') a
             |  UNION ALL
             |  SELECT o_orderkey, o_custkey, 'both' AS tag FROM (
             |    SELECT o_orderkey, o_custkey FROM orders WHERE o_totalprice > 200000.0
             |    INTERSECT ALL
             |    SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'F') b) u
             |ORDER BY tag, o_orderkey""".stripMargin)),

    // Pivot: returnflag x linestatus count matrix (oracle uses portable
    // conditional aggregation rather than dialect PIVOT syntax).
    "q39_pivot" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .count()
        // empty pivot cells are NULL in Spark but 0 under the oracle's
        // FILTER aggregation — normalize
        .select(col("l_returnflag"),
          coalesce(col("F"), lit(0L)).as("F"), coalesce(col("O"), lit(0L)).as("O"))
        .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |       count(*) FILTER (WHERE l_linestatus = 'F') AS "F",
             |       count(*) FILTER (WHERE l_linestatus = 'O') AS "O"
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Rollup subtotals; grouping keys coalesced to a sentinel so subtotal
    // rows sort identically in both engines (Spark and DuckDB disagree on
    // NULL ordering).
    "q40_rollup" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("<all>")).as("flag"),
          coalesce(col("l_linestatus"), lit("<all>")).as("status"),
          col("n"))
        .orderBy("flag", "status"),
      Some("""SELECT coalesce(l_returnflag, '<all>') AS flag,
             |       coalesce(l_linestatus, '<all>') AS status,
             |       count(*) AS n
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY flag, status""".stripMargin)),

    // Analytic window functions beyond running aggregates (§2.5): lag
    // diff, lead lookahead, ntile bucketing — one window spec, three
    // functions, deterministic via the (ts, event_id) total order.
    "q50_window_funcs" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.events(s, d).filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("value"),
            (col("value") - lag(col("value"), 1).over(w)).as("delta_prev"),
            lead(col("event_id"), 1).over(w).as("next_event_id"),
            ntile(4).over(w).cast("long").as("quartile"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, value,
             |  value - lag(value, 1) OVER w AS delta_prev,
             |  lead(event_id, 1) OVER w AS next_event_id,
             |  ntile(4) OVER w AS quartile
             |FROM events WHERE event_type = 'purchase'
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY event_id""".stripMargin)),

    // Semi/anti joins (§2.3): existence tests without join fan-out —
    // customers partitioned by whether they have any open order. Both
    // plan as a single build-side-deduped hash join (no row
    // multiplication however many orders match).
    "q51_semi_anti" -> Q(
      (s, d) => {
        val c = Tables.customer(s, d).select("c_custkey")
        val open = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
          .select(col("o_custkey"))
        c.join(open, col("c_custkey") === col("o_custkey"), "left_semi")
          .withColumn("tag", lit("has_open"))
          .union(
            c.join(open, col("c_custkey") === col("o_custkey"), "left_anti")
              .withColumn("tag", lit("none_open")))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             |  CASE WHEN EXISTS (SELECT 1 FROM orders
             |                    WHERE o_custkey = c_custkey
             |                      AND o_orderstatus = 'O')
             |       THEN 'has_open' ELSE 'none_open' END AS tag
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // Range join (point-in-interval) via the binned equi-join operator —
    // a bare BETWEEN join predicate would plan as BroadcastNestedLoop
    // (O(n·m) compares); binning makes it a shuffled equi-join. Here:
    // lineitems priced within ±50 of each part's retail price.
    "q54_range_join" -> Q(
      (s, d) => {
        val pts = Tables.lineitem(s, d).select("l_orderkey", "l_extendedprice")
        val bands = Tables.part(s, d).select(
          col("p_partkey"),
          (col("p_retailprice") - 50.0).as("lo"),
          (col("p_retailprice") + 50.0).as("hi"))
        graft.operators.RangeJoin
          .pointInInterval(pts, "l_extendedprice", bands, "lo", "hi", binWidth = 100.0)
          .groupBy("p_partkey").agg(count(lit(1)).as("n_in_band"))
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, count(*) AS n_in_band
             |FROM part JOIN lineitem
             |  ON l_extendedprice BETWEEN p_retailprice - 50 AND p_retailprice + 50
             |GROUP BY p_partkey ORDER BY p_partkey""".stripMargin)),

    // Full cube: all 2^k grouping-set combinations (rollup q40 covers the
    // hierarchical prefix sets; cube adds the status-only slice).
    "q56_cube" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("<all>")).as("flag"),
          coalesce(col("l_linestatus"), lit("<all>")).as("status"),
          col("n"))
        .orderBy("flag", "status"),
      Some("""SELECT coalesce(l_returnflag, '<all>') AS flag,
             |       coalesce(l_linestatus, '<all>') AS status,
             |       count(*) AS n
             |FROM lineitem
             |GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY flag, status""".stripMargin)),

    // Deterministic hash-based sampling — the reproducible alternative to
    // rand()-based sample(): membership is a pure function of the row key
    // (last md5 hex digit → exact 2/16 rate), so the sample is stable
    // across runs, engines, partitionings, and retries — which is what
    // makes 100 TB experiment pipelines auditable. rand(seed) can't give
    // that (Spark seeds per-partition, so membership changes with the
    // partitioning).
    "q57_det_sample" -> Q(
      (s, d) => Tables.events(s, d)
        .filter(substring(md5(col("event_id").cast("string")), 32, 1)
          .isin("0", "1"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n_sampled
             |FROM events
             |WHERE substr(md5(CAST(event_id AS VARCHAR)), 32, 1) IN ('0', '1')
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Unpivot/melt: wide numeric columns to long (metric, value) form —
    // the reshape every per-metric profiling pass needs. The oracle uses
    // dialect-safe UNION ALL (same relational content as UNPIVOT).
    "q58_unpivot" -> Q(
      (s, d) => {
        val metrics = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        Tables.lineitem(s, d)
          .select(metrics.map(col): _*)
          .unpivot(Array.empty, metrics.map(col).toArray, "metric", "value")
          .groupBy("metric")
          .agg(min(col("value")).as("min_v"), max(col("value")).as("max_v"),
            Stats.decimalSum(col("value")).as("sum_v"))
          .orderBy("metric")
      },
      Some("""WITH u AS (
             |  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
             |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
             |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
             |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
             |SELECT metric, min(value) AS min_v, max(value) AS max_v,
             |       CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_v
             |FROM u GROUP BY metric ORDER BY metric""".stripMargin)),

    // Nested-type aggregation: per order, the sorted array of its line
    // numbers (the corpus's duplicate (orderkey, linenumber) pairs stay
    // as multiset duplicates — sort_array makes the array a canonical,
    // engine-comparable value). The array is built and sorted natively;
    // the FINAL projection stringifies it (comma-joined) because the
    // output contract is scalar-only — nested cells aren't portable
    // across result-harness boundaries.
    "q59_array_agg" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(
          array_join(
            transform(sort_array(collect_list(col("l_linenumber"))),
              x => x.cast("string")), ",").as("line_numbers"),
          count(lit(1)).as("n_lines"))
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey,
             |       array_to_string(list_sort(list(l_linenumber)), ',') AS line_numbers,
             |       count(*) AS n_lines
             |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),

    // Correlated scalar subquery through the pure-SQL surface: Catalyst
    // must decorrelate it into an aggregate + join (no per-row subquery
    // execution exists in a distributed engine). Identical SQL runs on
    // the oracle — end-to-end SQL-text parity, not just DataFrame parity.
    "q60_sql_correlated" -> Q(
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("graft_customer")
        Tables.orders(s, d).createOrReplaceTempView("graft_orders2")
        s.sql("""SELECT c_custkey,
                |  (SELECT count(*) FROM graft_orders2
                |   WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
                |    AS n_big_orders
                |FROM graft_customer
                |WHERE (SELECT count(*) FROM graft_orders2
                |       WHERE o_custkey = c_custkey) >= 12
                |ORDER BY c_custkey""".stripMargin)
      },
      Some("""SELECT c_custkey,
             |  (SELECT count(*) FROM orders
             |   WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
             |    AS n_big_orders
             |FROM customer
             |WHERE (SELECT count(*) FROM orders
             |       WHERE o_custkey = c_custkey) >= 12
             |ORDER BY c_custkey""".stripMargin)),

    // Stratified deterministic sampling (sampleBy's auditable cousin):
    // per-stratum rates picked by first md5 hex digit of the row key —
    // purchase 8/16, click 2/16, everything else 1/16. Same membership on
    // every engine/partitioning/retry, unlike rand(seed) whose draw
    // depends on the partitioning (Spark seeds per partition).
    "q63_stratified_sample" -> Q(
      (s, d) => {
        val h = substring(md5(col("event_id").cast("string")), 1, 1)
        val keep = when(col("event_type") === "purchase",
            h.isin("0", "1", "2", "3", "4", "5", "6", "7"))
          .when(col("event_type") === "click", h.isin("0", "1"))
          .otherwise(h === "0")
        Tables.events(s, d).filter(keep)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_sampled"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n_sampled,
             |       count(DISTINCT user_id) AS n_users
             |FROM events
             |WHERE CASE
             |  WHEN event_type = 'purchase' THEN
             |    substr(md5(CAST(event_id AS VARCHAR)), 1, 1)
             |      IN ('0','1','2','3','4','5','6','7')
             |  WHEN event_type = 'click' THEN
             |    substr(md5(CAST(event_id AS VARCHAR)), 1, 1) IN ('0','1')
             |  ELSE substr(md5(CAST(event_id AS VARCHAR)), 1, 1) = '0' END
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Higher statistical moments (skewness/kurtosis) derived from
    // DECIMAL-exact power sums, NOT the builtin skewness()/kurtosis()
    // aggregates: engines disagree on bias correction and their streaming
    // merge order makes raw-double moments non-reproducible. Power sums of
    // the integral l_quantity are exact; the closed-form combination below
    // is the same IEEE expression tree on both sides → bit-identical.
    // Scale shape: one partial+final hash aggregate, five sums per group.
    "q64_moments" -> Q(
      (s, d) => {
        val x = col("l_quantity")
        val agg = Tables.lineitem(s, d).groupBy("l_returnflag").agg(
          count(lit(1)).as("n"),
          Stats.decimalSum(x).as("s1"),
          Stats.decimalSum(x * x).as("s2"),
          Stats.decimalSum(x * x * x).as("s3"),
          Stats.decimalSum(x * x * x * x).as("s4"))
        val m1 = col("s1") / col("n")
        val m2 = (col("s2") / col("n")) - (m1 * m1)
        val m3 = ((col("s3") / col("n")) - (lit(3.0) * (m1 * (col("s2") / col("n"))))) +
          (lit(2.0) * ((m1 * m1) * m1))
        val m4 = (((col("s4") / col("n")) - (lit(4.0) * (m1 * (col("s3") / col("n"))))) +
          (lit(6.0) * ((m1 * m1) * (col("s2") / col("n"))))) -
          (lit(3.0) * (((m1 * m1) * m1) * m1))
        agg.select(col("l_returnflag"), col("n"),
            m1.as("mean"), m2.as("m2"),
            (m3 / (sqrt(m2) * m2)).as("skewness"),
            ((m4 / (m2 * m2)) - lit(3.0)).as("kurtosis"))
          .orderBy("l_returnflag")
      },
      Some("""WITH s AS (
             |  SELECT l_returnflag, count(*) AS n,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS s1,
             |    CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS s2,
             |    CAST(SUM(CAST(l_quantity*l_quantity*l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS s3,
             |    CAST(SUM(CAST(l_quantity*l_quantity*l_quantity*l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS s4
             |  FROM lineitem GROUP BY l_returnflag),
             |m AS (
             |  SELECT l_returnflag, n,
             |    (s1/n) AS mean,
             |    ((s2/n) - ((s1/n)*(s1/n))) AS m2,
             |    (((s3/n) - (3.0*((s1/n)*(s2/n)))) + (2.0*(((s1/n)*(s1/n))*(s1/n)))) AS m3,
             |    ((((s4/n) - (4.0*((s1/n)*(s3/n)))) + (6.0*(((s1/n)*(s1/n))*(s2/n)))) -
             |      (3.0*((((s1/n)*(s1/n))*(s1/n))*(s1/n)))) AS m4
             |  FROM s)
             |SELECT l_returnflag, n, mean, m2,
             |  (m3/(sqrt(m2)*m2)) AS skewness,
             |  ((m4/(m2*m2)) - 3.0) AS kurtosis
             |FROM m ORDER BY l_returnflag""".stripMargin)),

    // String-function battery (§2.8 extension): the everyday scalar string
    // surface a migrating SQL workload leans on, all codegen'd built-ins,
    // checked cross-engine in one projection.
    "q65_string_funcs" -> Q(
      (s, d) => Tables.part(s, d).select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          length(col("p_name")).cast("long").as("name_len"),
          substring(col("p_name"), 1, 8).as("name_pre"),
          reverse(col("p_brand")).as("brand_rev"),
          lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
          regexp_replace(col("p_name"), " ", "_").as("name_snake"),
          split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  upper(p_brand) AS brand_u,
             |  length(p_name) AS name_len,
             |  substr(p_name, 1, 8) AS name_pre,
             |  reverse(p_brand) AS brand_rev,
             |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
             |  replace(p_name, ' ', '_') AS name_snake,
             |  split_part(p_type, ' ', 1) AS type_head,
             |  concat_ws('|', p_brand, p_type) AS brand_type
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Datetime-function battery (§2.8 extension): calendar extraction,
    // month bucketing, day arithmetic, clamped month addition — outputs
    // kept as strings/longs so the comparison is representation-proof.
    "q66_datetime_funcs" -> Q(
      (s, d) => Tables.orders(s, d).select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("dd"),
          date_format(col("o_orderdate"), "yyyy-MM").as("month_key"),
          datediff(col("o_orderdate").cast("date"), to_date(lit("1995-01-01")))
            .cast("long").as("days_since_95"),
          date_format(add_months(col("o_orderdate").cast("date"), 3), "yyyy-MM-dd")
            .as("plus_3m"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  year(o_orderdate) AS y,
             |  month(o_orderdate) AS m,
             |  day(o_orderdate) AS dd,
             |  strftime(o_orderdate, '%Y-%m') AS month_key,
             |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
             |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Z-order (Morton) layout keys: quantize (part, supplier) to 10 bits
    // each, interleave to a 20-bit z-value, and profile occupancy per
    // z-range — the histogram a layout optimizer consults before
    // clustering files along the curve (operators/ZOrder.cluster). The
    // oracle SQL is generated by the same loop as the Spark expression.
    "q67_zorder_key" -> Q(
      (s, d) => {
        val z = ZOrder.zValue(
          Seq(shiftright(col("l_partkey"), 5), col("l_suppkey")), bits = 10)
        Tables.lineitem(s, d)
          .select(z.as("zval"))
          .groupBy(shiftright(col("zval"), 14).as("zbucket"))
          .agg(count(lit(1)).as("n"),
            min(col("zval")).as("min_z"), max(col("zval")).as("max_z"))
          .orderBy("zbucket")
      },
      Some(s"""WITH z AS (
              |  SELECT ${ZOrder.zValueSql(Seq("l_partkey >> 5", "l_suppkey"), 10)} AS zval
              |  FROM lineitem)
              |SELECT (zval >> 14) AS zbucket, count(*) AS n,
              |       min(zval) AS min_z, max(zval) AS max_z
              |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin)),

    // Data-quality constraint report (the Deequ-style audit a training
    // pipeline runs before ingesting a drop): completeness, value-range,
    // primary-key uniqueness, and referential integrity as (check_name,
    // violations, checked) rows. One left join against the unique-keyed
    // orders table (so row counts are preserved and a NULL right side =
    // an orphan) feeds ONE aggregate pass computing all four checks;
    // `inline` fans the single stats row out into the report. The
    // corpus's injected duplicate (l_orderkey, l_linenumber) pairs make
    // pk_uniqueness show real violations.
    "q68_quality_checks" -> Q(
      (s, d) => {
        val agg = Tables.lineitem(s, d)
          .join(Tables.orders(s, d).select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left")
          .agg(
            count(lit(1)).as("n"),
            count(when(col("l_quantity").isNull, 1)).as("nulls"),
            count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1))
              .as("range_viol"),
            // NULL-keyed rows count as uniqueness violations by design (a
            // null pk is broken however you read it). Spark's multi-column
            // countDistinct skips any-null rows natively; the oracle adds
            // an explicit FILTER because DuckDB's row-value DISTINCT would
            // otherwise count null-field structs as distinct values.
            (count(lit(1)) -
              countDistinct(col("l_orderkey"), col("l_linenumber"))).as("dup_pk"),
            count(when(col("o_orderkey").isNull, 1)).as("n_orphans"))
        agg.select(inline(array(
            struct(lit("completeness_quantity").as("check_name"),
              col("nulls").as("violations"), col("n").as("checked")),
            struct(lit("pk_uniqueness").as("check_name"),
              col("dup_pk").as("violations"), col("n").as("checked")),
            struct(lit("range_quantity").as("check_name"),
              col("range_viol").as("violations"), col("n").as("checked")),
            struct(lit("ref_integrity_orderkey").as("check_name"),
              col("n_orphans").as("violations"), col("n").as("checked")))))
          .orderBy("check_name")
      },
      Some("""WITH li AS (
             |  SELECT count(*) AS n,
             |    count(*) FILTER (WHERE l_quantity IS NULL) AS nulls,
             |    count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS range_viol,
             |    count(*) - count(DISTINCT (l_orderkey, l_linenumber))
             |      FILTER (WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL) AS dup_pk,
             |    count(*) FILTER (WHERE o_orderkey IS NULL) AS n_orphans
             |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey)
             |SELECT check_name, violations, checked FROM (
             |  SELECT 'completeness_quantity' AS check_name, nulls AS violations, n AS checked FROM li
             |  UNION ALL SELECT 'pk_uniqueness', dup_pk, n FROM li
             |  UNION ALL SELECT 'range_quantity', range_viol, n FROM li
             |  UNION ALL SELECT 'ref_integrity_orderkey', n_orphans, n FROM li) u
             |ORDER BY check_name""".stripMargin)),

    // Fixed-width histogram: constant-anchor bucketing is one map-side
    // expression + a hash aggregate (no global min subquery, no sort) —
    // the distribution profile that stays cheap at any scale.
    "q69_histogram" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .groupBy(floor(col("l_extendedprice") / 1000.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"))
        .orderBy("bucket"),
      Some("""SELECT CAST(floor(l_extendedprice/1000.0) AS BIGINT) AS bucket,
             |       count(*) AS n,
             |       min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
             |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // Explicit GROUPING SETS with grouping() markers through the pure-SQL
    // surface (rollup q40 and cube q56 cover the derived forms; this is
    // the general construct): two disjoint single-column slices in one
    // aggregate pass, the grouping-id columns disambiguating which slice
    // each row belongs to. Identical SQL text runs on the oracle.
    "q70_grouping_sets" -> Q(
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("graft_lineitem_gs")
        s.sql("""SELECT coalesce(l_returnflag, '<all>') AS flag,
                |       coalesce(l_linestatus, '<all>') AS status,
                |       count(*) AS n,
                |       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
                |       CAST(grouping(l_linestatus) AS BIGINT) AS g_status
                |FROM graft_lineitem_gs
                |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
                |ORDER BY flag, status""".stripMargin)
      },
      Some("""SELECT coalesce(l_returnflag, '<all>') AS flag,
             |       coalesce(l_linestatus, '<all>') AS status,
             |       count(*) AS n,
             |       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
             |       CAST(grouping(l_linestatus) AS BIGINT) AS g_status
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
             |ORDER BY flag, status""".stripMargin)),

    // RANGE window frame (q15 covers ROWS): per customer, trailing-90-day
    // order count + exact spend at every order. The frame is keyed on
    // epoch SECONDS (numeric range) so both engines agree without interval
    // dialect drift; RANGE includes all peers of the current row, making
    // tied order-dates deterministic with no extra tie-break.
    "q71_range_frame" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy("epoch_s")
          .rangeBetween(-90L * 86400L, 0L)
        Tables.orders(s, d)
          .withColumn("epoch_s",
            unix_seconds(col("o_orderdate").cast("timestamp")))
          .select(col("o_orderkey"), col("o_custkey"),
            count(lit(1)).over(w).as("n_90d"),
            // .over must bind to the sum aggregate itself, so the decimal
            // cast dance is inlined here rather than via Stats.decimalSum
            sum(col("o_totalprice")
              .cast(org.apache.spark.sql.types.DecimalType(38, 4))).over(w)
              .cast("double").as("spend_90d"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  count(*) OVER w AS n_90d,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) OVER w AS DOUBLE) AS spend_90d
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey
             |  ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
             |  RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)
             |ORDER BY o_orderkey""".stripMargin)),

    // Five-table star join: region -> nation -> customer -> orders ->
    // lineitem revenue rollup. The macro-query shape Catalyst's join
    // reorder + AQE exist for: the dim chain broadcasts, the fact tables
    // meet in a single shuffle join, aggregation is partial->final.
    "q72_star_join" -> Q(
      (s, d) => {
        val revenue = Stats.decimalSum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
          .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"), revenue.as("revenue"))
          .orderBy("r_name", "o_orderpriority")
      },
      Some("""SELECT r_name, o_orderpriority, count(*) AS n_items,
             |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,4))) AS DOUBLE)
             |    AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, o_orderpriority
             |ORDER BY r_name, o_orderpriority""".stripMargin)),

    // New-vs-returning cohort split: first-seen day per user (a min
    // aggregate, not a window over the full history), joined back to
    // classify every active day. Day keys are formatted strings, so
    // lexicographic min == chronological and timestamp representation
    // can't perturb the hash.
    "q73_cohort_newret" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        val first = ev.groupBy("user_id").agg(min(col("day")).as("first_day"))
        ev.join(first, "user_id")
          .groupBy("day")
          .agg(
            countDistinct(col("user_id")).as("dau"),
            countDistinct(when(col("day") === col("first_day"), col("user_id")))
              .as("new_users"))
          .withColumn("returning_users", col("dau") - col("new_users"))
          .orderBy("day")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events),
             |f AS (SELECT user_id, min(day) AS first_day FROM ev GROUP BY user_id)
             |SELECT day,
             |  count(DISTINCT user_id) AS dau,
             |  count(DISTINCT CASE WHEN day = first_day THEN user_id END) AS new_users,
             |  count(DISTINCT user_id)
             |    - count(DISTINCT CASE WHEN day = first_day THEN user_id END)
             |    AS returning_users
             |FROM ev JOIN f USING (user_id)
             |GROUP BY day ORDER BY day""".stripMargin)),

    // Higher-order array functions over nested data (q59 builds the
    // arrays; this is the lambda surface over them): transform / filter /
    // aggregate-fold / max / membership / slice, all executed inside the
    // engine with no explode-reaggregate round-trip — the idiom that
    // keeps nested-data pipelines shuffle-free.
    "q74_array_lambdas" -> Q(
      (s, d) => {
        // All lambda work happens on the native arrays; each array-valued
        // result is stringified only in the FINAL projection (scalar-only
        // output contract — nested cells don't survive result harnesses).
        val str = (c: Column) =>
          array_join(transform(c, x => x.cast("string")), ",")
        Tables.lineitem(s, d)
          .groupBy("l_orderkey")
          .agg(sort_array(collect_list(col("l_linenumber"))).as("lines"))
          .select(
            col("l_orderkey"),
            str(transform(col("lines"), x => x * 2)).as("doubled"),
            str(filter(col("lines"), x => x % 2 === 0)).as("evens"),
            aggregate(col("lines"), lit(0L), (acc, x) => acc + x).as("line_sum"),
            array_max(col("lines")).as("line_max"),
            array_contains(col("lines"), 3).as("has_line3"),
            str(slice(col("lines"), 1, 2)).as("first_two"))
          .orderBy("l_orderkey")
      },
      Some("""WITH a AS (
             |  SELECT l_orderkey, list_sort(list(l_linenumber)) AS lines
             |  FROM lineitem GROUP BY l_orderkey)
             |SELECT l_orderkey,
             |  array_to_string(list_transform(lines, x -> x * 2), ',') AS doubled,
             |  array_to_string(list_filter(lines, x -> x % 2 = 0), ',') AS evens,
             |  CAST(list_sum(lines) AS BIGINT) AS line_sum,
             |  list_max(lines) AS line_max,
             |  list_contains(lines, 3) AS has_line3,
             |  array_to_string(list_slice(lines, 1, 2), ',') AS first_two
             |FROM a ORDER BY l_orderkey""".stripMargin)),

    // Conditional/null-handling battery (§2.8 extension): nullif-driven
    // sentinel collapse, coalesce defaults, least/greatest clamping, and
    // multi-branch CASE — the null-safety idioms every migrated workload
    // carries.
    "q75_conditionals" -> Q(
      (s, d) => Tables.orders(s, d).select(
          col("o_orderkey"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
            .as("status_label"),
          least(col("o_totalprice"), lit(100000.0)).as("capped_price"),
          greatest(col("o_totalprice"), lit(1000.0)).as("floored_price"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "expedite")
            .when(col("o_orderpriority") === "3-MEDIUM", "standard")
            .otherwise("relaxed").as("sla_class"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_label,
             |  least(o_totalprice, 100000.0) AS capped_price,
             |  greatest(o_totalprice, 1000.0) AS floored_price,
             |  CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'expedite'
             |       WHEN o_orderpriority = '3-MEDIUM' THEN 'standard'
             |       ELSE 'relaxed' END AS sla_class
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Rank-statistics window functions (q50 covers lag/lead/ntile; these
    // are the tie-aware ranks): rank / dense_rank over the price order,
    // percent_rank and cume_dist — both defined as ratios of exact row
    // counts ((rank-1)/(n-1), peers/n), so one IEEE division each and
    // bit-identical across engines even though the outputs are doubles.
    "q76_rank_stats" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
        Tables.orders(s, d).select(
            col("o_orderkey"), col("o_orderpriority"),
            rank().over(w).cast("long").as("rnk"),
            dense_rank().over(w).cast("long").as("drnk"),
            percent_rank().over(w).as("prnk"),
            cume_dist().over(w).as("cdist"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderpriority,
             |  rank() OVER w AS rnk,
             |  dense_rank() OVER w AS drnk,
             |  percent_rank() OVER w AS prnk,
             |  cume_dist() OVER w AS cdist
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
             |ORDER BY o_orderkey""".stripMargin)),

    // SLIDING event-time windows (q25 covers tumbling): 1-hour windows
    // every 15 minutes, so each event lands in exactly width/slide = 4
    // windows. The oracle expands the same epoch-aligned slide grid with
    // a 4-element unnest; window starts are compared as epoch SECONDS so
    // no timestamp representation can perturb the hash.
    "q77_sliding_windows" -> Q(
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), Stats.decimalSum(col("value")).as("sum_value"))
        .select(
          unix_seconds(col("w.start").cast("timestamp")).as("window_start_s"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start_s", "event_type"),
      Some("""WITH w AS (
             |  SELECT event_type, value,
             |    -- floor, not CAST: epoch() is a fractional double and a
             |    -- bare BIGINT cast ROUNDS, nudging boundary events into
             |    -- the next window
             |    (CAST(floor(epoch(ts)) AS BIGINT) // 900 - i) * 900 AS window_start_s
             |  FROM events CROSS JOIN unnest([0, 1, 2, 3]) AS t(i))
             |SELECT window_start_s, event_type, count(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
             |FROM w GROUP BY window_start_s, event_type
             |ORDER BY window_start_s, event_type""".stripMargin)),

    // Map-typed columns: construct, point-lookup, keys, cardinality. The
    // map value itself stays internal (engines disagree on map rendering);
    // everything extracted from it is stringified to scalar in the FINAL
    // projection (scalar-only output contract).
    // DuckDB's subscript returns a list, so the oracle bridges with [1].
    "q78_map_funcs" -> Q(
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"),
          map(lit("status"), col("o_orderstatus"),
            lit("priority"), col("o_orderpriority")).as("m"))
        .select(
          col("o_orderkey"),
          element_at(col("m"), "priority").as("prio"),
          element_at(col("m"), "status").as("status"),
          array_join(map_keys(col("m")), ",").as("ks"),
          size(col("m")).cast("long").as("n_entries"))
        .orderBy("o_orderkey"),
      Some("""WITH t AS (
             |  SELECT o_orderkey,
             |    map(['status','priority'], [o_orderstatus, o_orderpriority]) AS m
             |  FROM orders)
             |SELECT o_orderkey,
             |  m['priority'][1] AS prio,
             |  m['status'][1] AS status,
             |  array_to_string(map_keys(m), ',') AS ks,
             |  CAST(cardinality(m) AS BIGINT) AS n_entries
             |FROM t ORDER BY o_orderkey""".stripMargin)),

    // Regexp battery: group extraction, whole-match extraction, pattern
    // predicate, global replace. Patterns stay in the Java/RE2 common
    // subset; the oracle's regexp_replace needs the 'g' flag because
    // DuckDB replaces only the first match by default while Spark
    // replaces all.
    "q79_regexp_funcs" -> Q(
      (s, d) => Tables.part(s, d).select(
          col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 2).as("second_word"),
          regexp_extract(col("p_brand"), "[0-9]+", 0).as("brand_num"),
          col("p_name").rlike("(bolt|widget)").as("is_hw"),
          regexp_replace(col("p_type"), "[AEIOU]", "_").as("devowel"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word,
             |  regexp_extract(p_brand, '[0-9]+', 0) AS brand_num,
             |  regexp_matches(p_name, '(bolt|widget)') AS is_hw,
             |  regexp_replace(p_type, '[AEIOU]', '_', 'g') AS devowel
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Quantity-weighted mean price per return flag: both numerator and
    // denominator are DECIMAL-exact sums (the per-row product is a single
    // correctly-rounded double first), so the final ratio is one IEEE
    // division — the standard weighted-aggregate pattern without the
    // usual cross-engine float-sum drift.
    "q80_weighted_avg" -> Q(
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          Stats.decimalSum(col("l_extendedprice") * col("l_quantity")).as("wsum"),
          Stats.decimalSum(col("l_quantity")).as("wtot"))
        .select(col("l_returnflag"),
          col("wsum"), col("wtot"),
          (col("wsum") / col("wtot")).as("weighted_avg_price"))
        .orderBy("l_returnflag"),
      Some("""WITH s AS (
             |  SELECT l_returnflag,
             |    CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS wsum,
             |    CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS wtot
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, wsum, wtot,
             |  (wsum/wtot) AS weighted_avg_price
             |FROM s ORDER BY l_returnflag""".stripMargin)),

    // Structured JSON parsing (q26 extracts one scalar; this parses into
    // a typed struct): from_json with an explicit schema, nested field
    // access, and a schema field absent from the data surfacing as null —
    // the contract evolution-tolerant JSON ingestion relies on.
    "q81_json_struct" -> Q(
      (s, d) => Tables.events(s, d).select(
          col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, m STRING"))
            .as("p"))
        .select(col("event_id"), col("p.k").as("k"), col("p.m").as("m"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             |  json_extract_string(props, '$.m') AS m
             |FROM events ORDER BY event_id""".stripMargin)),

    // try_* null-safe arithmetic/casts (ANSI mode is on in Spark 4, so
    // a bare bad cast or /0 FAILS the job; try_ variants are the
    // per-expression opt-out a dirty-data pipeline needs). The oracle
    // spells them TRY_CAST / nullif-guarded division.
    "q82_try_ops" -> Q(
      (s, d) => Tables.part(s, d).select(
          col("p_partkey"),
          expr("try_cast(p_brand AS INT)").as("bad_cast"),
          expr("try_cast(regexp_extract(p_brand, '[0-9]+', 0) AS BIGINT)")
            .as("brand_num"),
          expr("try_divide(p_retailprice, p_size)").as("per_size"),
          expr("try_divide(p_retailprice, p_size - p_size)").as("div0"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  TRY_CAST(p_brand AS INTEGER) AS bad_cast,
             |  TRY_CAST(regexp_extract(p_brand, '[0-9]+', 0) AS BIGINT) AS brand_num,
             |  p_retailprice / nullif(CAST(p_size AS DOUBLE), 0.0) AS per_size,
             |  p_retailprice / nullif(CAST(p_size - p_size AS DOUBLE), 0.0) AS div0
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Time-series resample + gap fill: hourly buckets per event_type,
    // missing hours materialized from a `sequence` spine (no driver
    // loop), interior gaps linearly interpolated between the nearest
    // observed neighbors via IGNORE NULLS value-navigation windows.
    // Aggregates stay order-independent (fixed-point LONG sum + count);
    // only the per-row scalar math is IEEE double, so Spark and DuckDB
    // agree bit-for-bit. The spine join is per-type and the windows
    // partition by event_type — at 100 TB this parallelizes per series,
    // with no global sort anywhere.
    "q98_gapfill" -> Q(
      (s, d) => graft.operators.GapFill
        .linear(Tables.events(s, d), "event_type", "ts", "value")
        .orderBy("event_type", "b"),
      Some("""WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS b,
             |    sum(CAST(round(value*1000) AS BIGINT)) AS obs_fp,
             |    count(*) AS n_obs
             |  FROM events GROUP BY 1,2),
             |bounds AS (SELECT event_type, min(b) AS b0, max(b) AS b1
             |  FROM hourly GROUP BY 1),
             |spine AS (SELECT event_type,
             |    unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS b
             |  FROM bounds),
             |j AS (SELECT s.event_type, s.b,
             |    CAST(h.obs_fp AS DOUBLE) / (CAST(h.n_obs AS DOUBLE) * 1000.0)
             |      AS avg_v,
             |    h.n_obs
             |  FROM spine s LEFT JOIN hourly h
             |    ON s.event_type = h.event_type AND s.b = h.b),
             |f AS (SELECT event_type, b, avg_v, n_obs,
             |    last_value(avg_v IGNORE NULLS) OVER (PARTITION BY event_type
             |      ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS pv,
             |    last_value(CASE WHEN avg_v IS NOT NULL THEN b END IGNORE NULLS)
             |      OVER (PARTITION BY event_type ORDER BY b
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
             |    first_value(avg_v IGNORE NULLS) OVER (PARTITION BY event_type
             |      ORDER BY b ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
             |      AS nv,
             |    first_value(CASE WHEN avg_v IS NOT NULL THEN b END IGNORE NULLS)
             |      OVER (PARTITION BY event_type ORDER BY b
             |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
             |  FROM j)
             |SELECT event_type, b, coalesce(n_obs, 0) AS n_obs,
             |  CASE WHEN avg_v IS NOT NULL THEN avg_v
             |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
             |         pv + (nv - pv) *
             |           (CAST(epoch(b) AS DOUBLE) - CAST(epoch(pt) AS DOUBLE))
             |         / (CAST(epoch(nt) AS DOUBLE) - CAST(epoch(pt) AS DOUBLE))
             |       END AS value_filled,
             |  CASE WHEN avg_v IS NOT NULL THEN 'obs'
             |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
             |       ELSE 'edge' END AS src
             |FROM f ORDER BY event_type, b""".stripMargin)),

    // Triangle counting by degree orientation — the classic
    // O(E^(3/2)) formulation where every undirected edge is directed
    // from its lower-(degree, id) endpoint, wedges enumerate only
    // ordered out-neighbor pairs, and closure is a pure EQUI-join on
    // the oriented edge set (no OR predicates, no nested loop). The
    // orientation bounds out-degree by sqrt(2E), so wedge counts stay
    // polynomial even on skewed degree distributions — the property
    // that makes this the standard distributed triangle algorithm.
    // Graph: parts co-purchased in >= 2 distinct orders (support
    // threshold keeps the graph sparse; support 1 would be near-dense).
    "q99_triangles" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
          .distinct()
        val pairs = li.as("x")
          .join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
          .groupBy(col("x.p").as("a"), col("y.p").as("b"))
          .agg(count(lit(1)).as("supp"))
          .filter(col("supp") >= 2)
          .select("a", "b")
        graft.operators.Triangles.summary(pairs)
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
             |  FROM lineitem),
             |pairs AS (SELECT x.p AS a, y.p AS b
             |  FROM li x JOIN li y ON x.ok = y.ok AND x.p < y.p
             |  GROUP BY 1,2 HAVING count(*) >= 2),
             |deg AS (SELECT node, count(*) AS deg FROM (
             |    SELECT a AS node FROM pairs
             |    UNION ALL SELECT b AS node FROM pairs)
             |  GROUP BY node),
             |o AS (SELECT
             |    CASE WHEN (da.deg, p.a) < (db.deg, p.b) THEN p.a ELSE p.b END
             |      AS u,
             |    CASE WHEN (da.deg, p.a) < (db.deg, p.b) THEN p.b ELSE p.a END
             |      AS v,
             |    CASE WHEN (da.deg, p.a) < (db.deg, p.b) THEN db.deg
             |         ELSE da.deg END AS vdeg
             |  FROM pairs p
             |  JOIN deg da ON p.a = da.node
             |  JOIN deg db ON p.b = db.node),
             |w AS (SELECT e1.v AS y, e2.v AS z
             |  FROM o e1 JOIN o e2
             |  ON e1.u = e2.u AND (e1.vdeg, e1.v) < (e2.vdeg, e2.v))
             |SELECT 'n_edges' AS metric, count(*) AS n FROM o
             |UNION ALL SELECT 'n_wedges', count(*) FROM w
             |UNION ALL SELECT 'n_triangles', count(*)
             |  FROM w JOIN o ON w.y = o.u AND w.z = o.v
             |ORDER BY metric""".stripMargin)),

    // Association-rule mining over market baskets: pair support from
    // the same co-occurrence self-join q99 uses, directional rules
    // a→b scored by confidence (supp_ab/supp_a) and lift
    // (confidence over b's base rate). The basket count rides along
    // as a 1-row broadcast scalar (same pattern as PageRank's N) —
    // no driver round-trip. Support threshold first: the expensive
    // scoring joins only ever see the (tiny) frequent-pair set.
    "q100_assoc_rules" -> Q(
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
          .distinct()
        val n = li.agg(countDistinct(col("ok")).as("n_orders"))
        val isup = li.groupBy("p").agg(count(lit(1)).as("supp"))
        val pairs = li.as("x")
          .join(li.as("y"),
            col("x.ok") === col("y.ok") && col("x.p") < col("y.p"))
          .groupBy(col("x.p").as("a"), col("y.p").as("b"))
          .agg(count(lit(1)).as("supp_ab"))
          .filter(col("supp_ab") >= 3)
        val rules = pairs.select("a", "b", "supp_ab")
          .union(pairs.select(col("b"), col("a"), col("supp_ab")))
        rules
          .join(isup.select(col("p").as("a"), col("supp").as("sa")), "a")
          .join(isup.select(col("p").as("b"), col("supp").as("sb")), "b")
          .crossJoin(broadcast(n))
          .select(col("a"), col("b"), col("supp_ab"),
            (col("supp_ab").cast("double") / col("sa").cast("double"))
              .as("confidence"),
            ((col("supp_ab").cast("double") * col("n_orders").cast("double"))
              / (col("sa").cast("double") * col("sb").cast("double")))
              .as("lift"))
          .orderBy(col("lift").desc, col("a"), col("b"))
          .limit(20)
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
             |  FROM lineitem),
             |n AS (SELECT count(DISTINCT ok) AS n_orders FROM li),
             |isup AS (SELECT p, count(*) AS supp FROM li GROUP BY 1),
             |pairs AS (SELECT x.p AS a, y.p AS b, count(*) AS supp_ab
             |  FROM li x JOIN li y ON x.ok = y.ok AND x.p < y.p
             |  GROUP BY 1,2 HAVING count(*) >= 3),
             |rules AS (SELECT a, b, supp_ab FROM pairs
             |  UNION ALL SELECT b, a, supp_ab FROM pairs)
             |SELECT r.a, r.b, r.supp_ab,
             |  CAST(r.supp_ab AS DOUBLE) / CAST(sa.supp AS DOUBLE)
             |    AS confidence,
             |  (CAST(r.supp_ab AS DOUBLE) * CAST(n.n_orders AS DOUBLE))
             |    / (CAST(sa.supp AS DOUBLE) * CAST(sb.supp AS DOUBLE)) AS lift
             |FROM rules r
             |JOIN isup sa ON r.a = sa.p
             |JOIN isup sb ON r.b = sb.p, n
             |ORDER BY lift DESC, a, b LIMIT 20""".stripMargin)),

    // Sequential conversion funnel over the event stream: each step is
    // the user's EARLIEST qualifying event strictly after the previous
    // step and within a 2-day conversion window — the stepwise
    // min-aggregation formulation (one equi-join + grouped min per
    // step, no per-user event sorting, no window over the raw stream),
    // so each funnel stage shuffles only the survivors of the previous
    // one. Step-over-step conversion is a lag window over the 4-row
    // summary.
    "q101_funnel" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"))
        def step(prev: org.apache.spark.sql.DataFrame, prevT: String,
                 et: String, t: String) =
          e.filter(col("event_type") === et).as("e")
            .join(prev.as("p"), col("e.user_id") === col("p.user_id") &&
              col("e.ts") > col(s"p.$prevT") &&
              col("e.ts") <= col(s"p.$prevT") + expr("interval 2 days"))
            .groupBy(col("e.user_id").as("user_id"))
            .agg(min(col("e.ts")).as(t))
        val s1 = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts")).as("t1"))
        val s2 = step(s1, "t1", "view", "t2")
        val s3 = step(s2, "t2", "click", "t3")
        val s4 = step(s3, "t3", "purchase", "t4")
        def cnt(df: org.apache.spark.sql.DataFrame, label: String) =
          df.agg(count(lit(1)).as("n_users"))
            .select(lit(label).as("step"), col("n_users"))
        cnt(s1, "step1_signup")
          .union(cnt(s2, "step2_view"))
          .union(cnt(s3, "step3_click"))
          .union(cnt(s4, "step4_purchase"))
          .withColumn("conv_rate", col("n_users").cast("double") /
            lag(col("n_users"), 1).over(Window.orderBy("step"))
              .cast("double"))
          .orderBy("step")
      },
      Some("""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
             |  WHERE event_type = 'signup' GROUP BY 1),
             |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
             |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
             |    AND e.ts <= s1.t1 + INTERVAL 2 DAYS
             |  WHERE e.event_type = 'view' GROUP BY 1),
             |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
             |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
             |    AND e.ts <= s2.t2 + INTERVAL 2 DAYS
             |  WHERE e.event_type = 'click' GROUP BY 1),
             |s4 AS (SELECT e.user_id, min(e.ts) AS t4 FROM events e
             |  JOIN s3 ON e.user_id = s3.user_id AND e.ts > s3.t3
             |    AND e.ts <= s3.t3 + INTERVAL 2 DAYS
             |  WHERE e.event_type = 'purchase' GROUP BY 1),
             |c AS (SELECT 'step1_signup' AS step, count(*) AS n_users FROM s1
             |  UNION ALL SELECT 'step2_view', count(*) FROM s2
             |  UNION ALL SELECT 'step3_click', count(*) FROM s3
             |  UNION ALL SELECT 'step4_purchase', count(*) FROM s4)
             |SELECT step, n_users,
             |  CAST(n_users AS DOUBLE)
             |    / CAST(lag(n_users) OVER (ORDER BY step) AS DOUBLE)
             |    AS conv_rate
             |FROM c ORDER BY step""".stripMargin)),

    // Robust outlier detection via median absolute deviation — the
    // rank-exact cousin of q116's z-score anomalies (MAD survives the
    // heavy tails that wreck mean/stddev gates). Lower-median by
    // row_number rank ((n+1) div 2 — no two-element averaging, so every
    // reported value is an ACTUAL datum), deviations are single IEEE
    // subtractions, the 3·MAD gate one multiply — all bit-identical
    // across engines, no transcendentals. Two rank passes = two
    // per-group window shuffles; groups are few and the 100 TB path for
    // a hot group is the q157 quantile sketch — this exact form is its
    // verification-grade spec, same division of labor as q23/q27.
    "q168_mad_outliers" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("value"), col("event_id"))
        def lowerMedian(df: org.apache.spark.sql.DataFrame, valueCol: String,
            outCol: String) = {
          val w = Window.partitionBy("event_type")
            .orderBy(col(valueCol), col("event_id"))
          df.withColumn("rn", row_number().over(w))
            .withColumn("n", count(lit(1)).over(
              Window.partitionBy("event_type")))
            .filter(col("rn") === expr("(n + 1) div 2"))
            .select(col("event_type"), col(valueCol).as(outCol))
        }
        val med = lowerMedian(ev, "value", "med")
        val dev = ev.join(broadcast(med), "event_type")
          .withColumn("dev", abs(col("value") - col("med")))
        val mad = lowerMedian(
          dev.select(col("event_type"), col("dev"), col("event_id")),
          "dev", "mad")
        dev.join(broadcast(mad), "event_type")
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            max(col("med")).as("med"),
            max(col("mad")).as("mad"),
            sum(when(col("dev") > lit(3d) * col("mad"), 1L).otherwise(0L))
              .as("n_outliers"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type, value, event_id FROM events),
             |r1 AS (SELECT *,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY value, event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n FROM e),
             |med AS (SELECT event_type, value AS med
             |  FROM r1 WHERE rn = (n + 1) // 2),
             |dv AS (SELECT e.event_type, e.value, e.event_id, m.med,
             |    abs(e.value - m.med) AS dev
             |  FROM e JOIN med m USING (event_type)),
             |r2 AS (SELECT *,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY dev, event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS n FROM dv),
             |mad AS (SELECT event_type, dev AS mad
             |  FROM r2 WHERE rn = (n + 1) // 2)
             |SELECT dv.event_type, CAST(count(*) AS BIGINT) AS n,
             |  max(dv.med) AS med, max(mad.mad) AS mad,
             |  CAST(sum(CASE WHEN dv.dev > 3 * mad.mad THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_outliers
             |FROM dv JOIN mad USING (event_type)
             |GROUP BY dv.event_type ORDER BY dv.event_type""".stripMargin)),

    // HITS hubs & authorities over the DIRECTED customer→supplier trade
    // graph (operators/Hits.scala) — the role-splitting companion to
    // q93's PageRank: hubs are broad buyers, authorities widely-bought
    // suppliers, two scores PageRank's single rank conflates. Two full
    // update rounds, integer-quantized with max-normalization (no L2,
    // no sqrt), every half-round one join + one agg + a 1-row scalar
    // broadcast — the oracle unrolls the identical rounds as CTEs, so
    // the training loop itself is replayed, not just the final ranking.
    "q170_hits" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val edges = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("u"), col("l_suppkey").as("v"))
          .distinct()
        val scored = graft.operators.Hits.run(edges, iters = 2)
        scored
          .withColumn("rnk", row_number().over(
            Window.partitionBy("side")
              .orderBy(col("score_fp").desc, col("node"))).cast("long"))
          .filter(col("rnk") <= 10)
          .select("side", "rnk", "node", "score_fp")
          .orderBy("side", "rnk")
      },
      Some("""WITH e AS (SELECT DISTINCT o_custkey AS u, l_suppkey AS v
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |h0 AS (SELECT DISTINCT u, 1000000 AS h FROM e),
             |a1r AS (SELECT v, CAST(sum(h0.h) AS BIGINT) AS ar
             |        FROM e JOIN h0 USING (u) GROUP BY v),
             |a1 AS (SELECT v, CAST((ar * 1000000)
             |         // (SELECT max(ar) FROM a1r) AS BIGINT) AS a
             |       FROM a1r),
             |h1r AS (SELECT u, CAST(sum(a1.a) AS BIGINT) AS hr
             |        FROM e JOIN a1 USING (v) GROUP BY u),
             |h1 AS (SELECT u, CAST((hr * 1000000)
             |         // (SELECT max(hr) FROM h1r) AS BIGINT) AS h
             |       FROM h1r),
             |a2r AS (SELECT v, CAST(sum(h1.h) AS BIGINT) AS ar
             |        FROM e JOIN h1 USING (u) GROUP BY v),
             |a2 AS (SELECT v, CAST((ar * 1000000)
             |         // (SELECT max(ar) FROM a2r) AS BIGINT) AS a
             |       FROM a2r),
             |h2r AS (SELECT u, CAST(sum(a2.a) AS BIGINT) AS hr
             |        FROM e JOIN a2 USING (v) GROUP BY u),
             |h2 AS (SELECT u, CAST((hr * 1000000)
             |         // (SELECT max(hr) FROM h2r) AS BIGINT) AS h
             |       FROM h2r),
             |un AS (SELECT 'hub' AS side, u AS node, h AS score_fp FROM h2
             |       UNION ALL
             |       SELECT 'auth', v, a FROM a2),
             |rk AS (SELECT side, node, score_fp,
             |    row_number() OVER (PARTITION BY side
             |      ORDER BY score_fp DESC, node) AS rnk
             |  FROM un)
             |SELECT side, CAST(rnk AS BIGINT) AS rnk, node, score_fp
             |FROM rk WHERE rnk <= 10 ORDER BY side, rnk""".stripMargin)),

    // k-core decomposition (operators/KCore.scala) — the third member
    // of the link-analysis family (PageRank: global influence; HITS:
    // hub/authority roles; k-core: the dense backbone that survives
    // iterative pruning). Bipartite customer→supplier graph with the
    // supplier side offset into a disjoint id space; k=34 (above the
    // median degree) peels the low-activity customers in round 1 and
    // rounds 2-3 are proven no-ops by the oracle equality — the
    // bounded-peel contract, same family as TreePaths' bounded
    // doubling. The oracle unrolls all three rounds literally.
    "q179_kcore" -> Q(
      (s, d) => {
        val edges = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("u"),
            (col("l_suppkey") + 1000000L).as("v"))
        graft.operators.KCore.peel(edges, k = 34, rounds = 3)
          .orderBy("node")
      },
      Some("""WITH e0 AS (SELECT DISTINCT o_custkey AS u,
             |    l_suppkey + 1000000 AS v
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |d0 AS (SELECT n, count(*) AS d FROM (
             |    SELECT u AS n FROM e0 UNION ALL SELECT v FROM e0)
             |  GROUP BY n),
             |k0 AS (SELECT n FROM d0 WHERE d >= 34),
             |e1 AS (SELECT u, v FROM e0
             |  WHERE u IN (SELECT n FROM k0) AND v IN (SELECT n FROM k0)),
             |d1 AS (SELECT n, count(*) AS d FROM (
             |    SELECT u AS n FROM e1 UNION ALL SELECT v FROM e1)
             |  GROUP BY n),
             |k1 AS (SELECT n FROM d1 WHERE d >= 34),
             |e2 AS (SELECT u, v FROM e1
             |  WHERE u IN (SELECT n FROM k1) AND v IN (SELECT n FROM k1)),
             |d2 AS (SELECT n, count(*) AS d FROM (
             |    SELECT u AS n FROM e2 UNION ALL SELECT v FROM e2)
             |  GROUP BY n),
             |k2 AS (SELECT n FROM d2 WHERE d >= 34),
             |e3 AS (SELECT u, v FROM e2
             |  WHERE u IN (SELECT n FROM k2) AND v IN (SELECT n FROM k2))
             |SELECT n AS node, CAST(count(*) AS BIGINT) AS degree FROM (
             |    SELECT u AS n FROM e3 UNION ALL SELECT v FROM e3)
             |GROUP BY n ORDER BY node""".stripMargin)),

    // Personalized PageRank (operators/PageRank.personalized): teleport
    // mass pinned to a seed set (customers 0-9) over the SYMMETRIZED
    // customer↔supplier graph — the seed-relative relevance propagation
    // behind related-item surfacing and trust rank. Two damped rounds,
    // the same quantized integer arithmetic as q93, literally unrolled
    // by the oracle (r0 mass split over seeds; per-round teleport paid
    // only to seeds). Top-20 by rank with node tie-break.
    "q184_personalized_pagerank" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val base = Tables.orders(s, d)
          .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("cu"),
            (col("l_suppkey") + 1000000L).as("su"))
          .distinct()
        val edges = base.select(col("cu").as("u"), col("su").as("v"))
          .unionByName(base.select(col("su").as("u"), col("cu").as("v")))
        val seeds = base.filter(col("cu") < 10).select(col("cu").as("node"))
        graft.operators.PageRank.personalized(edges, seeds, iters = 2)
          .withColumn("rnk", row_number().over(
            Window.orderBy(col("rank_fp").desc, col("node"))).cast("long"))
          .filter(col("rnk") <= 20)
          .select("rnk", "node", "deg", "rank_fp")
          .orderBy("rnk")
      },
      Some("""WITH b AS (SELECT DISTINCT o_custkey AS cu,
             |    l_suppkey + 1000000 AS su
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |e AS (SELECT cu AS u, su AS v FROM b
             |      UNION ALL SELECT su, cu FROM b),
             |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg
             |  FROM e GROUP BY u),
             |nodes AS (SELECT DISTINCT u AS node FROM e
             |          UNION SELECT DISTINCT v FROM e),
             |sd AS (SELECT DISTINCT cu AS node FROM b WHERE cu < 10),
             |ns AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM sd),
             |r0 AS (SELECT n.node, coalesce(deg.deg, 0) AS deg,
             |    CASE WHEN sd.node IS NOT NULL THEN 1 ELSE 0 END AS is_seed,
             |    CASE WHEN sd.node IS NOT NULL
             |         THEN 1000000 // (SELECT ns FROM ns) ELSE 0 END AS r
             |  FROM nodes n LEFT JOIN deg ON deg.u = n.node
             |    LEFT JOIN sd ON sd.node = n.node),
             |c1 AS (SELECT e.v, CAST(sum(r0.r // r0.deg) AS BIGINT) AS c
             |  FROM r0 JOIN e ON e.u = r0.node WHERE r0.deg > 0 GROUP BY e.v),
             |r1 AS (SELECT r0.node, r0.deg, r0.is_seed,
             |    r0.is_seed * (3000000 // (20 * (SELECT ns FROM ns)))
             |      + (17 * coalesce(c1.c, 0)) // 20 AS r
             |  FROM r0 LEFT JOIN c1 ON c1.v = r0.node),
             |c2 AS (SELECT e.v, CAST(sum(r1.r // r1.deg) AS BIGINT) AS c
             |  FROM r1 JOIN e ON e.u = r1.node WHERE r1.deg > 0 GROUP BY e.v),
             |r2 AS (SELECT r1.node, r1.deg, r1.is_seed,
             |    r1.is_seed * (3000000 // (20 * (SELECT ns FROM ns)))
             |      + (17 * coalesce(c2.c, 0)) // 20 AS r
             |  FROM r1 LEFT JOIN c2 ON c2.v = r1.node),
             |rk AS (SELECT node, deg, CAST(r AS BIGINT) AS rank_fp,
             |    row_number() OVER (ORDER BY r DESC, node) AS rnk
             |  FROM r2)
             |SELECT CAST(rnk AS BIGINT) AS rnk, node, deg, rank_fp
             |FROM rk WHERE rnk <= 20 ORDER BY rnk""".stripMargin)),

    // Pre-flight join profiling (operators/JoinStats.profile): the
    // exact cardinality and skew profile of the events×events
    // self-join on user_id — computed WITHOUT running the join, from
    // the distinct-key-sized per-key count tables (inner equi-join
    // cardinality is exactly sum over keys of n_a*n_b). This is the
    // launch guard for 100 TB joins: the dominant `pairs` rows are the
    // keys that need salting/AQE-skew handling; the total says whether
    // the output is even writable. Products run in DECIMAL(38,0).
    "q189_join_cardinality" -> Q(
      (s, d) => {
        val ev = Tables.events(s, d)
        graft.operators.JoinStats.profile(ev, "user_id", ev, "user_id", 10)
      },
      Some("""WITH ca AS (SELECT user_id AS k, CAST(count(*) AS BIGINT)
             |    AS n_a FROM events GROUP BY 1),
             |prod AS (SELECT a.k, a.n_a, b.n_a AS n_b,
             |    a.n_a * b.n_a AS pairs
             |  FROM ca a JOIN ca b USING (k)),
             |tot AS (SELECT CAST(sum(pairs) AS BIGINT) AS total_pairs
             |  FROM prod),
             |rk AS (SELECT k, n_a, n_b, CAST(pairs AS BIGINT) AS pairs,
             |    row_number() OVER (ORDER BY pairs DESC, k) AS rnk
             |  FROM prod)
             |SELECT CAST(rnk AS BIGINT) AS rnk, k, n_a, n_b, pairs,
             |  tot.total_pairs
             |FROM rk CROSS JOIN tot WHERE rnk <= 10 ORDER BY rnk""".stripMargin)),

    // Interval union / coverage merge — the overlap half of
    // gaps-and-islands (q118 collapses runs of EQUAL values; this merges
    // OVERLAPPING spans): each event opens a deterministic integer-
    // micros interval, a running max-end window splits each user's
    // timeline into maximal covered islands, and the per-user report is
    // total covered time vs the naive duration sum (the double-counted
    // overlap made visible). Pure integer arithmetic on epoch micros —
    // the one window order key is total, so both engines agree exactly.
    "q172_interval_union" -> Q(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val iv = Tables.events(s, d).select(
          col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("st"),
          (unix_micros(col("ts")) +
            (pmod(col("event_id"), lit(300)) + 60) * 1000000L).as("en"))
        val order = Window.partitionBy("user_id")
          .orderBy(col("st"), col("en"), col("event_id"))
        val withPrev = iv.withColumn("prev_max_en",
          max("en").over(order.rowsBetween(Window.unboundedPreceding, -1)))
        val islands = withPrev
          .withColumn("new_island",
            when(col("prev_max_en").isNull ||
              col("st") > col("prev_max_en"), 1L).otherwise(0L))
          .withColumn("island", sum("new_island").over(
            order.rowsBetween(Window.unboundedPreceding, 0)))
        islands
          .groupBy("user_id", "island")
          .agg(min("st").as("i_st"), max("en").as("i_en"),
            count(lit(1)).as("n_ev"),
            sum(col("en") - col("st")).as("raw_sum"))
          .groupBy("user_id")
          .agg(
            sum("n_ev").as("n_events"),
            count(lit(1)).as("n_islands"),
            sum(col("i_en") - col("i_st")).as("covered_us"),
            sum("raw_sum").as("naive_us"))
          .orderBy("user_id")
      },
      Some("""WITH iv AS (SELECT user_id, event_id,
             |    epoch_ns(ts) // 1000 AS st,
             |    epoch_ns(ts) // 1000
             |      + (event_id % 300 + 60) * 1000000 AS en
             |  FROM events),
             |p AS (SELECT *, max(en) OVER (PARTITION BY user_id
             |      ORDER BY st, en, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS prev_max_en
             |  FROM iv),
             |m AS (SELECT *, CASE WHEN prev_max_en IS NULL
             |        OR st > prev_max_en THEN 1 ELSE 0 END AS new_island
             |  FROM p),
             |isl AS (SELECT *, sum(new_island) OVER (PARTITION BY user_id
             |      ORDER BY st, en, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS island
             |  FROM m),
             |g AS (SELECT user_id, island, min(st) AS i_st, max(en) AS i_en,
             |    count(*) AS n_ev,
             |    CAST(sum(en - st) AS BIGINT) AS raw_sum
             |  FROM isl GROUP BY user_id, island)
             |SELECT user_id, CAST(sum(n_ev) AS BIGINT) AS n_events,
             |  CAST(count(*) AS BIGINT) AS n_islands,
             |  CAST(sum(i_en - i_st) AS BIGINT) AS covered_us,
             |  CAST(sum(raw_sum) AS BIGINT) AS naive_us
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin)))
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-quality assertions over the real parquet corpus: these pin the
  * physical-plan properties the engine's 100 TB posture depends on
  * (pushdown, pruning, broadcast, map-side top-K, aggregate-not-window
  * dedup). A regression here means a silent scale cliff even while
  * results stay correct.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("filters are pushed to the parquet scan (q02)") {
    val plan = formatted(SparkEntry.queries("q02_filter")(spark, sf))
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("EqualTo(l_returnflag,R)"), plan.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("projection reaches the scan's ReadSchema (q01 reads 3 of 11 columns)") {
    val plan = formatted(SparkEntry.queries("q01_scan_project")(spark, sf))
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_shipdate"))
  }

  test("grouped top-K plans as WindowGroupLimit (map-side K pushdown, q05)") {
    val plan = formatted(SparkEntry.queries("q05_topk_per_group")(spark, sf))
    assert(plan.contains("WindowGroupLimit"))
  }

  test("dim joins broadcast (q17 flagship)") {
    val plan = formatted(SparkEntry.queries("q17_top_items")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("dedup-by-key is partial->final aggregation, not a window sort") {
    val dd = operators.Dedup.byKeyMin(
      Tables.lineitem(spark, sf), Seq("l_orderkey"), Seq("l_linenumber"))
    val plan = formatted(dd)
    // struct-buffer min_by plans as SortAggregate, but crucially in two
    // phases (map-side partial below the Exchange) and with no Window:
    // mappers reduce to one row per key before shuffling
    assert("(?s)SortAggregate.*Exchange.*SortAggregate".r.findFirstIn(plan).isDefined
      || "(?s)HashAggregate.*Exchange.*HashAggregate".r.findFirstIn(plan).isDefined)
    assert(!plan.contains("Window"))
  }

  test("bucketed tables join without a shuffle") {
    import operators.Bucketing
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    // drop any leftovers from a previous run (the in-memory catalog forgets
    // tables between JVMs but their warehouse directories survive)
    Seq("graft_li_bucketed", "graft_ord_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(li, "graft_li_bucketed", Seq("l_orderkey"), 4)
    Bucketing.writeBucketed(ord, "graft_ord_bucketed", Seq("l_orderkey"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark,
        "graft_li_bucketed", "graft_ord_bucketed", Seq("l_orderkey"))
      val plan = formatted(joined)
      assert(plan.contains("SortMergeJoin"))
      // bucket layout satisfies the join's required distribution: no
      // Exchange (shuffle) anywhere in the plan
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("star join broadcasts the dim chain (q72)") {
    val plan = formatted(SparkEntry.queries("q72_star_join")(spark, sf))
    // customer/nation/region must all broadcast; the only join allowed to
    // shuffle is lineitem |x| orders (facts meeting facts)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan)
    assert("SortMergeJoin".r.findAllIn(plan).size <= 1, plan)
  }

  test("every registered query passes PlanAudit.assertScaleSafe (full-corpus audit)") {
    // the queries that INTENTIONALLY broadcast a tiny side against the
    // corpus (exact baselines / dim-table compare patterns) — everything
    // else planning a nested loop is a silent quadratic scale cliff.
    // Exempted queries still get audited: cartesian products are never
    // acceptable, and the audit's scan/codegen counters must not throw.
    val broadcastByDesign = Set(
      "q24_knn_brute",          // broadcast query set vs corpus (exact baseline)
      "q30_embed_neardup_exact", // documented O(n^2) exactness baseline
      "q41_knn_ivf", "q52_knn_ivfpq", // corpus x broadcast centroid dim
      "q49_knn_pq",             // coded corpus x broadcast query tables
      "q89_skew_profile",       // 1-row broadcast scalar (corpus total)
      "q93_pagerank",           // 1-row broadcast scalar (node count N)
      "q100_assoc_rules",       // 1-row broadcast scalar (basket count)
      "q155_distinct_sketch",   // 1-row broadcast scalar (exact distinct)
      "q157_quantile_sketch",   // 3-row percentile spec x bounded bucket walk
      "q162_pmi_collocations",  // 1-row broadcast scalar (total bigrams N)
      "q169_group_quantiles",   // 3-row percentile spec x per-group counts
      "q170_hits",              // 1-row normalization scalar per half-round
      "q173_bm25_retrieval",    // 1-row corpus stats broadcast
      "q176_rrf_fusion",        // q24's broadcast query-vector set (dense leg)
      "q181_bm25_incremental",  // q173's 1-row stats broadcast, via the index
      "q189_join_cardinality",  // 1-row total_pairs broadcast scalar
      "q190_proximity_rerank",  // q173's 1-row stats broadcast (x3 plan reuse)
      "q191_tfidf_cosine_pairs", // 1-row n_docs broadcast scalar (x4 plan reuse)
      "q192_stream_bm25_ingest", // q181's 1-row stats broadcast via the index
      "q195_proximity_multiterm", // q190's 1-row stats broadcast (x4 plan reuse)
      "q199_mixture_rebalance",  // 1-row min-source-count broadcast scalar
      "q223_bm25_index_compaction", // q181's 1-row stats broadcast, post-compact
      "q226_bm25_tombstone_delete", // q181's 1-row stats broadcast + delete
      "q228_stream_takedown",    // same, via the streamed fold
      "q232_nb_classifier",      // tokens x broadcast CLASS LIST (|classes|~5)
      "q255_trained_langid",     // trigrams x broadcast CLASS LIST (4 classes)
      "q264_charset_langid",     // q255's class-list broadcast, charset-staged
      "q233_quality_classifier", // same, 2-class quality margin
      "q234_stream_windowed_quantiles", // 3-row percentile spec (q157's class)
      "q237_stream_classifier_admission") // q233's class-list broadcast at ingest
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      if (broadcastByDesign(name)) {
        val report = tools.PlanAudit.audit(df)
        assert(report.cartesianProducts == 0, s"$name plans a CartesianProduct")
        assert(report.totalNodes > 0, s"$name audit walked an empty plan")
      } else {
        val report =
          try tools.PlanAudit.assertScaleSafe(df)
          catch { case e: IllegalArgumentException =>
            fail(s"$name fails the scale audit: ${e.getMessage.linesIterator.take(3).mkString(" | ")}")
          }
        // a registered query must also keep SOME of its plan inside
        // whole-stage codegen — a 0-coverage plan is all volcano iterators
        assert(report.totalNodes > 0, s"$name audit walked an empty plan")
      }
    }
  }

  test("every registered query's FINAL projection is scalar-only (output contract)") {
    // Result harnesses (pandas sort + CSV hash) can't handle nested cells:
    // an ArrayType/MapType/StructType column in the final schema crashes
    // the external checker even when the values are correct. Nested types
    // are fine INTERNALLY — queries must stringify them at the boundary
    // (array_join / to_json). This walks all registered query schemas so
    // a nested output fails here, locally, not a round later.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val schema = SparkEntry.queries(name)(spark, sf).schema
      schema.fields.foreach { f =>
        val nested = f.dataType match {
          case _: ArrayType | _: MapType | _: StructType => true
          case _ => false
        }
        assert(!nested,
          s"$name output column '${f.name}' is ${f.dataType.simpleString}; " +
            "final projections must be scalar-only (stringify at the boundary)")
      }
    }
  }

  test("the full join-strategy menu is reachable: SHJ and SMJ by hint, BHJ by size") {
    // joins.pdf pp.1-2 analyzes Spark's strategy menu; this pins that the
    // planner can be steered to each shuffle strategy when a 100 TB join
    // needs it (SHJ: no sort, build-side memory; SMJ: spillable sorts)
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderstatus")
    def planOf(j: DataFrame): String = j.queryExecution.executedPlan.toString
    val shj = planOf(li.hint("shuffle_hash")
      .join(o, li("l_orderkey") === o("o_orderkey")))
    assert(shj.contains("ShuffledHashJoin"), shj)
    val smj = planOf(li.hint("merge")
      .join(o, li("l_orderkey") === o("o_orderkey")))
    assert(smj.contains("SortMergeJoin"), smj)
    val bhj = planOf(li.join(broadcast(o), li("l_orderkey") === o("o_orderkey")))
    assert(bhj.contains("BroadcastHashJoin"), bhj)
  }

  test("dynamic partition pruning fires on a partitioned fact x filtered dim join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    sources.PartitionedSink.writePartitioned(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_returnflag", "l_quantity"),
      s"$dir/fact", partitionCols = Seq("l_returnflag"))
    val fact = spark.read.parquet(s"$dir/fact")
    // the dim must be a real scan: a VALUES LocalRelation gets its filter
    // constant-folded away (ConvertToLocalRelation) before the
    // PartitionPruning rule looks for a selective predicate
    Seq(("R", "returned"), ("A", "accepted"), ("N", "normal"))
      .toDF("flag", "label").write.parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")
    val joined = fact
      .join(dim.filter(col("label") === "returned"),
        fact("l_returnflag") === dim("flag"))
    // the broadcast dim's filter must reach the FACT SCAN as a runtime
    // partition filter — at 100 TB this is the difference between
    // scanning one partition directory and all of them
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected dynamic partition pruning in:\n$plan")
    assert(joined.count() ==
      Tables.lineitem(spark, sf).filter(col("l_returnflag") === "R").count())
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // the runtime half of the skew story (SaltedJoin/SkewedAgg are the
    // manual half): one hot key dominates the left side, and with
    // realistic-ratio thresholds scaled down to fixture size, AQE must
    // mark and split the skewed partition in the final adaptive plan —
    // at 100 TB this is what keeps one executor from absorbing a hot
    // key's entire shuffle partition while 999 idle
    import spark.implicits._
    val keep = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "50KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val hot = spark.range(200000).select(lit(1L).as("k"), col("id").as("v"))
      val cold = spark.range(31).select((col("id") + 2).as("k"), col("id").as("v"))
      val left = hot.union(cold)
      val right = spark.range(40).select(col("id").as("k"), col("id").as("w"))
      val joined = left.join(right, "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the hot partition skewed in:\n$plan")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("whole-stage codegen covers the scan->aggregate path (q04)") {
    // AQE's pre-execution explain hides codegen stages, and df.write spawns
    // a separate queryExecution — collect() drives THIS one to its final
    // adaptive plan
    val df = SparkEntry.queries("q04_group_count")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"))
    // codegen spans render as "*(n) Operator" in the final adaptive plan
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"))
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("HashAggregate")))
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(
      left: Seq[(Long, Long, String)],
      right: Seq[(Long, Long, Double)]): Map[String, Option[Double]] =
    AsOfJoin.lastAtOrBefore(
        left.toDF("k", "lts", "tag"),
        right.toDF("rk", "rts", "v"),
        "k", "rk", "lts", "rts")
      .select(col("tag"), col("asof_v"))
      .as[(String, Option[Double])].collect().toMap

  test("picks the greatest right ts at or before each left ts, per key") {
    val out = run(
      left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 10L, "c")),
      right = Seq((1L, 5L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0), (2L, 10L, 9.0)))
    // a: only ts=5 is <= 10; b: ts=20; c: equal ts matches ("at or before")
    assert(out == Map("a" -> Some(1.0), "b" -> Some(2.0), "c" -> Some(9.0)))
  }

  test("no prior right row yields null payload (left outer)") {
    val out = run(
      left = Seq((1L, 3L, "early"), (3L, 10L, "nokey")),
      right = Seq((1L, 5L, 1.0)))
    assert(out == Map("early" -> None, "nokey" -> None))
  }

  test("duplicate right timestamps resolve to the greatest payload, deterministically") {
    val out = run(
      left = Seq((1L, 10L, "a")),
      right = Seq((1L, 10L, 2.0), (1L, 10L, 7.0), (1L, 10L, 4.0)))
    assert(out == Map("a" -> Some(7.0)))
  }

  test("native merge exec equals the window formulation (incl. null keys/ts)") {
    val rnd = new scala.util.Random(11)
    val left = Seq.tabulate(300) { i =>
      (if (i % 17 == 0) null else java.lang.Long.valueOf(rnd.nextInt(8).toLong),
        if (i % 23 == 0) null else java.lang.Long.valueOf(rnd.nextInt(50).toLong),
        s"l$i")
    }.toDF("k", "lts", "tag")
    // unique (k, rts) pairs so both formulations' tie rules can't differ
    val right = rnd.shuffle(
      (for (k <- 0L to 6L; t <- 0L until 50L by 3L) yield (k, t)).toList)
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toDouble) }
      .toDF("rk", "rts", "v")
    val win = AsOfJoin.lastAtOrBefore(left, right, "k", "rk", "lts", "rts")
      .select("tag", "asof_rts", "asof_v")
      .as[(String, Option[Long], Option[Double])].collect().toSet
    val mrg = AsOfJoin.lastAtOrBeforeMerge(left, right, "k", "rk", "lts", "rts")
      .select("tag", "asof_rts", "asof_v")
      .as[(String, Option[Long], Option[Double])].collect().toSet
    assert(mrg.nonEmpty && mrg == win)
  }

  test("native merge exec plans as AsOfJoinExec, not a window") {
    val df = AsOfJoin.lastAtOrBeforeMerge(
      Seq((1L, 10L, "a")).toDF("k", "lts", "tag"),
      Seq((1L, 5L, 1.0)).toDF("rk", "rts", "v"),
      "k", "rk", "lts", "rts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("small right side plans as BroadcastAsOfJoin with no shuffle at all") {
    val df = AsOfJoin.lastAtOrBeforeMerge(
      Seq((1L, 10L, "a"), (2L, 4L, "b")).toDF("k", "lts", "tag"),
      Seq((1L, 5L, 1.0), (2L, 9L, 2.0)).toDF("rk", "rts", "v"),
      "k", "rk", "lts", "rts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"), plan)
    assert(plan.contains("BroadcastExchange"), plan)
    // the left side keeps its partitioning: nothing shuffles or sorts
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Sort "), plan)
    assert(df.select("tag", "asof_v").as[(String, Option[Double])].collect().toMap ==
      Map("a" -> Some(1.0), "b" -> None))
  }

  test("broadcast and sort-merge paths agree with the window formulation (randomized)") {
    val rnd = new scala.util.Random(29)
    val left = Seq.tabulate(200) { i =>
      (if (i % 13 == 0) null else java.lang.Long.valueOf(rnd.nextInt(6).toLong),
        if (i % 19 == 0) null else java.lang.Long.valueOf(rnd.nextInt(40).toLong),
        s"l$i")
    }.toDF("k", "lts", "tag")
    val right = rnd.shuffle(
      (for (k <- 0L to 4L; t <- 0L until 40L by 3L) yield (k, t)).toList)
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toDouble) }
      .toDF("rk", "rts", "v")
    def collectMerge() = AsOfJoin.lastAtOrBeforeMerge(left, right, "k", "rk", "lts", "rts")
      .select("tag", "asof_rts", "asof_v")
      .as[(String, Option[Long], Option[Double])].collect().toSet
    val win = AsOfJoin.lastAtOrBefore(left, right, "k", "rk", "lts", "rts")
      .select("tag", "asof_rts", "asof_v")
      .as[(String, Option[Long], Option[Double])].collect().toSet
    // default threshold: tiny right broadcasts
    val viaBroadcast = collectMerge()
    // threshold off: the strategy falls back to the sort-merge exec
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val viaSortMerge = try collectMerge()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(viaBroadcast.nonEmpty)
    assert(viaBroadcast == win)
    assert(viaSortMerge == win)
  }

  test("optimizer rule prunes unused columns through the custom node") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val left = li.select(col("l_orderkey").as("k"), col("l_linenumber").as("lts"))
    val right = li.toDF(li.columns.map("r_" + _): _*) // full 11-column width
    val df = AsOfJoin.lastAtOrBeforeMerge(left, right,
        "k", "r_l_orderkey", "lts", "r_l_linenumber")
      .select("k", "lts", "asof_r_l_quantity")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    // without AsOfJoinPruningRule the custom node is a pruning barrier and
    // the right scan reads all 11 columns
    assert(readSchemas.nonEmpty && !readSchemas.exists(_.contains("l_comment")),
      readSchemas.mkString("\n"))
    assert(readSchemas.exists(_.contains("l_quantity")), readSchemas.mkString("\n"))
    assert(df.count() > 0)
  }

  test("plans as a single window over the union - no join operator") {
    val df = AsOfJoin.lastAtOrBefore(
      Seq((1L, 10L, "a")).toDF("k", "lts", "tag"),
      Seq((1L, 5L, 1.0)).toDF("rk", "rts", "v"),
      "k", "rk", "lts", "rts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.toLowerCase.contains("join"),
      s"as-of join must not plan an actual join:\n$plan")
  }
}

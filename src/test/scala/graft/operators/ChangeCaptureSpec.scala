package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ChangeCaptureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("diff classifies insert/delete/update and drops unchanged") {
    val oldS = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val newS = Seq((2L, 20.0), (3L, 33.0), (4L, 40.0)).toDF("k", "v")
    val out = ChangeCapture.diff(oldS, newS, Seq("k"), Seq("v"))
      .orderBy("k")
      .select("k", "change").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "delete"), (3L, "update"), (4L, "insert")))
  }

  test("diff compares null-safely: null→value and value→null are updates; null→null is unchanged") {
    val oldS = Seq((1L, Some(1.0)), (2L, None), (3L, None))
      .toDF("k", "v")
    val newS = Seq((1L, None), (2L, Some(2.0)), (3L, None))
      .toDF("k", "v")
    val out = ChangeCapture.diff(oldS, newS, Seq("k"), Seq("v"))
      .select("k", "change").as[(Long, String)].collect().toSeq.sorted
    assert(out == Seq((1L, "update"), (2L, "update")))
  }

  test("diff works on self-derived snapshots (shared lineage)") {
    val base = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "v")
    val oldS = base.filter(col("k") =!= 3)
    val newS = base.filter(col("k") =!= 1)
      .withColumn("v", when(col("k") === 2, col("v") + 1).otherwise(col("v")))
    val out = ChangeCapture.diff(oldS, newS, Seq("k"), Seq("v"))
      .select("k", "change").as[(Long, String)].collect().toSeq.sorted
    assert(out == Seq((1L, "delete"), (2L, "update"), (3L, "insert")))
  }

  test("merge: matched U updates, matched D deletes, unmatched I/U insert, unmatched D no-op") {
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "a2", "U"),  // matched update
      (2L, "-", "D"),   // matched delete
      (4L, "d", "I"),   // insert
      (5L, "e", "U"),   // upsert (unmatched U inserts)
      (9L, "-", "D")    // delete of missing key: no-op
    ).toDF("k", "v", "op")
    val out = ChangeCapture.merge(target, changes, Seq("k"), "op")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a2"), (3L, "c"), (4L, "d"), (5L, "e")))
  }

  test("merge: re-delivered insert on an existing key is an idempotent no-op") {
    val target = Seq((1L, "orig")).toDF("k", "v")
    val changes = Seq((1L, "clobber", "I")).toDF("k", "v", "op")
    val out = ChangeCapture.merge(target, changes, Seq("k"), "op")
      .as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "orig")))
  }

  test("merge on a changeset derived from the target (self-lineage)") {
    val target = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val changes = target.filter(col("k") === 2)
      .withColumn("v", col("v") + 5).withColumn("op", lit("U"))
    val out = ChangeCapture.merge(target, changes, Seq("k"), "op")
      .orderBy("k").as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 10.0), (2L, 25.0), (3L, 30.0)))
  }

  test("diff → merge round-trip reconstructs the new snapshot") {
    val oldS = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (6L, 60.0)).toDF("k", "v")
    val newS = Seq((2L, 22.0), (3L, 30.0), (4L, 40.0)).toDF("k", "v")
    val d = ChangeCapture.diff(oldS, newS, Seq("k"), Seq("v"))
    val changes = d.select(col("k"), col("new_v").as("v"),
      when(col("change") === "insert", "I")
        .when(col("change") === "delete", "D").otherwise("U").as("op"))
    val rebuilt = ChangeCapture.merge(oldS, changes, Seq("k"), "op")
      .orderBy("k").as[(Long, Double)].collect().toSeq
    assert(rebuilt == Seq((2L, 22.0), (3L, 30.0), (4L, 40.0)))
  }

  test("merge over a bucketed target and changeset plans with NO exchange (co-located CDC apply)") {
    // The 100 TB shape: a maintained target bucketed by its key absorbs
    // changesets bucketed the same way without shuffling either side —
    // merge's internal rename must not break alias-aware partitioning
    // propagation.
    Seq("graft_cc_target", "graft_cc_changes").foreach { t =>
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
    val target = (1L to 1000L).map(i => (i, i * 10)).toDF("k", "v")
    val changes = (1L to 1000L by 3)
      .map(i => (i, i, if (i % 2 == 1) "U" else "D")).toDF("k", "v", "op")
    Bucketing.writeBucketed(target, "graft_cc_target", Seq("k"), 4)
    Bucketing.writeBucketed(changes, "graft_cc_changes", Seq("k"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val merged = ChangeCapture.merge(
        spark.table("graft_cc_target"), spark.table("graft_cc_changes"),
        Seq("k"), "op")
      val plan = merged.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed merge must not shuffle either side:\n$plan")
      assert(merged.count() ==
        1000 - changes.filter(col("op") === "D").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

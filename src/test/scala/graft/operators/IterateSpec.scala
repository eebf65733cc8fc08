package graft.operators

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.TestSpark

/** The materialization policy seam ([[Iterate]]): reliable checkpoints
  * must produce byte-identical results to localCheckpoint, must survive
  * executor-block loss where localCheckpoint cannot, and the mode must be
  * selected by config exactly as documented.
  *
  * Test ordering note: the fail-fast test runs BEFORE any
  * `setCheckpointDir` call — a SparkContext checkpoint dir cannot be
  * unset once set (tests within a suite run sequentially).
  */
class IterateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def sc = spark.sparkContext

  private def localSession(): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.graft.checkpoint.reliable", "false")
    s
  }
  private def reliableSession(): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.graft.checkpoint.reliable", "true")
    s
  }

  /** Run `f`, returning its result plus the persistent RDDs it newly
    * registered (diff-based so concurrent suites' blocks are untouched).
    */
  private def withNewPersistentRdds[A](f: => A): (A, Seq[org.apache.spark.rdd.RDD[_]]) = {
    val before = sc.getPersistentRDDs.keySet
    val r = f
    val fresh = (sc.getPersistentRDDs -- before).values.toSeq
    (r, fresh)
  }

  test("reliable=true without a checkpoint dir fails fast with the remedy") {
    assume(sc.getCheckpointDir.isEmpty, "another run already set a dir")
    val s = reliableSession()
    import s.implicits._
    val ex = intercept[IllegalStateException] {
      Iterate.materialize(Seq(1, 2, 3).toDF("v"))
    }
    assert(ex.getMessage.contains("setCheckpointDir"))
  }

  test("mode selection: explicit conf wins; default follows the checkpoint dir") {
    import spark.implicits._
    val df = Seq(1).toDF("v")
    // base session is pinned false in TestSpark
    assert(!Iterate.reliable(df))
    val defaulted = spark.newSession()
    val ddf = { import defaulted.implicits._; Seq(1).toDF("v") }
    assert(!Iterate.reliable(ddf), "no conf, no dir -> local")
    sc.setCheckpointDir(Files.createTempDirectory("graft-iterate-ckpt").toString)
    assert(Iterate.reliable(ddf), "no conf, dir set -> reliable (cluster default)")
    assert(!Iterate.reliable(df), "explicit false overrides the dir")
    val rdf = { val s = reliableSession(); import s.implicits._; Seq(1).toDF("v") }
    assert(Iterate.reliable(rdf))
  }

  test("both modes produce identical iterative results (PageRank, CC, LabelPropagation)") {
    if (sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(Files.createTempDirectory("graft-iterate-ckpt").toString)
    def runAll(s: SparkSession): Seq[Set[String]] = {
      import s.implicits._
      val edges = Seq(
        (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 3L),
        (10L, 11L), (11L, 10L), (12L, 10L)
      ).toDF("u", "v")
      Seq(
        PageRank.run(edges, iters = 8),
        ConnectedComponents.run(edges, srcCol = "u", dstCol = "v"),
        LabelPropagation.run(edges, iters = 5)
      ).map(_.collect().map(_.toString).toSet)
    }
    val local = runAll(localSession())
    val reliable = runAll(reliableSession())
    assert(local == reliable)
  }

  test("reliable mode survives loss of every executor-local block") {
    val s = reliableSession()
    import s.implicits._
    val src = s.range(0, 1000).toDF("v")
    val (mat, fresh) = withNewPersistentRdds(Iterate.materialize(src))
    fresh.foreach(_.unpersist(blocking = true))
    // blocks gone; the reliable files back the read
    assert(mat.count() === 1000L)
  }

  test("local mode cannot recompute after block loss (the 100TB job-killer)") {
    val s = localSession()
    import s.implicits._
    val src = s.range(0, 1000).toDF("v")
    val (mat, fresh) = withNewPersistentRdds(Iterate.materialize(src))
    assert(mat.count() === 1000L, "blocks present: reads fine")
    fresh.foreach(_.unpersist(blocking = true))
    val ex = intercept[Exception](mat.count())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(t =>
      Option(t.getMessage).exists(_.toLowerCase.contains("checkpoint"))),
      s"expected a lost-checkpoint-block failure, got: $ex")
  }
}

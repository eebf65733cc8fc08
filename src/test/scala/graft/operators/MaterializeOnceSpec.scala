package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Round-12 optimization pins: iterative operators must evaluate their
  * input plan EXACTLY ONCE.
  *
  * Before the fix, ConnectedComponents.run consumed its input through
  * three subtrees (both vertex-universe union legs + the canonical edge
  * list) across separate actions, and PageRank filled its lazy edge
  * cache through three concurrent subtrees of one job (a cache-fill
  * race) — for near-dup callers that re-ran the whole candidates+verify
  * pipeline 2-3x (q93: 198s summed task time for 24MB of input).
  *
  * The pin counts input-plan evaluations with an accumulator bumped by
  * a non-deterministic UDF (non-determinism stops the optimizer from
  * collapsing or duplicating the call): after the operator's action(s),
  * the count must equal the input row count — one evaluation — not 2-3x
  * it. Local mode runs no task retries, so the count is exact.
  */
class MaterializeOnceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def countedInput(rows: Seq[(Long, Long)], cols: (String, String)) = {
    val acc = spark.sparkContext.longAccumulator("evals")
    val bump = udf { (u: Long) => acc.add(1L); u }.asNondeterministic()
    val df = rows.toDF(cols._1, cols._2)
      .withColumn(cols._1, bump(col(cols._1)))
    (df, acc)
  }

  test("ConnectedComponents.run evaluates its input pair plan exactly once") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L), (21L, 22L))
    val (df, acc) = countedInput(pairs, ("id_a", "id_b"))
    val out = ConnectedComponents.run(df).collect()
    assert(out.nonEmpty)
    assert(acc.value == pairs.size.toLong,
      s"input evaluated ${acc.value}x for ${pairs.size} rows — the " +
        "multi-consumer input must be materialized once")
  }

  test("PageRank.run evaluates its edge plan exactly once") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (5L, 5L))
    val (df, acc) = countedInput(edges, ("u", "v"))
    val out = PageRank.run(df, iters = 2).collect()
    assert(out.nonEmpty)
    assert(acc.value == edges.size.toLong,
      s"edge plan evaluated ${acc.value}x for ${edges.size} rows — the " +
        "lazy-cache fill race is back (see PageRank.run scaladoc)")
  }

  test("PageRank.personalized evaluates its edge plan exactly once") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L))
    val (df, acc) = countedInput(edges, ("u", "v"))
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val out = PageRank.personalized(df, seeds, iters = 2).collect()
    assert(out.nonEmpty)
    assert(acc.value == edges.size.toLong,
      s"edge plan evaluated ${acc.value}x for ${edges.size} rows")
  }
}

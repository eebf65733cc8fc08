package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val indexDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    IvfIndex.build(emb, dir, k = 8, iters = 1)
    dir
  }
  private lazy val queries = emb.filter(col("vec_id") < 5)

  test("index layout: one hive partition per cell plus the _model sidecar") {
    val root = new java.io.File(indexDir)
    val cellDirs = root.listFiles.filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty && cellDirs.length <= 8)
    assert(new java.io.File(s"$indexDir/_model").exists)
    assert(IvfIndex.loadCentroids(spark, indexDir).size == 8)
    // the sidecar must be invisible to the index read
    assert(spark.read.parquet(indexDir).columns.sorted.toSeq ==
      Seq("cell", "embedding", "vec_id"))
  }

  test("nprobe=all cells reproduces the exact brute-force top-k") {
    val ivf = IvfIndex.search(spark, indexDir, queries, k = 5, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = EmbeddingKnn.bruteForce(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivf == exact)
  }

  test("probe join triggers dynamic partition pruning on the cell directories") {
    val plan = IvfIndex.search(spark, indexDir, queries, k = 3, nprobe = 1)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no DPP on the cell partition column:\n$plan")
  }

  test("append assigns against the stored codebook: search == one-shot build") {
    val oldEmb = emb.filter(col("vec_id") < 400)
    val newEmb = emb.filter(col("vec_id") >= 400)
    // incremental: codebook trained on the OLD corpus only, batch appended
    val incDir = java.nio.file.Files.createTempDirectory("graft-ivf-inc").toString
    IvfIndex.build(oldEmb, incDir, k = 8, iters = 1)
    IvfIndex.append(newEmb, incDir)
    // reference: the same codebook assigning the union in one shot —
    // rebuilt by hand (build() would retrain on the union)
    val cents = IvfIndex.loadCentroids(spark, incDir)
    val refDir = java.nio.file.Files.createTempDirectory("graft-ivf-ref").toString
    val assigned = emb.select(col("vec_id"), col("embedding"),
      Clustering.nearest(Clustering.quantize(col("embedding")), cents)
        .getField("c").cast("int").as("cell"))
    graft.sources.PartitionedSink.writePartitioned(assigned, refDir, Seq("cell"))
    spark.read.parquet(s"$incDir/_model").write.mode("overwrite")
      .parquet(s"$refDir/_model")
    def res(dir: String) = IvfIndex.search(spark, dir, queries, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(res(incDir) == res(refDir))
    // appended rows really landed in the cell layout
    assert(spark.read.parquet(incDir).count() == emb.count())
  }

  test("nprobe=1 is deterministic and returns at most k rows per query") {
    val a = IvfIndex.search(spark, indexDir, queries, k = 3, nprobe = 1)
      .collect().map(_.toSeq).toSeq
    val b = IvfIndex.search(spark, indexDir, queries, k = 3, nprobe = 1)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    val perQuery = a.groupBy(_.head).map(_._2.size)
    assert(perQuery.forall(_ <= 3) && perQuery.nonEmpty)
  }
  test("forget: tombstoned vectors vanish from search; compact materializes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-del").toString
    IvfIndex.build(emb, dir, k = 8, iters = 1)
    val before = IvfIndex.search(spark, dir, queries, k = 5, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // forget every current neighbor of query 0 -> none may reappear,
    // and the result must equal brute force over the survivors
    val gone = before.collect { case (0L, n) => n }.toSet
    val spark2 = spark
    import spark2.implicits._
    IvfIndex.forget(dir, gone.toSeq.toDF("vec_id"))
    val after = IvfIndex.search(spark, dir, queries, k = 5, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after.intersect(gone.map((0L, _))).isEmpty)
    val exact = EmbeddingKnn.bruteForce(
        emb.filter(!col("vec_id").isin(gone.toSeq: _*)), queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == exact)
    // compact: successor has no _dels, filtered cells, same results
    IvfIndex.compact(spark, dir, s"$dir-compact")
    assert(!new java.io.File(s"$dir-compact/_dels").exists)
    assert(spark.read.parquet(s"$dir-compact")
      .filter(col("vec_id").isin(gone.toSeq: _*)).isEmpty)
    assert(IvfIndex.search(spark, s"$dir-compact", queries, k = 5, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == after)
  }
}

package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.TestSpark

/** Pins the Kafka-shaped source contract of [[LogTopicSource]]: dense
  * per-partition offsets, batch/stream parity, admission control
  * splitting microbatches, and exactly-once resume from a checkpoint
  * across producer appends.
  */
class LogTopicSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-logtopic").toString

  private def rec(i: Int): LogTopic.Record = LogTopic.Record(
    ts = 1000L + i,
    key = s"k$i".getBytes("UTF-8"),
    value = s"v$i".getBytes("UTF-8"))

  test("batch read returns every produced record with dense per-partition offsets") {
    val root = s"${tmp()}/topic"
    LogTopic.create(root, 4)
    LogTopic.produce(root, (0 until 1000).map(rec))
    val df = spark.read.format("graft.sources.LogTopicSource")
      .option("path", root).load()
    assert(df.count() == 1000)
    // offsets are 0..n-1 dense within each partition
    val perPart = df.groupBy("partition")
      .agg(count(lit(1)).as("n"), min("offset").as("lo"), max("offset").as("hi"))
      .collect()
    assert(perPart.length == 4)
    perPart.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L)
      assert(r.getAs[Long]("hi") == r.getAs[Long]("n") - 1)
    }
    // key->partition assignment is consistent (no key in two partitions)
    val spread = df.select(col("key").cast("string").as("k"), col("partition"))
      .distinct().groupBy("k").count().filter(col("count") > 1).count()
    assert(spread == 0)
  }

  test("truncate-then-append makes a retried producer task idempotent") {
    val root = s"${tmp()}/topic"
    LogTopic.create(root, 2)
    def produceAttempt(): Unit = (0 to 1).foreach { p =>
      // the q152 producer-task shape: truncate at first encounter of an
      // owned partition, then append — a re-executed task rewrites
      // instead of appending a second copy
      LogTopic.truncate(root, p)
      LogTopic.append(root, p, (0 until 10).map(i => rec(p * 100 + i)))
    }
    def snapshot(): Seq[String] = spark.read
      .format("graft.sources.LogTopicSource").option("path", root).load()
      .select(col("partition"), col("offset"), col("ts"),
        col("key").cast("string"), col("value").cast("string"))
      .collect().map(_.toString).sorted.toSeq
    produceAttempt()
    val first = snapshot()
    produceAttempt() // the retry
    val second = snapshot()
    assert(second == first, "retry must not duplicate records or move offsets")
    assert(LogTopic.nextOffset(root, 0) == 10L)
    // truncate also clears torn tmp files
    val torn = new java.io.File(s"$root/p0/99999999999999999999-1.log.tmp")
    assert(torn.createNewFile())
    LogTopic.truncate(root, 0)
    assert(!torn.exists() && LogTopic.nextOffset(root, 0) == 0L)
  }

  test("maxRecordsPerTrigger splits the stream into bounded microbatches, no loss") {
    val root = s"${tmp()}/topic"
    LogTopic.create(root, 4)
    LogTopic.produce(root, (0 until 900).map(rec))
    val stream = spark.readStream.format("graft.sources.LogTopicSource")
      .option("path", root)
      .option("maxRecordsPerTrigger", "250")
      .load()
    val name = "graft_logtopic_admission"
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 4, s"expected >=4 bounded batches, got ${batches.length}")
    assert(batches.forall(_.numInputRows <= 253),
      batches.map(_.numInputRows).mkString(","))
    val got = spark.table(name)
    assert(got.count() == 900)
    assert(got.select("partition", "offset").distinct().count() == 900)
  }

  test("restart from checkpoint resumes exactly-once across appends") {
    // the memory sink can't recover from a checkpoint; the file sink is
    // the recoverable one, which is exactly the restart contract to pin
    val root = s"${tmp()}/topic"
    val ckpt = s"${tmp()}/ckpt"
    val out = s"${tmp()}/out"
    LogTopic.create(root, 2)
    LogTopic.produce(root, (0 until 300).map(rec))
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft.sources.LogTopicSource")
        .option("path", root).load()
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(out).count() == 300)
    LogTopic.produce(root, (300 until 500).map(rec))
    runOnce()
    val got = spark.read.parquet(out)
    // 300 + only the 200 NEW records — re-delivery would show as >500
    // rows (or non-distinct offsets), loss as <500
    assert(got.count() == 500)
    assert(got.select("partition", "offset").distinct().count() == 500)
    assert(got.select(col("key").cast("string")).distinct().count() == 500)
  }

  test("reader slices respect [from, until) inside multi-segment partitions") {
    val root = s"${tmp()}/topic"
    LogTopic.create(root, 1)
    // three appends = three segments of 10
    (0 until 3).foreach(b => LogTopic.append(root, 0, (b * 10 until b * 10 + 10).map(rec)))
    assert(LogTopic.nextOffset(root, 0) == 30L)
    val mid = LogTopic.read(root, 0, 5, 25).toSeq
    assert(mid.map(_._1) == (5L until 25L))
    val all = LogTopic.read(root, 0, 0, 30).toSeq
    assert(all.map(_._1) == (0L until 30L))
    assert(new String(all(17)._4, "UTF-8") == "v17")
  }
}

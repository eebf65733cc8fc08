package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-stage measurement harness for one or more declared queries
  * (guide §1: measure first, empirically, at the stage level).
  *
  * Runs each named query through the noop sink (same timed action as
  * [[graft.Bench]]) with a listener that aggregates, per stage: wall
  * clock, summed task time, task count, input bytes, shuffle
  * read/write bytes, and spill. Prints the top stages by task time and
  * the job count — the "which operator is the money going to" view the
  * Spark UI gives on a cluster, as plain stdout here (UI is disabled
  * in the sandbox).
  *
  * Usage:
  *   SPARK_GRAFT_ONLY=q93_pagerank tools/profile.sh [passes]
  * Each query runs `passes` times (default 2); per-stage numbers are
  * reported for the LAST pass (codegen/JIT warm), per-pass walls for
  * all.
  */
object ProfileQuery {

  private final case class StageAgg(
      var name: String,
      var wallMs: Long = 0,
      var taskMs: Long = 0,
      var tasks: Int = 0,
      var inputBytes: Long = 0,
      var shuffleRead: Long = 0,
      var shuffleWrite: Long = 0,
      var spill: Long = 0)

  private final class Agg extends SparkListener {
    val stages = mutable.LinkedHashMap.empty[Int, StageAgg]
    var jobs = 0
    val submitted = mutable.Map.empty[Int, Long]
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
      submitted(s.stageInfo.stageId) = System.nanoTime()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val a = stages.getOrElseUpdate(si.stageId, StageAgg(si.name))
      if (a.name.isEmpty) a.name = si.name
      a.wallMs += (for {
        t0 <- submitted.get(si.stageId)
      } yield (System.nanoTime() - t0) / 1000000).getOrElse(0L)
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val a = stages.getOrElseUpdate(t.stageId, StageAgg(""))
      val m = t.taskMetrics
      if (m != null) {
        a.tasks += 1
        a.taskMs += m.executorRunTime
        a.inputBytes += m.inputMetrics.bytesRead
        a.shuffleRead += m.shuffleReadMetrics.totalBytesRead
        a.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
        a.spill += m.memoryBytesSpilled
      }
    }
  }

  private def mb(b: Long): String = f"${b / 1048576.0}%.1fM"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = if (args.nonEmpty) args(0).toInt else 2
    val names = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(sys.error("set SPARK_GRAFT_ONLY=<query,...>"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.GraftExtensions.register(spark)

    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      var agg: Agg = null
      for (pass <- 1 to passes) {
        agg = new Agg
        spark.sparkContext.addSparkListener(agg)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // let straggling listener events drain before reading the agg
        // (listenerBus is private[spark]; a short sleep suffices here)
        Thread.sleep(300)
        spark.sparkContext.removeSparkListener(agg)
        println(f"[profile] $name pass$pass wall=$wall%.2fs jobs=${agg.jobs} " +
          f"stages=${agg.stages.size} taskTime=${agg.stages.valuesIterator.map(_.taskMs).sum / 1e3}%.2fs")
      }
      val top = agg.stages.toSeq.sortBy(-_._2.taskMs).take(25)
      println(f"[profile] $name top stages by task time (last pass):")
      top.foreach { case (id, a) =>
        println(f"  stage $id%4d task=${a.taskMs / 1e3}%7.2fs n=${a.tasks}%3d " +
          f"in=${mb(a.inputBytes)}%8s sr=${mb(a.shuffleRead)}%8s " +
          f"sw=${mb(a.shuffleWrite)}%8s spill=${mb(a.spill)}%6s  ${a.name.take(110)}")
      }
    }
    spark.stop()
  }
}

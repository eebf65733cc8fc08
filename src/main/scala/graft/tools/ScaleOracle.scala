package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1.0 ORACLE dataset — a 10× replica of every sf0.1 table with
  * per-copy KEY offsets, written so the driver's own correctness gate
  * (`graft.Verify` + the DuckDB compare) can run at a decade above its
  * usual scale. Correctness was only ever hash-checked at sf0.01;
  * scale-dependent wrongness — int-range overflow, partition-count-
  * sensitive sampling, hot-bucket caps actually firing, tie-breaks that
  * only tie when values repeat enough — passes that gate by
  * construction. This tool exists so ~15 flagship queries get the SAME
  * rows+schema+hash check at 10× sf0.1 (= 100× the driver gate) once
  * per round.
  *
  * Replication preserves join structure per copy: fact keys and the
  * dimension keys they reference are offset TOGETHER (copy k's orders
  * reference copy k's customers), while the tiny fixed dims
  * (region/nation) stay verbatim — their keys are category labels, not
  * identity spaces. Text/vector payloads replicate verbatim: the oracle
  * compare needs identical inputs on both engines, not corpus realism
  * (ScaleProof's mutated replicas cover that axis).
  *
  * Usage: `runMain graft.tools.ScaleOracle [sf0.1Dir] [outDir] [copies]`
  * then `SPARK_GRAFT_ONLY=<flagships> runMain graft.Verify outDir ...`.
  */
object ScaleOracle {

  private val Off = 10000000L // one id space per copy, ScaleProof's unit

  /** Replicate `df` `copies`× with every column in `keys` shifted by
    * copy·Off — ids stay unique and per-copy join structure intact.
    */
  def replicate(df: DataFrame, copies: Int, keys: Seq[String]): DataFrame = {
    val c = df.sparkSession.range(copies)
    keys.foldLeft(c.crossJoin(df))((d, k) =>
      d.withColumn(k, col(k) + col("id") * Off))
      .drop("id")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft-sf1-oracle")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${graft.GraftSession.defaultCores}]")
      .appName("graft-scale-oracle")
      .config("spark.sql.shuffle.partitions",
        graft.GraftSession.defaultCores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def table(name: String): DataFrame =
      spark.read.parquet(s"$sfDir/$name.parquet")
    def write(name: String, df: DataFrame): Unit = {
      df.repartition(32).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
      System.err.println(s"[scaleoracle] $name: " +
        spark.read.parquet(s"$out/$name.parquet").count() + " rows")
    }

    // fixed dims verbatim — category spaces, not identity spaces
    write("region", table("region"))
    write("nation", table("nation"))
    // identity-keyed tables: keys (and the foreign keys that reference
    // them) offset per copy
    write("customer", replicate(table("customer"), copies, Seq("c_custkey")))
    write("supplier", replicate(table("supplier"), copies, Seq("s_suppkey")))
    write("part", replicate(table("part"), copies, Seq("p_partkey")))
    write("orders", replicate(table("orders"), copies,
      Seq("o_orderkey", "o_custkey")))
    write("lineitem", replicate(table("lineitem"), copies,
      Seq("l_orderkey", "l_partkey", "l_suppkey")))
    write("events", replicate(table("events"), copies,
      Seq("event_id", "user_id")))
    // documents and embeddings replicate MUTATED (ScaleProof's copy-
    // marked text / sign-flipped vectors), NOT verbatim: both engines
    // still see identical bytes (mutation happens at generation), but
    // verbatim copies multiply every shingle's df by `copies` and the
    // EXACT-join oracle SQL for the dedup queries grows with df² —
    // measured: the verbatim form spilled >54 GB in DuckDB at 10×,
    // while the mutated form keeps the oracle's pair space ∝ corpus.
    ScaleProof.synthesize(spark, sfDir, out, copies)
    System.err.println("[scaleoracle] documents: " +
      spark.read.parquet(s"$out/documents.parquet").count() + " rows")
    ScaleProof.synthesizeEmbeddings(spark, sfDir, out, copies)
    System.err.println("[scaleoracle] embeddings: " +
      spark.read.parquet(s"$out/embeddings.parquet").count() + " rows")
    spark.stop()
  }
}

package graft.llm

import org.apache.spark.sql.SparkSession

/** Shared maintenance for the band-key index wing (minhash, simhash,
  * winnow, perceptual, embedding): flat-append indexes accumulate a
  * shuffle-partition-count of small parquet files per batch — a
  * streamed ingest leaves thousands after a day — and compaction
  * rewrites a table into a few files WITHOUT touching contents, so
  * probes through the compacted form are bit-identical (each index's
  * spec pins this; q222 pins it through the oracle for the embedding
  * member). Compaction always writes a NEW successor path rather than
  * swapping in place: the wing's crash contract ("re-append on any
  * doubt" — torn appends only cost recall on the torn rows) does NOT
  * extend to a torn in-place swap, which could lose a whole table.
  * An immutable successor keeps recovery trivial (retry overwrites
  * it; the original is never written), and callers flip their index
  * pointer only after the rewrite returns.
  */
object IndexMaintenance {

  /** Rewrite one flat parquet table into `targetFiles` files at
    * `outPath`, contents identical.
    */
  def compactTable(spark: SparkSession, inPath: String, outPath: String,
      targetFiles: Int): Unit = {
    require(targetFiles >= 1)
    spark.read.parquet(inPath).coalesce(targetFiles)
      .write.mode("overwrite").parquet(outPath)
  }
}

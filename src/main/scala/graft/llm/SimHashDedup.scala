package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.functions.TextFunctions
import graft.plans.{SimHash64 => SimHash64Expr}

/** SimHash near-duplicate detection: 64-bit per-document signature (native
  * Catalyst expression, `graft.plans.SimHash64`), candidate pairs from
  * documents agreeing on at least one of four 16-bit signature blocks
  * (any pair within Hamming distance 3 must agree on one block —
  * pigeonhole), verified by exact Hamming distance via `bit_count`.
  */
object SimHashDedup {

  /** SimHash64 of a token array column as a Column. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(tokens)))

  /** Per-document signature from raw text (normalized word tokens). */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("id"),
      simhash64(TextFunctions.tokens(TextFunctions.normalized(col(textCol)))).as("simhash"))

  private val Blocks = 4

  /** Pairs (id_a < id_b) within `radius` Hamming distance (radius < 4 for
    * the 4-block banding to be lossless).
    */
  def nearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      radius: Int = 3): DataFrame = {
    require(radius < Blocks, s"4-block banding is only complete for radius < $Blocks")
    val sig = signatures(docs, idCol, textCol)
    val blocks = sig.select(
      col("id"), col("simhash"),
      posexplode(array((0 until Blocks).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("block", "bkey")))
    blocks.as("l")
      .join(blocks.as("r"),
        col("l.block") === col("r.block") && col("l.bkey") === col("r.bkey") &&
          col("l.id") < col("r.id"))
      .select(
        col("l.id").as("id_a"), col("r.id").as("id_b"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= radius)
  }
}

package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Count-min sketch (Cormode & Muthukrishnan, J.Alg'05) as a typed
  * mergeable [[Aggregator]]: `depth × width` counters, each input key
  * incrementing one counter per row; the point estimate for a key is the
  * MIN of its `depth` counters and NEVER undercounts (every cell holding
  * a key's count also holds its colliders' counts). This is the sketch a
  * 100 TB token-frequency pass keeps instead of the full distinct-token
  * table: fixed ~`depth·width·8` bytes per (group, sketch), merged
  * map-side by elementwise add — aggregation traffic is independent of
  * corpus vocabulary size.
  *
  * Portability: inputs are PRE-HASHED by the caller to a Rabin-Karp
  * poly-hash in [0, 1e9+7) (graft.functions.TextFunctions.polyHash), and
  * the row hash is plain integer arithmetic
  * `((a_j·h + b_j) mod 1e9+7) mod width` with fixed `a_j = 31 + 2j`,
  * `b_j = 7 + 97j` — so an external SQL engine replays the ENTIRE sketch
  * (cells, collisions, estimates) bit-for-bit; nothing depends on JVM
  * hashing. All intermediates < 2^39: no ANSI overflow.
  *
  * Reference behavior surface: Yakashimaru/Parquet-combiner keeps exact
  * grouped counts (core/aggregate.rs); the sketch is this engine's
  * bounded-memory scale path for the same "how often does each key
  * occur" question.
  */
object CountMin {

  val Mod: Long = 1000000007L

  def rowA(j: Int): Long = 31L + 2L * j
  def rowB(j: Int): Long = 7L + 97L * j

  /** Cell index of pre-hashed key `h` in row `j` (flattened layout). */
  def cell(j: Int, h: Long, width: Int): Int =
    (j * width + ((rowA(j) * h + rowB(j)) % Mod) % width).toInt

  case class CmsBuf(counters: Array[Long])

  /** IN = poly-hashed key, BUF = flattened depth×width counters,
    * OUT = the counter matrix (row-major `Seq[Long]`).
    */
  case class CountMinAgg(depth: Int, width: Int)
      extends Aggregator[Long, CmsBuf, Seq[Long]] {
    require(depth >= 1 && width >= 1, "depth and width must be >= 1")

    override def zero: CmsBuf = CmsBuf(Array.fill(depth * width)(0L))

    override def reduce(b: CmsBuf, h: Long): CmsBuf = {
      var j = 0
      while (j < depth) {
        b.counters(cell(j, h, width)) += 1L
        j += 1
      }
      b
    }

    override def merge(b1: CmsBuf, b2: CmsBuf): CmsBuf = {
      var i = 0
      while (i < b1.counters.length) {
        b1.counters(i) += b2.counters(i)
        i += 1
      }
      b1
    }

    override def finish(b: CmsBuf): Seq[Long] = b.counters.toSeq
    override def bufferEncoder: Encoder[CmsBuf] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** Point estimate from a collected counter matrix. */
  def estimate(counters: IndexedSeq[Long], h: Long,
      depth: Int, width: Int): Long = {
    var m = Long.MaxValue
    var j = 0
    while (j < depth) {
      val c = counters(cell(j, h, width))
      if (c < m) m = c
      j += 1
    }
    m
  }
}

package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bottom-k sample sketch as a typed [[Aggregator]] — the one extension
  * API the engine's other custom operators don't exercise (expressions:
  * `graft.plans`; whole-operator plans: `AsOfJoinPlan`; this: a custom
  * mergeable AGGREGATION state machine that runs as a two-phase
  * `ObjectHashAggregate` with map-side partials).
  *
  * Bottom-k over a uniform hash of the row id is the classic coordinated
  * sample (Cohen & Kaplan, PODC'07 summaries): the k smallest hash values
  * of a set form a fixed-size, MERGEABLE uniform sample — union = merge
  * the sketches and re-truncate, so a 100 TB corpus aggregates per-split
  * samples with no second pass, and the same key always lands in the
  * sample of every set containing it (enables cross-set overlap
  * estimates). Determinism: the caller supplies the hash as an explicit
  * ORD column (here substring(md5(id),1,16), portable to any engine), and
  * ties break on the payload id, so results are a fixed object — the
  * DuckDB oracle replays the sample with a window row_number.
  */
object Sketches {

  /** Sketch state: at most k (ord, id) pairs, kept sorted ascending. */
  case class BottomKBuf(items: Seq[(String, Long)])

  /** Typed Aggregator: IN = (ord, id), BUF = bounded sorted seq,
    * OUT = the sampled ids in hash order.
    */
  case class BottomKAgg(k: Int)
      extends Aggregator[(String, Long), BottomKBuf, Seq[Long]] {
    require(k >= 1, "k must be >= 1")

    private def lt(a: (String, Long), b: (String, Long)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

    private def insert(b: BottomKBuf, it: (String, Long)): BottomKBuf =
      if (b.items.length >= k && !lt(it, b.items.last)) b
      else {
        val (lo, hi) = b.items.span(lt(_, it))
        // bottom-k of a SET: an (ord, id) pair already present must not
        // insert again — merging sketches of OVERLAPPING sets would
        // otherwise crowd out legitimate members with duplicates
        if (hi.headOption.contains(it)) b
        else BottomKBuf((lo ++ (it +: hi)).take(k))
      }

    override def zero: BottomKBuf = BottomKBuf(Vector.empty)
    override def reduce(b: BottomKBuf, a: (String, Long)): BottomKBuf = insert(b, a)
    override def merge(b1: BottomKBuf, b2: BottomKBuf): BottomKBuf =
      b2.items.foldLeft(b1)(insert)
    override def finish(b: BottomKBuf): Seq[Long] = b.items.map(_._2)
    override def bufferEncoder: Encoder[BottomKBuf] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }
}

package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** K-minimum-values (KMV) distinct-count sketch: keep the k smallest
  * DISTINCT hash values seen; the kth smallest estimates the set's distinct
  * cardinality as (k-1)·H / kth (H = hash domain size). The sketch of a set
  * UNION is the k-min merge of the sets' sketches, which makes pairwise
  * distinct-overlap estimation (inclusion–exclusion) a driver-scale
  * array operation over |groups|·k longs — the mergeable-summary pattern
  * (same family as HLL, but the sketch VALUES are portable integers any
  * engine can rebuild from the same hash function).
  *
  * Scale notes: the buffer is O(k) regardless of input size, merge() gives
  * partial+final aggregation (map-side combine), and duplicates need no
  * pre-distinct shuffle — the distinct-trim inside the buffer absorbs them.
  * Buffer grows to 4k before a sort+dedup trim, amortizing reduce cost.
  */
object Kmv {

  final case class Buf(var items: List[Long])

  final class KmvAgg(k: Int) extends Aggregator[Long, Buf, Array[Long]] {
    private def trim(xs: List[Long]): List[Long] = xs.distinct.sorted.take(k)
    override def zero: Buf = Buf(Nil)
    override def reduce(b: Buf, a: Long): Buf = {
      b.items = a :: b.items
      if (b.items.lengthCompare(4 * k) > 0) b.items = trim(b.items)
      b
    }
    override def merge(a: Buf, b: Buf): Buf = { a.items = trim(a.items ::: b.items); a }
    override def finish(b: Buf): Array[Long] = trim(b.items).toArray
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  def agg(k: Int) = new KmvAgg(k)
}

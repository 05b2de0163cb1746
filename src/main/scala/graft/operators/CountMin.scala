package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a typed Aggregator:
  * a depth × width matrix of counters, O(depth·width) memory regardless of
  * stream length or key cardinality. estimate(x) = min over rows of the
  * counter at that row's hash position — always ≥ the true count, and
  * ≤ true + e/width · N with probability 1 − e^(−depth). Merge is
  * element-wise sum, so partial aggregation is EXACT (the merged sketch
  * equals the whole-stream sketch, bit-for-bit) — the 100 TB answer to
  * "how often does each of these keys occur" when the key space is too
  * large to groupBy but the probe set is small.
  *
  * The hash family is md5-chunk based (row d's position = first 16 bits of
  * md5("item:d") mod width) so an oracle SQL engine reconstructs the
  * IDENTICAL sketch cell-for-cell — the same cross-engine trick as the
  * md5-derived MinHash family (DedupQueries.md5SigTable).
  */
object CountMin {

  /** Row-d hash position of an item — md5 first 4 hex chars mod width.
    * Exactly `conv(substring(md5(concat(item, ':', d)), 1, 4), 16, 10) %
    * width` in Spark SQL and `('0x' || substr(md5(item || ':' || d), 1,
    * 4))::INT % width` in DuckDB.
    */
  def position(item: String, d: Int, width: Int): Int = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest((item + ":" + d).getBytes("UTF-8"))
    // first 4 hex chars = first 2 bytes, big-endian
    val v = ((digest(0) & 0xff) << 8) | (digest(1) & 0xff)
    v % width
  }

  final class CMSketch(val depth: Int, val width: Int) extends Serializable {
    val cells = new Array[Long](depth * width)
    var n: Long = 0L

    def add(item: String, w: Long = 1L): Unit = {
      n += w
      var d = 0
      while (d < depth) { cells(d * width + position(item, d, width)) += w; d += 1 }
    }

    def merge(o: CMSketch): CMSketch = {
      require(o.depth == depth && o.width == width, "sketch shape mismatch")
      n += o.n
      var i = 0
      while (i < cells.length) { cells(i) += o.cells(i); i += 1 }
      this
    }

    /** Point estimate: min across rows — never under-counts. */
    def estimate(item: String): Long = {
      var best = Long.MaxValue
      var d = 0
      while (d < depth) {
        val c = cells(d * width + position(item, d, width))
        if (c < best) best = c
        d += 1
      }
      best
    }
  }

  /** Aggregator producing the flat cell array (row-major, length
    * depth·width) as an array column — estimates are then plain HOF
    * arithmetic over it, in either engine.
    */
  final class CMAgg(depth: Int, width: Int)
      extends Aggregator[String, CMSketch, Seq[Long]] {
    override def zero: CMSketch = new CMSketch(depth, width)
    override def reduce(b: CMSketch, item: String): CMSketch = {
      if (item != null) b.add(item); b
    }
    override def merge(a: CMSketch, b: CMSketch): CMSketch = a.merge(b)
    override def finish(s: CMSketch): Seq[Long] =
      scala.collection.immutable.ArraySeq.unsafeWrapArray(s.cells)
    override def bufferEncoder: Encoder[CMSketch] = Encoders.kryo[CMSketch]
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  def agg(depth: Int, width: Int) = new CMAgg(depth, width)
}

package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Deterministic KLL/MRL-style quantile sketch as a typed Aggregator: a
  * cascade of sorted buffers where level i's items each represent 2^i
  * input rows. When a level overflows, it is compacted by keeping every
  * other element (parity alternates per level to cancel bias — the
  * deterministic variant of KLL's coin flip) and promoting the kept half
  * one level up. Buffer is O(k · log(n/k)) doubles regardless of n — the
  * 100 TB answer to exact percentile's full sort — and merge is level-wise
  * concatenate-and-compact, so partial aggregation applies.
  *
  * Rank error observed ≤ ~1% of n at k=512 (spec asserts 2% with margin
  * across uniform/zipf/sorted inputs). The exact-percentile twin
  * (stats_percentiles, DuckDB-oracled) remains the correctness anchor;
  * this operator is the scale path.
  */
object QuantileSketch {

  val DefaultK = 512

  final class QSketch(val k: Int) extends Serializable {
    var count: Long = 0L
    // level 0: unsorted append buffer; levels(i >= 1): sorted, weight 2^i
    var l0: Array[Double] = new Array[Double](k)
    var n0: Int = 0
    var levels: Array[Array[Double]] = Array.empty
    var parity: Array[Boolean] = Array.empty

    def insert(v: Double): Unit = {
      l0(n0) = v; n0 += 1; count += 1
      if (n0 == k) flushL0()
    }

    private def flushL0(): Unit = {
      if (n0 == 0) return
      val a = java.util.Arrays.copyOf(l0, n0)
      java.util.Arrays.sort(a)
      n0 = 0
      addAtLevel(a, 0)
    }

    /** Merge a sorted run into `levels(idx)`; compact upward while a level
      * exceeds 2k items.
      */
    private def addAtLevel(sorted: Array[Double], idx0: Int): Unit = {
      var run = sorted
      var idx = idx0
      while (run.length > 0) {
        ensureLevel(idx)
        levels(idx) = mergeSorted(levels(idx), run)
        if (levels(idx).length <= 2 * k) return
        // compact: keep alternating elements; promote the kept half
        val all = levels(idx)
        val off = if (parity(idx)) 1 else 0
        parity(idx) = !parity(idx)
        val kept = new Array[Double]((all.length - off + 1) / 2)
        var i = 0
        while (i < kept.length) { kept(i) = all(off + 2 * i); i += 1 }
        levels(idx) = Array.empty
        run = kept
        idx += 1
      }
    }

    private def ensureLevel(idx: Int): Unit =
      if (idx >= levels.length) {
        levels = java.util.Arrays.copyOf(levels, idx + 1)
        parity = java.util.Arrays.copyOf(parity, idx + 1)
        var i = 0
        while (i < levels.length) { if (levels(i) == null) levels(i) = Array.empty; i += 1 }
      }

    private def mergeSorted(a: Array[Double], b: Array[Double]): Array[Double] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[Double](a.length + b.length)
      var i = 0; var j = 0; var o = 0
      while (i < a.length && j < b.length) {
        if (a(i) <= b(j)) { out(o) = a(i); i += 1 } else { out(o) = b(j); j += 1 }
        o += 1
      }
      while (i < a.length) { out(o) = a(i); i += 1; o += 1 }
      while (j < b.length) { out(o) = b(j); j += 1; o += 1 }
      out
    }

    def merge(other: QSketch): QSketch = {
      other.flushL0()
      flushL0()
      count += other.count
      var i = 0
      while (i < other.levels.length) {
        if (other.levels(i).nonEmpty) addAtLevel(other.levels(i), i)
        i += 1
      }
      this
    }

    /** Value at rank q·(n−1) over the weighted multiset (lower-weighted
      * nearest item — the sketch analogue of percentile_disc).
      */
    def quantile(q: Double): Double = {
      flushL0()
      // gather (value, weight) pairs from all levels
      var total = 0
      var i = 0
      while (i < levels.length) { total += levels(i).length; i += 1 }
      if (total == 0) return Double.NaN
      val vs = new Array[Double](total)
      val ws = new Array[Long](total)
      var o = 0
      i = 0
      while (i < levels.length) {
        val w = 1L << i
        val lv = levels(i)
        var j = 0
        while (j < lv.length) { vs(o) = lv(j); ws(o) = w; j += 1; o += 1 }
        i += 1
      }
      // sort pairs by value (indices sorted by vs)
      val order = Array.range(0, total).sortBy(vs(_))
      var wsum = 0L
      i = 0
      while (i < total) { wsum += ws(i); i += 1 }
      val target = math.max(0L, math.min(wsum - 1, math.round(q * (wsum - 1).toDouble)))
      var cum = 0L
      i = 0
      while (i < total) {
        cum += ws(order(i))
        if (cum > target) return vs(order(i))
        i += 1
      }
      vs(order(total - 1))
    }
  }

  /** approx_quantiles(value) → ARRAY<DOUBLE> at the given q points. */
  final class QuantileAgg(qs: Array[Double], k: Int = DefaultK)
      extends Aggregator[Double, QSketch, Array[Double]] {
    override def zero: QSketch = new QSketch(k)
    override def reduce(b: QSketch, v: Double): QSketch = { b.insert(v); b }
    override def merge(a: QSketch, b: QSketch): QSketch = a.merge(b)
    override def finish(s: QSketch): Array[Double] = qs.map(s.quantile)
    override def bufferEncoder: Encoder[QSketch] = Encoders.kryo[QSketch]
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  }

  def agg(qs: Array[Double], k: Int = DefaultK) = new QuantileAgg(qs, k)
}

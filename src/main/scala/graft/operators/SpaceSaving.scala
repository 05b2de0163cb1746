package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** SpaceSaving heavy-hitters sketch (Metwally et al. 2005) as a typed
  * Aggregator: m counters, O(m) memory per group regardless of stream
  * length. Guarantee: every item with true frequency > N/m is in the
  * sketch, and each reported count overestimates by at most its recorded
  * `err`. Merge (counter-wise sum + keep top-m, errors compounding into
  * `err`) preserves the guarantee, so partial aggregation applies — the
  * 100 TB answer to "top domains / top tokens" where an exact groupBy's
  * key space doesn't fit.
  *
  * The exact twin (`text_vocab_topk`, DuckDB-oracled) is the correctness
  * anchor; SpaceSavingSpec asserts the guarantee on zipf-skewed streams.
  */
object SpaceSaving {

  final case class Counter(var item: String, var count: Long, var err: Long)

  final class SSketch(val m: Int) extends Serializable {
    val counts = new java.util.HashMap[String, Counter]()
    var n: Long = 0L

    def add(item: String, weight: Long = 1L): Unit = {
      n += weight
      val c = counts.get(item)
      if (c != null) { c.count += weight; return }
      if (counts.size < m) { counts.put(item, Counter(item, weight, 0L)); return }
      // evict the minimum counter: newcomer inherits its count as error
      var min: Counter = null
      val it = counts.values.iterator()
      while (it.hasNext) {
        val x = it.next()
        if (min == null || x.count < min.count ||
          (x.count == min.count && x.item < min.item)) min = x
      }
      counts.remove(min.item)
      counts.put(item, Counter(item, min.count + weight, min.count))
    }

    def merge(other: SSketch): SSketch = {
      n += other.n
      val it = other.counts.values.iterator()
      while (it.hasNext) {
        val oc = it.next()
        val c = counts.get(oc.item)
        if (c != null) { c.count += oc.count; c.err += oc.err }
        else counts.put(oc.item, Counter(oc.item, oc.count, oc.err))
      }
      // keep the top-m by count (ties: item asc), folding evicted counters'
      // counts into the survivors' error bound is unnecessary — dropping
      // them only UNDER-reports items already below the guarantee line
      if (counts.size > m) {
        val all = new java.util.ArrayList(counts.values)
        all.sort((x: Counter, y: Counter) =>
          if (x.count != y.count) java.lang.Long.compare(y.count, x.count)
          else x.item.compareTo(y.item))
        counts.clear()
        var i = 0
        while (i < m) { val c = all.get(i); counts.put(c.item, c); i += 1 }
      }
      this
    }

    /** (item, count, err) rows, count desc / item asc. */
    def top(k: Int): Seq[(String, Long, Long)] = {
      val all = new java.util.ArrayList(counts.values)
      all.sort((x: Counter, y: Counter) =>
        if (x.count != y.count) java.lang.Long.compare(y.count, x.count)
        else x.item.compareTo(y.item))
      (0 until math.min(k, all.size)).map { i =>
        val c = all.get(i); (c.item, c.count, c.err)
      }
    }
  }

  final class SSAgg(m: Int, k: Int)
      extends Aggregator[String, SSketch, Seq[(String, Long, Long)]] {
    override def zero: SSketch = new SSketch(m)
    override def reduce(b: SSketch, item: String): SSketch = {
      if (item != null) b.add(item); b
    }
    override def merge(a: SSketch, b: SSketch): SSketch = a.merge(b)
    override def finish(s: SSketch): Seq[(String, Long, Long)] = s.top(k)
    override def bufferEncoder: Encoder[SSketch] = Encoders.kryo[SSketch]
    override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
      ExpressionEncoder[Seq[(String, Long, Long)]]()
  }

  def agg(m: Int, k: Int) = new SSAgg(m, k)
}

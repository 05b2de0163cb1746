package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct-count sketch as a typed Aggregator (the published
  * Flajolet–Fuss–Gandouet–Meunier construction): 2^p byte registers, merge
  * is element-wise max — associative and commutative, so Spark runs it
  * partial+final and the estimate is independent of partitioning. Fixed
  * 4 KB buffer per group regardless of cardinality: the 100 TB answer to
  * count_distinct's unbounded hash set.
  *
  * Standard error ≈ 1.04/√m ≈ 1.6% at p=12; the small range uses linear
  * counting (the usual bias correction).
  */
object Hll {

  val P = 12
  val M: Int = 1 << P // 4096 registers

  /** 64-bit hash: FNV-1a over the string then a splitmix64 finalizer for
    * high-bit uniformity (FNV alone skews the top bits HLL buckets on).
    */
  def hash64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * 0x100000001b3L; i += 1 }
    h += 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  def add(regs: Array[Byte], v: String): Unit = {
    val h = hash64(v)
    val idx = (h >>> (64 - P)).toInt
    val w = h << P
    val rank = (if (w == 0) 64 - P else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  def estimate(regs: Array[Byte]): Long = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += java.lang.Math.scalb(1.0, -regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1 + 1.079 / M)
    val raw = alpha * M * M / sum
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) // linear counting
      else raw
    math.rint(est).toLong
  }

  final class HllAgg extends Aggregator[String, Array[Byte], Long] {
    override def zero: Array[Byte] = new Array[Byte](M)
    override def reduce(b: Array[Byte], a: String): Array[Byte] = {
      if (a != null) add(b, a)
      b
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(b: Array[Byte]): Long = estimate(b)
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  def hll = new HllAgg
}

package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Encoder}

/** Bloom-filter-pruned equi-join: build a fixed-size bloom filter over the
  * build side's join keys (one distributed aggregate — the filter bits are
  * the only data that converges), then filter the probe side with a codegen
  * `might_contain` BEFORE its shuffle, then run the actual join.
  *
  * The scale story this operator exists for: probe = O(100 TB) fact table,
  * build = a dimension too big to broadcast-hash-join cheaply but whose KEY
  * SET fits a few hundred KB of bloom bits. A plain shuffle join moves every
  * probe row; the pruned plan moves only rows whose key might match —
  * selectivity s and false-positive rate p shrink the probe shuffle to
  * ~(s + p) of the input. False positives are removed by the join itself, so
  * the result is EXACTLY the plain join (the registered query's DuckDB
  * oracle is the plain join).
  *
  * This is the plan shape Spark's AQE runtime filter
  * (spark.sql.optimizer.runtime.bloomFilter.enabled) injects for selective
  * joins; here it is an explicit operator so the pruning is guaranteed,
  * test-asserted, and composable with any key expression.
  */
object BloomJoin {

  /** Optimal bloom sizing (standard formulas), bits rounded up to 64. */
  def optimalNumBits(n: Long, fpp: Double): Long = {
    val m = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    ((m + 63) / 64) * 64
  }

  def optimalNumHashes(m: Long, n: Long): Int =
    math.max(1, math.round(m.toDouble / n * math.log(2)).toInt)

  /** Kirsch–Mitzenmacher double hashing over one xxhash64 value: bit_i =
    * (h1 + i·h2) mod m. Shared by the build (setBits) and probe
    * (mightContain) sides so the two can never disagree.
    */
  private def h2(hash: Long): Long = (hash >>> 33) ^ (hash * 0xff51afd7ed558ccdL)

  def setBits(words: Array[Long], k: Int, hash: Long): Unit = {
    val mBits = words.length.toLong << 6
    var h = hash; val step = h2(hash)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h, mBits)
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      h += step; i += 1
    }
  }

  /** Static bridge for generated code. */
  def mightContain(words: Array[Long], k: Int, hash: Long): Boolean = {
    val mBits = words.length.toLong << 6
    var h = hash; val step = h2(hash)
    var i = 0
    while (i < k) {
      val bit = java.lang.Long.remainderUnsigned(h, mBits)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0) return false
      h += step; i += 1
    }
    true
  }

  /** Distributed bloom build: fixed-width Array[Long] buffer, bitwise-OR
    * merge (associative + commutative), so partial aggregation applies and
    * only `numWords` longs per partition cross the network.
    */
  final class BloomAgg(numWords: Int, k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](numWords)
    override def reduce(b: Array[Long], hash: Long): Array[Long] = { setBits(b, k, hash); b }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a
    }
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** bloom_might_contain(hash LONG) → BOOLEAN. The bits travel as a plain
    * constructor field: they serialize with the physical plan to every
    * executor (same mechanism as a Literal — no driver-side registry that
    * would break off-JVM), and codegen references them as a constant object,
    * so the probe filter stays inside whole-stage codegen.
    */
  case class BloomMightContainExpr(child: Expression, words: Array[Long], k: Int)
      extends UnaryExpression {

    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_might_contain"

    override protected def nullSafeEval(hash: Any): Any =
      mightContain(words, k, hash.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
      defineCodeGen(ctx, ev, h => s"graft.operators.BloomJoin.mightContain($ref, $k, $h)")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Build bloom bits over `build`'s key. One narrow aggregate; the result
    * (m/8 bytes) is the only thing returned to the driver.
    */
  def buildBits(build: DataFrame, buildKey: Column, expectedKeys: Long,
                fpp: Double): (Array[Long], Int) = {
    val spark = build.sparkSession
    import spark.implicits._
    val m = optimalNumBits(math.max(1, expectedKeys), fpp)
    val k = optimalNumHashes(m, math.max(1, expectedKeys))
    val words = build.select(xxhash64(buildKey).as("value")).as[Long]
      .select(new BloomAgg((m / 64).toInt, k).toColumn).head()
    (words, k)
  }

  /** Just the probe-side filter (exposed for tests/plan assertions). */
  def prune(probe: DataFrame, probeKey: Column, words: Array[Long], k: Int): DataFrame =
    probe.where(org.apache.spark.sql.GraftBridge.column(
      BloomMightContainExpr(org.apache.spark.sql.GraftBridge.expression(xxhash64(probeKey)), words, k)))

  /** The pruned inner equi-join. Result ≡ probe ⋈ build on key equality. */
  def prunedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: String, buildKey: String,
                 expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val (words, k) = buildBits(build, col(buildKey), expectedKeys, fpp)
    val pruned = prune(probe, col(probeKey), words, k)
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }
}

package graft.operators

import org.apache.spark.sql.SparkSession

/** Random-hyperplane LSH for cosine similarity over embedding vectors —
  * the scale path for similarity search (brute force is the correctness
  * baseline in graft.queries.SimilarityQ). 8 bands × 8 hyperplanes: a pair
  * at cosine 0.93 (angle ≈ 21°) matches at least one band with p ≈ 0.97,
  * while random pairs (cos ≤ 0.52) rarely collide — candidates are then
  * reranked with the exact cosine.
  *
  * Hyperplanes are seeded and deterministic across JVMs/executors.
  */
object AnnLsh {

  val Bands = 8
  val BitsPerBand = 8
  val Dim = 64

  private val planes: Array[Array[Double]] = {
    val rnd = new java.util.Random(1337)
    Array.fill(Bands * BitsPerBand)(Array.fill(Dim)(rnd.nextGaussian()))
  }

  /** Band signatures: Bands values, each an 8-bit hyperplane sign pattern
    * tagged with the band index (so different bands never collide).
    */
  def bandSignatures(arr: Array[Float]): Array[Long] = {
    Array.tabulate(Bands) { b =>
      var sig = 0L
      var i = 0
      while (i < BitsPerBand) {
        val p = planes(b * BitsPerBand + i)
        var dot = 0.0
        var d = 0
        val n = math.min(arr.length, Dim)
        while (d < n) { dot += p(d) * arr(d); d += 1 }
        if (dot > 0) sig |= (1L << i)
        i += 1
      }
      (b.toLong << 32) | sig
    }
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineD(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i); val y = b(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private val registeredSessions =
    java.util.Collections.synchronizedSet(
      java.util.Collections.newSetFromMap(
        new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  def register(spark: SparkSession): Unit = {
    if (!registeredSessions.add(spark)) return
    val u = spark.udf
    // primitive-array signatures: Spark passes array<float/double> unboxed
    u.register("ann_band_sigs", (v: Array[Float]) => bandSignatures(v))
    u.register("cosine_f", (a: Array[Float], b: Array[Float]) => cosine(a, b))
    u.register("cosine_d", (a: Array[Double], b: Array[Double]) => cosineD(a, b))
    ()
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class DedupSpec extends AnyFunSuite {

  private def randText(rnd: Random, n: Int): String = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi")
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }

  test("minhash signature similarity approximates shingle jaccard") {
    val rnd = new Random(7)
    for (_ <- 1 to 30) {
      val base = randText(rnd, 80)
      val toks = base.split(" ")
      // perturb ~10% of tokens
      val perturbed = toks.map(t => if (rnd.nextInt(10) == 0) "zzz" else t).mkString(" ")
      val exact = Dedup.shingleJaccard(base, perturbed)
      val est = Dedup.signatureSimilarity(
        Dedup.minHashSignature(Dedup.shingleHashes(base)),
        Dedup.minHashSignature(Dedup.shingleHashes(perturbed)))
      assert(math.abs(exact - est) < 0.25, s"exact=$exact est=$est")
    }
    // identical text → identical signature
    val t = randText(rnd, 50)
    assert(Dedup.signatureSimilarity(
      Dedup.minHashSignature(Dedup.shingleHashes(t)),
      Dedup.minHashSignature(Dedup.shingleHashes(t))) == 1.0)
  }

  test("shingleHashesSorted is the exact shingle set, sorted — and its merge-count jaccard equals shingleJaccard") {
    val rnd = new Random(99)
    for (_ <- 1 to 50) {
      val ta = randText(rnd, 2 + rnd.nextInt(120))
      val tb = if (rnd.nextBoolean()) randText(rnd, 2 + rnd.nextInt(120))
               else ta.split(" ").map(t => if (rnd.nextInt(8) == 0) "zzz" else t).mkString(" ")
      val sa = Dedup.shingleHashesSorted(ta)
      assert(sa.toSet === Dedup.shingleHashes(ta).toSet)
      assert(sa.toSeq === sa.toSeq.sorted)
      assert(sa.distinct.length === sa.length)
      // the verify arithmetic the dedup_minhash_lsh query now uses
      val sb = Dedup.shingleHashesSorted(tb)
      var i = 0; var j = 0; var inter = 0L
      while (i < sa.length && j < sb.length) {
        if (sa(i) == sb(j)) { inter += 1; i += 1; j += 1 }
        else if (sa(i) < sb(j)) i += 1 else j += 1
      }
      val union = sa.length.toLong + sb.length - inter
      val viaArrays = if (union == 0) 1.0 else inter.toDouble / union
      assert(viaArrays === Dedup.shingleJaccard(ta, tb))
      // the integer threshold form dedup_lsh_clusters uses: j >= 0.5 iff
      // 2*inter >= union (exact — a correctly-rounded double quotient
      // cannot cross 0.5 while union <= 2^53)
      assert((2 * inter >= union) === (Dedup.shingleJaccard(ta, tb) >= 0.5))
      // bands from the sorted-distinct hash array are bit-identical to
      // bands from the raw text (min over a multiset ignores order and
      // duplicates) — the one-tokenize plan's banding contract
      assert(Dedup.bandHashes(Dedup.minHashSignature(sa)).toSeq ===
        Dedup.minHashBands(ta).toSeq)
      // the ArrayData kernels behind the codegen expressions reproduce the
      // boxed functions bit-for-bit (interpreted-eval side of the contract;
      // ExpressionsSpec pins the codegen side end-to-end)
      assert(Dedup.shingleHashesSortedData(
        org.apache.spark.unsafe.types.UTF8String.fromString(ta))
        .toLongArray().toSeq === sa.toSeq)
      assert(Dedup.bandsFromHashesData(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(sa))
        .toLongArray().toSeq === Dedup.minHashBands(ta).toSeq)
    }
  }

  test("b-bit minhash: packing round-trips and the corrected estimate tracks the full signature") {
    val rnd = new Random(23)
    // packing: low b bits of every hash are recoverable (match of a sig
    // with itself is exact 1.0 similarity for any b)
    Seq(1, 2, 4, 8).foreach { b =>
      val sig = Dedup.minHashSignature(Dedup.shingleHashes(randText(rnd, 60)))
      val packed = Dedup.bBitSignature(sig, b)
      assert(packed.length == sig.length * b / 64)
      assert(Dedup.bBitSimilarity(packed, packed, sig.length, b) == 1.0)
    }
    // estimator: within ±0.3 of the full-signature similarity at 64
    // hashes / b=2 (stderr of the corrected match fraction ≈ 0.09)
    for (_ <- 1 to 25) {
      val base = randText(rnd, 80)
      val toks = base.split(" ")
      val perturbed = toks.map(t => if (rnd.nextInt(8) == 0) "zzz" else t).mkString(" ")
      val sa = Dedup.minHashSignature(Dedup.shingleHashes(base))
      val sb = Dedup.minHashSignature(Dedup.shingleHashes(perturbed))
      val full = Dedup.signatureSimilarity(sa, sb)
      val bbit = Dedup.bBitSimilarity(
        Dedup.bBitSignature(sa, 2), Dedup.bBitSignature(sb, 2), sa.length, 2)
      assert(math.abs(full - bbit) < 0.3, s"full=$full bbit=$bbit")
    }
  }

  test("simhash: similar texts have small hamming distance, dissimilar large") {
    val rnd = new Random(11)
    val base = randText(rnd, 100)
    val similar = base.split(" ").drop(1).mkString(" ") + " zzz"
    val different = randText(new Random(999), 100)
    val hSim = Dedup.hamming(Dedup.simHash64(base), Dedup.simHash64(similar))
    val hDiff = Dedup.hamming(Dedup.simHash64(base), Dedup.simHash64(different))
    assert(hSim <= 8, s"similar hamming $hSim")
    assert(hDiff > hSim, s"diff $hDiff vs sim $hSim")
    // chunk bucketing is exhaustive for hamming<=3 (pigeonhole)
    val a = 0x0123456789abcdefL
    val b = a ^ 0x8001L // hamming 2, both flips in chunk 0
    assert(Dedup.simHashChunks(a).zip(Dedup.simHashChunks(b)).exists { case (x, y) => x == y })
  }

  test("ann lsh: planted near-dup collides in at least one band") {
    val rnd = new Random(5)
    var collisions = 0
    val trials = 50
    for (_ <- 1 to trials) {
      val v = Array.fill(64)(rnd.nextGaussian().toFloat)
      val norm = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      val vn = v.map(_ / norm)
      val perturbed = vn.map(x => x + 0.05f)
      val sa = AnnLsh.bandSignatures(vn)
      val sb = AnnLsh.bandSignatures(perturbed)
      if (sa.zip(sb).exists { case (x, y) => x == y }) collisions += 1
      assert(AnnLsh.cosine(vn, perturbed) > 0.9)
    }
    assert(collisions >= trials * 8 / 10, s"only $collisions/$trials collided")
  }

  test("ann lsh: adaptive bits — occupancy bound, legacy-compatible, recall holds") {
    // occupancy contract: smallest bits with n/2^bits <= 16, floored at 8
    assert(AnnLsh.bitsFor(0L) == 8)
    assert(AnnLsh.bitsFor(4000L) == 8)     // sf0.1 with planted dups
    assert(AnnLsh.bitsFor(4096L) == 8)     // 4096/256 = 16 exactly
    assert(AnnLsh.bitsFor(4097L) == 9)
    assert(AnnLsh.bitsFor(40000L) == 12)   // the 10x soak corpus
    assert(AnnLsh.bitsFor(Long.MaxValue / 4) == AnnLsh.MaxBits)
    (9 to AnnLsh.MaxBits).foreach { b =>
      val nMax = 16L << b // largest n mapped to b bits
      assert(AnnLsh.bitsFor(nMax) == b, s"bitsFor($nMax)")
      assert(AnnLsh.bitsFor(nMax + 1) == math.min(AnnLsh.MaxBits, b + 1))
    }
    val rnd = new Random(5)
    var collide12 = 0
    val trials = 50
    for (_ <- 1 to trials) {
      val v = Array.fill(64)(rnd.nextGaussian().toFloat)
      val norm = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      val vn = v.map(_ / norm)
      val perturbed = vn.map(x => x + 0.05f)
      // widened signatures EXTEND the legacy ones: low 8 bits unchanged,
      // so every oracle computed at bits = 8 is reproduced bit-for-bit
      val s8 = AnnLsh.bandSignatures(vn)
      val s12 = AnnLsh.bandSignatures(vn, 12)
      assert(s8.zip(s12).forall { case (a, b) =>
        (a & 0xff) == (b & 0xff) && (a >>> 32) == (b >>> 32) })
      // planted near-dups keep colliding at the widened width
      val p12 = AnnLsh.bandSignatures(perturbed, 12)
      if (s12.zip(p12).exists { case (x, y) => x == y }) collide12 += 1
    }
    assert(collide12 >= trials * 7 / 10, s"only $collide12/$trials collided at 12 bits")
  }

  test("multimodal stubs are deterministic and size-bounded") {
    val payload = "hello world, this is a payload of moderate length".getBytes("UTF-8")
    val (w1, h1) = Multimodal.decodeStub(payload)
    val (w2, h2) = Multimodal.decodeStub(payload)
    assert((w1, h1) == (w2, h2))
    assert(w1 >= 64 && w1 < 512 && h1 >= 64 && h1 < 512)
    val big = Array.fill(10000)(42.toByte)
    assert(Multimodal.resizeStub(big, 256).length <= 256 + 1)
    assert(Multimodal.frameSampleStub(big, 4096) == 2)
  }
}

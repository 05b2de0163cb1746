package graft.h3

/** Hex-grid IJK+ coordinate math, after the published Uber H3 cell indexing
  * scheme (Apache-2.0; see h3geo.org/docs/core-library/coordsystems). The
  * reference pipeline consumes these semantics through h3-py 3.7.4
  * (/root/reference/requirements.txt); this is a from-scratch Scala
  * implementation of the public algorithm.
  *
  * Coordinates are kept normalized: all components >= 0 and at least one 0.
  */
final case class CoordIJK(i: Int, j: Int, k: Int) {

  def +(o: CoordIJK): CoordIJK = CoordIJK(i + o.i, j + o.j, k + o.k)
  def -(o: CoordIJK): CoordIJK = CoordIJK(i - o.i, j - o.j, k - o.k)
  def *(f: Int): CoordIJK = CoordIJK(i * f, j * f, k * f)

  def normalize: CoordIJK = {
    var (ni, nj, nk) = (i, j, k)
    if (ni < 0) { nj -= ni; nk -= ni; ni = 0 }
    if (nj < 0) { ni -= nj; nk -= nj; nj = 0 }
    if (nk < 0) { ni -= nk; nj -= nk; nk = 0 }
    val min = math.min(ni, math.min(nj, nk))
    if (min > 0) CoordIJK(ni - min, nj - min, nk - min) else CoordIJK(ni, nj, nk)
  }

  /** Centroid position in 2D hex axial space (x toward +i). */
  def toHex2d: Vec2d = {
    val ii = i - k
    val jj = j - k
    Vec2d(ii - 0.5 * jj, jj * Constants.Sqrt3_2)
  }

  /** Unit-vector digit (0-6) for a normalized unit ijk; -1 if not a unit.
    * UnitVecs is ordered so that digit = 4i + 2j + k over components in
    * {0,1} — computed arithmetically instead of a linear indexOf.
    */
  def toDigit: Int = {
    val n = normalize
    if (((n.i | n.j | n.k) & ~1) == 0) (n.i << 2) | (n.j << 1) | n.k else -1
  }

  /** Aggregate to the next-coarser aperture-7 counter-clockwise resolution. */
  def upAp7: CoordIJK = {
    val ii = i - k
    val jj = j - k
    CoordIJK(
      math.round((3 * ii - jj) / 7.0).toInt,
      math.round((ii + 2 * jj) / 7.0).toInt,
      0).normalize
  }

  /** Aggregate to the next-coarser aperture-7 clockwise resolution. */
  def upAp7r: CoordIJK = {
    val ii = i - k
    val jj = j - k
    CoordIJK(
      math.round((2 * ii + jj) / 7.0).toInt,
      math.round((3 * jj - ii) / 7.0).toInt,
      0).normalize
  }

  /** Down-aperture 7 (counter-clockwise). */
  def downAp7: CoordIJK =
    (CoordIJK(3, 0, 1) * i + CoordIJK(1, 3, 0) * j + CoordIJK(0, 1, 3) * k).normalize

  /** Down-aperture 7 (clockwise). */
  def downAp7r: CoordIJK =
    (CoordIJK(3, 1, 0) * i + CoordIJK(0, 3, 1) * j + CoordIJK(1, 0, 3) * k).normalize

  /** Down-aperture 3 (counter-clockwise). */
  def downAp3: CoordIJK =
    (CoordIJK(2, 0, 1) * i + CoordIJK(1, 2, 0) * j + CoordIJK(0, 1, 2) * k).normalize

  /** Down-aperture 3 (clockwise). */
  def downAp3r: CoordIJK =
    (CoordIJK(2, 1, 0) * i + CoordIJK(0, 2, 1) * j + CoordIJK(1, 0, 2) * k).normalize

  def neighbor(digit: Int): CoordIJK =
    if (digit > 0 && digit < 7) (this + CoordIJK.UnitVecs(digit)).normalize else this

  def rotate60ccw: CoordIJK =
    (CoordIJK(1, 1, 0) * i + CoordIJK(0, 1, 1) * j + CoordIJK(1, 0, 1) * k).normalize

  def rotate60cw: CoordIJK =
    (CoordIJK(1, 0, 1) * i + CoordIJK(1, 1, 0) * j + CoordIJK(0, 1, 1) * k).normalize
}

object CoordIJK {
  /** Unit vectors indexed by digit: CENTER, K, J, JK, I, IK, IJ. */
  val UnitVecs: IndexedSeq[CoordIJK] = IndexedSeq(
    CoordIJK(0, 0, 0), CoordIJK(0, 0, 1), CoordIJK(0, 1, 0), CoordIJK(0, 1, 1),
    CoordIJK(1, 0, 0), CoordIJK(1, 0, 1), CoordIJK(1, 1, 0))

  val Center = 0; val K = 1; val J = 2; val JK = 3; val I = 4; val IK = 5; val IJ = 6
  val InvalidDigit = 7

  /** Digit rotation 60° counter-clockwise: 1→5→4→6→2→3→1. */
  def rotateDigit60ccw(d: Int): Int = d match {
    case K => IK; case IK => I; case I => IJ; case IJ => J; case J => JK; case JK => K
    case other => other
  }

  /** Digit rotation 60° clockwise: 1→3→2→6→4→5→1. */
  def rotateDigit60cw(d: Int): Int = d match {
    case K => JK; case JK => J; case J => IJ; case IJ => I; case I => IK; case IK => K
    case other => other
  }

  /** Round fractional hex-plane coordinates to the containing cell. */
  def fromHex2d(v: Vec2d): CoordIJK = {
    val a1 = math.abs(v.x)
    val a2 = math.abs(v.y)
    val x2 = a2 / Constants.Sin60
    val x1 = a1 + x2 / 2.0
    val m1 = x1.toInt
    val m2 = x2.toInt
    val r1 = x1 - m1
    val r2 = x2 - m2
    var i = 0
    var j = 0
    if (r1 < 0.5) {
      if (r1 < 1.0 / 3.0) {
        i = m1
        j = if (r2 < (1.0 + r1) / 2.0) m2 else m2 + 1
      } else {
        j = if (r2 < (1.0 - r1)) m2 else m2 + 1
        i = if ((1.0 - r1) <= r2 && r2 < (2.0 * r1)) m1 + 1 else m1
      }
    } else {
      if (r1 < 2.0 / 3.0) {
        j = if (r2 < (1.0 - r1)) m2 else m2 + 1
        i = if ((2.0 * r1 - 1.0) < r2 && r2 < (1.0 - r1)) m1 else m1 + 1
      } else {
        i = m1 + 1
        j = if (r2 < (r1 / 2.0)) m2 else m2 + 1
      }
    }
    // fold across the axes if necessary
    if (v.x < 0.0) {
      if (j % 2 == 0) {
        val axisi = j / 2L
        val diff = i - axisi
        i = (i - 2.0 * diff).toInt
      } else {
        val axisi = (j + 1) / 2L
        val diff = i - axisi
        i = (i - (2.0 * diff + 1)).toInt
      }
    }
    if (v.y < 0.0) {
      i = i - (2 * j + 1) / 2
      j = -1 * j
    }
    CoordIJK(i, j, 0).normalize
  }
}

final case class Vec2d(x: Double, y: Double) {
  def mag: Double = math.sqrt(x * x + y * y)
}

final case class Vec3d(x: Double, y: Double, z: Double) {
  def distSq(o: Vec3d): Double = {
    val dx = x - o.x; val dy = y - o.y; val dz = z - o.z
    dx * dx + dy * dy + dz * dz
  }
}

object Constants {
  val Sqrt3_2: Double = math.sqrt(3.0) / 2.0
  val Sin60: Double = Sqrt3_2
  val Sqrt7: Double = math.sqrt(7.0)
  /** rotation angle between Class II and Class III resolution axes */
  val Ap7RotRads: Double = math.asin(math.sqrt(3.0 / 28.0))
  /** scaled unit distance from the face center to each vertex, at res 0 */
  val Res0UGnomonic: Double = 0.38196601125010500003
  val Epsilon: Double = 1e-16
  val MaxH3Res: Int = 15

  def isResClassIII(res: Int): Boolean = res % 2 == 1

  def posAngleRads(a: Double): Double = {
    val tau = 2.0 * math.Pi
    val m = a % tau
    if (m < 0) m + tau else m
  }
}

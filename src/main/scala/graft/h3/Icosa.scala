package graft.h3

import Constants._

final case class LatLng(lat: Double, lng: Double) {
  def toVec3d: Vec3d = {
    val r = math.cos(lat)
    Vec3d(r * math.cos(lng), r * math.sin(lng), math.sin(lat))
  }

  /** Great-circle distance in radians. */
  def distRads(o: LatLng): Double = {
    val sinLat = math.sin((o.lat - lat) / 2.0)
    val sinLng = math.sin((o.lng - lng) / 2.0)
    val a = math.min(1.0,
      sinLat * sinLat + math.cos(lat) * math.cos(o.lat) * sinLng * sinLng)
    2.0 * math.atan2(math.sqrt(a), math.sqrt(1.0 - a))
  }

  /** Azimuth to o in radians from true north. */
  def azimuthTo(o: LatLng): Double =
    math.atan2(
      math.cos(o.lat) * math.sin(o.lng - lng),
      math.cos(lat) * math.sin(o.lat) -
        math.sin(lat) * math.cos(o.lat) * math.cos(o.lng - lng))

  /** Destination point at the given azimuth and great-circle distance. */
  def destination(azRaw: Double, distance: Double): LatLng = {
    if (distance < Epsilon) return this
    val az = posAngleRads(azRaw)
    if (az < Epsilon || math.abs(az - math.Pi) < Epsilon) {
      // due north/south
      val lat2 = if (az < Epsilon) lat + distance else lat - distance
      if (math.abs(lat2 - math.Pi / 2) < Epsilon) LatLng(math.Pi / 2, 0)
      else if (math.abs(lat2 + math.Pi / 2) < Epsilon) LatLng(-math.Pi / 2, 0)
      else LatLng(lat2, LatLng.constrainLng(lng))
    } else {
      val sinLat = math.max(-1.0, math.min(1.0,
        math.sin(lat) * math.cos(distance) +
          math.cos(lat) * math.sin(distance) * math.cos(az)))
      val lat2 = math.asin(sinLat)
      if (math.abs(lat2 - math.Pi / 2) < Epsilon) LatLng(math.Pi / 2, 0)
      else if (math.abs(lat2 + math.Pi / 2) < Epsilon) LatLng(-math.Pi / 2, 0)
      else {
        val sinLng = math.max(-1.0, math.min(1.0,
          math.sin(az) * math.sin(distance) / math.cos(lat2)))
        val cosLng = math.max(-1.0, math.min(1.0,
          (math.cos(distance) - math.sin(lat) * sinLat) /
            (math.cos(lat) * math.cos(lat2))))
        LatLng(lat2, LatLng.constrainLng(lng + math.atan2(sinLng, cosLng)))
      }
    }
  }
}

object LatLng {
  def constrainLng(lng: Double): Double = {
    var l = lng
    while (l > math.Pi) l -= 2 * math.Pi
    while (l < -math.Pi) l += 2 * math.Pi
    l
  }
  def degrees(latDeg: Double, lngDeg: Double): LatLng =
    LatLng(math.toRadians(latDeg), math.toRadians(lngDeg))
}

/** A cell position: icosahedron face plus normalized IJK coordinates on it. */
final case class FaceIJK(face: Int, coord: CoordIJK)

/** Icosahedron geometry and the gnomonic face projections of the published
  * H3 indexing scheme. Constant tables follow the public H3 core library
  * definitions (Apache-2.0, h3geo.org).
  */
object Icosa {

  /** Face center latitude/longitude in radians, faces 0-19. */
  val faceCenterGeo: Array[LatLng] = Array(
    LatLng(0.803582649718989942, 1.248397419617396099),   // 0
    LatLng(1.307747883455638156, 2.536945009877921159),   // 1
    LatLng(1.054751253523952054, -1.347517358900396623),  // 2
    LatLng(0.600191595538186799, -0.450603909469755746),  // 3
    LatLng(0.491715428198773866, 0.401988202911306943),   // 4
    LatLng(0.172745327415618701, 1.678146885280433686),   // 5
    LatLng(0.605929321571350690, 2.953923329812411617),   // 6
    LatLng(0.427370518328979641, -1.888876200336285401),  // 7
    LatLng(-0.079066118549212831, -0.733429513380867741), // 8
    LatLng(-0.230961644455383637, 0.506495587332349035),  // 9
    LatLng(0.079066118549212831, 2.408163140208925497),   // 10
    LatLng(0.230961644455383637, -2.635097066257444203),  // 11
    LatLng(-0.172745327415618701, -1.463445768309359553), // 12
    LatLng(-0.605929321571350690, -0.187669323777381622), // 13
    LatLng(-0.427370518328979641, 1.252716453253507838),  // 14
    LatLng(-0.600191595538186799, 2.690988744120037492),  // 15
    LatLng(-0.491715428198773866, -2.739604450678486295), // 16
    LatLng(-0.803582649718989942, -1.893195233972397139), // 17
    LatLng(-1.307747883455638156, -0.604647643711872080), // 18
    LatLng(-1.054751253523952054, 1.794075294689396615)   // 19
  )

  /** Face centers as unit 3-vectors (derived from faceCenterGeo). */
  val faceCenterPoint: Array[Vec3d] = faceCenterGeo.map(_.toVec3d)

  /** Azimuth (radians from true north) of each face's Class II i-axis —
    * column 0 of the published faceAxesAzRadsCII table; the j/k axis azimuths
    * are exactly 2π/3 apart and are derived, not stored.
    */
  val faceAxesAzII: Array[Double] = Array(
    5.619958268523939882,  // 0
    5.760339081714187279,  // 1
    0.780213654393430055,  // 2
    0.430469363979999913,  // 3
    6.130269123335111400,  // 4
    2.692877706530642877,  // 5
    2.982963003477243874,  // 6
    3.532912002790141181,  // 7
    3.494305004259568154,  // 8
    3.003214169499538391,  // 9
    5.930472956509811562,  // 10
    0.138378484090254847,  // 11
    0.448714947059150361,  // 12
    0.158629650112549365,  // 13
    5.891865957979238535,  // 14
    2.711123289609793325,  // 15
    3.294508837434268316,  // 16
    3.804819692245439833,  // 17
    3.664438879055192436,  // 18
    2.361378999196363184   // 19
  )

  /** Neighboring-face orientation: for each face, the adjacent face reached
    * through each overage "quadrant" (0 = central/none, 1 = IJ, 2 = KI,
    * 3 = JK), with the ccw 60° rotations and translation applied to IJK
    * coordinates when crossing. Published H3 faceNeighbors table.
    */
  final case class FaceOrient(face: Int, translate: CoordIJK, ccwRot60: Int)
  val IJQuad = 1; val KIQuad = 2; val JKQuad = 3

  val faceNeighbors: Array[Array[FaceOrient]] = {
    def fo(f: Int, i: Int, j: Int, k: Int, r: Int) = FaceOrient(f, CoordIJK(i, j, k), r)
    Array(
      Array(fo(0,0,0,0,0), fo(4,2,0,2,1), fo(1,2,2,0,5), fo(5,0,2,2,3)),
      Array(fo(1,0,0,0,0), fo(0,2,0,2,1), fo(2,2,2,0,5), fo(6,0,2,2,3)),
      Array(fo(2,0,0,0,0), fo(1,2,0,2,1), fo(3,2,2,0,5), fo(7,0,2,2,3)),
      Array(fo(3,0,0,0,0), fo(2,2,0,2,1), fo(4,2,2,0,5), fo(8,0,2,2,3)),
      Array(fo(4,0,0,0,0), fo(3,2,0,2,1), fo(0,2,2,0,5), fo(9,0,2,2,3)),
      Array(fo(5,0,0,0,0), fo(10,2,2,0,3), fo(14,2,0,2,3), fo(0,0,2,2,3)),
      Array(fo(6,0,0,0,0), fo(11,2,2,0,3), fo(10,2,0,2,3), fo(1,0,2,2,3)),
      Array(fo(7,0,0,0,0), fo(12,2,2,0,3), fo(11,2,0,2,3), fo(2,0,2,2,3)),
      Array(fo(8,0,0,0,0), fo(13,2,2,0,3), fo(12,2,0,2,3), fo(3,0,2,2,3)),
      Array(fo(9,0,0,0,0), fo(14,2,2,0,3), fo(13,2,0,2,3), fo(4,0,2,2,3)),
      Array(fo(10,0,0,0,0), fo(5,2,2,0,3), fo(6,2,0,2,3), fo(15,0,2,2,3)),
      Array(fo(11,0,0,0,0), fo(6,2,2,0,3), fo(7,2,0,2,3), fo(16,0,2,2,3)),
      Array(fo(12,0,0,0,0), fo(7,2,2,0,3), fo(8,2,0,2,3), fo(17,0,2,2,3)),
      Array(fo(13,0,0,0,0), fo(8,2,2,0,3), fo(9,2,0,2,3), fo(18,0,2,2,3)),
      Array(fo(14,0,0,0,0), fo(9,2,2,0,3), fo(5,2,0,2,3), fo(19,0,2,2,3)),
      Array(fo(15,0,0,0,0), fo(16,2,0,2,1), fo(19,2,2,0,5), fo(10,0,2,2,3)),
      Array(fo(16,0,0,0,0), fo(17,2,0,2,1), fo(15,2,2,0,5), fo(11,0,2,2,3)),
      Array(fo(17,0,0,0,0), fo(18,2,0,2,1), fo(16,2,2,0,5), fo(12,0,2,2,3)),
      Array(fo(18,0,0,0,0), fo(19,2,0,2,1), fo(17,2,2,0,5), fo(13,0,2,2,3)),
      Array(fo(19,0,0,0,0), fo(15,2,0,2,1), fo(18,2,2,0,5), fo(14,0,2,2,3))
    )
  }

  /** Which overage quadrant (IJ/KI/JK) leads from face f to adjacent face g;
    * -1 when not adjacent. Derived from faceNeighbors.
    */
  val adjacentFaceDir: Array[Array[Int]] = {
    val arr = Array.fill(20, 20)(-1)
    for (f <- 0 until 20; q <- 1 to 3)
      arr(f)(faceNeighbors(f)(q).face) = q
    arr
  }

  /** Intersection of lines (p0,p1) and (p2,p3) in 2D (assumed to cross). */
  def v2dIntersect(p0: Vec2d, p1: Vec2d, p2: Vec2d, p3: Vec2d): Vec2d = {
    val s1 = Vec2d(p1.x - p0.x, p1.y - p0.y)
    val s2 = Vec2d(p3.x - p2.x, p3.y - p2.y)
    val t = (s2.x * (p0.y - p2.y) - s2.y * (p0.x - p2.x)) /
      (-s2.x * s1.y + s1.x * s2.y)
    Vec2d(p0.x + t * s1.x, p0.y + t * s1.y)
  }

  /** Max IJK coordinate sum on a face, by Class II resolution: 2·7^(res/2). */
  def maxDimByCIIres(res: Int): Int = 2 * unitScaleByCIIres(res)

  /** Unit scale of a Class II resolution grid: 7^(res/2). */
  def unitScaleByCIIres(res: Int): Int = {
    var s = 1
    var r = 0
    while (r < res) { s *= 7; r += 2 }
    s
  }

  /** Nearest icosahedron face to the point, with squared 3D distance. */
  def closestFace(g: LatLng): (Int, Double) = {
    val v = g.toVec3d
    var best = 0
    var bestSq = 5.0
    var f = 0
    while (f < 20) {
      val d = faceCenterPoint(f).distSq(v)
      if (d < bestSq) { bestSq = d; best = f }
      f += 1
    }
    (best, bestSq)
  }

  /** Project a point to 2D hex coordinates on its nearest face at res. */
  def geoToHex2d(g: LatLng, res: Int): (Int, Vec2d) = {
    val (face, sqd) = closestFace(g)
    // cos(r) = 1 - sqd/2 for unit chord-to-arc conversion
    var r = math.acos(1.0 - sqd / 2.0)
    if (r < Epsilon) return (face, Vec2d(0, 0))
    var theta = posAngleRads(
      faceAxesAzII(face) - posAngleRads(faceCenterGeo(face).azimuthTo(g)))
    if (isResClassIII(res)) theta = posAngleRads(theta - Ap7RotRads)
    r = math.tan(r) / Res0UGnomonic
    var i = 0
    while (i < res) { r *= Sqrt7; i += 1 }
    (face, Vec2d(r * math.cos(theta), r * math.sin(theta)))
  }

  /** Inverse projection: 2D hex coordinates on a face back to geo. */
  def hex2dToGeo(v: Vec2d, face: Int, res: Int, substrate: Boolean): LatLng = {
    var r = v.mag
    if (r < Epsilon) return faceCenterGeo(face)
    var theta = math.atan2(v.y, v.x)
    var i = 0
    while (i < res) { r /= Sqrt7; i += 1 }
    if (substrate) {
      r /= 3.0
      if (isResClassIII(res)) r /= Sqrt7
    }
    r = math.atan(r * Res0UGnomonic)
    if (!substrate && isResClassIII(res)) theta = posAngleRads(theta + Ap7RotRads)
    theta = posAngleRads(faceAxesAzII(face) - theta)
    faceCenterGeo(face).destination(theta, r)
  }

  def geoToFaceIjk(g: LatLng, res: Int): FaceIJK = {
    val (face, v) = geoToHex2d(g, res)
    FaceIJK(face, CoordIJK.fromHex2d(v))
  }

  def faceIjkToGeo(fijk: FaceIJK, res: Int): LatLng =
    hex2dToGeo(fijk.coord.toHex2d, fijk.face, res, substrate = false)

  sealed trait Overage
  case object NoOverage extends Overage
  case object FaceEdge extends Overage
  case object NewFace extends Overage

  /** Adjust a FaceIJK for overage onto an adjacent face if necessary,
    * in a Class II grid (substrate grids scale by 3).
    * Returns the (possibly new) FaceIJK and the overage kind.
    */
  def adjustOverageClassII(fijk: FaceIJK, res: Int, pentLeading4: Boolean,
                           substrate: Boolean): (FaceIJK, Overage) = {
    var ijk = fijk.coord
    var face = fijk.face
    var maxDim = maxDimByCIIres(res)
    if (substrate) maxDim *= 3
    val sum = ijk.i + ijk.j + ijk.k
    if (substrate && sum == maxDim) (fijk, FaceEdge)
    else if (sum > maxDim) {
      val orient =
        if (ijk.k > 0) {
          if (ijk.j > 0) faceNeighbors(face)(JKQuad)
          else {
            val o = faceNeighbors(face)(KIQuad)
            if (pentLeading4) {
              // translate origin to the pentagon center, rotate cw to adjust
              // for the deleted k-axis subsequence, translate back
              val origin = CoordIJK(maxDim, 0, 0)
              ijk = ((ijk - origin).rotate60cw + origin)
            }
            o
          }
        } else faceNeighbors(face)(IJQuad)
      face = orient.face
      var r = 0
      while (r < orient.ccwRot60) { ijk = ijk.rotate60ccw; r += 1 }
      var unitScale = unitScaleByCIIres(res)
      if (substrate) unitScale *= 3
      ijk = (ijk + orient.translate * unitScale).normalize
      val overage =
        if (substrate && ijk.i + ijk.j + ijk.k == maxDim) FaceEdge else NewFace
      (FaceIJK(face, ijk), overage)
    } else (fijk, NoOverage)
  }
}

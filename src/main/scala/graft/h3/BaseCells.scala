package graft.h3

/** The 122 resolution-0 H3 base cells: home face + IJK, pentagon flag, and
  * (for pentagons) the two faces whose grids are clockwise-offset from the
  * pentagon's canonical orientation. Follows the published H3 base cell
  * definitions (Apache-2.0, h3geo.org).
  *
  * The inverse lookup (face, coarse-IJK) → (base cell, ccw rotations) —
  * a 540-entry generated table in the C library — is DERIVED here at class
  * load from the geometry: positions are matched by res-0 cell centers, and
  * orientation by comparing azimuths of the res-1 I-digit child as seen from
  * the querying face vs. the home face. Init fails loudly if any position is
  * ambiguous, which doubles as a consistency check of the tables above.
  */
object BaseCells {

  final case class BaseCellInfo(homeFace: Int, homeIjk: CoordIJK,
                                isPentagon: Boolean, cwOffsetPent: (Int, Int))

  private def c(f: Int, i: Int, j: Int, k: Int) =
    BaseCellInfo(f, CoordIJK(i, j, k), isPentagon = false, (-1, -1))
  private def p(f: Int, i: Int, j: Int, k: Int, o1: Int, o2: Int) =
    BaseCellInfo(f, CoordIJK(i, j, k), isPentagon = true, (o1, o2))

  val cells: Array[BaseCellInfo] = Array(
    c(1, 1, 0, 0),            // 0
    c(2, 1, 1, 0),            // 1
    c(1, 0, 0, 0),            // 2
    c(2, 1, 0, 0),            // 3
    p(0, 2, 0, 0, -1, -1),    // 4
    c(1, 1, 1, 0),            // 5
    c(1, 0, 0, 1),            // 6
    c(2, 0, 0, 0),            // 7
    c(0, 1, 0, 0),            // 8
    c(2, 0, 1, 0),            // 9
    c(1, 0, 1, 0),            // 10
    c(1, 0, 1, 1),            // 11
    c(3, 1, 0, 0),            // 12
    c(3, 1, 1, 0),            // 13
    p(11, 2, 0, 0, 2, 6),     // 14
    c(4, 1, 0, 0),            // 15
    c(0, 0, 0, 0),            // 16
    c(6, 0, 1, 0),            // 17
    c(0, 0, 0, 1),            // 18
    c(2, 0, 1, 1),            // 19
    c(7, 0, 0, 1),            // 20
    c(2, 0, 0, 1),            // 21
    c(0, 1, 1, 0),            // 22
    c(6, 0, 0, 1),            // 23
    p(10, 2, 0, 0, 1, 5),     // 24
    c(6, 0, 0, 0),            // 25
    c(3, 0, 0, 0),            // 26
    c(11, 1, 0, 0),           // 27
    c(4, 1, 1, 0),            // 28
    c(3, 0, 1, 0),            // 29
    c(0, 0, 1, 1),            // 30
    c(4, 0, 0, 0),            // 31
    c(5, 0, 1, 0),            // 32
    c(0, 0, 1, 0),            // 33
    c(7, 0, 1, 0),            // 34
    c(11, 1, 1, 0),           // 35
    c(7, 0, 0, 0),            // 36
    c(10, 1, 0, 0),           // 37
    p(12, 2, 0, 0, 3, 7),     // 38
    c(6, 1, 0, 1),            // 39
    c(7, 1, 0, 1),            // 40
    c(4, 0, 0, 1),            // 41
    c(3, 0, 0, 1),            // 42
    c(3, 0, 1, 1),            // 43
    c(4, 0, 1, 0),            // 44
    c(6, 1, 0, 0),            // 45
    c(11, 0, 0, 0),           // 46
    c(8, 0, 0, 1),            // 47
    c(5, 0, 0, 1),            // 48
    p(14, 2, 0, 0, 0, 9),     // 49
    c(5, 0, 0, 0),            // 50
    c(12, 1, 0, 0),           // 51
    c(10, 1, 1, 0),           // 52
    c(4, 0, 1, 1),            // 53
    c(12, 1, 1, 0),           // 54
    c(7, 1, 0, 0),            // 55
    c(11, 0, 1, 0),           // 56
    c(10, 0, 0, 0),           // 57
    p(13, 2, 0, 0, 4, 8),     // 58
    c(10, 0, 0, 1),           // 59
    c(11, 0, 0, 1),           // 60
    c(9, 0, 1, 0),            // 61
    c(8, 0, 1, 0),            // 62
    p(6, 2, 0, 0, 11, 15),    // 63
    c(8, 0, 0, 0),            // 64
    c(9, 0, 0, 1),            // 65
    c(14, 1, 0, 0),           // 66
    c(5, 1, 0, 1),            // 67
    c(16, 0, 1, 1),           // 68
    c(8, 1, 0, 1),            // 69
    c(5, 1, 0, 0),            // 70
    c(12, 0, 0, 0),           // 71
    p(7, 2, 0, 0, 12, 16),    // 72
    c(12, 0, 1, 0),           // 73
    c(10, 0, 1, 0),           // 74
    c(9, 0, 0, 0),            // 75
    c(13, 1, 0, 0),           // 76
    c(16, 0, 0, 1),           // 77
    c(15, 0, 1, 1),           // 78
    c(15, 0, 1, 0),           // 79
    c(16, 0, 1, 0),           // 80
    c(14, 1, 1, 0),           // 81
    c(13, 1, 1, 0),           // 82
    p(5, 2, 0, 0, 10, 19),    // 83
    c(8, 1, 0, 0),            // 84
    c(14, 0, 0, 0),           // 85
    c(9, 1, 0, 1),            // 86
    c(14, 0, 0, 1),           // 87
    c(17, 0, 0, 1),           // 88
    c(12, 0, 0, 1),           // 89
    c(16, 0, 0, 0),           // 90
    c(17, 0, 1, 1),           // 91
    c(15, 0, 0, 1),           // 92
    c(16, 1, 0, 1),           // 93
    c(9, 1, 0, 0),            // 94
    c(15, 0, 0, 0),           // 95
    c(13, 0, 0, 0),           // 96
    p(8, 2, 0, 0, 13, 17),    // 97
    c(13, 0, 1, 0),           // 98
    c(17, 1, 0, 1),           // 99
    c(19, 0, 1, 0),           // 100
    c(14, 0, 1, 0),           // 101
    c(19, 0, 1, 1),           // 102
    c(17, 0, 1, 0),           // 103
    c(13, 0, 0, 1),           // 104
    c(17, 0, 0, 0),           // 105
    c(16, 1, 0, 0),           // 106
    p(9, 2, 0, 0, 14, 18),    // 107
    c(15, 1, 0, 1),           // 108
    c(15, 1, 0, 0),           // 109
    c(18, 0, 1, 1),           // 110
    c(18, 0, 0, 1),           // 111
    c(19, 0, 0, 1),           // 112
    c(17, 1, 0, 0),           // 113
    c(19, 0, 0, 0),           // 114
    c(18, 0, 1, 0),           // 115
    c(18, 1, 0, 1),           // 116
    p(19, 2, 0, 0, -1, -1),   // 117
    c(19, 1, 0, 0),           // 118
    c(18, 0, 0, 0),           // 119
    c(19, 1, 0, 1),           // 120
    c(18, 1, 0, 0)            // 121
  )

  require(cells.length == 122, s"expected 122 base cells, got ${cells.length}")
  require(cells.count(_.isPentagon) == 12,
    s"expected 12 pentagons, got ${cells.count(_.isPentagon)}")

  def isPentagon(bc: Int): Boolean = cells(bc).isPentagon

  def isCwOffset(bc: Int, face: Int): Boolean = {
    val o = cells(bc).cwOffsetPent
    o._1 == face || o._2 == face
  }

  /** Res-0 cell center of each base cell, from its home face. */
  val centers: Array[LatLng] =
    cells.map(b => Icosa.faceIjkToGeo(FaceIJK(b.homeFace, b.homeIjk), 0))

  /** Derived inverse lookup: (face, i, j, k) with i,j,k in 0..2 → base cell,
    * or -1 when no res-0 cell sits at that position. Matched by geographic
    * center distance; ambiguity (two centers comparably close) is an init
    * error rather than a silent wrong grid.
    */
  private def deriveInv(): Array[Int] = {
    val arr = Array.fill(20 * 27)(-1)
    for (face <- 0 until 20; i <- 0 to 2; j <- 0 to 2; k <- 0 to 2) {
      val ijk = CoordIJK(i, j, k)
      if (ijk.normalize == ijk) { // only normalized positions are addressable
        val g = Icosa.faceIjkToGeo(FaceIJK(face, ijk), 0)
        var best = -1
        var bestD = Double.MaxValue
        var second = Double.MaxValue
        var bc = 0
        while (bc < 122) {
          val d = g.distRads(centers(bc))
          if (d < bestD) { second = bestD; bestD = d; best = bc }
          else if (d < second) { second = d }
          bc += 1
        }
        // res-0 neighbor centers are ~0.35 rad apart; a true match is within
        // gnomonic distortion (grows toward far overage positions, so allow
        // up to half the center spacing but demand an absolute margin over
        // the runner-up), anything else is "no cell here"
        if (bestD < 0.17) {
          require(second - bestD > 0.08 || bestD < 1e-9,
            s"ambiguous base cell at face=$face ijk=$ijk: $bestD vs $second")
          arr(face * 27 + i * 9 + j * 3 + k) = best
        }
      }
    }
    arr
  }

  def faceIjkToBaseCell(fijk: FaceIJK): Int = {
    val c = fijk.coord
    if (c.i > 2 || c.j > 2 || c.k > 2 || c.i < 0 || c.j < 0 || c.k < 0) -1
    else invLookup(fijk.face * 27 + c.i * 9 + c.j * 3 + c.k)
  }

  /** Derived rotation lookup: number of ccw 60° rotations mapping digits
    * computed in the querying face's frame to the base cell's canonical
    * (home face) orientation.
    *
    * Calibrated by round trip: for each addressable (face, position), take a
    * sample point displaced from the cell center toward the querying face
    * (so its nearest face IS that face), encode it with each of the six
    * candidate rotation counts, decode the resulting index through the home
    * face (rotation-independent ground truth), and keep the unique candidate
    * whose decoded center lands back at the sample's cell. Azimuth matching
    * cannot be used here: at pentagon positions the five meeting faces are
    * 72° apart, not 60°. Positions no geographic point can aggregate to are
    * marked unreachable (-1).
    */
  private def deriveRot(inv: Array[Int]): Array[Int] = {
    val arr = Array.fill(20 * 27)(-1)
    val calibRes = 4

    // encode a FaceIJK at calibRes with an explicit rotation count
    // (H3.aggregateDigits/applyBaseRotation don't consult rotLookup)
    def encodeWithRot(fijk: FaceIJK, res: Int, bc: Int, numRots: Int): Long = {
      val (hDigits, fijkBC) = H3.aggregateDigits(fijk, res)
      H3.applyBaseRotation(hDigits, bc, fijkBC.face, numRots)
    }

    // decode is rotation-independent
    def decodeCenter(h: Long): LatLng = H3.cellToLatLng(h)

    // aggregate a fine FaceIJK to its res-0 position on the same face
    def res0Position(c0: CoordIJK, res: Int): CoordIJK = {
      var ijk = c0
      var r = res - 1
      while (r >= 0) {
        ijk = if (Constants.isResClassIII(r + 1)) ijk.upAp7 else ijk.upAp7r
        r -= 1
      }
      ijk
    }

    val cellRadius = H3.hexEdgeLengthRads(calibRes)
    for (face <- 0 until 20; i <- 0 to 2; j <- 0 to 2; k <- 0 to 2) {
      val idx = face * 27 + i * 9 + j * 3 + k
      val bc = inv(idx)
      if (bc >= 0) {
        val p = CoordIJK(i, j, k)
        val cellCenter = Icosa.faceIjkToGeo(FaceIJK(face, p), 0)
        val faceCenter = Icosa.faceCenterGeo(face)
        // find a sample point, genuinely displaced from the cell center,
        // whose nearest face is `face` and whose res-0 aggregate is exactly
        // this position; prefer displacement toward the face center (edge
        // and vertex positions), fall back to other azimuths (center cell)
        val azs = cellCenter.azimuthTo(faceCenter) +:
          (0 until 6).map(s => Icosa.faceAxesAzII(face) + 0.23 + s * math.Pi / 3)
        // one valid sample per workable azimuth (diverse digit strings, so a
        // rotation that ties on one sample breaks on another unless the two
        // rotations encode identically everywhere)
        val samples = azs.flatMap { az =>
          Iterator.iterate(0.02)(_ * 1.6).takeWhile(_ < 0.35)
            .map(d => cellCenter.destination(az, d))
            .find { q =>
              q.distRads(cellCenter) > 0.015 &&
              Icosa.closestFace(q)._1 == face && {
                val fq = Icosa.geoToFaceIjk(q, calibRes)
                res0Position(fq.coord, calibRes) == p
              }
            }
        }
        if (samples.nonEmpty) {
          val sums = (0 until 6).map { rot =>
            samples.map { q =>
              val fq = Icosa.geoToFaceIjk(q, calibRes)
              decodeCenter(encodeWithRot(fq, calibRes, bc, rot)).distRads(q)
            }.sum
          }
          val best = sums.indices.minBy(sums)
          val others = sums.indices.filter(_ != best).map(sums)
          require(sums(best) < samples.size * cellRadius,
            s"rotation calibration failed at face=$face ijk=$p bc=$bc sums=$sums")
          // any non-best rotation must either be clearly worse or encode
          // identically (exactly tied) — near-ties would mean ambiguity
          require(others.forall(o => o > 5 * sums(best) || o - sums(best) < 1e-12),
            s"rotation calibration ambiguous at face=$face ijk=$p bc=$bc sums=$sums")
          arr(idx) = best
        }
      }
    }
    arr
  }

  /** Re-run the geometric derivation (used by DumpTables and the spec that
    * validates GeneratedLookups against it).
    */
  def deriveLookups(): (Array[Int], Array[Int]) = {
    val inv = deriveInv()
    (inv, deriveRot(inv))
  }

  // literals generated from deriveLookups (graft.tools.DumpTables) — skips
  // ~800 ms of per-JVM derivation; BaseCellsSpec asserts they still match
  private val invLookup: Array[Int] = GeneratedLookups.inv
  private val rotLookup: Array[Int] = GeneratedLookups.rot.clone() // learnRotation mutates

  def faceIjkToBaseCellCCWrot60(fijk: FaceIJK): Int = {
    val c = fijk.coord
    if (c.i > 2 || c.j > 2 || c.k > 2 || c.i < 0 || c.j < 0 || c.k < 0) -1
    else rotLookup(fijk.face * 27 + c.i * 9 + c.j * 3 + c.k)
  }

  /** Record a lazily-calibrated rotation (idempotent; benign under races). */
  private[h3] def learnRotation(fijk: FaceIJK, rot: Int): Unit = {
    val c = fijk.coord
    rotLookup(fijk.face * 27 + c.i * 9 + c.j * 3 + c.k) = rot
  }
}

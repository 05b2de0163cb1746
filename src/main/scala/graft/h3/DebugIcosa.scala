package graft.h3

/** Scratch validator: check faceAxesAzII against icosahedron vertices derived
  * from face-center geometry (each face's i-axis azimuth must point at one of
  * its three vertices).
  */
object DebugIcosa {
  def main(args: Array[String]): Unit = {
    val centers = Icosa.faceCenterPoint
    val cosAdj = math.sqrt(5.0) / 3.0
    val adj = Array.tabulate(20) { f =>
      (0 until 20).filter { g =>
        g != f && math.abs(centers(f).x * centers(g).x + centers(f).y * centers(g).y +
          centers(f).z * centers(g).z - cosAdj) < 1e-6
      }
    }
    // a vertex shared by faces f,g,h (g,h neighbors of f) is the unit vector
    // equidistant from all three face centers: v ⟂ (cf-cg) and v ⟂ (cf-ch)
    def norm(v: Vec3d) = {
      val m = math.sqrt(v.x * v.x + v.y * v.y + v.z * v.z)
      Vec3d(v.x / m, v.y / m, v.z / m)
    }
    def sub(a: Vec3d, b: Vec3d) = Vec3d(a.x - b.x, a.y - b.y, a.z - b.z)
    def cross(a: Vec3d, b: Vec3d) = Vec3d(
      a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x)
    def dot(a: Vec3d, b: Vec3d) = a.x * b.x + a.y * b.y + a.z * b.z
    val verts = (for {
      f <- 0 until 20
      Seq(g, h) <- adj(f).combinations(2).toSeq
    } yield {
      val v = norm(cross(sub(centers(f), centers(g)), sub(centers(f), centers(h))))
      if (dot(v, centers(f)) < 0) Vec3d(-v.x, -v.y, -v.z) else v
    }).toArray
    println(s"derived ${verts.length} vertices")
    def toLatLng(v: Vec3d) = LatLng(math.asin(v.z), math.atan2(v.y, v.x))
    for (f <- 0 until 20) {
      val fc = Icosa.faceCenterGeo(f)
      val myVerts = verts.map(toLatLng).filter(v => fc.distRads(v) < 0.7)
      val azs = myVerts.map(v => Constants.posAngleRads(fc.azimuthTo(v))).sorted
      val table = Constants.posAngleRads(Icosa.faceAxesAzII(f))
      val diffs = azs.map(a => {
        var d = math.abs(a - table); if (d > math.Pi) d = 2 * math.Pi - d; d
      })
      val min = diffs.min
      println(f"face $f%2d: tableAz=$table%.6f vertexAzs=${azs.map(a => f"$a%.6f").mkString(",")} minDiff=$min%.2e ${if (min > 1e-6) "  <-- MISMATCH" else ""}")
    }
  }
}

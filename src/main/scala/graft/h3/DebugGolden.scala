package graft.h3

object DebugGolden {
  def main(args: Array[String]): Unit = {
    def dump(name: String, h: Long): Unit = {
      val res = H3Index.resolution(h)
      val digits = (1 to res).map(H3Index.digit(h, _)).mkString(",")
      val c = H3.cellToLatLng(h)
      println(f"$name: hex=${H3Index.toHexString(h)} res=$res bc=${H3Index.baseCell(h)} " +
        f"digits=[$digits] center=(${math.toDegrees(c.lat)}%.6f,${math.toDegrees(c.lng)}%.6f)")
    }
    val sf = LatLng.degrees(37.775938728915946, -122.41795063018799)
    println(s"SF point: (37.775939, -122.417951)")
    val (face, sqd) = Icosa.closestFace(sf)
    println(s"closest face: $face (sqd=$sqd)")
    for (res <- 0 to 5) {
      val fijk = Icosa.geoToFaceIjk(sf, res)
      println(s"res $res: faceIjk=$fijk")
      dump(s"  mine@$res", H3.latLngToCell(sf, res))
    }
    dump("expected r5", H3Index.fromHexString("85283473fffffff"))
    dump("expected r9", H3Index.fromHexString("8928308280fffff"))
    // where does my engine think the expected index's center is? and what
    // cell does that center encode back to?
    val exp = H3Index.fromHexString("85283473fffffff")
    val c = H3.cellToLatLng(exp)
    dump("re-encode of expected center", H3.latLngToCell(c, 5))
  }
}

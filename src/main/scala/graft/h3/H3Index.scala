package graft.h3

/** 64-bit H3 cell index bit layout and digit-string operations, after the
  * published H3 encoding (h3geo.org/docs/core-library/h3Indexing):
  * bit 63 reserved, bits 59-62 mode (1 = cell), bits 56-58 reserved,
  * bits 52-55 resolution, bits 45-51 base cell, then 15 × 3-bit digits
  * (res 1 at bits 42-44 … res 15 at bits 0-2), unused digits = 7.
  */
object H3Index {
  val CellMode = 1L
  private val ResOffset = 52
  private val BaseCellOffset = 45
  private val DigitMask = 7L

  /** Mode 1, res 0, base cell 0, all digits 7. */
  val Init: Long = (CellMode << 59) | 0x00001fffffffffffL

  def resolution(h: Long): Int = ((h >>> ResOffset) & 0xfL).toInt
  def setResolution(h: Long, res: Int): Long =
    (h & ~(0xfL << ResOffset)) | (res.toLong << ResOffset)

  def baseCell(h: Long): Int = ((h >>> BaseCellOffset) & 0x7fL).toInt
  def setBaseCell(h: Long, bc: Int): Long =
    (h & ~(0x7fL << BaseCellOffset)) | (bc.toLong << BaseCellOffset)

  private def digitOffset(res: Int): Int = (Constants.MaxH3Res - res) * 3
  def digit(h: Long, res: Int): Int = ((h >>> digitOffset(res)) & DigitMask).toInt
  def setDigit(h: Long, res: Int, d: Int): Long =
    (h & ~(DigitMask << digitOffset(res))) | (d.toLong << digitOffset(res))

  def leadingNonZeroDigit(h: Long): Int = {
    val res = resolution(h)
    var r = 1
    while (r <= res) {
      val d = digit(h, r)
      if (d != 0) return d
      r += 1
    }
    0
  }

  def rotate60ccw(hIn: Long): Long = {
    var h = hIn
    val res = resolution(h)
    var r = 1
    while (r <= res) {
      h = setDigit(h, r, CoordIJK.rotateDigit60ccw(digit(h, r)))
      r += 1
    }
    h
  }

  def rotate60cw(hIn: Long): Long = {
    var h = hIn
    val res = resolution(h)
    var r = 1
    while (r <= res) {
      h = setDigit(h, r, CoordIJK.rotateDigit60cw(digit(h, r)))
      r += 1
    }
    h
  }

  /** Pentagonal rotation: rotates ccw, adjusting for the deleted k-axis
    * subsequence at the first non-zero digit.
    */
  def rotatePent60ccw(hIn: Long): Long = {
    var h = hIn
    val res = resolution(h)
    var foundFirstNonZero = false
    var r = 1
    while (r <= res) {
      h = setDigit(h, r, CoordIJK.rotateDigit60ccw(digit(h, r)))
      if (!foundFirstNonZero && digit(h, r) != 0) {
        foundFirstNonZero = true
        if (leadingNonZeroDigit(h) == CoordIJK.K) h = rotate60ccw(h)
      }
      r += 1
    }
    h
  }

  /** Parent at a coarser resolution: truncate digits, pad with 7. */
  def toParent(h: Long, parentRes: Int): Long = {
    val childRes = resolution(h)
    require(parentRes >= 0 && parentRes <= childRes,
      s"invalid parent res $parentRes for child res $childRes")
    if (parentRes == childRes) h
    else {
      var p = setResolution(h, parentRes)
      var r = parentRes + 1
      while (r <= childRes) { p = setDigit(p, r, 7); r += 1 }
      p
    }
  }

  /** Structural validity per the published bit layout: cell mode, zero
    * reserved bits, base cell < 122, every digit ≤ 6 above the cell's
    * resolution and = 7 below it, and no K-axis (digit 1) first step out
    * of a pentagon (the deleted subsequence).
    */
  def isValidCell(h: Long): Boolean = {
    if ((h >>> 63) != 0L || ((h >>> 59) & 0xfL) != CellMode) return false
    if (((h >>> 56) & 0x7L) != 0L) return false // reserved bits
    val res = resolution(h)
    if (res > Constants.MaxH3Res) return false
    val bc = baseCell(h)
    if (bc >= 122) return false
    var r = 1
    var firstNonZero = 0
    while (r <= res) {
      val d = digit(h, r)
      if (d > 6) return false
      if (firstNonZero == 0 && d != 0) firstNonZero = d
      r += 1
    }
    while (r <= Constants.MaxH3Res) {
      if (digit(h, r) != 7) return false
      r += 1
    }
    !(BaseCells.isPentagon(bc) && firstNonZero == CoordIJK.K)
  }

  def isPentagon(h: Long): Boolean =
    BaseCells.isPentagon(baseCell(h)) && leadingNonZeroDigit(h) == 0

  /** Canonical lowercase-hex string form (leading zeros stripped). */
  def toHexString(h: Long): String = java.lang.Long.toHexString(h)

  def fromHexString(s: String): Long = java.lang.Long.parseUnsignedLong(s, 16)
}

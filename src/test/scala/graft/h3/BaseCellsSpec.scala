package graft.h3

import org.scalatest.funsuite.AnyFunSuite

class BaseCellsSpec extends AnyFunSuite {
  test("GeneratedLookups match a fresh geometric derivation") {
    val (inv, rot) = BaseCells.deriveLookups()
    assert(inv.sameElements(GeneratedLookups.inv),
      "inverse lookup literals are stale — regenerate with graft.tools.DumpTables")
    assert(rot.sameElements(GeneratedLookups.rot),
      "rotation lookup literals are stale — regenerate with graft.tools.DumpTables")
  }
}

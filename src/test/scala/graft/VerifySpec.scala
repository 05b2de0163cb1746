package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The round-7 lesson: a query that throws inside Verify must be LOUD — a
  * present-but-failing key in the dump — never indistinguishable from an
  * unregistered query (the silent path converted a 16-query regression
  * into a shrinking JSON). This drives the real main end-to-end.
  */
class VerifySpec extends AnyFunSuite {

  test("a throwing query dumps an err-column result and an errors.json entry") {
    val out = Files.createTempDirectory("graft_verifyspec").toString
    // a nonexistent data dir makes the query throw at analysis — the same
    // failure class as round 7's encoding break
    Verify.main(Array("/tmp/graft_no_such_sf", out, "a1_group_sum"))

    val dumped = new java.io.File(s"$out/a1_group_sum")
    assert(dumped.isDirectory, "failed query must still produce its key dir")
    val spark = Sessions.local("2")
    val df = spark.read.parquet(dumped.toString)
    assert(df.columns.toSeq == Seq("err"))
    val msg = df.collect().head.getString(0)
    assert(msg.startsWith("QUERY FAILED:") && msg.contains("PATH_NOT_FOUND"), msg)

    val sidecar = Files.readString(java.nio.file.Paths.get(s"$out/errors.json"))
    assert(sidecar.contains("\"a1_group_sum\""), sidecar)
    // oracle_sql.json must still be written even when queries fail — the
    // driver's compare needs it to mark the err rather than crash
    assert(new java.io.File(s"$out/oracle_sql.json").isFile)
  }

  test("a healthy query still dumps a real result through the same path") {
    val out = Files.createTempDirectory("graft_verifyspec_ok").toString
    Verify.main(Array("/root/testdata/sf0.001", out, "a1_group_sum"))
    val spark = Sessions.local("2")
    val df = spark.read.parquet(s"$out/a1_group_sum")
    assert(!df.columns.contains("err") && df.count() > 0)
    assert(!new java.io.File(s"$out/errors.json").exists())
  }
}

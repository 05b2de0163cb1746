package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val spark = Sessions.local()
    new java.io.File(outDir).mkdirs()
    // Dev-loop filter: SPARK_GRAFT_ONLY=q1,q2 (or a third CLI arg — used
    // by VerifySpec, which can't set env vars) runs just those queries
    // (unset → full dump, the driver's contract).
    val only = args.lift(2).orElse(sys.env.get("SPARK_GRAFT_ONLY"))
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.filter {
      case (name, _) => only.forall(_.contains(name))
    }
    val failed = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // The driver's pandas compare sorts/hashes column VALUES — nested
        // types (array/map/struct) crash it ("unhashable numpy.ndarray",
        // round-4 stats_quantile_sketch). Rows-only queries may still
        // surface nested columns; stringify them deterministically so the
        // dump contract never breaks. Oracled queries are scalar-only by
        // construction (DuckDB compare needs scalars), so their hashes are
        // untouched.
        import org.apache.spark.sql.types._
        val flat = df.schema.fields.foldLeft(df) { (acc, f) =>
          f.dataType match {
            case _: ArrayType | _: MapType | _: StructType =>
              acc.withColumn(f.name,
                org.apache.spark.sql.functions.to_json(
                  org.apache.spark.sql.functions.col(f.name)))
            case _ => acc
          }
        }
        flat.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        // A thrown query must never be indistinguishable from an
        // unregistered one (round 7: 16 queries silently vanished from the
        // driver's correctness JSON). Write a one-row result whose single
        // `err` column carries the message — the key stays present in the
        // dump and the oracle compare fails LOUDLY on it.
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        failed += name -> e.toString
        import spark.implicits._
        Seq(s"QUERY FAILED: ${e.toString.take(500)}").toDF("err")
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
    }
    if (failed.nonEmpty) {
      Files.writeString(Paths.get(s"$outDir/errors.json"),
        failed.map { case (k, v) => s""""$k": "${v.replace("\\", "\\\\")
          .replace("\"", "\\\"").replace("\n", " ").take(500)}"""" }
          .mkString("{", ",", "}"))
      System.err.println(s"[verify] ${failed.size} queries FAILED: ${failed.map(_._1).mkString(", ")}")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

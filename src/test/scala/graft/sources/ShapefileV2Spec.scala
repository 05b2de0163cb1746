package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The DataSource V2 split reader: .shx-driven record-range partitions must
  * keep geometry ↔ attribute alignment per record across splits, prune
  * columns, and fall back to a single sequential partition without a .shx.
  */
class ShapefileV2Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  private val N = 20000 // RecordsPerSplit = 8192 → 3 splits

  /** Write pts.shp / pts.shx / pts.dbf with N point records whose
    * coordinates and id are derived from the record index.
    */
  private def writeTrio(dir: Path, withShx: Boolean,
                        fieldName: String = "id"): Unit = {
    val recBytes = 20 // point record content: int type + 2 doubles
    val shp = ByteBuffer.allocate(100 + N * (8 + recBytes))
    shp.order(ByteOrder.BIG_ENDIAN)
    shp.putInt(0, 9994)
    shp.putInt(24, shp.capacity() / 2)
    shp.order(ByteOrder.LITTLE_ENDIAN)
    shp.putInt(28, 1000)
    shp.putInt(32, 1)
    shp.position(100)
    val shx = ByteBuffer.allocate(100 + N * 8).order(ByteOrder.BIG_ENDIAN)
    shx.putInt(0, 9994)
    shx.putInt(24, shx.capacity() / 2)
    shx.position(100)
    (0 until N).foreach { i =>
      shx.putInt(shp.position() / 2) // offset words of the record header
      shx.putInt(recBytes / 2)
      shp.order(ByteOrder.BIG_ENDIAN)
      shp.putInt(i + 1)
      shp.putInt(recBytes / 2)
      shp.order(ByteOrder.LITTLE_ENDIAN)
      shp.putInt(1) // point
      shp.putDouble(i * 0.001 - 5.0)
      shp.putDouble(i * 0.0005 + 1.0)
    }
    Files.write(dir.resolve("pts.shp"), shp.array())
    if (withShx) Files.write(dir.resolve("pts.shx"), shx.array())

    val headerSize = 32 + 32 + 1
    val recordSize = 1 + 9
    val dbf = ByteBuffer.allocate(headerSize + N * recordSize + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    dbf.put(0, 0x03.toByte)
    dbf.putInt(4, N)
    dbf.putShort(8, headerSize.toShort)
    dbf.putShort(10, recordSize.toShort)
    fieldName.getBytes("ASCII").zipWithIndex.foreach { case (c, j) => dbf.put(32 + j, c) }
    dbf.put(32 + 11, 'N'.toByte)
    dbf.put(32 + 16, 9.toByte)
    dbf.put(headerSize - 1, 0x0d.toByte)
    (0 until N).foreach { i =>
      val p = headerSize + i * recordSize
      dbf.put(p, ' '.toByte)
      val s = i.toString.reverse.padTo(9, ' ').reverse
      s.getBytes("ASCII").zipWithIndex.foreach { case (c, j) => dbf.put(p + 1 + j, c) }
    }
    Files.write(dir.resolve("pts.dbf"), dbf.array())
  }

  test("shx splits read in parallel and keep record alignment") {
    val dir = Files.createTempDirectory("shpv2")
    writeTrio(dir, withShx = true)
    val df = spark.read.format("shapefile").load(dir.resolve("pts.shp").toString)
    assert(df.columns.toSeq == Seq("geometry", "id"))
    assert(df.rdd.getNumPartitions == 3, s"expected 3 splits of $N records")
    assert(df.count() == N)
    // alignment: every row's geometry must encode its own id
    import org.apache.spark.sql.functions._
    val misaligned = df
      .withColumn("x", regexp_extract(col("geometry"), """POINT \(([-0-9.E]+) """, 1).cast("double"))
      .filter(abs(col("x") - (col("id") * 0.001 - 5.0)) > 1e-9)
      .count()
    assert(misaligned == 0, s"$misaligned rows with geometry/attribute skew")
  }

  test("column pruning reaches the scan") {
    val dir = Files.createTempDirectory("shpv2p")
    writeTrio(dir, withShx = true)
    val ids = spark.read.format("shapefile").load(dir.resolve("pts.shp").toString)
      .select("id")
    assert(ids.schema.fieldNames.toSeq == Seq("id"))
    // the BatchScan's output column set IS the pruned read schema
    val plan = ids.queryExecution.executedPlan.toString()
    assert(plan.contains("BatchScan") && plan.contains("[id#") &&
      !plan.contains("geometry#"), plan)
    assert(ids.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0)
      == N.toLong * (N - 1) / 2)
  }

  test("multi-path load parses the JSON-encoded paths option") {
    val d1 = Files.createTempDirectory("shpv2m1")
    val d2 = Files.createTempDirectory("shpv2m2")
    writeTrio(d1, withShx = true)
    writeTrio(d2, withShx = true)
    val df = spark.read.format("shapefile")
      .load(d1.resolve("pts.shp").toString, d2.resolve("pts.shp").toString)
    assert(df.count() == 2L * N)
    assert(df.rdd.getNumPartitions == 6, "3 splits per file")
  }

  test("heterogeneous sibling .dbf layouts fail loudly, not misalign") {
    val dir = Files.createTempDirectory("shpv2h")
    writeTrio(dir, withShx = true)
    val sub = Files.createDirectory(dir.resolve("b"))
    writeTrio(sub, withShx = true, fieldName = "uid")
    Files.move(sub.resolve("pts.shp"), dir.resolve("zz.shp"))
    Files.move(sub.resolve("pts.shx"), dir.resolve("zz.shx"))
    Files.move(sub.resolve("pts.dbf"), dir.resolve("zz.dbf"))
    val df = spark.read.format("shapefile").load(dir.toString)
    val err = intercept[Exception](df.count())
    assert(err.getMessage.contains("does not match table schema"), err.getMessage)
  }

  test("missing .shx falls back to one sequential partition with same rows") {
    val dir = Files.createTempDirectory("shpv2s")
    writeTrio(dir, withShx = false)
    val df = spark.read.format("shapefile").load(dir.resolve("pts.shp").toString)
    assert(df.rdd.getNumPartitions == 1)
    assert(df.count() == N)
    assert(df.selectExpr("max(id)").head().getLong(0) == N - 1)
  }
}

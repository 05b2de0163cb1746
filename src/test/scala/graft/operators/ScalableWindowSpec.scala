package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** ScalableWindow must reproduce the plain global window EXACTLY — the
  * salt-group boundaries cancel out of the rank/ntile math — including
  * under nesting (two helpers chained on one frame), which is precisely
  * the shape that silently broke the earlier spark_partition_id-based
  * design (the rank branch and the count branch sampled different range
  * boundaries, so rank+offset stopped being a permutation).
  */
class ScalableWindowSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // plan-shape assertions read executedPlan pre-execution; AQE would
      // wrap it in an AdaptiveSparkPlanExec that collect() can't see into
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  override def afterAll(): Unit = spark.stop()

  private def frame(n: Int) = {
    import spark.implicits._
    // keys with heavy ties in v (salted coarsely) and a unique tiebreak
    (1 to n).map(i => (i.toLong, (i * 7 % 13).toLong, (i * 31 % 997).toLong))
      .toDF("id", "v", "w")
  }

  test("withGlobalRowNumber equals row_number() over a global order") {
    val df = frame(500)
    val ref = df.withColumn("r",
      row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
    val got = ScalableWindow.withGlobalRowNumber(df, "r2")(
      Seq(col("v")), col("v"), col("id"))
    assert(ref.join(got, "id").where(col("r") =!= col("r2")).count() === 0)
  }

  test("descending order with a negated salt") {
    val df = frame(500)
    val ref = df.withColumn("r",
      row_number().over(Window.orderBy(col("w").desc, col("id"))).cast("long"))
    val got = ScalableWindow.withGlobalRowNumber(df, "r2")(
      Seq(expr("-(w div 50L)")), col("w").desc, col("id"))
    assert(ref.join(got, "id").where(col("r") =!= col("r2")).count() === 0)
  }

  test("exact-leading-salt plus tiebreak sub-salt stays a permutation") {
    val df = frame(1000)
    val ref = df.withColumn("r",
      row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
    val got = ScalableWindow.withGlobalRowNumber(df, "r2")(
      Seq(expr("-v"), expr("id div 64L")), col("v").desc, col("id"))
    assert(ref.join(got, "id").where(col("r") =!= col("r2")).count() === 0)
  }

  test("ntile matches SQL ntile for uneven tile sizes and N < n") {
    for (n <- Seq(4, 7, 32); rows <- Seq(10, 33, 500)) {
      val df = frame(rows)
      val ref = df.withColumn("t",
        ntile(n).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      val got = ScalableWindow.withGlobalNtile(df, "t2", n)(
        Seq(col("v")), col("v"), col("id"))
      assert(ref.join(got, "id").where(col("t") =!= col("t2")).count() === 0,
        s"n=$n rows=$rows")
    }
  }

  test("nested helpers on one frame both stay exact (the pid-design killer)") {
    val df = frame(800)
    val ref = df
      .withColumn("a", ntile(8).over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .withColumn("b", ntile(8).over(Window.orderBy(col("w"), col("id"))).cast("long"))
    val got = ScalableWindow.withGlobalNtile(
      ScalableWindow.withGlobalNtile(df, "a2", 8)(Seq(col("v")), col("v"), col("id")),
      "b2", 8)(Seq(expr("w div 100L")), col("w"), col("id"))
    val j = ref.join(got, "id")
    assert(j.where(col("a") =!= col("a2")).count() === 0)
    assert(j.where(col("b") =!= col("b2")).count() === 0)
  }

  test("randomized agreement with the global window (sizes, ties, widths, directions)") {
    // fixed-seed random sweep (OperatorPropertySpec style — the
    // scalatestplus bridge isn't in the offline cache): row_number,
    // ntile, and cumsum must equal the single-window forms for any
    // combination of frame size, tie density, salt width, and direction.
    val rnd = new scala.util.Random(0x5ca1ab1eL)
    (1 to 10).foreach { it =>
      import spark.implicits._
      val n = 50 + rnd.nextInt(400)
      val tieMod = 1 + rnd.nextInt(40) // 1 = all-distinct, 40 = heavy ties
      val width = 1L + rnd.nextInt(64)
      val desc = rnd.nextBoolean()
      val nt = 2 + rnd.nextInt(15)
      val df = (1 to n).map { i =>
        (i.toLong, (rnd.nextInt(10000) % (tieMod * 100)).toLong, rnd.nextInt(50).toLong)
      }.toDF("id", "v", "dlt")
      val (sortCol, salt) =
        if (desc) (col("v").desc, expr(s"-(v div ${width}L)"))
        else (col("v"), expr(s"v div ${width}L"))
      val wRef = Window.orderBy(sortCol, col("id"))
      val ref = df
        .withColumn("rn", row_number().over(wRef).cast("long"))
        .withColumn("t", ntile(nt).over(wRef).cast("long"))
        .withColumn("cs", sum("dlt").over(
          wRef.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val got = ScalableWindow.withGlobalCumSum(
        ScalableWindow.withGlobalNtile(
          ScalableWindow.withGlobalRowNumber(df, "rn2")(Seq(salt), sortCol, col("id")),
          "t2", nt)(Seq(salt), sortCol, col("id")),
        "cs2", col("dlt"))(Seq(salt), sortCol, col("id"))
      val j = ref.join(got.select("id", "rn2", "t2", "cs2"), "id")
      val bad = j.where(col("rn") =!= col("rn2") || col("t") =!= col("t2") ||
        col("cs") =!= col("cs2")).count()
      assert(bad === 0, s"iter=$it n=$n tieMod=$tieMod width=$width desc=$desc nt=$nt")
    }
  }

  test("the big-frame window is salt-partitioned (no global WindowExec over the input)") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = frame(500)
    val plan = ScalableWindow.withGlobalRowNumber(df, "r")(
      Seq(col("v")), col("v"), col("id")).queryExecution.executedPlan
    val wins = plan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty)
    // exactly the offset window (over per-salt counts, an aggregated
    // frame) may be un-partitioned; the rank window must not be
    val unpartitioned = wins.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.size === 1)
    val hasAggBelow = unpartitioned.head.collectFirst {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }.isDefined
    assert(hasAggBelow, "offset window must run over the per-salt aggregate")
  }

  test("withPartitionedNtile equals the plain partitioned window under skew") {
    import spark.implicits._
    // adversarial partition sizes: one giant group, one exactly-n group,
    // one singleton, one smaller-than-n group — plus heavy salt ties
    val rows =
      (1 to 900).map(i => ("big", i.toLong, (i * 7 % 5).toLong)) ++
      (1 to 3).map(i => ("n", i.toLong + 1000, 0L)) ++
      Seq(("one", 2000L, 0L)) ++
      (1 to 2).map(i => ("small", i.toLong + 3000, 1L))
    val df = rows.toDF("g", "id", "v")
    for (n <- Seq(2, 3, 7)) {
      val ref = df.withColumn("t", ntile(n).over(
        Window.partitionBy("g").orderBy(col("v"), col("id"))).cast("long"))
      val got = ScalableWindow.withPartitionedNtile(df, "t2", n)(
        Seq(col("g")), Seq(col("v")), col("v"), col("id"))
      assert(ref.join(got, Seq("g", "id"))
        .where(col("t") =!= col("t2")).count() === 0, s"ntile($n) mismatch")
    }
    // the big-frame rank window must be (partition, salt)-partitioned —
    // never a per-partition single-task sort
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = ScalableWindow.withPartitionedNtile(df, "t", 3)(
      Seq(col("g")), Seq(col("v")), col("v"), col("id"))
      .queryExecution.executedPlan
    val rankWins = plan.collect {
      case w: WindowExec if w.partitionSpec.size >= 2 => w
    }
    assert(rankWins.nonEmpty, "rank window must partition by (part, salt)")
  }

  test("NULL partition and salt keys are kept, matching the plain window") {
    import spark.implicits._
    // a plain `ntile() OVER (PARTITION BY g ...)` keeps the NULL-g group;
    // the offsets round trip must too (null-safe join) — a plain equi-join
    // would silently drop every NULL-keyed row
    val rows = Seq[(Option[String], Long, Long)](
      (Some("en"), 1, 5), (Some("en"), 2, 3), (Some("en"), 3, 9),
      (None, 4, 1), (None, 5, 8), (None, 6, 2), (None, 7, 7),
      (Some("de"), 8, 4))
    val df = rows.toDF("g", "id", "v")
    val ref = df.withColumn("t", ntile(3).over(
      Window.partitionBy("g").orderBy(col("v"), col("id"))).cast("long"))
    val got = ScalableWindow.withPartitionedNtile(df, "t2", 3)(
      Seq(col("g")), Seq(expr("v div 3")), col("v"), col("id"))
    assert(got.count() === rows.size, "no row may be dropped on a NULL key")
    assert(ref.join(got, Seq("id")).where(col("t") =!= col("t2")).count() === 0)

    // global form: a salt expression that is NULL for some rows (e.g. a
    // derived bucket of a nullable column) must still rank every row
    val dfn = Seq[(Long, Option[Long])]((1L, Some(10L)), (2L, None),
      (3L, Some(4L)), (4L, None), (5L, Some(7L))).toDF("id", "v")
    val refG = dfn.withColumn("r", row_number().over(
      Window.orderBy(col("v").asc_nulls_first, col("id"))).cast("long"))
    val gotG = ScalableWindow.withGlobalRowNumber(dfn, "r2")(
      Seq(col("v")), col("v").asc_nulls_first, col("id"))
    assert(gotG.count() === 5)
    assert(refG.join(gotG, "id").where(col("r") =!= col("r2")).count() === 0)
  }
}

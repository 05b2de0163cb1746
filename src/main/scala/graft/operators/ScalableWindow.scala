package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe replacements for global (un-partitioned) window functions.
  *
  * `row_number() OVER (ORDER BY …)` with no PARTITION BY plans a
  * single-partition WindowExec — one task sorts the entire input, the
  * classic 100-TB scale killer Spark itself warns about
  * ("WindowExec: No Partition Defined"). These helpers compute the SAME
  * values with bounded per-task work, generalizing the two-phase salted
  * pattern of `text_length_bucket_batches`:
  *
  *   1. the caller supplies SALT expressions that are a deterministic,
  *      ASC-monotone coarsening of the total order (see contract below);
  *      the big frame shuffles ONCE on the salt into balanced groups;
  *   2. a window partitioned by the salt ranks locally — every task
  *      sorts only its salt group;
  *   3. per-salt counts (≤ |salt space| rows — bounded by the salt
  *      design, not the data) become cumulative offsets via a tiny
  *      window and broadcast back; global rank = local rank + offset.
  *
  * The result is EXACTLY the global row_number/ntile — the salt group
  * boundaries cancel out of the math — so DuckDB oracles written against
  * the plain global window stay green.
  *
  * SALT CONTRACT (caller must guarantee; the math silently breaks
  * otherwise): for any two rows a before b in the total order defined by
  * `sortCols`, salts(a) <= salts(b) lexicographically (ASC). In
  * practice: salt_0 is the leading sort column, optionally div-bucketed
  * (negate first for a DESC leading column — `-(c div K)` stays monotone
  * and equal-preserving); a second salt that sub-buckets a LATER sort
  * column is only valid when salt_0 is the exact leading value (no
  * coarsening), since coarsening would let later-column buckets
  * interleave across the tie range. Pick bucket widths so the salt
  * space stays ≲10⁵ groups (bounds the offset frame) while each group
  * stays ≪ executor memory (bounds the local sort).
  *
  * An earlier design derived the salt from `spark_partition_id()` over a
  * `repartitionByRange` — WRONG: the local-rank branch and the count
  * branch each re-evaluate the nondeterministic partitioner (range
  * sampling is seeded by the per-branch RDD id), so their pid
  * assignments disagree whenever exchange reuse fails to unify the two
  * subtrees (column pruning routinely makes them non-identical), and
  * rank+offset silently stops being a permutation. Value-derived salts
  * are deterministic by construction, so the branches can never
  * disagree, reuse or not.
  */
object ScalableWindow {

  /** Adds `outCol` = global 1-based row_number over the total order
    * `sortCols` (callers must pass a TOTAL order — ties would make both
    * the scalable and the single-window forms nondeterministic).
    */
  def withGlobalRowNumber(df: DataFrame, outCol: String)(
      salts: Seq[Column], sortCols: Column*): DataFrame =
    withGlobalCumSum(df, outCol, lit(1L))(salts, sortCols: _*)

  /** Adds `outCol` = inclusive running sum of `value` (must be non-null)
    * over the total order `sortCols` — `sum(value) OVER (ORDER BY …
    * ROWS UNBOUNDED PRECEDING)` without the single-partition sort.
    * row_number is the value ≡ 1 special case.
    */
  def withGlobalCumSum(df: DataFrame, outCol: String, value: Column)(
      salts: Seq[Column], sortCols: Column*): DataFrame = {
    val (local, offs, _, saltNames) = ranked(df, salts, sortCols, value)
    joinOffsets(local, offs, saltNames)
      .withColumn(outCol, col(LRK) + col(OFF))
      .drop(saltNames: _*).drop(LRK, OFF)
  }

  /** Adds `outCol` = global ntile(n) (BIGINT) over the total order
    * `sortCols`, matching SQL ntile exactly: with N rows, the first
    * N mod n tiles get ceil(N/n) rows, the rest floor(N/n).
    */
  def withGlobalNtile(df: DataFrame, outCol: String, n: Int)(
      salts: Seq[Column], sortCols: Column*): DataFrame = {
    val (local, offs, counts, saltNames) = ranked(df, salts, sortCols, lit(1L))
    val total = counts.agg(sum(CNT).cast("long").as(TOT))
    joinOffsets(local, offs, saltNames)
      .crossJoin(broadcast(total))
      .withColumn(outCol, expr(ntileExpr(n)))
      .drop(saltNames: _*).drop(LRK, OFF, TOT)
  }

  /** Adds `outCol` = ntile(n) (BIGINT) WITHIN each `partSalts` group over
    * the per-group total order `sortCols` — `ntile(n) OVER (PARTITION BY
    * part ORDER BY …)` without the per-partition single-task sort (a
    * billion-row partition would otherwise sort in one task). Same
    * two-phase scheme as the global forms: `extraSalts` sub-bucket the
    * leading sort column (same ASC-monotone, equal-preserving contract;
    * `partSalts` must be the EXACT partition keys, never coarsened), the
    * big frame shuffles once on (part, salt), and the per-salt counts
    * frame — bounded by the salt space — yields within-partition offsets
    * and partition totals via tiny windows.
    */
  def withPartitionedNtile(df: DataFrame, outCol: String, n: Int)(
      partSalts: Seq[Column], extraSalts: Seq[Column], sortCols: Column*): DataFrame = {
    require(extraSalts.nonEmpty,
      "withPartitionedNtile needs ≥1 extra salt; with none, use a plain partitioned window")
    val pNames = partSalts.indices.map(i => s"__sw_p$i")
    val eNames = extraSalts.indices.map(i => s"__sw_e$i")
    val allNames = pNames ++ eNames
    val withSalt = (pNames.zip(partSalts) ++ eNames.zip(extraSalts))
      .foldLeft(df) { case (acc, (nm, c)) => acc.withColumn(nm, c) }
    val wLocal = Window.partitionBy(allNames.map(col): _*).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = withSalt.withColumn(LRK, sum(lit(1L)).over(wLocal).cast("long"))
    val counts = withSalt.groupBy(allNames.map(col): _*)
      .agg(count(lit(1)).cast("long").as(CNT))
    // both windows run over the ≤|salt space| counts frame (bounded by
    // salt design, not data) — partitioned by the exact partition keys
    val wOff = Window.partitionBy(pNames.map(col): _*)
      .orderBy(eNames.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(pNames.map(col): _*)
    val offs = counts
      .withColumn(OFF, coalesce(sum(CNT).over(wOff), lit(0L)))
      .withColumn(TOT, sum(CNT).over(wTot).cast("long"))
      .select((allNames :+ OFF :+ TOT).map(col): _*)
    joinOffsets(local, offs, allNames)
      .withColumn(outCol, expr(ntileExpr(n)))
      .drop(allNames: _*).drop(LRK, OFF, TOT)
  }

  /** Broadcast-join the offsets frame back onto the salted rows with
    * NULL-SAFE equality on every salt column: a plain equi-join would
    * silently DROP rows whose partition or salt key is NULL (e.g. a null
    * lang), diverging from the plain window these helpers are proven
    * value-identical to — `PARTITION BY`/`ORDER BY` both keep a NULL
    * group, and so do the groupBy counts feeding `offs`, so `<=>` makes
    * the round trip lossless. EqualNullSafe is still a hashable join key,
    * so the plan stays a BroadcastHashJoin.
    */
  private def joinOffsets(local: DataFrame, offs: DataFrame,
      keys: Seq[String]): DataFrame = {
    val renamed = keys.foldLeft(offs)((acc, k) => acc.withColumnRenamed(k, "__sw_o_" + k))
    val cond = keys.map(k => col(k) <=> col("__sw_o_" + k)).reduce(_ && _)
    local.join(broadcast(renamed), cond).drop(keys.map("__sw_o_" + _): _*)
  }

  /** SQL ntile(n) over rank rn = LRK + OFF within a frame of TOT rows:
    * q = TOT div n, r = TOT mod n; tiles 1..r hold q+1 rows. The CASE is
    * lazy per-row, so the q=0 (TOT < n) edge never divides by zero — the
    * WHEN branch covers every rn there. One owner for the tile
    * arithmetic (global and partitioned forms share it).
    */
  private def ntileExpr(n: Int): String =
    s"""CAST(CASE WHEN ($LRK + $OFF) <= ($TOT div $n + 1L) * ($TOT % $n)
       |  THEN ($LRK + $OFF - 1L) div ($TOT div $n + 1L) + 1L
       |  ELSE ($TOT % $n) +
       |    (($LRK + $OFF) - 1L - ($TOT div $n + 1L) * ($TOT % $n)) div ($TOT div $n) + 1L
       |END AS BIGINT)""".stripMargin

  private val LRK = "__sw_lrk"
  private val OFF = "__sw_off"
  private val CNT = "__sw_cnt"
  private val TOT = "__sw_tot"

  /** Shared core: (locally cumsummed frame, per-salt offsets, per-salt
    * totals, salt column names). `sum(value) ROWS UNBOUNDED PRECEDING`
    * within the salt partition generalizes row_number (value ≡ 1). All
    * branches derive the salt from row VALUES, so recomputation across
    * plan branches is harmless.
    */
  private def ranked(df: DataFrame, salts: Seq[Column], sortCols: Seq[Column],
      value: Column) = {
    val saltNames = salts.indices.map(i => s"__sw_s$i")
    val withSalt = saltNames.zip(salts).foldLeft(df) {
      case (acc, (nm, c)) => acc.withColumn(nm, c)
    }
    val saltCols = saltNames.map(col)
    val wLocal = Window.partitionBy(saltCols: _*).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = withSalt.withColumn(LRK, sum(value).over(wLocal).cast("long"))
    val counts = withSalt.groupBy(saltCols: _*).agg(sum(value).cast("long").as(CNT))
    // the offset window runs over ≤ |salt space| rows — bounded by the
    // salt design, not the data, so its empty partitionBy is scale-safe
    val wOff = Window.orderBy(saltCols: _*).rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts
      .withColumn(OFF, coalesce(sum(CNT).over(wOff), lit(0L)))
      .select((saltNames :+ OFF).map(col): _*)
    (local, offs, counts, saltNames)
  }
}

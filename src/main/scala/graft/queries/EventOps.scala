package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics beyond the reference's batch surface:
  * gap-based sessionization, as-of alignment, and JSON payload extraction —
  * the window/stateful patterns a training-data pipeline needs over event
  * logs. All arithmetic is in epoch microseconds (exact integers in both
  * engines) so the DuckDB oracles hash-match.
  */
object EventOps {

  private val GapMicros = 1800L * 1000000L // 30 min

  private val SessionizeOracle =
    s"""WITH o AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS tsu,
       |         CAST(value AS DECIMAL(18,2)) AS v,
       |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS ptsu
       |  FROM events),
       |m AS (SELECT *, CASE WHEN ptsu IS NULL OR tsu - ptsu > ${GapMicros} THEN 1 ELSE 0 END AS brk FROM o),
       |x AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY tsu, event_id
       |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM m)
       |SELECT user_id, session_idx, count(*) AS n_events,
       |       min(tsu) AS start_us, max(tsu) AS end_us,
       |       CAST(sum(v) AS DOUBLE) AS sum_value
       |FROM x GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  /** Shared by events_scd2_dimension and its streaming twin. */
  private val Scd2Oracle =
    """WITH o AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu,
      |         lag(event_type) OVER (PARTITION BY user_id
      |           ORDER BY epoch_us(ts), event_id) AS prev_type
      |  FROM events),
      |c AS (SELECT user_id, event_id, event_type, tsu FROM o
      |  WHERE prev_type IS NULL OR event_type <> prev_type),
      |v AS (SELECT user_id, event_type, tsu,
      |    CAST(row_number() OVER (PARTITION BY user_id
      |      ORDER BY tsu, event_id) AS BIGINT) AS version,
      |    lead(tsu) OVER (PARTITION BY user_id
      |      ORDER BY tsu, event_id) AS valid_to_us
      |  FROM c)
      |SELECT user_id, version, event_type AS status,
      |  tsu AS valid_from_us, valid_to_us,
      |  valid_to_us IS NULL AS is_current
      |FROM v ORDER BY user_id, version""".stripMargin

  /** Zero-filled (event_type, hour) series — see events_gapfill_hourly. */
  private def gapfillHourly(s: org.apache.spark.sql.SparkSession, d: String) = {
    val ev = T.events(s, d)
      .withColumn("eh", expr("unix_micros(ts) div 3600000000"))
    val hourly = ev.groupBy("event_type", "eh")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sv"))
    val bounds = ev.agg(min("eh").as("lo"), max("eh").as("hi"))
    val types = ev.select("event_type").distinct()
    val spine = types.crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(expr("sequence(lo, hi)")).as("eh"))
    spine.join(hourly, Seq("event_type", "eh"), "left")
      .select(col("event_type"), col("eh"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sv").cast("double"), lit(0.0d)).as("sum_value"))
  }

  /** The gap-filled series as DuckDB CTEs (`gf` = the filled frame). */
  private val GapfillSqlCtes =
    """ev AS (SELECT event_type, epoch_us(ts) // 3600000000 AS eh,
      |    value FROM events),
      |hourly AS (SELECT event_type, eh, count(*) AS n,
      |    sum(CAST(value AS DECIMAL(18,2))) AS sv
      |  FROM ev GROUP BY 1, 2),
      |b AS (SELECT min(eh) AS lo, max(eh) AS hi FROM ev),
      |spine AS (SELECT t.event_type, g.eh
      |  FROM (SELECT DISTINCT event_type FROM ev) t,
      |       b, UNNEST(range(b.lo, b.hi + 1)) AS g(eh)),
      |gf AS (SELECT s.event_type, s.eh, coalesce(h.n, 0) AS n,
      |    coalesce(CAST(h.sv AS DOUBLE), 0.0) AS sum_value
      |  FROM spine s LEFT JOIN hourly h
      |    ON s.event_type = h.event_type AND s.eh = h.eh)""".stripMargin

  val qs: Seq[QueryDef] = Seq(
    // gap-based sessionization: lag → break flag → running session index →
    // per-session aggregate. One shuffle on user_id; at scale this is the
    // same plan shape regardless of row count per user (no collect).
    QueryDef(
      "events_sessionize",
      (s, d) => {
        val order = Window.partitionBy("user_id").orderBy("tsu", "event_id")
        val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.events(s, d)
          .select(col("user_id"), col("event_id"),
            expr("unix_micros(ts)").as("tsu"),
            col("value").cast("decimal(18,2)").as("v"))
          .withColumn("brk",
            when(col("tsu") - lag("tsu", 1).over(order) > GapMicros ||
              lag("tsu", 1).over(order).isNull, 1).otherwise(0))
          .withColumn("session_idx", sum("brk").over(running))
          .groupBy("user_id", "session_idx")
          .agg(count(lit(1)).as("n_events"),
            min("tsu").as("start_us"), max("tsu").as("end_us"),
            sum("v").cast("double").as("sum_value"))
          .orderBy("user_id", "session_idx")
      },
      Some(SessionizeOracle),
      headline = true
    ),

    // the SAME sessionization through Spark's NATIVE session_window
    // operator (merges events closer than the gap; splits at gap ≥ 30 min
    // vs the window form's gap > 30 min — no exact-boundary gaps exist in
    // the data, asserted by the shared oracle's session count). One
    // shuffle on user_id; state is the open session per key.
    QueryDef(
      "events_sessionize_native",
      (s, d) =>
        T.events(s, d)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
          .select(col("user_id"),
            expr("unix_micros(session_window.start)").as("start_us"),
            col("n_events"), col("sum_value"))
          .orderBy("user_id", "start_us"),
      Some("""WITH o AS (
             |  SELECT user_id, epoch_us(ts) AS tsu,
             |         CAST(value AS DECIMAL(18,2)) AS v,
             |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS ptsu
             |  FROM events),
             |m AS (SELECT *, CASE WHEN ptsu IS NULL OR tsu - ptsu >= 1800000000 THEN 1 ELSE 0 END AS brk FROM o),
             |x AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY tsu
             |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx FROM m)
             |SELECT user_id, min(tsu) AS start_us, count(*) AS n_events,
             |       CAST(sum(v) AS DOUBLE) AS sum_value
             |FROM x GROUP BY user_id, session_idx
             |ORDER BY user_id, start_us""".stripMargin)
    ),

    // the SAME sessionization as a per-key streaming state machine
    // (flatMapGroupsWithState: O(1) state per user, gap rule applied as
    // events arrive) — driven to completion and checked against the
    // identical DuckDB oracle as the batch window-function version
    QueryDef(
      "events_sessionize_stream",
      (s, d) => graft.streaming.EventStream.sessionize(s, d, GapMicros),
      Some(SessionizeOracle)
    ),

    // as-of alignment: each error event joined to the most recent preceding
    // click by the same user (running max over the ordered window — no
    // range/theta join needed).
    QueryDef(
      "events_asof_last_click",
      (s, d) => {
        val running = Window.partitionBy("user_id").orderBy("tsu", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            expr("unix_micros(ts)").as("tsu"))
          .withColumn("last_click_us",
            max(when(col("event_type") === "click", col("tsu"))).over(running))
          .where(col("event_type") === "error")
          .select(col("event_id"), col("user_id"),
            (col("tsu") - col("last_click_us")).as("us_since_click"))
          .orderBy("event_id")
      },
      Some("""WITH o AS (
             |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu,
             |         max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
             |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             |                 ROWS UNBOUNDED PRECEDING) AS last_click_us
             |  FROM events)
             |SELECT event_id, user_id, tsu - last_click_us AS us_since_click
             |FROM o WHERE event_type = 'error' ORDER BY event_id""".stripMargin)
    ),

    // JSON payload extraction + aggregate (props is a JSON string column).
    QueryDef(
      "events_json_extract",
      (s, d) =>
        T.events(s, d)
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), min("k").as("min_k"),
            max("k").as("max_k"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
             |CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
             |max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // Type-2 slowly-changing dimension built from the event log: each
    // user's event_type stream collapses to its change points (consecutive
    // repeats dropped via lag), every surviving row opens a validity
    // interval [valid_from, valid_to) closed by the NEXT change (lead),
    // the open interval is flagged current — the standard warehouse
    // dimension-history build. All three windows share one
    // (user_id)-(tsu, event_id) ordering, so Catalyst plans a single
    // shuffle + sort for the whole query; state per user is one pass over
    // its sorted events, nothing driver-side. Epoch-microsecond integers
    // keep the interval arithmetic cross-engine exact.
    QueryDef(
      "events_scd2_dimension",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
        val changes = T.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            expr("unix_micros(ts)").as("tsu"))
          .withColumn("prev_type", lag("event_type", 1).over(w))
          .where(col("prev_type").isNull || col("event_type") =!= col("prev_type"))
        changes
          .withColumn("version", row_number().over(w).cast("long"))
          .withColumn("valid_to_us", lead("tsu", 1).over(w))
          .withColumn("is_current", col("valid_to_us").isNull)
          .select(col("user_id"), col("version"), col("event_type").as("status"),
            col("tsu").as("valid_from_us"), col("valid_to_us"), col("is_current"))
          .orderBy("user_id", "version")
      },
      Some(Scd2Oracle)
    ),

    // the SAME dimension build incrementally, as a per-key streaming state
    // machine (flatMapGroupsWithState): each change point closes the open
    // version the moment it arrives, the sentinel flushes the current one
    // — proving SCD2 maintenance doesn't need a nightly rebuild. Checked
    // against the identical DuckDB oracle as the batch window version.
    QueryDef(
      "events_scd2_dimension_stream",
      (s, d) => graft.streaming.EventStream.scd2Dimension(s, d),
      Some(Scd2Oracle)
    ),

    // The CONSUMING half of SCD2: every fact row looks up the dimension
    // version whose validity interval contains its event time (the as-of
    // interval lookup every star schema with history does). Boundary
    // semantics: an event AT a change point belongs to the NEW version
    // (from inclusive, to exclusive) — purely ts-based, so both engines
    // assign identically. Scale shape: equi-join on the user key carries
    // the interval predicate as a join residual — dimension versions are
    // per-key few, so the residual fan-out is bounded; rolled up per
    // status with the versions-touched count.
    QueryDef(
      "events_scd2_lookup",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
        val ev = T.events(s, d).select(col("user_id"), col("event_id"),
          col("event_type"), expr("unix_micros(ts)").as("tsu"))
        val dim = ev
          .withColumn("prev_type", lag("event_type", 1).over(w))
          .where(col("prev_type").isNull || col("event_type") =!= col("prev_type"))
          .withColumn("version", row_number().over(w).cast("long"))
          .withColumn("valid_to_us", lead("tsu", 1).over(w))
          .select(col("user_id").as("d_user"), col("version"),
            col("event_type").as("status"), col("tsu").as("from_us"),
            col("valid_to_us"))
        ev.join(dim, col("user_id") === col("d_user") &&
            col("tsu") >= col("from_us") &&
            (col("valid_to_us").isNull || col("tsu") < col("valid_to_us")))
          .groupBy("status")
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("d_user"), col("version")).as("n_versions"))
          .orderBy("status")
      },
      Some("""WITH o AS (
             |  SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu,
             |         lag(event_type) OVER (PARTITION BY user_id
             |           ORDER BY epoch_us(ts), event_id) AS prev_type
             |  FROM events),
             |c AS (SELECT user_id, event_id, event_type, tsu FROM o
             |  WHERE prev_type IS NULL OR event_type <> prev_type),
             |v AS (SELECT user_id, event_type AS status, tsu AS from_us,
             |    CAST(row_number() OVER (PARTITION BY user_id
             |      ORDER BY tsu, event_id) AS BIGINT) AS version,
             |    lead(tsu) OVER (PARTITION BY user_id
             |      ORDER BY tsu, event_id) AS valid_to_us
             |  FROM c),
             |ev AS (SELECT user_id, epoch_us(ts) AS tsu FROM events),
             |j AS (SELECT v.status, v.user_id, v.version
             |  FROM ev JOIN v ON ev.user_id = v.user_id
             |    AND ev.tsu >= v.from_us
             |    AND (v.valid_to_us IS NULL OR ev.tsu < v.valid_to_us))
             |SELECT status, count(*) AS n_events,
             |  count(DISTINCT (user_id, version)) AS n_versions
             |FROM j GROUP BY status ORDER BY status""".stripMargin)
    ),

    // Multi-touch LINEAR attribution: each click's 10000 bp of credit
    // splits equally across the views that preceded it within 30 minutes
    // (same user), integer remainder to the EARLIEST view — so per-click
    // credit conserves EXACTLY (the invariant last-touch models get for
    // free and linear models usually fudge with floats). Scale shape: one
    // user-keyed join with a bounded time residual (the attribution-join
    // shape events_attrib_join_stream streams), two windows over the
    // per-click match group (match-sized, not event-sized), one view-keyed
    // rollup.
    QueryDef(
      "events_attrib_linear",
      (s, d) => {
        val ev = T.events(s, d).select(col("event_id"), col("user_id"),
          col("event_type"), expr("unix_micros(ts)").as("tsu"))
        val v = ev.where(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id"), col("tsu").as("vts"))
        val c = ev.where(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"), col("tsu").as("cts"))
        val m = c.join(v, "user_id")
          .where(col("vts") <= col("cts") && col("vts") >= col("cts") - lit(1800000000L))
        val wk = Window.partitionBy("click_id")
        val wr = Window.partitionBy("click_id").orderBy(col("vts"), col("view_id"))
        m.withColumn("k", count(lit(1)).over(wk))
          .withColumn("rk", row_number().over(wr))
          .withColumn("credit_bp",
            expr("10000 div k + CASE WHEN rk = 1 THEN 10000 % k ELSE 0L END"))
          .groupBy("view_id")
          .agg(count(lit(1)).as("n_clicks"), sum("credit_bp").as("credit_bp"))
          .orderBy("view_id")
      },
      Some("""WITH ev AS (SELECT event_id, user_id, event_type,
             |    epoch_us(ts) AS tsu FROM events),
             |v AS (SELECT event_id AS view_id, user_id, tsu AS vts FROM ev
             |  WHERE event_type = 'view'),
             |c AS (SELECT event_id AS click_id, user_id, tsu AS cts FROM ev
             |  WHERE event_type = 'click'),
             |m AS (SELECT c.click_id, v.view_id, v.vts
             |  FROM c JOIN v ON c.user_id = v.user_id
             |  WHERE v.vts <= c.cts AND v.vts >= c.cts - 1800000000),
             |r AS (SELECT click_id, view_id,
             |    count(*) OVER (PARTITION BY click_id) AS k,
             |    row_number() OVER (PARTITION BY click_id
             |      ORDER BY vts, view_id) AS rk
             |  FROM m)
             |SELECT view_id, count(*) AS n_clicks,
             |  CAST(sum(10000 // k + CASE WHEN rk = 1 THEN 10000 % k ELSE 0 END)
             |    AS BIGINT) AS credit_bp
             |FROM r GROUP BY view_id ORDER BY view_id""".stripMargin)
    ),

    // CDC merge (MERGE INTO semantics without a table format): the event
    // log is a change stream keyed into the customer dimension — the last
    // event per key wins ((tsu, event_id) total order, one window shuffle),
    // 'click' deletes, anything else upserts, keys beyond the dimension
    // insert. The merge itself is ONE full-outer shuffle join; at 100 TB
    // the change side is typically a small fraction of the snapshot and
    // AQE picks the broadcast/shuffle side at runtime — no driver state,
    // no per-row lookups. Balance updates use floor(value*100)/100.0 so
    // both engines round identically (double floor, not cast).
    QueryDef(
      "events_cdc_merge",
      (s, d) => {
        val cust = T(s, d, "customer")
        val maxk = cust.agg(max(col("c_custkey")).as("maxk"))
        val w = Window.partitionBy("key")
          .orderBy(col("tsu").desc, col("event_id").desc)
        val latest = T.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("value"), expr("unix_micros(ts)").as("tsu"))
          .crossJoin(broadcast(maxk))
          .withColumn("key", col("user_id") + col("maxk") - 99)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("key"), col("event_type"), col("value"))
        val newBal =
          (floor(col("value") * lit(100.0)).cast("double") / lit(100.0))
        cust.join(latest, cust("c_custkey") === latest("key"), "full_outer")
          .where(col("key").isNull || col("event_type") =!= "click")
          .select(
            coalesce(col("c_custkey"), col("key")).as("c_custkey"),
            when(col("c_custkey").isNull,
              concat(lit("NEW#"), col("key").cast("string")))
              .otherwise(col("c_name")).as("c_name"),
            when(col("key").isNull, col("c_acctbal"))
              .otherwise(newBal).as("c_acctbal"),
            when(col("key").isNull, col("c_mktsegment"))
              .otherwise(upper(col("event_type"))).as("c_mktsegment"),
            when(col("key").isNull, lit("base"))
              .when(col("c_custkey").isNull, lit("inserted"))
              .otherwise(lit("updated")).as("src"))
          .orderBy("c_custkey")
      },
      Some("""WITH mk AS (SELECT max(c_custkey) AS maxk FROM customer),
             |ev AS (SELECT user_id + maxk - 99 AS key, event_id, event_type,
             |         value, epoch_us(ts) AS tsu FROM events, mk),
             |latest AS (SELECT key, event_type, value FROM (
             |    SELECT *, row_number() OVER (PARTITION BY key
             |      ORDER BY tsu DESC, event_id DESC) AS rn FROM ev)
             |  WHERE rn = 1),
             |m AS (SELECT c.c_custkey AS bk, c.c_name, c.c_acctbal,
             |        c.c_mktsegment, l.key, l.event_type, l.value
             |      FROM customer c FULL OUTER JOIN latest l
             |        ON c.c_custkey = l.key)
             |SELECT CAST(coalesce(bk, key) AS BIGINT) AS c_custkey,
             |  CASE WHEN bk IS NULL THEN 'NEW#' || CAST(key AS VARCHAR)
             |       ELSE c_name END AS c_name,
             |  CASE WHEN key IS NULL THEN c_acctbal
             |       ELSE floor(value * 100) / 100.0 END AS c_acctbal,
             |  CASE WHEN key IS NULL THEN c_mktsegment
             |       ELSE upper(event_type) END AS c_mktsegment,
             |  CASE WHEN key IS NULL THEN 'base'
             |       WHEN bk IS NULL THEN 'inserted'
             |       ELSE 'updated' END AS src
             |FROM m WHERE key IS NULL OR event_type <> 'click'
             |ORDER BY c_custkey""".stripMargin)
    ),

    // Incremental aggregate maintenance (materialized-view delta merge):
    // base partial aggregates (events before the temporal midpoint) merged
    // with a delta batch's partials — count sums, DECIMAL sums sum, min/max
    // fold — and the ORACLE is a full recompute over everything, so a hash
    // match proves the merge algebra is lossless. This is the incremental
    // ETL contract at 100 TB: the nightly view update touches only the
    // delta's partials, never the base data. The split point is derived
    // from broadcast min/max scalars so both engines cut identically.
    QueryDef("events_incremental_agg",
      (s, d) => {
        val ev = T.events(s, d).withColumn("us", expr("unix_micros(ts)"))
        val bounds = ev.agg(min("us").as("lo"), max("us").as("hi"))
        val partials = ev.crossJoin(broadcast(bounds))
          .withColumn("is_base", expr("us < (lo + hi) div 2"))
          .groupBy("event_type", "is_base")
          .agg(count(lit(1)).as("pn"),
            sum(col("value").cast("decimal(18,2)")).as("psum"),
            min("us").as("pmin"), max("us").as("pmax"))
        partials.groupBy("event_type")
          .agg(sum("pn").as("n_events"),
            sum("psum").cast("double").as("sum_value"),
            min("pmin").as("min_us"), max("pmax").as("max_us"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             |  min(epoch_us(ts)) AS min_us, max(epoch_us(ts)) AS max_us
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // Streaming twin of the incremental merge: the delta half arrives via
    // Structured Streaming (readStream over staged files, complete-mode
    // partial aggregation) and merges with the batch base partials — the
    // lambda-architecture unification, under the SAME full-recompute
    // oracle, so batch and streaming paths are proven to land on identical
    // state. See streaming/EventStream.incrementalMerge.
    QueryDef("events_incremental_agg_stream",
      (s, d) => graft.streaming.EventStream.incrementalMerge(s, d),
      Some("""SELECT event_type, count(*) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
             |  min(epoch_us(ts)) AS min_us, max(epoch_us(ts)) AS max_us
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // Hourly gap-fill: a time-series rollup is only chartable/joinable if
    // every (type, hour) cell exists — generate the full hourly spine
    // between the corpus min/max hour, cross it with the type dimension,
    // and left-join the observed counts, filling absent cells with 0.
    // Scale shape: the spine is hours × types — DIMENSION-sized, built
    // from broadcast min/max scalars with one sequence() explode — and the
    // fact side arrives pre-aggregated (one groupBy shuffle), so the fill
    // join is spine-sized, never event-sized. Hour keys stay integer
    // (epoch hours) end to end.
    QueryDef("events_gapfill_hourly",
      (s, d) => gapfillHourly(s, d).orderBy("event_type", "eh"),
      Some(s"""WITH $GapfillSqlCtes
              |SELECT event_type, eh, n, sum_value
              |FROM gf ORDER BY event_type, eh""".stripMargin)
    ),

    // Rolling-median smoothing over the gap-filled series: a 7-hour
    // centered window median per type — the robust trend line (medians
    // shrug off the spikes events_anomaly_trailing hunts). No window
    // percentile needed: collect the ≤7-row frame, sort, take the middle —
    // med2 = twice the median, kept integer (sum of the two middle
    // elements; equal for odd frames) so cross-engine equality is exact.
    // Scale shape: the window runs over the AGGREGATED hourly series
    // (dimension-sized), partitioned by type — never over raw events.
    QueryDef("events_rolling_median",
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("eh").rowsBetween(-3, 3)
        gapfillHourly(s, d)
          .withColumn("ls", sort_array(collect_list(col("n")).over(w)))
          .select(col("event_type"), col("eh"), col("n"), expr(
            """element_at(ls, int((size(ls) + 1) div 2)) +
              |element_at(ls, int(size(ls) div 2 + 1))""".stripMargin).as("med2"))
          .orderBy("event_type", "eh")
      },
      Some(s"""WITH $GapfillSqlCtes,
              |r AS (SELECT event_type, eh, n,
              |    list_sort(list(n) OVER (PARTITION BY event_type ORDER BY eh
              |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS ls
              |  FROM gf)
              |SELECT event_type, eh, n,
              |  ls[(len(ls) + 1) // 2] + ls[len(ls) // 2 + 1] AS med2
              |FROM r ORDER BY event_type, eh""".stripMargin)
    ),

    // Session-shape report off the sessionize output: sessions bucketed by
    // length, with exact duration sums — the distribution a product team
    // reads and the one a streaming-state capacity plan needs (how much
    // state does a typical key hold?). Reuses the registered sessionize
    // query; everything downstream is a rollup over the SESSION table
    // (orders of magnitude below events).
    QueryDef(
      "events_session_stats",
      (s, d) => {
        val sess = qs.find(_.name == "events_sessionize").get.fn(s, d)
        sess
          .withColumn("len_bucket",
            when(col("n_events") === 1, "a_1")
              .when(col("n_events") <= 4, "b_2_4")
              .when(col("n_events") <= 9, "c_5_9")
              .otherwise("d_10_plus"))
          .withColumn("dur_us", col("end_us") - col("start_us"))
          .groupBy("len_bucket")
          .agg(count(lit(1)).as("n_sessions"),
            sum("n_events").as("n_events_total"),
            sum("dur_us").as("dur_us_total"),
            max("dur_us").as("dur_us_max"))
          .orderBy("len_bucket")
      },
      Some(s"""WITH sess AS (SELECT * FROM (${SessionizeOracle})),
              |b AS (SELECT CASE WHEN n_events = 1 THEN 'a_1'
              |    WHEN n_events <= 4 THEN 'b_2_4'
              |    WHEN n_events <= 9 THEN 'c_5_9'
              |    ELSE 'd_10_plus' END AS len_bucket,
              |    n_events, end_us - start_us AS dur_us FROM sess)
              |SELECT len_bucket, count(*) AS n_sessions,
              |  CAST(sum(n_events) AS BIGINT) AS n_events_total,
              |  CAST(sum(dur_us) AS BIGINT) AS dur_us_total,
              |  CAST(max(dur_us) AS BIGINT) AS dur_us_max
              |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)
    )
  )
}

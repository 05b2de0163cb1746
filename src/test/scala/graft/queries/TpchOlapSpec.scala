package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the TPC-H completion batch (Q1..Q22
  * adaptations) and the multi-level grouping surface — properties that
  * hold for ANY data, complementing the DuckDB value-compare at one SF.
  */
class TpchOlapSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  override def afterAll(): Unit = spark.stop()

  private def q(name: String) =
    graft.SparkEntry.registry.find(_.name == name).get.fn(spark, dir)

  test("q1: integer averages are consistent with their sums and counts") {
    q("tpch_q1_pricing_summary").collect().foreach { r =>
      val n = r.getAs[Long]("count_order")
      assert(n > 0)
      assert(r.getAs[Long]("avg_qty_milli") == r.getAs[Long]("sum_qty") * 1000L / n)
      assert(r.getAs[Long]("avg_price_cents") == r.getAs[Long]("sum_base_cents") / n)
      assert(r.getAs[Long]("sum_disc_cents") <= r.getAs[Long]("sum_base_cents"))
    }
  }

  test("q13: the distribution histogram accounts for every customer exactly once") {
    val total = q("tpch_q13_customer_distribution")
      .agg(sum("custdist")).collect().head.getLong(0)
    val nCust = spark.read.parquet(s"$dir/customer.parquet").count()
    assert(total == nCust, s"histogram covers $total of $nCust customers")
  }

  test("q15: every kept supplier shares the one maximal revenue") {
    val rows = q("tpch_q15_top_supplier").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("total_cents")).distinct.length == 1)
  }

  test("q21: a supplier's waits never exceed its late multi-supplier lines") {
    // numwait counts late lines that are also order-latest — re-deriving
    // the upper bound (late lines in multi-supplier F-orders) must
    // dominate it for every supplier
    val waits = q("tpch_q21_waiting_orders").collect()
      .map(r => r.getAs[String]("s_name") -> r.getAs[Long]("numwait")).toMap
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .where(col("o_orderstatus") === "F")
    val nsupp = l.groupBy(col("l_orderkey").as("ok"))
      .agg(countDistinct("l_suppkey").as("ns"))
    val upper = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .join(nsupp, col("l_orderkey") === col("ok"))
      .where(col("ns") >= 2)
      .groupBy("l_suppkey").agg(count(lit(1)).as("n_late"))
      .join(spark.read.parquet(s"$dir/supplier.parquet"),
        col("l_suppkey") === col("s_suppkey"))
      .collect().map(r => r.getAs[String]("s_name") -> r.getAs[Long]("n_late")).toMap
    waits.foreach { case (name, w) =>
      assert(w <= upper.getOrElse(name, 0L), s"$name waits=$w upper=${upper.get(name)}")
    }
  }

  test("rollup: the grand total row equals the full table, levels are nested") {
    val rows = q("agg_rollup_year_priority").collect()
    val nOrders = spark.read.parquet(s"$dir/orders.parquet").count()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1 && grand.head.getAs[Long]("n") == nOrders)
    // each year subtotal equals the sum of its leaves
    val leaves = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
    val subs = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) == "ALL")
    subs.foreach { sr =>
      val y = sr.getString(0)
      val leafN = leaves.filter(_.getString(0) == y).map(_.getAs[Long]("n")).sum
      assert(sr.getAs[Long]("n") == leafN, s"year $y subtotal")
    }
  }

  test("cube: all four grouping levels agree on the grand total") {
    val rows = q("agg_cube_segment_status").collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
      .head.getAs[Long]("n")
    val bySeg = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) == "ALL")
      .map(_.getAs[Long]("n")).sum
    val byStatus = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) != "ALL")
      .map(_.getAs[Long]("n")).sum
    val leaves = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
      .map(_.getAs[Long]("n")).sum
    assert(bySeg == grand && byStatus == grand && leaves == grand)
  }

  test("spearman suffstats: doubled rank sums satisfy n(n+1) exactly") {
    // sum of average ranks over a permutation with ties is always
    // n(n+1)/2, so the doubled-rank sums must equal n(n+1) — for both
    // variables, in every group
    q("stats_spearman_suffstats").collect().foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("sum_rx2") == n * (n + 1))
      assert(r.getAs[Long]("sum_ry2") == n * (n + 1))
    }
  }

  test("gopher rules: keep flag is exactly the conjunction of its rule columns") {
    val bad = q("text_gopher_rules").where(
      col("keep") =!= (col("n_words").between(10, 100000) &&
        col("mean_wl_milli").between(2000, 10000) &&
        col("stop_hits") >= 2).cast("int")).count()
    assert(bad == 0)
  }

  test("lang rebalance: every language keeps a subset, none more than its size") {
    val rows = q("corpus_lang_rebalance").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("kept") <= r.getAs[Long]("orig"))
      assert(r.getAs[Long]("kept") > 0)
    }
  }

  test("curriculum: ranks are a dense 1..n permutation within each language") {
    val byLang = q("text_curriculum_order").groupBy("lang")
      .agg(count(lit(1)).as("n"), max("rank_in_lang").as("mx"),
        min("rank_in_lang").as("mn"), countDistinct("rank_in_lang").as("dr"))
      .collect()
    byLang.foreach { r =>
      assert(r.getAs[Long]("mn") == 1 && r.getAs[Long]("mx") == r.getAs[Long]("n") &&
        r.getAs[Long]("dr") == r.getAs[Long]("n"), r.toString)
    }
  }

  test("hits: total first-pass authority equals the edge count") {
    val total = q("graph_hits_unrolled").agg(sum("auth1")).collect().head.getLong(0)
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val edges = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey", "l_suppkey").distinct().count()
    assert(total == edges)
  }

  test("k-anonymity: group sizes partition the customer table exactly") {
    val total = q("privacy_k_anonymity").agg(sum("n")).collect().head.getLong(0)
    assert(total == spark.read.parquet(s"$dir/customer.parquet").count())
  }

  test("generalization ladder: coarser bands merge groups monotonically") {
    // band widths nest (100 | 1000 | 5000), so each coarse group is a
    // union of fine groups: group count can only fall, the smallest
    // group and the k-violation count can only improve
    val rows = q("privacy_generalization_ladder").orderBy("width").collect()
    assert(rows.map(_.getAs[Long]("width")).toSeq == Seq(100L, 1000L, 5000L))
    rows.sliding(2).foreach { case Array(fine, coarse) =>
      assert(coarse.getAs[Long]("n_groups") <= fine.getAs[Long]("n_groups"))
      assert(coarse.getAs[Long]("min_size") >= fine.getAs[Long]("min_size"))
      assert(coarse.getAs[Long]("n_below_k") <= fine.getAs[Long]("n_below_k"))
      case _ =>
    }
  }

  test("l-diversity: members with orders never exceed the group's k count") {
    val k = q("privacy_k_anonymity")
      .select(col("c_mktsegment"), col("n_name"), col("bal_band"), col("n"))
    val l = q("privacy_l_diversity")
      .select(col("c_mktsegment"), col("n_name"), col("bal_band"), col("n_members"))
    val bad = l.join(k, Seq("c_mktsegment", "n_name", "bal_band"))
      .where(col("n_members") > col("n")).count()
    assert(bad == 0)
  }

  test("walk corpus: every hop is a real edge of the order graph") {
    val e = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sup")).distinct().cache()
    val w = q("graph_walk_corpus").cache()
    val bad1 = w.join(e, w("c0") === e("c") && w("s1") === e("sup"), "left_anti").count()
    val bad2 = w.join(e, w("c2") === e("c") && w("s1") === e("sup"), "left_anti").count()
    val bad3 = w.join(e, w("c2") === e("c") && w("s2") === e("sup"), "left_anti").count()
    assert(bad1 == 0 && bad2 == 0 && bad3 == 0, s"$bad1/$bad2/$bad3 phantom hops")
  }

  test("rake: no phrase contains a stopword, occurrences are positive") {
    val stops = Set("the", "a", "of", "to", "and", "in")
    q("text_rake_keyphrases").collect().foreach { r =>
      val words = r.getAs[String]("phrase").split(" ")
      assert(words.forall(w => !stops(w)), r.toString)
      assert(r.getAs[Long]("n_occ") > 0 && r.getAs[Double]("score") > 0)
    }
  }

  test("bootstrap: resample sizes concentrate around n and means around the truth") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val n = orders.count()
    val trueMeanMilli = orders
      .agg(sum(expr("CAST(round(o_totalprice * 100.0D, 0) AS BIGINT)")), count(lit(1)))
      .collect().head match { case org.apache.spark.sql.Row(s: Long, c: Long) => s * 1000L / c }
    val rows = q("stats_bootstrap_poisson").collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val nEff = r.getAs[Long]("n_eff")
      assert(math.abs(nEff - n) < n / 2, s"resample size $nEff vs $n")
      val m = r.getAs[Long]("mean_millicents")
      assert(math.abs(m - trueMeanMilli).toDouble / trueMeanMilli < 0.2,
        s"bootstrap mean $m vs $trueMeanMilli")
    }
  }

  test("permutation test: b=0 reproduces the true group split exactly") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val trueViews = ev.where(col("event_type") === "view").count()
    val trueClicks = ev.where(col("event_type") === "click").count()
    val b0 = q("stats_permutation_test").where(col("b") === 0).collect().head
    assert(b0.getAs[Long]("n_a") == trueViews && b0.getAs[Long]("n_b") == trueClicks)
  }

  test("mann-whitney: U identities and bounds hold") {
    val r = q("stats_mann_whitney_u").collect().head
    val (n1, n2) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"))
    val (u1, u2) = (r.getAs[Long]("u1_doubled"), r.getAs[Long]("u2_doubled"))
    assert(u1 + u2 == 2 * n1 * n2)
    assert(u1 >= 0 && u1 <= 2 * n1 * n2)
  }

  test("matryoshka: reranking never loses recall vs raw truncation") {
    val plain = q("sim_matryoshka_recall").collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("hits")).toMap
    val rer = q("sim_matryoshka_rerank_recall").collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Long]("hits")).toMap
    rer.foreach { case (qid, h) =>
      assert(h >= plain.getOrElse(qid, 0L), s"query $qid: rerank $h < plain ${plain.get(qid)}")
      assert(h <= 10)
    }
  }

  test("q17: qualifying lines are a strict subset with below-average quantity") {
    val nl = q("tpch_q17_small_quantity").collect().head.getAs[Long]("n_lines")
    assert(nl >= 0)
    val all = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/part.parquet")
        .where(col("p_brand") === "Brand#2" && col("p_type") === "ECONOMY"),
        col("l_partkey") === col("p_partkey"), "left_semi").count()
    assert(nl < all || all == 0, s"threshold kept $nl of $all lines")
  }
}

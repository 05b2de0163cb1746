package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A/B probe for the round-9 text_pack_sequences slowdown (0.40 → 0.62 s):
  * times the REGISTERED two-phase ScalableWindow form against the old
  * single-global-window form it replaced, interleaved in one JVM so
  * JIT/host effects cancel. Spec-only harness per the round-9 verdict —
  * the single-window form is NOT registered (it is the known
  * single-partition scale-killer the lint bans); this tool exists to
  * attribute the local-latency delta, not to bring it back.
  */
object AbPack {
  def main(args: Array[String]): Unit = {
    val s = graft.Sessions.local()
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)

    val registered = graft.SparkEntry.registry.find(_.name == "text_pack_sequences").get.fn

    // the pre-round-9 form: ONE un-partitioned window (single task at scale)
    def singleWindow(d: String) = {
      val L = 512L
      val toks = graft.queries.T(s, d, "documents").select(
        col("doc_id"),
        size(split(col("text"), " +")).cast("long").as("n_tokens"))
      val w = Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      toks
        .withColumn("cum", sum("n_tokens").over(w))
        .select(col("doc_id"), col("n_tokens"), col("cum"),
          expr(s"(cum - n_tokens) div $L").as("first_block"),
          expr(s"(cum - 1) div $L").as("last_block"))
        .withColumn("n_blocks", col("last_block") - col("first_block") + 1)
        .orderBy("doc_id")
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both
    registered(s, d).write.format("noop").mode("overwrite").save()
    singleWindow(d).write.format("noop").mode("overwrite").save()
    val (ta, tb) = (Array.fill(reps)(0.0), Array.fill(reps)(0.0))
    for (i <- 0 until reps) {
      ta(i) = time(registered(s, d).write.format("noop").mode("overwrite").save())
      tb(i) = time(singleWindow(d).write.format("noop").mode("overwrite").save())
    }
    println(f"two-phase (registered): min=${ta.min}%.3f reps=${ta.map(t => f"$t%.3f").mkString(",")}")
    println(f"single-window (old)  : min=${tb.min}%.3f reps=${tb.map(t => f"$t%.3f").mkString(",")}")
    s.stop()
  }
}

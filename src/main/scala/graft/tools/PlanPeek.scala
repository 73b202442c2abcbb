package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan + timing inspector for driver queries (the `tools` tier beside
  * [[graft.Profile]]/[[graft.RecallSweep]] — diagnostics mains, not part of
  * the driver contract). For each named query: the formatted physical plan,
  * the planning time, and a timed `count()`. This is the tool that caught
  * x112's constraint-substitution blowup (77 duplicated `regexp_extract`
  * nodes under the join — see `graft.functions.UrlPolicy`).
  *
  * Usage: `runMain graft.tools.PlanPeek <sfDir> <queryName...>`. Repeat a
  * name to see warm-plan timings. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, dir)
      // time BEFORE explain: explain() itself forces executedPlan, so a
      // timer placed after it would measure a cached val (r19 review)
      val tp0 = System.nanoTime()
      df.queryExecution.executedPlan
      val tPlan = (System.nanoTime() - tp0) / 1e9
      df.explain("formatted")
      val t0 = System.nanoTime()
      val c = df.count()
      println(s"rows=$c  planSec=$tPlan  countSec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Per-operator SQL-metric dump for driver queries (the `tools` tier
  * beside [[PlanPeek]] — diagnostics mains, not part of the driver
  * contract). Executes each named query once, then walks the FINAL
  * adaptive physical plan and prints every operator with its non-zero
  * metrics (rows, build/probe/sort/shuffle times) — the headless stand-in
  * for the UI's SQL tab (guide §7.1; `spark.ui.enabled` stays off in
  * every bench session, so this is how per-operator time is attributed
  * here). Usage: `runMain graft.tools.SqlMetrics <sfDir> <queryName...>`. */
object SqlMetrics {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(graft.util.Tables.MinScanPartitionsConf,
        math.min(cpus.toInt, 16).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()

    // unwrap AQE wrappers so the walk reaches executed operators
    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    def walk(p: SparkPlan, depth: Int): Unit = {
      val ms = p.metrics.toSeq
        .filter(_._2.value > 0)
        .sortBy(-_._2.value)
        .take(6)
        .map { case (k, m) => s"$k=${m.value}" }
        .mkString(" ")
      println(f"${"  " * depth}${p.nodeName}%-38s $ms")
      kids(p).foreach(walk(_, depth + 1))
    }
    names.foreach { n =>
      println(s"===== $n =====")
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val t0 = System.nanoTime()
      // execute THE captured plan (df.count() builds a different
      // QueryExecution and would leave these operators' metrics empty)
      val ep = df.queryExecution.executedPlan
      ep.execute().foreachPartition((_: Iterator[_]) => ())
      println(s"execSec=${(System.nanoTime() - t0) / 1e9}")
      walk(ep, 0)
    }
    spark.stop()
  }
}

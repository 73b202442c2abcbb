package graft

import org.apache.spark.sql.SparkSession

/** Planning-vs-execution attribution harness for the bench's per-query
  * fixed-cost work (round-13 item #1). For each named query it times, on a
  * FRESH first run: DataFrame construction (includes table loads and any
  * driver-side model collects), analysis, optimization, physical planning,
  * and execution — then a full warm second run for the codegen/exchange-reuse
  * delta. Not part of any driver protocol; a local tool.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Profile x9_quality x65_relevance_gate x44_kmeans"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // scan floor capped at 16 — see Bench.scala (mirrors its session)
      .config(graft.util.Tables.MinScanPartitionsConf,
        math.min(cpus.toInt, 16).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    spark.range(100000).groupBy(org.apache.spark.sql.functions.expr("id % 7"))
      .count().collect()

    val names = if (args.nonEmpty) args.toSeq
      else Seq("x9_quality", "x65_relevance_gate", "x44_kmeans", "x71_hybrid_rrf",
        "v2_latest_notification", "q5_latest_order_per_customer")

    // per-stage attribution (SPARK_GRAFT_PROFILE_STAGES=1): stage wall time,
    // task count, and aggregate executor task time — separates scheduling /
    // task-overhead-bound stages (wall >> task-time/cores) from compute
    val stageDetail = sys.env.get("SPARK_GRAFT_PROFILE_STAGES").contains("1")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int, Long)]()
    if (stageDetail) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val wall = (for {s <- i.submissionTime; c <- i.completionTime}
            yield c - s).getOrElse(-1L)
          stages.add((i.stageId, i.name.takeWhile(_ != '\n').take(60),
            wall, i.numTasks, i.taskMetrics.executorRunTime))
        }
      })
    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    println(f"${"query"}%-28s ${"build"}%7s ${"analyze"}%7s ${"optim"}%7s ${"plan"}%7s ${"exec1"}%7s ${"total1"}%7s ${"warm"}%7s")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      System.gc()
      val (tb, df) = t(fn(spark, sfDir))
      val qe = df.queryExecution
      val (ta, _) = t(qe.analyzed)
      val (to, _) = t(qe.optimizedPlan)
      val (tp, _) = t(qe.executedPlan)
      // execute the ALREADY-PLANNED physical plan (df.count() would wrap it
      // in a fresh count aggregate and re-pay analyze/optimize/plan)
      val (te, _) = t(qe.executedPlan.execute().count())
      System.gc()
      val (tw, _) = t(fn(spark, sfDir).count())
      println(f"$name%-28s $tb%7.3f $ta%7.3f $to%7.3f $tp%7.3f $te%7.3f ${tb+ta+to+tp+te}%7.3f $tw%7.3f")
      if (stageDetail) {
        // listener events arrive on the async bus thread; poll until the
        // stage count is stable across a 100 ms window (max 2 s) — a fixed
        // nap loses the race whenever the bus backlog exceeds it, and the
        // largest stage gets dropped or billed to the NEXT query's block
        var prev = -1
        var tries = 0
        while (tries < 20 && stages.size != prev) {
          prev = stages.size
          Thread.sleep(100)
          tries += 1
        }
        import scala.jdk.CollectionConverters._
        val all = stages.asScala.toSeq.sortBy(-_._3)
        println(s"  stages=${all.size} wallSum=${all.map(_._3).sum}ms " +
          s"taskTimeSum=${all.map(_._5).sum}ms")
        all.take(12).foreach { case (id, nm, wall, nt, rt) =>
          println(f"  s$id%-5d $wall%6dms tasks=$nt%-4d taskTime=$rt%6dms  $nm")
        }
        stages.clear()
      }
    }
    spark.stop()
  }
}

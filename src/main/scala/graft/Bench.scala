package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Fixed-work deterministic spin for the host-speed calibration probe:
    * a serial LCG chain — every iteration depends on the last, so the JIT
    * can neither vectorize nor elide it, and the measured time is pure
    * clock-speed-and-contention. Returns the chain's end state (consumed
    * by the caller so the loop is live). */
  private def spin(iters: Long): Long = {
    var x = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < iters) {
      x = x * 6364136223846793005L + 1442695040888963407L
      i += 1
    }
    x
  }

  /** Host-speed calibration probe (BASELINE.md Appendix B §4): the same
    * fixed work timed once on ONE thread (`cal1` — clock speed / thermal
    * state) and once on `threads` concurrent threads (`calN` — co-tenant
    * contention, SMT width, turbo droop at width). No Spark involved: the
    * probe prices the HOST, not the session, so any two bench lines can be
    * normalized against each other without re-running old HEADs (r13, r14,
    * and r17 each needed environment-vs-code adjudication; r17's demanded
    * a full prior-HEAD re-run — this buys the same evidence for one number
    * per run). ~1.5 s single + ~2 s wide on the r18 reference box. */
  private def calibrate(threads: Int): (Double, Double) = {
    val iters = 1000000000L
    val sink = new java.util.concurrent.atomic.AtomicLong(spin(iters / 50))
    val t1 = System.nanoTime()
    sink.addAndGet(spin(iters))
    val cal1 = (System.nanoTime() - t1) / 1e9
    val tN = System.nanoTime()
    val pool = (1 to threads).map(_ => new Thread(() => {
      sink.addAndGet(spin(iters)); ()
    }))
    pool.foreach(_.start())
    pool.foreach(_.join())
    val calN = (System.nanoTime() - tN) / 1e9
    if (sink.get == 42L) println("calibration sentinel") // keep the chain live
    (cal1, calN)
  }

  /** The FROZEN r2 bench suite — the 26 queries behind BASELINE.md's
    * 74.74 s bar (`BENCH_r02.json`, verbatim). The suite has since grown
    * ~4–8 queries per round, so the raw `value` mechanically crosses the
    * 2× gate near ~180 queries with zero code defects; `value_26q` is the
    * same run's total over THIS set — the like-for-like number the gate
    * compares (BASELINE.md Appendix B §5). Frozen by name: never add to
    * it, even if a listed query is later renamed (renaming one means
    * updating the baseline doc, not this list). */
  private val Frozen26: Set[String] = Set(
    "d1_record_projection", "d2_notification_parse", "d5_invalid_json",
    "q1_agg", "q2_topk_revenue", "q3_nation_revenue",
    "q4_customers_no_orders", "q5_latest_order_per_customer",
    "q6_events_hourly", "q7_sessions",
    "t1_batch_counts", "t2_counts_with_meta", "t3_threshold_fail",
    "t4_complete_decision", "t6_overflow_fail",
    "u1_topic_derivation",
    "v1_extract_batch_id", "v2_latest_notification", "v3_batch_lookup_join",
    "v4_missing_batch_id", "v5_unknown_batch_id", "v6_dropped_statuses",
    "v7_late_after_complete", "v8_json_validity", "v10_invalid_records",
    "v11_counts_stream")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // calibrate BEFORE the session exists: Spark's own threads must not
    // contend with the probe
    val (cal1, calN) = calibrate(cpus.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // single-row-group testdata cannot split at the scan; see Tables. The
      // floor is capped at 16: past it, the repartition exchange + per-task
      // overhead on single-row-group sf0.1 scans costs more than the extra
      // parallelism returns (measured round 14: floor 32 → 16 cut an
      // 18-query subset 49.7 → 41.3 s at cpus=32; 8 was within noise of 16)
      .config(graft.util.Tables.MinScanPartitionsConf,
        math.min(cpus.toInt, 16).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // local-experiment conf passthrough (k=v;k=v) — the driver never sets it,
    // so round benches always run the committed session confs above
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k.trim, v.trim)
      })
    // warm the session (JVM, codegen, shuffle machinery) so the first measured
    // query isn't charged for one-time initialization; fixed name order so
    // per-query numbers are comparable across rounds
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    spark.range(100000).groupBy(org.apache.spark.sql.functions.expr("id % 7"))
      .count().collect()
    // prewarm every table load (footer schema, OS page cache, parquet reader
    // classes) so no measured query is the first-toucher — without this the
    // alphabetically-first query per table absorbs the one-time load cost and
    // per-query numbers stop being comparable across rounds (round-13 advice)
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings"))
      try graft.util.Tables.table(spark, sfDir, t).count()
      // a missing table surfaces in its query; fatal errors (OOM, linkage)
      // must still abort — a heap-exhausted JVM would record garbage timings
      catch { case scala.util.control.NonFatal(_) => () }
    // a failed query must be LOUD: recorded in the JSON and fatal to the run's
    // exit code, so bench can never silently mask a regression
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // optional comma-separated allowlist for targeted profiling runs; the
    // driver never sets it, so round benches always measure the full set
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    // min-of-N noise discipline (SCALING.md's cell-time rule): host-load
    // spikes on a shared box only ever ADD time, so the min over repeats is
    // the least-contaminated estimate. Default 2 (BASELINE.md Appendix B §3,
    // adopted round 15 after two consecutive environmental single-pass
    // breaches): pass 1 prices each query cold (plan + janino codegen
    // compile), pass 2 prices it at steady state — which is what a 100 TB
    // deployment pays (one compile per plan, then hours of execution). The
    // headline "value" is the min-of-N total; the pass-1 total is reported
    // alongside as "p1" so the cold number is never hidden. Set
    // SPARK_GRAFT_BENCH_REPEAT=1 to reproduce the old single-pass protocol.
    val repeat = sys.env.get("SPARK_GRAFT_BENCH_REPEAT")
      .map(_.toInt).getOrElse(2).max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val reps = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true } catch {
            case e: Throwable =>
              e.printStackTrace()
              errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
                .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200)
              false
          }
        val t = (System.nanoTime() - t0) / 1e9
        // between-query hygiene (outside the timed section): broadcasts and
        // shuffle state from earlier queries are only reclaimed when the
        // ContextCleaner sees their references collected — without this, late
        // queries pay earlier queries' memory debt and per-query numbers
        // swing wildly run-to-run
        System.gc()
        (t, ok)
      }
      // min over SUCCESSFUL reps only: a failed run aborts early and its
      // near-zero duration would otherwise report as the query's time while
      // an error is also recorded (the error stays recorded either way —
      // a transient failure must remain loud and fatal to the exit code)
      val good = reps.filter(_._2).map(_._1)
      (name, if (good.nonEmpty) good.min else reps.map(_._1).min,
        reps.head._1)
    }
    // centisecond precision, trailing zeros stripped: full-double values made
    // the line ~2.1 KB, and the driver's stdout tail-capture window is 2 KB —
    // the FRONT of the JSON gets clipped, so every byte counts (10 ms
    // granularity is well inside run-to-run variance at sf0.1).
    def ms(v: Double): String = graft.util.JsonNum.compact2(v)
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    // errors is ALWAYS present (empty {} when clean): a fixed-schema consumer
    // that expects the key must not break silently on a green run
    val errJson = errors.map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString(""","errors":{""", ",", "}")
    val total = results.map(_._2).sum
    // pass-1 (cold) total, reported whenever more than one rep ran so the
    // single-pass number stays visible next to the min-of-N headline
    val p1Json = if (repeat > 1)
      s""","p1":${ms(results.map(_._3).sum)}""" else ""
    // basename only: every byte of this line competes with the 2 KB capture
    // window, and the harness records the full sf dir itself
    val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
    // "value" (the headline total) goes LAST: tail capture keeps the END of
    // stdout, so a clipped line loses leading per-query entries, never the
    // total — bench-latest.json below holds the complete copy regardless
    // cal1/calN ride every line (host-speed probe, Appendix B §4) — placed
    // before "value" so tail capture keeps them with the total
    // the frozen-r2-subset total (Appendix B §5): only meaningful when the
    // whole subset actually ran — a SPARK_GRAFT_ONLY run that clips it
    // must not record a too-good number
    val ranNames = results.map(_._1).toSet
    val v26Json = if (Frozen26.subsetOf(ranNames))
      s""","value_26q":${ms(
        results.filter(r => Frozen26(r._1)).map(_._2).sum)}"""
    else ""
    val line = s"""{"metric":"total","unit":"sec","sf":"$sfName",""" +
      s""""queries":$qs$errJson$p1Json$v26Json""" +
      s""","cal1":${ms(cal1)},"calN":${ms(calN)},"value":${ms(total)}}"""
    println(line)
    // also persist to a file: the driver's stdout tail-capture has truncated
    // this line mid-JSON before, losing the total — the file is the robust
    // copy. Anchored to SPARK_GRAFT_BENCH_DIR (falling back to the process
    // cwd) so running the bench from another directory can't strand the file.
    val outDir = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR",
      System.getProperty("user.dir"))
    // create the dir if missing: a bad SPARK_GRAFT_BENCH_DIR must not turn a
    // fully green bench into a nonzero exit AFTER the results printed
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // a SPARK_GRAFT_ONLY-restricted run must NOT clobber the committed
    // full-suite record (it did once: a one-query targeted run overwrote
    // the round record the baseline doc cites) — partial runs get their
    // own file
    val outName = if (only.isDefined) "bench-partial.json"
      else "bench-latest.json"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, outName),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}

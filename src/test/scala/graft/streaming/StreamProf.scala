package graft.streaming

import graft.model.Status
import graft.validation.{JsonValidator, ValidationEngine}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Scratch per-phase profiler for the chunked streaming path (round 12).
  * Replicates the record query's foreachBatch phases over MemoryStream
  * micro-batches and attributes the per-trigger overhead.
  * Run: sbt "Test/runMain graft.streaming.StreamProf". Not a test. */
object StreamProf {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUF", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val recEnc: org.apache.spark.sql.Encoder[graft.BenchRec] =
      org.apache.spark.sql.Encoders.product[graft.BenchRec]

    val topic = "ingest.bench.claims.in"
    def rec(i: Long): graft.BenchRec = {
      val payload =
        if (i % 10 == 9) s"""{"broken"""
        else s"""{"resourceType":"Claim","id":$i}"""
      graft.BenchRec(s"k$i".getBytes, payload.getBytes,
        Seq(graft.BenchHdr("batchId", "b1".getBytes)), topic, 0, i)
    }

    val store = new NotificationSnapshot(spark, None)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    store.update(Seq(
      """{"id":"b1","name":"n","topic":"ingest.bench.claims.in","dataType":"claims","status":"started","expectedRecordCount":100000,"invalidThreshold":-1}""")
      .toDF("v")
      .select(from_json(col("v"), graft.model.Schemas.batchNotification).as("n"))
      .select(col("n.*")))

    val records = MemoryStream[graft.BenchRec]
    val validator = new JsonValidator

    val phases = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      .withDefaultValue(0.0)
    var triggers = 0
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      phases(name) += (System.nanoTime() - t0) / 1e6; r
    }

    val q = records.toDF().writeStream
      .queryName("prof")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sprof").toString + "/q")
      .foreachBatch { (df: DataFrame, _: Long) =>
        triggers += 1
        val snap = phase("snapshot()")(store.snapshot())
        val validated = phase("plan validate")(
          ValidationEngine.validate(df, snap, validator).persist())
        try {
          phase("job1 valid.count")(ValidationEngine.validOutput(validated).count())
          phase("job2 invalid.count")(ValidationEngine.invalidOutput(validated).count())
          phase("job3 counts.agg") {
            ValidationEngine.countsOutput(validated)
              .groupBy("batchId").agg(sum(when(col("isValid"), 1L).otherwise(0L)),
                sum(when(col("isValid"), 0L).otherwise(1L))).collect()
            ()
          }
        } finally { phase("unpersist")(validated.unpersist()); () }
      }
      .start()

    // warm
    records.addData((0L until 1000L).map(rec))
    q.processAllAvailable()
    phases.clear(); triggers = 0

    val chunk = 10000
    val n = 20
    val t0 = System.nanoTime()
    (0 until n).foreach { c =>
      records.addData((c.toLong * chunk until (c + 1).toLong * chunk).map(rec))
      q.processAllAvailable()
    }
    val total = (System.nanoTime() - t0) / 1e9
    q.stop()
    println(f"PROF total=${total}%.2f s for ${n * chunk} records in $triggers triggers (${(n * chunk / total).toLong} rps)")
    val accounted = phases.values.sum / 1000
    phases.foreach { case (k, v) =>
      println(f"PROF   $k%-22s ${v / 1000}%6.2f s  (${v / triggers}%6.1f ms/trigger)")
    }
    println(f"PROF   unaccounted (engine)   ${total - accounted}%6.2f s  (${(total - accounted) * 1000 / triggers}%6.1f ms/trigger)")
    spark.stop()
  }
}

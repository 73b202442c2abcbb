package graft.jobs

import graft.SparkSpec
import graft.model.InvalidRecord
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** D3/D5 serializer fidelity matrix — the twin of the reference's
  * HriRecordSerializerTest.scala:101-123 and HriRecordDeserializerTest
  * .scala:126-149: null key / null value / null headers and non-ASCII (UTF-8)
  * payloads must survive the Kafka projections byte-exact. */
class SerializerSpec extends AnyFunSuite with SparkSpec with Matchers {

  import graft.model.Schemas

  private def record(key: Array[Byte], value: Array[Byte],
      headers: Seq[(String, Array[Byte])]): Row =
    Row(key, value,
      if (headers == null) null else headers.map { case (k, v) => Row(k, v) },
      "ingest.t1.di.in", 0, 0L)

  private def recordsDf(rows: Row*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Schemas.hriRecord)

  test("D3: null key, null value, null headers, and UTF-8 bytes pass through untouched") {
    val utf8 = "中文 żółć émoji é".getBytes("UTF-8")
    val df = recordsDf(
      record(null, utf8, Seq("batchId" -> "b-中".getBytes("UTF-8"))),
      record("k".getBytes("UTF-8"), null, null),
      record(null, null, Seq.empty))
    val out = ValidationJob.validRecordProjection(df).collect()

    out(0).get(0).asInstanceOf[AnyRef] shouldBe null
    out(0).getAs[Array[Byte]](1) shouldBe utf8
    val hs = out(0).getSeq[Row](2)
    hs should have size 1
    hs.head.getString(0) shouldBe "batchId"
    new String(hs.head.getAs[Array[Byte]](1), "UTF-8") shouldBe "b-中"

    new String(out(1).getAs[Array[Byte]](0), "UTF-8") shouldBe "k"
    out(1).get(1).asInstanceOf[AnyRef] shouldBe null
    out(1).get(2).asInstanceOf[AnyRef] shouldBe null

    out(2).get(0).asInstanceOf[AnyRef] shouldBe null
    out(2).get(1).asInstanceOf[AnyRef] shouldBe null
    out(2).getSeq[Row](2) shouldBe empty
  }

  test("D5: JSON body is UTF-8; batchId echoes as the lone header; null batchId -> null headers") {
    import spark.implicits._
    val df = Seq(
      InvalidRecord("坏记录 \"quoted\"", "ingest.t1.di.in", 3, 42L, "batch-中-1"),
      InvalidRecord("no batch", "ingest.t1.di.in", 0, 7L, null))
      .toDF()
    val out = ValidationJob.invalidRecordProjection(df).collect()

    out.foreach(_.isNullAt(0) shouldBe true) // null key always

    val body = new String(out(0).getAs[Array[Byte]](1), "UTF-8")
    body should include(""""failure":"坏记录 \"quoted\"""")
    body should include(""""batchId":"batch-中-1"""")
    val hs = out(0).getSeq[Row](2)
    hs should have size 1
    hs.head.getString(0) shouldBe "batchId"
    new String(hs.head.getAs[Array[Byte]](1), "UTF-8") shouldBe "batch-中-1"

    out(1).get(2).asInstanceOf[AnyRef] shouldBe null // D5: missing batchId -> no header at all
    new String(out(1).getAs[Array[Byte]](1), "UTF-8") should include(""""offset":7""")
  }

  test("kafkaSaslOptions: SASL_SSL exactly when a password is set; JAAS-escaped") {
    ValidationJob.kafkaSaslOptions(None) shouldBe empty

    val sasl = ValidationJob.kafkaSaslOptions(Some("s3cr3t"))
    sasl("kafka.security.protocol") shouldBe "SASL_SSL"
    sasl("kafka.sasl.mechanism") shouldBe "PLAIN"
    sasl("kafka.sasl.jaas.config") should include("""username="token" password="s3cr3t";""")
    sasl("kafka.ssl.protocol") shouldBe "TLSv1.2"
    sasl should not contain key("kafka.group.id") // consumer-only prop, not SASL

    // quotes/backslashes in an API key must not corrupt the JAAS line
    val tricky = ValidationJob.kafkaSaslOptions(Some("""p"w\x"""))
    tricky("kafka.sasl.jaas.config") should include("""password="p\"w\\x";""")
  }

  test("kafkaGroupId: reference id for the record source; role-suffixed for the others") {
    ValidationJob.kafkaGroupId("ingest.t1.di.in") shouldBe
      Map("kafka.group.id" -> "hri-validation-ingest.t1.di.in-ingest.t1.di.out")
    // concurrent queries must never share one group id
    ValidationJob.kafkaGroupId("ingest.t1.di.in", "notifications")("kafka.group.id") shouldBe
      "hri-validation-ingest.t1.di.in-ingest.t1.di.out-notifications"
    ValidationJob.kafkaGroupId("ingest.t1.di.in", "tracker")("kafka.group.id") should
      endWith("-tracker")
  }
}

// TEST-ONLY fakes of the kafka-clients surface KafkaTxnProducerFactory binds
// to reflectively. The sandbox has no broker and no kafka-clients jar, which
// would leave the factory's reflective plumbing (props assembly, fencing call
// order, record/header construction, partition clamping, the incremental
// marker scan) as dead code no test exercises; these classes carry the EXACT
// fully-qualified names and method signatures the reflection looks up, backed
// by an in-process cluster with transactional semantics, so the production
// factory runs end-to-end in `sbt test`. Test scope only — never shipped.
package org.apache.kafka

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** In-process "cluster" behind the fakes, keyed by bootstrap.servers so
  * independent tests get independent brokers. Commit is atomic under the
  * cluster lock, so the committed log IS the read-committed view. */
object FakeCluster {
  final class Cluster {
    var partitionsPerTopic: Int = 4
    val log = mutable.Map.empty[(String, Int), mutable.ArrayBuffer[(Array[Byte], Array[Byte], Seq[(String, Array[Byte])])]]
    private val generations = mutable.Map.empty[String, Long].withDefaultValue(0L)
    var recordsPolled: Long = 0L // for incremental-scan assertions
    // simulates a degraded broker connection: polls return empty while the
    // end offset stays ahead of the position (the scan-deadline case)
    @volatile var stallPolls: Boolean = false
    // simulates a tail of aborted transactions occupying offsets after the
    // committed log: endOffsets includes them, and a read_committed poll
    // over them returns ZERO records while the position advances one
    // offset per poll (the abort-dense-segment case the stall guard must
    // NOT misread as a dead connection)
    @volatile var abortedTailOffsets: Long = 0L

    def fence(txnId: String): Long = synchronized {
      val g = generations(txnId) + 1; generations(txnId) = g; g
    }
    def stillCurrent(txnId: String, gen: Long): Boolean = synchronized {
      generations(txnId) == gen
    }
    def commit(entries: Seq[(String, Int, Array[Byte], Array[Byte], Seq[(String, Array[Byte])])]): Unit =
      synchronized {
        entries.foreach { case (t, p, k, v, h) =>
          log.getOrElseUpdate((t, p), mutable.ArrayBuffer.empty) += ((k, v, h))
        }
      }
    def endOffset(topic: String, p: Int): Long = synchronized {
      log.get((topic, p)).map(_.size.toLong).getOrElse(0L)
    }
    def read(topic: String, p: Int, from: Long, until: Long): Seq[Array[Byte]] =
      synchronized {
        recordsPolled += until - from
        log.get((topic, p)).map(_.slice(from.toInt, until.toInt).map(_._1).toSeq)
          .getOrElse(Seq.empty)
      }
    def committedValues(topic: String): Seq[String] = synchronized {
      log.keys.filter(_._1 == topic).toSeq.sorted.flatMap(k =>
        log(k).map(r => if (r._2 == null) null else new String(r._2, "UTF-8")))
    }
    def committedKeys(topic: String): Seq[String] = synchronized {
      log.keys.filter(_._1 == topic).toSeq.sorted.flatMap(k =>
        log(k).map(r => if (r._1 == null) null else new String(r._1, "UTF-8")))
    }
  }
  private val registry = new java.util.concurrent.ConcurrentHashMap[String, Cluster]()
  def get(bootstrap: String): Cluster =
    registry.computeIfAbsent(bootstrap, _ => new Cluster)
  def reset(bootstrap: String): Cluster = {
    registry.remove(bootstrap); get(bootstrap)
  }
}

package common {
  class TopicPartition(t: String, p: Int) {
    def topic(): String = t
    def partition(): Int = p
    override def equals(o: Any): Boolean = o match {
      case tp: TopicPartition => tp.topic() == t && tp.partition() == p
      case _ => false
    }
    override def hashCode(): Int = (t, p).##
    override def toString = s"$t-$p"
  }
  package header.internals {
    class RecordHeader(k: String, v: Array[Byte]) {
      def key(): String = k
      def value(): Array[Byte] = v
    }
  }
}

package clients.producer {
  class ProducerRecord[K, V](t: String, p: Integer, k: Object, v: Object,
      h: java.lang.Iterable[AnyRef]) {
    def topic(): String = t
    def partition(): Integer = p
    def keyBytes: Array[Byte] = k.asInstanceOf[Array[Byte]]
    def valueBytes: Array[Byte] = v.asInstanceOf[Array[Byte]]
    def headerSeq: Seq[(String, Array[Byte])] =
      if (h == null) Seq.empty
      else h.asScala.toSeq.map { hd =>
        val rh = hd.asInstanceOf[org.apache.kafka.common.header.internals.RecordHeader]
        (rh.key(), rh.value())
      }
  }

  class KafkaProducer[K, V](props: java.util.Properties) {
    private val cluster = FakeCluster.get(props.getProperty("bootstrap.servers"))
    private val txnId = props.getProperty("transactional.id")
    require(txnId != null, "fake producer requires transactional.id")
    require(props.getProperty("enable.idempotence") == "true",
      "transactional producer must be idempotent")
    val properties: java.util.Properties = props
    private var gen: Long = -1L
    private var inTxn = false
    private val buffer =
      mutable.ArrayBuffer.empty[(String, Int, Array[Byte], Array[Byte], Seq[(String, Array[Byte])])]

    def initTransactions(): Unit = { gen = cluster.fence(txnId) }
    def beginTransaction(): Unit = {
      require(gen >= 0, "initTransactions must run first")
      inTxn = true
    }
    def send(rec: ProducerRecord[_, _]): java.util.concurrent.Future[AnyRef] = {
      require(inTxn, "send outside transaction")
      val p = Option(rec.partition()).map(_.intValue()).getOrElse(0)
      buffer += ((rec.topic(), p, rec.keyBytes, rec.valueBytes, rec.headerSeq))
      null
    }
    def partitionsFor(topic: String): java.util.List[AnyRef] =
      (0 until cluster.partitionsPerTopic)
        .map(p => new FakePartitionInfo(p): AnyRef).asJava
    def commitTransaction(): Unit = {
      if (!cluster.stillCurrent(txnId, gen))
        throw new IllegalStateException(s"producer fenced: $txnId")
      cluster.commit(buffer.toSeq)
      buffer.clear(); inTxn = false
    }
    def abortTransaction(): Unit = { buffer.clear(); inTxn = false }
    def close(): Unit = ()
  }

  class FakePartitionInfo(p: Int) {
    def partition(): Int = p
  }
}

package clients.consumer {
  import org.apache.kafka.common.TopicPartition

  class FakeConsumerRecord(k: Array[Byte]) {
    def key(): Array[Byte] = k
  }

  class KafkaConsumer[K, V](props: java.util.Properties) {
    require(props.getProperty("isolation.level") == "read_committed",
      "marker scans must be read_committed")
    private val cluster = FakeCluster.get(props.getProperty("bootstrap.servers"))
    private var assigned: Seq[TopicPartition] = Seq.empty
    private val positions = mutable.Map.empty[TopicPartition, Long]

    def partitionsFor(topic: String): java.util.List[AnyRef] =
      (0 until cluster.partitionsPerTopic)
        .map(p => new org.apache.kafka.clients.producer.FakePartitionInfo(p): AnyRef)
        .asJava
    def assign(tps: java.util.Collection[_]): Unit = {
      assigned = tps.asScala.toSeq.map(_.asInstanceOf[TopicPartition])
      assigned.foreach(tp => positions.getOrElseUpdate(tp, 0L))
    }
    def seek(tp: TopicPartition, offset: Long): Unit = positions(tp) = offset
    def endOffsets(tps: java.util.Collection[_]): java.util.Map[AnyRef, java.lang.Long] = {
      val m = new java.util.HashMap[AnyRef, java.lang.Long]()
      tps.asScala.foreach { t =>
        val tp = t.asInstanceOf[TopicPartition]
        m.put(tp.asInstanceOf[AnyRef],
          java.lang.Long.valueOf(cluster.endOffset(tp.topic(), tp.partition())
            + cluster.abortedTailOffsets))
      }
      m
    }
    def position(tp: TopicPartition): Long = positions(tp)
    def poll(d: java.time.Duration): java.lang.Iterable[AnyRef] = {
      val out = mutable.ArrayBuffer.empty[AnyRef]
      if (cluster.stallPolls) return out.asJava
      assigned.foreach { tp =>
        val end = cluster.endOffset(tp.topic(), tp.partition())
        val from = positions(tp)
        if (end > from) {
          cluster.read(tp.topic(), tp.partition(), from, end)
            .foreach(k => out += new FakeConsumerRecord(k))
          positions(tp) = end
        } else if (from < end + cluster.abortedTailOffsets) {
          // abort-dense tail: no records surface under read_committed, but
          // the position steps past one aborted offset per poll
          positions(tp) = from + 1
        }
      }
      out.asJava
    }
    def close(): Unit = ()
  }
}

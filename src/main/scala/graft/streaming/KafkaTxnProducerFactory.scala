package graft.streaming

/** [[TxnProducerFactory]] bound to real Kafka through the deployment's
  * kafka-clients jar, resolved REFLECTIVELY at runtime.
  *
  * Why reflection: this library compiles against the Spark jars alone —
  * kafka-clients ships with the `spark-sql-kafka` connector at deployment
  * (the same jars that make `.format("kafka")` resolvable), and is absent
  * from the build (and from this sandbox, which has no broker at all). The
  * reflective binding keeps the compile classpath connector-free while
  * remaining fully functional wherever the connector jars are present; a
  * missing jar fails fast at [[open]]/[[committedPartitions]] with a clear
  * ClassNotFoundException naming kafka-clients.
  *
  * Producer side (executors): `KafkaProducer` with `transactional.id`,
  * idempotence, `acks=all`, byte-array serializers;
  * `initTransactions()` runs in [[open]] — that IS the fencing handshake
  * [[TxnProducerFactory.open]] requires. Consumer side (driver):
  * `KafkaConsumer` pinned `isolation.level=read_committed` scanning the
  * marker topic start-to-end — aborted markers are invisible, so the
  * returned set contains exactly the partitions whose epoch transaction
  * committed.
  *
  * `clientOptions` uses the same `kafka.`-prefixed convention as the rest of
  * `ValidationJob` (e.g. `kafka.compression.type`), so the SASL_SSL and
  * producer-tuning maps drop in unchanged; the prefix is stripped here.
  */
final case class KafkaTxnProducerFactory(
    bootstrapServers: String,
    clientOptions: Map[String, String] = Map.empty) extends TxnProducerFactory {

  private def stripped: Map[String, String] =
    clientOptions.map { case (k, v) => k.stripPrefix("kafka.") -> v }

  @transient private lazy val recordCtor = {
    val cls = Class.forName("org.apache.kafka.clients.producer.ProducerRecord")
    cls.getConstructor(classOf[String], classOf[Integer], classOf[Object],
      classOf[Object], classOf[java.lang.Iterable[_]])
  }

  @transient private lazy val headerCtor =
    Class.forName("org.apache.kafka.common.header.internals.RecordHeader")
      .getConstructor(classOf[String], classOf[Array[Byte]])

  override def open(transactionalId: String): TxnProducer = {
    val props = new java.util.Properties()
    props.put("bootstrap.servers", bootstrapServers)
    props.put("enable.idempotence", "true")
    props.put("acks", "all")
    props.put("key.serializer",
      "org.apache.kafka.common.serialization.ByteArraySerializer")
    props.put("value.serializer",
      "org.apache.kafka.common.serialization.ByteArraySerializer")
    stripped.foreach { case (k, v) => props.put(k, v) }
    props.put("transactional.id", transactionalId)
    val cls = Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
    val producer = cls.getConstructor(classOf[java.util.Properties])
      .newInstance(props).asInstanceOf[AnyRef]
    def call(name: String): Unit =
      cls.getMethod(name).invoke(producer)
    val sendMethod = cls.getMethod("send",
      Class.forName("org.apache.kafka.clients.producer.ProducerRecord"))
    val partitionsForM = cls.getMethod("partitionsFor", classOf[String])
    call("initTransactions") // the fencing handshake

    new TxnProducer {
      def begin(): Unit = call("beginTransaction")
      def send(topic: String, partition: Option[Int], key: Array[Byte],
          value: Array[Byte], headers: Seq[(String, Array[Byte])]): Unit = {
        val hs = new java.util.ArrayList[AnyRef](headers.size)
        headers.foreach { case (k, v) => hs.add(headerCtor.newInstance(k, v)) }
        // explicit routing clamps into the topic's partition count — fewer
        // marker partitions than task parallelism degrades to residue-class
        // pinning (see TransactionalEpochSink's LSO note), never an error
        val part: Integer = partition.map { p =>
          val n = partitionsForM.invoke(producer, topic)
            .asInstanceOf[java.util.List[_]].size
          Integer.valueOf(p % n)
        }.orNull
        val rec = recordCtor.newInstance(topic, part, key, value, hs)
        sendMethod.invoke(producer, rec) // Future ignored: commit() confirms
      }
      def commit(): Unit = call("commitTransaction")
      def abort(): Unit = call("abortTransaction")
      def close(): Unit = call("close")
    }
  }

  override def committedPartitions(markerTopic: String, txnIdBase: String,
      epochId: Long): Set[Int] =
    scanMarkers(markerTopic, txnIdBase, epochId, None)

  /** The authoritative post-fence check: scan ONLY the marker-topic
    * partition this pid's marker was routed to — the one partition whose
    * LSO the caller's open() has just cleared of unresolved transactions. */
  override def committed(markerTopic: String, txnIdBase: String,
      epochId: Long, partitionId: Int): Boolean =
    scanMarkers(markerTopic, txnIdBase, epochId, Some(partitionId))
      .contains(partitionId)

  private def scanMarkers(markerTopic: String, txnIdBase: String,
      epochId: Long, onlyPartition: Option[Int]): Set[Int] = {
    val props = new java.util.Properties()
    props.put("bootstrap.servers", bootstrapServers)
    props.put("key.deserializer",
      "org.apache.kafka.common.serialization.ByteArrayDeserializer")
    props.put("value.deserializer",
      "org.apache.kafka.common.serialization.ByteArrayDeserializer")
    stripped.foreach { case (k, v) => props.put(k, v) }
    // read_committed is the POINT — an aborted epoch's marker must stay
    // invisible so its partition rewrites; pinned after clientOptions so a
    // stray option can never weaken it
    props.put("isolation.level", "read_committed")
    props.put("enable.auto.commit", "false")
    val cls = Class.forName("org.apache.kafka.clients.consumer.KafkaConsumer")
    val consumer = cls.getConstructor(classOf[java.util.Properties])
      .newInstance(props).asInstanceOf[AnyRef]
    try {
      val infos = cls.getMethod("partitionsFor", classOf[String])
        .invoke(consumer, markerTopic).asInstanceOf[java.util.List[AnyRef]]
      if (infos == null || infos.isEmpty) return Set.empty // topic not created yet
      val tpCls = Class.forName("org.apache.kafka.common.TopicPartition")
      val tpCtor = tpCls.getConstructor(classOf[String], classOf[Int])
      val tps = new java.util.ArrayList[AnyRef]()
      // single-partition mode clamps exactly like the producer's routing,
      // so check and send always agree on the marker's home partition
      val wanted = onlyPartition.map(p => Integer.valueOf(p % infos.size))
      infos.forEach { info =>
        val p = info.getClass.getMethod("partition").invoke(info)
          .asInstanceOf[Integer]
        if (wanted.forall(_ == p)) tps.add(tpCtor.newInstance(markerTopic, p))
      }
      cls.getMethod("assign", classOf[java.util.Collection[_]])
        .invoke(consumer, tps)
      cls.getMethod("seekToBeginning", classOf[java.util.Collection[_]])
        .invoke(consumer, tps)
      val ends = cls.getMethod("endOffsets", classOf[java.util.Collection[_]])
        .invoke(consumer, tps).asInstanceOf[java.util.Map[AnyRef, java.lang.Long]]
      val positionM = cls.getMethod("position", tpCls)
      val pollM = cls.getMethod("poll", classOf[java.time.Duration])
      val found = scala.collection.mutable.Set.empty[Int]
      def drained(): Boolean = {
        var all = true
        tps.forEach { tp =>
          val pos = positionM.invoke(consumer, tp).asInstanceOf[java.lang.Long]
          if (pos < ends.get(tp)) all = false
        }
        all
      }
      while (!drained()) {
        val records = pollM.invoke(consumer, java.time.Duration.ofMillis(500))
          .asInstanceOf[java.lang.Iterable[AnyRef]]
        records.forEach { rec =>
          val key = rec.getClass.getMethod("key").invoke(rec)
            .asInstanceOf[Array[Byte]]
          if (key != null) {
            val k = new String(key, java.nio.charset.StandardCharsets.UTF_8)
            TransactionalEpochSink.parseMarker(k, txnIdBase, epochId)
              .foreach(found += _)
          }
        }
      }
      found.toSet
    } finally {
      cls.getMethod("close").invoke(consumer)
    }
  }
}

package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Randomized model check of [[InMemoryTxnBroker]] — the reference
  * implementation the exactly-once specs trust, so its transactional
  * semantics get adversarial interleavings, not just the happy paths:
  * random sequences of open/begin/send/commit/abort across several
  * transactional ids, including operations on FENCED (superseded) handles,
  * are replayed against a plain in-memory model. Invariants after every
  * step: the committed log equals the model's (the log only ever grows by
  * whole committed transactions), fenced handles always throw on
  * begin/send/commit and never publish, abort never throws. Seeded, so
  * failures replay. */
class TxnBrokerModelSpec extends AnyFunSuite with Matchers {

  private val Topic = "t"

  test("randomized interleavings preserve commit atomicity and fencing") {
    val rnd = new scala.util.Random(97)
    for (iter <- 0 until 100) {
      val brokerId = s"model-$iter"
      InMemoryTxnBroker.remove(brokerId)
      val broker = InMemoryTxnBroker.get(brokerId)
      val ids = Seq("id-a", "id-b", "id-c")
      // model state per id: latest live handle + its txn flag + its buffer
      val latest = scala.collection.mutable.Map.empty[String, TxnProducer]
      val inTxn = scala.collection.mutable.Map.empty[String, Boolean]
      val buffer = scala.collection.mutable.Map.empty[String, Vector[String]]
      val fenced = scala.collection.mutable.ArrayBuffer.empty[TxnProducer]
      val log = scala.collection.mutable.ArrayBuffer.empty[String]
      var counter = 0

      def committedValues(): Seq[String] =
        broker.committed(Topic).map { case (_, v, _) => new String(v, "UTF-8") }

      for (_ <- 0 until 120) {
        val id = ids(rnd.nextInt(ids.size))
        rnd.nextInt(6) match {
          case 0 => // OPEN: supersede (and fence) the current handle
            latest.get(id).foreach(fenced += _)
            latest(id) = broker.open(id)
            inTxn(id) = false
            buffer(id) = Vector.empty
          case 1 => latest.get(id).foreach { h => // BEGIN
            if (inTxn(id)) intercept[IllegalArgumentException] { h.begin() }
            else { h.begin(); inTxn(id) = true }
          }
          case 2 => latest.get(id).foreach { h => // SEND
            val v = s"v$counter"; counter += 1
            if (!inTxn(id))
              intercept[IllegalArgumentException] {
                h.send(Topic, None, null, v.getBytes("UTF-8"), Nil)
              }
            else {
              h.send(Topic, None, null, v.getBytes("UTF-8"), Nil)
              buffer(id) = buffer(id) :+ v
            }
          }
          case 3 => latest.get(id).foreach { h => // COMMIT
            if (!inTxn(id)) intercept[IllegalArgumentException] { h.commit() }
            else {
              h.commit()
              log ++= buffer(id)
              buffer(id) = Vector.empty
              inTxn(id) = false
            }
          }
          case 4 => latest.get(id).foreach { h => // ABORT: never throws
            h.abort(); buffer(id) = Vector.empty; inTxn(id) = false
          }
          case 5 if fenced.nonEmpty => // a ZOMBIE handle tries to act
            val z = fenced(rnd.nextInt(fenced.size))
            rnd.nextInt(4) match {
              case 0 => intercept[IllegalStateException] { z.begin() }
              case 1 => intercept[IllegalStateException] {
                z.send(Topic, None, null, "zombie".getBytes("UTF-8"), Nil)
              }
              case 2 => intercept[IllegalStateException] { z.commit() }
              case 3 => z.abort() // abort is always safe
            }
          case _ => ()
        }
        // THE invariant: read-committed view == whole committed transactions,
        // in commit order; zombie writes never appear
        committedValues() shouldBe log.toSeq
      }
      InMemoryTxnBroker.remove(brokerId)
    }
  }
}

package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Concurrency model check for [[KafkaTxnProducerFactory.MarkerScanCache]]'s
  * `scanWith` — the choreography `scanMarkers` runs on every epoch replay
  * check. The exactly-once property rides entirely on one invariant:
  *
  *   a scan for (base, epoch) must return EVERY marker of that (base,
  *   epoch) appended to the log before the scan read its end offset —
  *   a lost marker means a committed partition looks uncommitted and the
  *   sink re-publishes it (duplicate delivery).
  *
  * The hard part is concurrency: scans at wildly different epochs share the
  * cache entry (a zombie pre-rollback scanner races the restarted run — the
  * deep-rollback scenario `ensureAnswerable` exists for), and each scan
  * prunes its own horizon, so interleavings exist where a high-epoch prune
  * removes keys a low-epoch scan's cached prefix still needs (the
  * validation-retry in `scanWith` is what defends this). This spec hammers
  * one cache entry from many threads scanning at divergent epochs over a
  * shared append-only log and asserts the invariant on every single scan.
  * Runs are seeded; the writer/scanner schedule is nondeterministic by
  * design (that is the point of a model check under real threads). */
class MarkerScanCacheModelSpec extends AnyFunSuite with Matchers {

  private val Cache = KafkaTxnProducerFactory.MarkerScanCache

  test("no interleaving of concurrent divergent-epoch scans loses a seen marker") {
    val key = s"model-${java.util.UUID.randomUUID()}"
    val base = "jobX"
    val window = 100L // small replay window → prunes actually bite
    val log = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val scansDone = new java.util.concurrent.atomic.AtomicInteger

    // writer: markers for ever-growing epochs of `base` (pids 0/1), plus
    // other-base noise that pruning must never confuse with ours. Daemon +
    // stop-flag so a scanner dying can never leave it spinning past the
    // test, and size-capped: CopyOnWriteArrayList.add is O(n), so an
    // unthrottled writer makes the check O(n²) in log length on a slow host
    val maxEpoch = new java.util.concurrent.atomic.AtomicLong
    val stop = new java.util.concurrent.atomic.AtomicBoolean
    val writer = new Thread(() => {
      var epoch = 0L
      while (scansDone.get() < 800 && !stop.get()) {
        if (log.size() < 30000) {
          log.add(TransactionalEpochSink.markerKey(base, epoch, (epoch % 2).toInt))
          log.add(TransactionalEpochSink.markerKey("otherJob", epoch, 0))
          maxEpoch.set(epoch)
          epoch += 1
        }
        if (epoch % 7 == 0 || log.size() >= 30000) Thread.`yield`()
      }
    })
    writer.setDaemon(true)

    def scanAt(epoch: Long): Unit = {
      var endSeen = 0
      val keys = Cache.scanWith(key, base, epoch, window) { start =>
        endSeen = log.size()
        val fresh = (start.toInt until endSeen).map(log.get).toSet
        (endSeen.toLong, fresh)
      }
      // the invariant: every marker of (base, epoch) in log[0, endSeen)
      // must be in the answer — regardless of what other threads pruned
      // or reset while we scanned
      val expected = (0 until endSeen).map(log.get)
        .flatMap(TransactionalEpochSink.parseMarker(_, base, epoch)).toSet
      val got = keys.flatMap(TransactionalEpochSink.parseMarker(_, base, epoch))
      if (!expected.subsetOf(got))
        failures.add(s"epoch=$epoch end=$endSeen missing=${expected -- got}")
      scansDone.incrementAndGet()
    }

    val scanners = (0 until 8).map { t =>
      val th = new Thread(() => {
        val rnd = new java.util.Random(1000 + t)
        try (0 until 100).foreach { _ =>
          val hi = math.max(1L, maxEpoch.get())
          // mostly recent epochs (they drag the prune horizon up);
          // every few scans a DEEP low epoch — the rollback far below
          // someone else's horizon that forces resets mid-traffic
          val epoch =
            if (rnd.nextInt(4) == 0) rnd.nextInt(3).toLong
            else math.max(0L, hi - rnd.nextInt(5))
          scanAt(epoch)
        } catch {
          // surface a dead scanner as a first-class failure instead of a
          // bare count mismatch (and release the writer's stop condition)
          case e: Throwable => failures.add(s"scanner $t died: $e")
        }
      })
      th.setDaemon(true)
      th
    }

    writer.start(); scanners.foreach(_.start())
    scanners.foreach(_.join(120000))
    stop.set(true); writer.join(120000)
    failures.asInstanceOf[java.util.Collection[String]] shouldBe empty
    scansDone.get() shouldBe 800
  }

  test("scanWith prunes its own base below the horizon but never another base's keys") {
    val key = s"model-${java.util.UUID.randomUUID()}"
    val log = new java.util.concurrent.CopyOnWriteArrayList[String]()
    (0L until 10L).foreach { e =>
      log.add(TransactionalEpochSink.markerKey("a", e, 0))
      log.add(TransactionalEpochSink.markerKey("b", e, 0))
    }
    def scan(base: String, epoch: Long, window: Long): Set[String] =
      Cache.scanWith(key, base, epoch, window) { start =>
        (log.size().toLong, (start.toInt until log.size()).map(log.get).toSet)
      }
    scan("a", 9L, 3L) // prunes a's keys below epoch 6
    val view = Cache.snapshot(key)._3
    view.count(_.startsWith("a/")) shouldBe 4 // epochs 6..9
    view.count(_.startsWith("b/")) shouldBe 10 // untouched
    // and a deep-rollback query on the pruned base still answers correctly
    // (reset + full re-read): epoch 2's marker is found again
    scan("a", 2L, 3L) should contain(TransactionalEpochSink.markerKey("a", 2L, 0))
  }
}

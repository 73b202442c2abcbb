package graft.corpus

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the classifier plane's contracts across random
  * corpora (sizes, vocabularies, class balances, NULL-text rates, learning
  * rates, iteration counts the fixture specs never cover):
  *
  *  - trained weights and bias are EXACTLY the collections referee's
  *    (the fixed-point arithmetic contract the x76 oracle replays in SQL),
  *    at any iteration count;
  *  - scored margins are the exact fixed-point referee margins;
  *  - the Pareto resample's keep decision matches the referee's
  *    rounded->= arithmetic row-for-row, and is INVARIANT to retraining
  *    (the draw depends only on the namespaced identity).
  *
  * Sample count is bounded (each trial trains a model = several Spark jobs). */
object ClassifierProperties extends Properties("classifier") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.session

  private case class Fixture(rows: List[(Long, String, String)],
      positives: Set[String], buckets: Int, lr: Double, iters: Int)

  private val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh",
    "", "é", "naïve", "ZZ")

  private val fixtureGen: Gen[Fixture] = for {
    n <- Gen.choose(10, 50)
    nSrc <- Gen.choose(2, 6)
    nPos <- Gen.choose(1, 2)
    buckets <- Gen.oneOf(16, 32, 64)
    lr <- Gen.oneOf(0.1, 0.3, 0.5, 1.0)
    iters <- Gen.choose(1, 3)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield {
    val rnd = new scala.util.Random(seed)
    val rows = (0L until n.toLong).map { id =>
      val text =
        if (rnd.nextDouble() < 0.08) null // NULL text: bias-only doc
        else Seq.fill(rnd.nextInt(14))(words(rnd.nextInt(words.size)))
          .mkString(" ")
      (id, s"src${rnd.nextInt(nSrc)}", text)
    }.toList
    Fixture(rows, (0 until nPos).map(i => s"src$i").toSet, buckets, lr, iters)
  }

  private def df(f: Fixture) = {
    val s = spark
    import s.implicits._
    f.rows.map { case (id, src, t) => (id, src, Option(t)) }
      .toDF("doc_id", "source", "text")
  }

  // ---- the referee: the same arithmetic ClassifierSpec pins, kept here in
  // ---- one place for property-scale reuse
  private def bucketOf(t: String, buckets: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Integer.parseInt(hex.substring(0, 4), 16) % buckets
  }

  private def feats(f: Fixture): List[(Long, Double, Seq[Int])] =
    f.rows.map { case (id, src, t) =>
      (id, if (f.positives(src)) 1.0 else 0.0,
        if (t == null) Nil
        else t.split(" ", -1).toSeq.map(bucketOf(_, f.buckets)))
    }

  private def refereeTrain(f: Fixture): (Array[Long], Long) = {
    val fs = feats(f)
    val n = fs.size
    val w = Array.fill(f.buckets)(0L)
    var bias = 0L
    for (_ <- 1 to f.iters) {
      val grads = Array.fill(f.buckets)(BigInt(0))
      var gBias = BigInt(0)
      fs.foreach { case (_, y, bs) =>
        val m = bias + bs.map(w(_)).sum
        val p = 1.0 / (1.0 + math.exp(-(m / 1.0e8)))
        val gm = math.floor((p - y) * 1.0e8 + 0.5).toLong
        gBias += gm
        bs.foreach(b => grads(b) += gm)
      }
      bias -= math.floor(f.lr * gBias.toDouble / n + 0.5).toLong
      (0 until f.buckets).foreach { b =>
        w(b) -= math.floor(f.lr * grads(b).toDouble / n + 0.5).toLong
      }
    }
    (w, bias)
  }

  property("training matches the collections referee exactly") =
    Prop.forAll(fixtureGen) { f =>
      val model = Classifier.trainQualityLr(df(f), f.positives.toSeq,
        f.buckets, f.lr, f.iters)
      val (rw, rb) = refereeTrain(f)
      (model.biasMicro == rb) :| s"bias ${model.biasMicro} vs $rb" &&
        (model.weightsMicro.toSeq == rw.toSeq) :| "weights diverged"
    }

  property("scored margins are the exact fixed-point referee margins") =
    Prop.forAll(fixtureGen) { f =>
      val model = Classifier.trainQualityLr(df(f), f.positives.toSeq,
        f.buckets, f.lr, f.iters)
      val (rw, rb) = refereeTrain(f)
      val got = Classifier.scoreQualityLr(df(f), model, f.positives.toSeq)
        .collect().map(r => r.getLong(0) -> r.getAs[Double]("margin")).toMap
      val fs = feats(f)
      fs.forall { case (id, _, bs) =>
        val m = rb + bs.map(rw(_)).sum
        got(id) == BigDecimal(m / 1.0e8)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      } :| "a margin diverged from the referee"
    }

  property("pareto keep matches referee arithmetic and ignores the model for the draw") =
    Prop.forAll(fixtureGen) { f =>
      val model = Classifier.trainQualityLr(df(f), f.positives.toSeq,
        f.buckets, f.lr, f.iters)
      val out = Classifier.paretoResample(df(f), model, f.positives.toSeq)
        .collect().map(r => r.getLong(0) ->
          ((r.getAs[Double]("prob"), r.getAs[Double]("pareto"),
            r.getAs[Boolean]("keep")))).toMap
      val drawsOk = f.rows.forall { case (id, _, _) =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${Classifier.ResampleKeyPrefix}$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 8)
        val u = java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
        val pareto = BigDecimal(
          math.pow(1.0 - u, -(1.0 / Classifier.ParetoAlpha)) - 1.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (prob, gotPareto, keep) = out(id)
        gotPareto == pareto && keep == (pareto >= 1.0 - prob)
      }
      // the draw column is model-independent: a different model changes
      // prob (and possibly keep), never pareto
      val zero = Classifier.LrModel(Array.fill(f.buckets)(0L), 0L)
      val draws2 = Classifier.paretoResample(df(f), zero, f.positives.toSeq)
        .collect().map(r => r.getLong(0) -> r.getAs[Double]("pareto")).toMap
      drawsOk :| "draw/keep diverged from referee" &&
        f.rows.forall { case (id, _, _) =>
          draws2(id) == out(id)._2 } :| "draw depended on the model"
    }
}

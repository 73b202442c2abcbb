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

  // the collections-only referee lives in [[ClassifierReferee]] — ONE
  // definition shared with ClassifierSpec
  private val R = ClassifierReferee

  private def refereeTrain(f: Fixture): (Array[Long], Long) =
    R.train(f.rows, f.positives, f.buckets, f.lr, f.iters)

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
      f.rows.forall { case (id, _, t) =>
        got(id) == R.margin6(R.marginMicro(t, rw, rb))
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
        val pareto = R.paretoDraw(id)
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

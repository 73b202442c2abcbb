package graft.corpus

/** The collections-only referee for the classifier plane — ONE definition of
  * the arithmetic contract (md5-prefix bucket hash, fixed-point GD training,
  * integer half-away-from-zero margin rounding, namespaced Pareto draw)
  * shared by `ClassifierSpec` and `ClassifierProperties`, so the two suites
  * can never pin conflicting contracts. Every step mirrors the engine op
  * order the x76–x78 oracles replay in SQL. */
object ClassifierReferee {

  def bucketOf(t: String, buckets: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Integer.parseInt(hex.substring(0, 4), 16) % buckets
  }

  /** Spark's `split(text, " ")` is a limit=-1 regex split (keeps trailing
    * empties); NULL text reads as zero tokens. */
  def tokensOf(text: String): Seq[String] =
    if (text == null) Nil else text.split(" ", -1).toSeq

  def feats(rows: Seq[(Long, String, String)], positives: Set[String],
      buckets: Int): Seq[(Long, Double, Seq[Int])] =
    rows.map { case (id, src, t) =>
      (id, if (positives(src)) 1.0 else 0.0,
        tokensOf(t).map(bucketOf(_, buckets)))
    }

  /** Full-batch GD from zero init — the exact engine arithmetic: long
    * margins, `math.exp` sigmoid, `floor(x + 0.5)` micro rounding, BigInt
    * gradient sums (the engine's DECIMAL(38,0)), `w -= floor(lr·G/N + 0.5)`. */
  def train(rows: Seq[(Long, String, String)], positives: Set[String],
      buckets: Int, lr: Double, iterations: Int): (Array[Long], Long) = {
    val fs = feats(rows, positives, buckets)
    val n = fs.size
    val w = Array.fill(buckets)(0L)
    var bias = 0L
    for (_ <- 1 to iterations) {
      val grads = Array.fill(buckets)(BigInt(0))
      var gBias = BigInt(0)
      fs.foreach { case (_, y, bs) =>
        val m = bias + bs.map(w(_)).sum
        val p = 1.0 / (1.0 + math.exp(-(m / 1.0e8)))
        val gm = math.floor((p - y) * 1.0e8 + 0.5).toLong
        gBias += gm
        bs.foreach(b => grads(b) += gm)
      }
      bias -= math.floor(lr * gBias.toDouble / n + 0.5).toLong
      (0 until buckets).foreach { b =>
        w(b) -= math.floor(lr * grads(b).toDouble / n + 0.5).toLong
      }
    }
    (w, bias)
  }

  def marginMicro(text: String, w: Array[Long], bias: Long): Long =
    bias + tokensOf(text).map(t => w(bucketOf(t, w.length))).sum

  /** 8-dp micro → 6-dp double by INTEGER half-away-from-zero division — the
    * engine/oracle contract (never round(double): Spark and DuckDB disagree
    * on the systematic |micro| ≡ 50 (mod 100) half-ties). */
  def margin6(micro: Long): Double = {
    val mag = (2L * math.abs(micro) + 100L) / 200L
    (if (micro < 0) -mag else mag).toDouble / 1.0e6
  }

  /** The x77 acceptance draw: namespaced md5-uniform through the Pareto
    * inverse CDF, 6-dp HALF_UP (a pow output — non-systematic ties). */
  def paretoDraw(id: Long): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${Classifier.ResampleKeyPrefix}$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    val u = java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    BigDecimal(math.pow(1.0 - u, -(1.0 / Classifier.ParetoAlpha)) - 1.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }
}

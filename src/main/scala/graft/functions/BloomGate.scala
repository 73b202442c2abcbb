package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership gating on Catalyst's own sketch machinery — the
  * standard 100 TB prefilter: when a membership set is too large to ship
  * around as data but its FALSE POSITIVES can be killed by a cheaper exact
  * stage downstream, a bloom filter (bits ∝ set size, independent of item
  * width) gates the stream narrowly first.
  *
  * Built on the same internal expressions Spark's runtime-filter rule
  * injects for shuffle pruning (`BloomFilterAggregate` /
  * `BloomFilterMightContain` over `xxhash64`), NOT a UDF: the gate stays
  * inside whole-stage codegen. `BloomFilterMightContain` requires its
  * filter side FOLDABLE, so the filter is built once and embedded as a
  * byte-array literal — the driver-held control-plane pattern
  * (`Semantic.withBestMatch`'s doctrine), which also makes the gate
  * stateless and stream-composable. Blob size is `optimalNumOfBits/8`
  * (~1.2 MB per 1M items at 1% fpp) — broadcast-trivial at any corpus
  * scale, because it grows with the MEMBERSHIP set, not the corpus. */
object BloomGate {

  /** Aggregate a column into one serialized bloom filter (binary). */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double = 0.01): Column = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val bits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    GraftExpressionBridge.column(
      BloomFilterAggregate(
        XxHash64(Seq(GraftExpressionBridge.expression(c)), 42L),
        Literal(expectedItems), Literal(bits), 0, 0).toAggregateExpression())
  }

  /** Build the filter over `items(colName)` and collect its serialized bytes
    * to the driver — a bounded control-plane blob, like a centroid table.
    *
    * Catalyst's analysis check caps `BloomFilterAggregate` at the
    * runtime-filter session confs (defaults 4M items / 64M bits — sized for
    * join pruning, not blocklists), so the build RAISES them to cover this
    * filter when they are lower (never lowers); without this, the
    * multi-million-item blocklists the gate exists for would throw at
    * analysis time. The prior values are RESTORED in a finally once the
    * aggregation has run — these same confs size Spark's own
    * InjectRuntimeFilter, and one large blocklist build must not enlarge
    * runtime join filters for every later query in the session. `bloomAgg`
    * used directly inherits whatever the session confs say — prefer this
    * entry point. */
  def build(items: DataFrame, colName: String, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = buildLock.synchronized {
    val conf = items.sparkSession.conf
    val bits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> expectedItems,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> bits)
    // the analysis check only needs the raised values while THIS query
    // analyzes+runs (head() is eager, so both happen inside the try)
    val saved = keys.map { case (k, _) => k -> conf.get(k) }
    try {
      keys.foreach { case (k, needed) =>
        if (conf.get(k).toLong < needed) conf.set(k, needed.toString)
      }
      items.agg(bloomAgg(col(colName), expectedItems, fpp).as("bf"))
        .head().getAs[Array[Byte]]("bf")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  // Serializes build(): the save/raise/restore around the session conf is a
  // read-modify-write, so two concurrent builds could interleave such that
  // one's finally-restore LOWERS the cap while the other's aggregation still
  // analyzes against it (and the second would then "restore" the first's
  // raised value, corrupting the session default). Builds are rare driver
  // control-plane actions, so one JVM-wide lock costs nothing.
  private val buildLock = new Object

  /** Narrow membership test of `c` against driver-held filter bytes. No
    * false negatives ever; false positives at the built fpp — callers MUST
    * exact-verify downstream when exactness matters. */
  def mightContain(bloomBytes: Array[Byte], c: Column): Column =
    GraftExpressionBridge.column(
      BloomFilterMightContain(
        Literal(bloomBytes, BinaryType),
        XxHash64(Seq(GraftExpressionBridge.expression(c)), 42L)))
}

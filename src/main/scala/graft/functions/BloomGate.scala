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
    * join pruning, not blocklists), so large blocklists would throw at
    * analysis time under the caller's session. The build therefore runs in a
    * throwaway `newSession()` — same SparkContext, shared cache, ISOLATED
    * SQLConf — with the caps raised only there: the caller's session conf is
    * never touched, so neither later queries nor queries CONCURRENT with the
    * build can have Spark's own InjectRuntimeFilter sized against the raised
    * caps (a save/raise/restore on the shared conf would leak to anything
    * analyzing inside the build window). `bloomAgg` used directly inherits
    * whatever the session confs say — prefer this entry point. */
  def build(items: DataFrame, colName: String, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val bits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val iso = items.sparkSession.newSession()
    // newSession() starts from the base SparkConf, NOT the caller's runtime
    // session conf — semantic-affecting confs the caller set via conf.set
    // (ANSI mode, session timezone, codegen flags) would silently not apply
    // while the blocklist aggregate analyzes and executes here. Carry the
    // caller's modifiable overrides across before raising the caps.
    graft.util.SessionConfs.carryInto(items.sparkSession, iso)
    Seq(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> expectedItems,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> bits)
      .foreach { case (k, needed) =>
        if (iso.conf.get(k).toLong < needed) iso.conf.set(k, needed.toString)
      }
    // re-bind the caller's ANALYZED plan (self-contained — catalog lookups
    // already resolved) so the aggregate analyzes under the isolated caps
    val bytes = GraftExpressionBridge.ofRows(iso, items.queryExecution.analyzed)
      .agg(bloomAgg(col(colName), expectedItems, fpp).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    if (bytes != null) bytes
    else {
      // BloomFilterAggregate evals to SQL NULL when it aggregated zero
      // non-null items. Returning that null would make mightContain(null, c)
      // NULL for every row — `filter(!mightContain(...))` then drops the
      // ENTIRE stream exactly when the blocklist happens to be empty. An
      // empty blocklist must gate nothing: hand back a real zero-item filter
      // (same serialized format Spark's sketch writes), for which
      // might_contain is false everywhere
      val empty = org.apache.spark.util.sketch.BloomFilter
        .create(expectedItems, fpp)
      val out = new java.io.ByteArrayOutputStream()
      empty.writeTo(out)
      out.toByteArray
    }
  }

  /** Narrow membership test of `c` against driver-held filter bytes. No
    * false negatives ever; false positives at the built fpp — callers MUST
    * exact-verify downstream when exactness matters. */
  def mightContain(bloomBytes: Array[Byte], c: Column): Column =
    GraftExpressionBridge.column(
      BloomFilterMightContain(
        Literal(bloomBytes, BinaryType),
        XxHash64(Seq(GraftExpressionBridge.expression(c)), 42L)))
}

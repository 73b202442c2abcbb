package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-range join — the other interval operator Spark has no built-in
  * for: rows (point, range) with the same key where
  * `start <= pointTime < end`.
  *
  * The naive formulation is an equi-join on the key with two inequality
  * predicates — Spark executes the inequalities as a post-join filter, so the
  * join itself is the full per-key cross product. Here each range is exploded
  * into the fixed-granularity time buckets it covers, each point hashes to its
  * OWN bucket, and the join is a plain equi-join on (key, bucket) with an exact
  * containment filter after: per-key fan-out falls from |points|×|ranges| to
  * |points| × (ranges alive in the same bucket). A (point, range) pair meets in
  * exactly one bucket — the point's — so no dedup pass is needed.
  *
  * `granularitySeconds` tunes the trade: buckets ≈ typical range length keep
  * the explode factor ~2 while maximizing pruning. Second precision; `start`
  * inclusive, `end` exclusive.
  */
object RangeJoin {

  /** @return point columns unchanged + each range column as `range_<name>`.
    * Empty or inverted ranges (`end <= start`) are dropped — `sequence` would
    * otherwise enumerate DOWNWARD through every bucket between the two ends
    * (silent bloat, or a hard array-size failure for a wildly corrupt row). */
  def pointInRange(points: DataFrame, ranges: DataFrame,
      pointKey: String, pointTime: String,
      rangeKey: String, startCol: String, endCol: String,
      granularitySeconds: Long): DataFrame = {
    require(granularitySeconds > 0, "granularity must be positive")
    val g = granularitySeconds
    def q(name: String) = "`" + name.replace("`", "``") + "`"
    val p = points.select(
      col(pointKey).as("__k"),
      expr(s"unix_timestamp(${q(pointTime)}) div $g").as("__b"),
      struct(points.columns.toIndexedSeq.map(col): _*).as("__p"))
    val r = ranges
      .filter(col(endCol) > col(startCol))
      .select(
        col(rangeKey).as("__k"),
        // enumerate THROUGH the end's bucket: unix_timestamp truncates to
        // seconds, so a sub-second end (end 00:02:00.5, g=60) still covers
        // instants in its own bucket — `(end - 1) div g` would stop one
        // bucket short and silently lose those matches. When the end sits
        // exactly on a bucket boundary this adds one candidate bucket whose
        // pairs the exact end-exclusive filter below prunes — extra work,
        // never extra (or missing) output
        explode(sequence(
          expr(s"unix_timestamp(${q(startCol)}) div $g"),
          expr(s"unix_timestamp(${q(endCol)}) div $g"))).as("__b"),
        struct(ranges.columns.toIndexedSeq.map(col): _*).as("__r"))
    p.join(r, Seq("__k", "__b"))
      .filter(col(s"__p.$pointTime") >= col(s"__r.$startCol") &&
        col(s"__p.$pointTime") < col(s"__r.$endCol"))
      .select(points.columns.toIndexedSeq.map(c => col(s"__p.$c").as(c)) ++
        ranges.columns.toIndexedSeq.map(c => col(s"__r.$c").as(s"range_$c")): _*)
  }
}

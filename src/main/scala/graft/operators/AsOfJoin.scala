package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — an operator Spark has no built-in for: attach to each left row
  * the LATEST right row with `rightTime <= leftTime` for the same key (inner
  * semantics: left rows with no prior right row are dropped), i.e. DuckDB's
  * `ASOF JOIN`, kdb's `aj`, Pandas' `merge_asof`.
  *
  * Spark-first shape: the naive formulation — an inequality join, then a
  * per-left-row max, then a re-join — costs two wide shuffles and its fan-out
  * is |left_k| × |right_k| per key (quadratic on hot keys). Here both sides are
  * UNION-interleaved and shuffled ONCE on the key, sorted per key on
  * (time, side), and a `last(_, ignoreNulls)` carry-forward window hands every
  * left row its as-of match in a single pass: fan-out is exactly one row per
  * input row, so key skew degrades linearly, never quadratically. Right rows
  * sort BEFORE left rows at equal timestamps, so `rightTime == leftTime`
  * matches (the `<=` contract).
  *
  * Right rows should be unique per (key, time) — pre-aggregate first if not
  * (with duplicates the carried row is the last in the engine's sort, which is
  * not deterministic across runs).
  */
object AsOfJoin {

  /** @return left columns unchanged + each right column as `asof_<name>`.
    * Rows with a NULL key or NULL time are dropped on BOTH sides first — an
    * equality join never matches a NULL key and a NULL time has no place in
    * the order, but the window would otherwise co-partition all NULL keys and
    * sort NULL times first, inventing matches no SQL ASOF JOIN produces. */
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String): DataFrame = {
    val lStruct = StructType(left.schema.fields)
    val rStruct = StructType(right.schema.fields)
    val l = left
      .filter(col(leftKey).isNotNull && col(leftTime).isNotNull)
      .select(
        col(leftKey).as("__k"), col(leftTime).cast("timestamp").as("__t"),
        lit(1).as("__side"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("__l"),
        lit(null).cast(rStruct).as("__r"))
    val r = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("__k"), col(rightTime).cast("timestamp").as("__t"),
        lit(0).as("__side"),
        lit(null).cast(lStruct).as("__l"),
        struct(right.columns.toIndexedSeq.map(col): _*).as("__r"))
    val carry = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(carry))
      .filter(col("__side") === 1 && col("__m").isNotNull)
      .select(left.columns.toIndexedSeq.map(c => col(s"__l.$c").as(c)) ++
        right.columns.toIndexedSeq.map(c => col(s"__m.$c").as(s"asof_$c")): _*)
  }
}

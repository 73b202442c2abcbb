package graft.util

import org.apache.spark.sql.DataFrame

/** The persisted-index storage contract shared by every incremental probe
  * (x3 `dedupIndex`, x54 `vocabulary`, x51 `assignedIndex`, x60 `bm25Index`,
  * x86 `unigramLm`): bucketed + sorted on the probe key so a later probe
  * join re-shuffles ONLY the probing increment while the index reads in
  * place. One definition — a storage-contract change (bucket default,
  * format, sort discipline) lands everywhere at once instead of drifting
  * across five per-plane writers. */
object BucketedTable {
  def write(df: DataFrame, tableName: String, buckets: Int,
      keys: String*): Unit = {
    require(keys.nonEmpty, "bucketed table needs at least one key column")
    df.write.bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite").format("parquet").saveAsTable(tableName)
  }
}

package graft.core

import org.apache.spark.sql.DataFrame

/** Bucketed-table helpers — the CO-LOCATED JOIN primitive at scale: two
  * tables bucketed (and sorted) on the same key with the same bucket count
  * join with NO shuffle exchange on either side (the bucket layout IS the
  * partitioning), turning the biggest repeated cost of fact-to-fact joins
  * into a one-time write-side investment. The spec pins the plan shape:
  * a sort-merge join over bucketed scans with zero Exchange operators.
  *
  * At 100 TB this is how recurring joins (events⋈users, orders⋈lineitem)
  * avoid re-shuffling petabytes per query; the same mechanism backs
  * `GROUP BY` on the bucket key (no exchange before the aggregate).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table (overwriting).
    * Both join sides must use the same `buckets` count for exchange-free
    * co-location.
    */
  def writeBucketed(df: DataFrame, table: String, keyCol: String, buckets: Int): Unit = {
    require(buckets > 0, "buckets must be positive")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(table)
  }
}

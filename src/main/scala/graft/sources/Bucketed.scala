package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location — the standing answer to "this join
  * shuffles the fact table every single run".
  *
  * Writing both join sides with `bucketBy(n, key).sortBy(key)` hashes
  * rows into n files per table by the join key at WRITE time. Any
  * later equi-join (or aggregation) on that key reads both sides
  * already hash-partitioned AND sorted: Catalyst plans a sort-merge
  * join with ZERO Exchange and ZERO Sort nodes. At 100 TB this turns
  * every recurring fact-to-fact join from a full-data shuffle into a
  * streaming per-bucket merge — the single biggest recurring-cost
  * lever a warehouse layout has. (One-off joins don't pay the write;
  * this is for tables joined repeatedly on a stable key.)
  *
  * Bucket count guidance: pick n so a bucket of the LARGER table is
  * ~100-500 MB (n = tableBytes / 256 MB, rounded to a power of two);
  * both sides must use the same n (or integer multiples, which Spark
  * 3+ coalesces) for the exchange-free plan.
  */
object Bucketed {

  /** Write df as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two co-bucketed tables on their bucket key. The plan
    * must contain no Exchange — asserted in the test suite.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}

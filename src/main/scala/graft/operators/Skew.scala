package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities for the 100 TB path.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on
  * by default here) covers sort-merge joins; explicit salting remains
  * the tool when the skewed side must hash-join or aggregate on a key
  * with a dominating hot value.
  */
object Skew {

  /** Equi-join with the large side salted into `saltBuckets`
    * sub-partitions per key and the small side replicated across all
    * buckets. Result is row-identical to `large.join(small, key)` while
    * splitting any hot key's rows across `saltBuckets` tasks.
    *
    * The salt must be deterministic per-row but uniform; a hash of the
    * whole large-side row provides that without needing a unique id.
    */
  def saltedEquiJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltBuckets: Int = 16
  ): DataFrame = {
    val salted = large.withColumn(
      "__salt",
      pmod(xxhash64(large.columns.map(col).toSeq: _*), lit(saltBuckets.toLong)).cast("int")
    )
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Two-phase (salted partial → final) aggregation for a hot grouping
    * key: pre-aggregate on (key, salt), then combine. `aggs` must be
    * decomposable (sum/count/min/max); pass the partial and final
    * expressions explicitly.
    */
  def saltedSumByKey(
      df: DataFrame,
      key: String,
      valueCol: String,
      saltBuckets: Int = 16
  ): DataFrame = {
    df.withColumn(
      "__salt",
      pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(saltBuckets.toLong)).cast("int")
    ).groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__pn"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"), sum(col("__pn")).as("n"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe EXACT global ranking — the replacement for
  * `Window.orderBy(...)` with no `partitionBy`, which plans as a
  * single-task sort of the whole input (fine on 60k rows, fatal on a
  * 100 TB corpus).
  *
  * Shape (the classic range-partitioned rank composition):
  *   1. `repartitionByRange` on the order key — Spark's own sampled
  *      range partitioner, the same shuffle a distributed ORDER BY
  *      pays; partition p holds a contiguous key range, all
  *      partitions sort in parallel.
  *   2. per-partition `row_number`/running sum via a window
  *      PARTITIONED on `spark_partition_id()` — parallel, streaming
  *      frame, no global sort task.
  *   3. per-partition counts/sums collected to the driver — BOUNDED
  *      by the partition count (≤ a few thousand on any cluster),
  *      never by the data — composed into a partition-offset literal
  *      map; global rank = offset(pid) + local rank.
  *
  * Exactness: callers must pass a STRICT total order (tie-broken by a
  * unique key, the repo-wide discipline) — then global ranks, NTILE
  * buckets (SQL semantics: first `total % n` buckets take one extra
  * row), and running sums are bit-identical to the single-task window,
  * independent of where the sampled range boundaries fall.
  */
object RankOps {

  /** Range-partition on `order`, attach `_pid`, materialize once
    * (three consumers: offset scan, count probe, ranked output), and
    * return the per-partition (count, sum) ledger in pid order.
    * `sumCol` defaults to 0 so rank-only callers skip the sum plumbing.
    */
  private def partitionLedger(
      df: DataFrame,
      order: Seq[Column],
      sumCol: Column
  ): (DataFrame, Array[(Int, Long, Long)]) = {
    val parted = df
      .repartitionByRange(order: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val ledger = parted
      .groupBy(col("_pid"))
      .agg(count(lit(1)).as("_n"), coalesce(sum(sumCol), lit(0L)).as("_s"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    (parted, ledger)
  }

  /** pid → cumulative-offset literal map (exclusive prefix over the
    * pid-ordered ledger). Empty input degenerates to a 0→0 map so the
    * expression still type-checks (no rows consult it).
    */
  private def offsetMap(ledger: Array[(Int, Long)]): Column =
    if (ledger.isEmpty) map(lit(0), lit(0L))
    else {
      val offs = ledger.map(_._1).zip(ledger.scanLeft(0L)(_ + _._2))
      map(offs.flatMap { case (p, o) => Seq(lit(p), lit(o)) }.toSeq: _*)
    }

  /** Exact global `row_number` (BIGINT, 1-based) as column `out`. */
  def withGlobalRank(df: DataFrame, out: String, order: Seq[Column]): DataFrame = {
    val (parted, ledger) = partitionLedger(df, order, lit(0L))
    val w = Window.partitionBy(col("_pid")).orderBy(order: _*)
    parted
      .withColumn(
        out,
        element_at(offsetMap(ledger.map(t => (t._1, t._2))), col("_pid")) +
          row_number().over(w).cast("long")
      )
      .drop("_pid")
  }

  /** Exact global NTILE(n) (BIGINT, 1..n) as column `out` — SQL
    * semantics: with q = N DIV n and rem = N MOD n, the first rem
    * buckets hold q+1 rows. Computed from the composed global rank in
    * pure integer arithmetic (engine-exact against the oracle's
    * NTILE).
    */
  def withGlobalNtile(df: DataFrame, n: Int, out: String, order: Seq[Column]): DataFrame = {
    val (parted, ledger) = partitionLedger(df, order, lit(0L))
    val w = Window.partitionBy(col("_pid")).orderBy(order: _*)
    val ranked = parted
      .withColumn(
        "_grank",
        element_at(offsetMap(ledger.map(t => (t._1, t._2))), col("_pid")) +
          row_number().over(w).cast("long")
      )
      .drop("_pid")
    val total = ledger.map(_._2).sum // ledger already paid: no extra job
    val q = total / n
    val rem = total % n
    val cut = rem * (q + 1)
    // SQL NTILE from the exact global rank, pure integer arithmetic;
    // the q=0 guard covers total < n (every row its own bucket).
    ranked
      .withColumn(
        out,
        expr(
          s"""CAST(CASE WHEN _grank <= $cut THEN (_grank - 1) DIV ${q + 1}
             |          WHEN $q > 0 THEN $rem + (_grank - $cut - 1) DIV $q
             |          ELSE $rem END + 1 AS BIGINT)""".stripMargin
        )
      )
      .drop("_grank")
  }

  /** Exact global rank AND inclusive running sum of `valueCol` over
    * the same strict order — one range shuffle serves both (the
    * frequency-nucleus / equi-mass pattern). Returns (frame, grand
    * total of valueCol) so callers get the corpus total without
    * another pass.
    */
  def withGlobalRankAndRunningSum(
      df: DataFrame,
      valueCol: Column,
      rankOut: String,
      cumOut: String,
      order: Seq[Column]
  ): (DataFrame, Long) = {
    val (parted, ledger) = partitionLedger(df, order, valueCol)
    val w = Window.partitionBy(col("_pid")).orderBy(order: _*)
    val out = parted
      .withColumn(
        rankOut,
        element_at(offsetMap(ledger.map(t => (t._1, t._2))), col("_pid")) +
          row_number().over(w).cast("long")
      )
      .withColumn(
        cumOut,
        element_at(offsetMap(ledger.map(t => (t._1, t._3))), col("_pid")) +
          sum(valueCol).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
      .drop("_pid")
    (out, ledger.map(_._3).sum)
  }
}

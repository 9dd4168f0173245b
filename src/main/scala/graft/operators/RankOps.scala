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

  // ── Grouped variants (few HUGE groups — the per-source class) ─────
  //
  // `Window.partitionBy(source)` is scale-safe only when groups are
  // MANY and individually small; with ~6 sources over a 100 TB corpus
  // it is 6 sort tasks of ~17 TB each — 1/6th of a partition-less
  // window, not a plan. The grouped composition below is the same
  // range-partition + offset-ledger trick with a (pid, group) ledger:
  // range-partition on (group ++ order) so each partition holds
  // contiguous (group, key) runs, rank within (pid, group) in
  // parallel, and compose per-group offsets from the collected
  // ledger — BOUNDED by partitions x |groups| entries (callers use
  // this exactly when |groups| is small; high-cardinality groups
  // should keep the plain window, which is already parallel).

  /** Internal: range-partition on (groups ++ order), attach `_pid`
    * and the group key string `_gk`, materialize once, and return the
    * per-(pid, gk) row counts. `\u0001` never occurs in the group
    * columns this repo keys on (source/lang identifiers).
    */
  private def groupLedger(
      df: DataFrame,
      groups: Seq[Column],
      order: Seq[Column],
      sumCol: Column = lit(0L)
  ): (DataFrame, Array[(Int, String, Long, Long)]) = {
    val parted = df
      .repartitionByRange((groups ++ order): _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_gk", concat_ws("\u0001", groups.map(_.cast("string")): _*))
      .localCheckpoint()
    val ledger = parted
      .groupBy(col("_pid"), col("_gk"))
      .agg(count(lit(1)).as("_n"), coalesce(sum(sumCol), lit(0L)).as("_s"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._2, t._1))
    (parted, ledger)
  }

  /** (pid, gk) → per-group exclusive-prefix offset literal map over
    * `value` (row counts for ranks, per-partition sums for running
    * sums).
    */
  private def groupOffsetMap(
      ledger: Array[(Int, String, Long, Long)],
      value: ((Int, String, Long, Long)) => Long
  ): Column =
    if (ledger.isEmpty) map(lit(""), lit(0L))
    else {
      val entries = ledger
        .groupBy(_._2)
        .toSeq
        .flatMap { case (gk, rows) =>
          val sorted = rows.sortBy(_._1)
          sorted.map(_._1).zip(sorted.scanLeft(0L)(_ + value(_))).map { case (p, o) =>
            (s"$p\u0001$gk", o)
          }
        }
      map(entries.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    }

  /** gk → group total literal map. */
  private def groupTotalMap(ledger: Array[(Int, String, Long, Long)]): Column =
    if (ledger.isEmpty) map(lit(""), lit(0L))
    else {
      val totals = ledger.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq
      map(totals.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    }

  private def groupKeyCol: Column =
    concat_ws("\u0001", col("_pid").cast("string"), col("_gk"))

  private def groupRankCol(
      ledger: Array[(Int, String, Long, Long)],
      order: Seq[Column]
  ): Column =
    element_at(groupOffsetMap(ledger, _._3), groupKeyCol) + row_number()
      .over(Window.partitionBy(col("_pid"), col("_gk")).orderBy(order: _*))
      .cast("long")

  /** Exact per-group `row_number` (BIGINT, 1-based within each group)
    * as column `out` — bit-identical to
    * `row_number().over(Window.partitionBy(groups).orderBy(order))`
    * for any STRICT total order, with every sort running at full
    * partition parallelism instead of |groups| tasks.
    */
  def withGroupRank(
      df: DataFrame,
      groups: Seq[Column],
      out: String,
      order: Seq[Column]
  ): DataFrame = {
    val (parted, ledger) = groupLedger(df, groups, order)
    parted.withColumn(out, groupRankCol(ledger, order)).drop("_pid", "_gk")
  }

  /** Per-group rank AND the group's total row count (the
    * rank-vs-quota pattern: `rank * k <= n_group`) off the SAME
    * ledger — no second corpus pass for the count.
    */
  def withGroupRankAndCount(
      df: DataFrame,
      groups: Seq[Column],
      rankOut: String,
      cntOut: String,
      order: Seq[Column]
  ): DataFrame = {
    val (parted, ledger) = groupLedger(df, groups, order)
    parted
      .withColumn(rankOut, groupRankCol(ledger, order))
      .withColumn(cntOut, element_at(groupTotalMap(ledger), col("_gk")))
      .drop("_pid", "_gk")
  }

  /** Exact per-group inclusive running sum of `valueCol` over the
    * strict `order` — the per-source cumulative-offset pattern of the
    * packing family, at full partition parallelism (the plain
    * source-keyed running-sum window is |sources| corpus-length
    * tasks). Integer addition composes associatively, so the
    * ledger-offset form is bit-identical to the single-group-task
    * window.
    */
  def withGroupRunningSum(
      df: DataFrame,
      groups: Seq[Column],
      valueCol: Column,
      cumOut: String,
      order: Seq[Column]
  ): DataFrame = {
    val (parted, ledger) = groupLedger(df, groups, order, valueCol)
    val w = Window.partitionBy(col("_pid"), col("_gk")).orderBy(order: _*)
    parted
      .withColumn(
        cumOut,
        element_at(groupOffsetMap(ledger, _._4), groupKeyCol) +
          sum(valueCol).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
      .drop("_pid", "_gk")
  }

  /** Exact per-group NTILE(n) (BIGINT, 1..n within each group) as
    * column `out` — SQL semantics per group (first `total % n` buckets
    * take one extra row), composed from the exact per-group rank and
    * the ledger's group totals in pure integer arithmetic.
    */
  def withGroupNtile(
      df: DataFrame,
      groups: Seq[Column],
      n: Int,
      out: String,
      order: Seq[Column]
  ): DataFrame = {
    val (parted, ledger) = groupLedger(df, groups, order)
    parted
      .withColumn("_grank", groupRankCol(ledger, order))
      .withColumn("_gn", element_at(groupTotalMap(ledger), col("_gk")))
      .withColumn(
        out,
        expr(
          s"""CAST(CASE WHEN _grank <= (_gn % $n) * (_gn DIV $n + 1)
             |          THEN (_grank - 1) DIV (_gn DIV $n + 1)
             |          WHEN _gn DIV $n > 0
             |          THEN (_gn % $n) + (_grank - (_gn % $n) * (_gn DIV $n + 1) - 1)
             |               DIV (_gn DIV $n)
             |          ELSE (_gn % $n) END + 1 AS BIGINT)""".stripMargin
        )
      )
      .drop("_pid", "_gk", "_grank", "_gn")
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

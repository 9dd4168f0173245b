package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming DSIR SELECTION gate — the threshold-mode twin of the
  * batch `dsir_select` sheet, closing the round-9 gap where the
  * ingest edge could score ([[DsirGateStream]]) but not enforce the
  * selection policy online: an arriving document is KEPT iff its
  * importance score clears the acceptance threshold its source earned
  * in the batch fit (threshold64 = the min kept score of the
  * stratified top-20%), so the ingest rack applies exactly the policy
  * the batch selection sheet published.
  *
  * The [[PplGateStream]] reference-snapshot discipline: thresholds fit
  * ONCE on the reference corpus (`refDir`) and broadcast — a
  * #sources-bounded map by construction, no cap needed. Semantics are
  * the THRESHOLD filter, not the rank quota: every doc with
  * score64 ≥ threshold64 passes, so ties at the boundary all pass
  * (deterministic, order-free — a rank quota cannot be enforced
  * per-row at ingest without global state). Sources the batch fit
  * kept nothing from (n_kept = 0, only possible under 5 docs) and
  * sources unseen at fit time REJECT — no policy, no pass.
  * Stateless per-row scoring + filter: no state store, no shuffle;
  * emitted rows equal the batch threshold filter under ANY
  * micro-batch slicing.
  */
object DsirSelectStream {

  /** source → threshold64 from the batch selection sheet, only for
    * sources that actually kept docs (#sources-bounded).
    */
  private[graft] def thresholdIndex(
      spark: SparkSession, refDir: String): Map[String, Long] =
    graft.operators.TextOps
      .dsirSelect(spark, refDir)
      .select(col("source"), col("n_kept"), col("threshold64"))
      .collect()
      .filter(_.getLong(1) > 0L)
      .map(r => r.getString(0) -> r.getLong(2))
      .toMap

  /** Kept rows over a directory of document parquet files (each file
    * = one ingest micro-batch); thresholds fit on `refDir`.
    */
  def kept(
      spark: SparkSession,
      streamDir: String,
      refDir: String): Dataset[DsirGateStream.DsirRow] = {
    val bc = spark.sparkContext.broadcast(thresholdIndex(spark, refDir))
    DsirGateStream
      .scored(spark, streamDir, refDir)
      .filter(r => bc.value.get(r.source).exists(t => r.score64 >= t))
  }
}

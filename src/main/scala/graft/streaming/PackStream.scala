package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextOps

/** Streaming sequence packing: the stateful twin of
  * TextOps.packAssign — documents arrive in micro-batches and each
  * source's greedy first-fit packer carries ONE number of state (its
  * cumulative token offset), so bin assignments stream out
  * incrementally and the final manifest equals the batch packer's
  * exactly (proven in StreamingSpec over a sliced replay). This is
  * how a shard writer actually runs: docs land continuously, and the
  * writer must decide each doc's (bin, offset) at arrival time
  * without re-reading the corpus.
  *
  * Ordering contract: within a source, documents must arrive in
  * doc_id order across batches (the replay/backfill contract — the
  * batch twin sorts by doc_id too); inside a batch the fold sorts its
  * group, so intra-batch file order is free. State per source is one
  * long — at 100 TB/day the state store holds |sources| rows, and the
  * only shuffle is the groupBy on source, the same exchange the batch
  * window does.
  */
object PackStream {

  final case class DocTok(doc_id: Long, source: String, n_tokens: Long)

  final case class PackState(cum: Long)

  final case class Assign(
      doc_id: Long,
      source: String,
      n_tokens: Long,
      cum: Long,
      bin: Long
  )

  private def fold(
      source: String,
      docs: Iterator[DocTok],
      state: GroupState[PackState]
  ): Iterator[Assign] = {
    var cum = state.getOption.map(_.cum).getOrElse(0L)
    val out = Seq.newBuilder[Assign]
    for (d <- docs.toSeq.sortBy(_.doc_id)) {
      val start = cum
      cum += d.n_tokens
      out += Assign(d.doc_id, source, d.n_tokens, cum,
        Math.floorDiv(start, TextOps.PackBudget.toLong))
    }
    state.update(PackState(cum))
    out.result().iterator
  }

  /** Streaming assignments over a directory of documents parquet
    * files (each file = one micro-batch).
    */
  def assignments(spark: SparkSession, dir: String): Dataset[Assign] = {
    import spark.implicits._
    spark.readStream
      .schema(DedupStream.docsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .select(
        col("doc_id"),
        col("source"),
        TextOps.packTokenCount(col("text")).as("n_tokens")
      )
      .as[DocTok]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
  }
}

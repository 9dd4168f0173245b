package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.DedupOps

/** Streaming content-defined chunker: the stateful twin of
  * `DedupOps.cdcChunkTable` — the token stream arrives in micro-
  * batches (an append-only ingestion log) and each document's chunker
  * decides every boundary AT ARRIVAL TIME, emitting a chunk the
  * moment its closing boundary token lands. The emitted (doc, chunk
  * id, length, content md5) rows equal the batch chunk table exactly
  * (StreamingSpec replays pos-sliced batches and compares), which is
  * the CDC promise transplanted to streaming: boundaries are
  * content-anchored, so they cannot depend on WHERE the batch cuts
  * fell.
  *
  * Ordering contract: within a document, tokens arrive in `pos` order
  * across batches (the append-log contract; intra-batch order is free
  * — the fold sorts its group). A final end-marker row per document
  * (`tok = ""`, the commit record every CDC log has) flushes the open
  * trailing chunk and DROPS the document's state.
  *
  * State bound: one (chunk counter, incremental MD5) pair per
  * in-flight document — CONSTANT size per document by construction
  * ([[graft.functions.IncrementalMd5]] carries 4 registers + a <64-
  * byte block tail, never the chunk's text), so state is O(docs in
  * flight) regardless of content: a document whose tokens happen to
  * never satisfy the boundary predicate costs the same 4 registers as
  * one that boundaries every 8 tokens. (The earlier form accumulated
  * the open chunk's raw text to hash at flush — O(chunk length) state
  * with quadratic append on adversarial content.) Documents leave the
  * store at their end marker. The only shuffle is the groupByKey on
  * doc_id, the same exchange the batch window pays.
  */
object ChunkStream {

  import graft.functions.IncrementalMd5
  import graft.functions.IncrementalMd5.Md5State

  final case class TokRow(doc_id: Long, pos: Long, tok: String)

  final case class ChunkState(chunkId: Long, nToks: Long, md5: Md5State)

  final case class Chunk(doc_id: Long, chunk_id: Long, n_toks: Long, chash: String)

  val tokSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("pos", LongType),
    StructField("tok", StringType)
  ))

  private def fold(
      docId: Long,
      rows: Iterator[TokRow],
      state: GroupState[ChunkState]
  ): Iterator[Chunk] = {
    var st = state.getOption.getOrElse(ChunkState(0L, 0L, IncrementalMd5.empty))
    val out = Seq.newBuilder[Chunk]
    var ended = false
    for (r <- rows.toSeq.sortBy(_.pos)) {
      if (r.tok.isEmpty) { // end marker: flush the open trailing chunk
        if (st.nToks > 0)
          out += Chunk(docId, st.chunkId, st.nToks, IncrementalMd5.hex(st.md5))
        ended = true
      } else {
        // the chunk content is its tokens space-joined; absorb the
        // separator-prefixed token so the running digest equals
        // md5(join(" ", toks)) without ever materializing the join
        val piece = if (st.nToks == 0) r.tok else " " + r.tok
        st = ChunkState(st.chunkId, st.nToks + 1, IncrementalMd5.updateUtf8(st.md5, piece))
        if (DedupOps.cdcBoundaryJvm(r.tok)) { // boundary token CLOSES its chunk
          out += Chunk(docId, st.chunkId, st.nToks, IncrementalMd5.hex(st.md5))
          st = ChunkState(st.chunkId + 1, 0L, IncrementalMd5.empty)
        }
      }
    }
    if (ended) state.remove() else state.update(st)
    out.result().iterator
  }

  /** Streaming chunk table over a directory of token parquet files
    * (each file = one micro-batch of the append log).
    */
  def chunks(spark: SparkSession, dir: String): Dataset[Chunk] = {
    import spark.implicits._
    spark.readStream
      .schema(tokSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .as[TokRow]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
  }
}

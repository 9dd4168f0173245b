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
  * State bound: one (chunk counter, open-chunk text) pair per
  * in-flight document; the open chunk's expected length is the
  * boundary modulus (8 tokens), so state is O(docs in flight), not
  * O(corpus) — and documents leave the store at their end marker.
  * The only shuffle is the groupByKey on doc_id, the same exchange
  * the batch window pays.
  */
object ChunkStream {

  final case class TokRow(doc_id: Long, pos: Long, tok: String)

  final case class ChunkState(chunkId: Long, nToks: Long, text: String)

  final case class Chunk(doc_id: Long, chunk_id: Long, n_toks: Long, chash: String)

  val tokSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("pos", LongType),
    StructField("tok", StringType)
  ))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def fold(
      docId: Long,
      rows: Iterator[TokRow],
      state: GroupState[ChunkState]
  ): Iterator[Chunk] = {
    var st = state.getOption.getOrElse(ChunkState(0L, 0L, ""))
    val out = Seq.newBuilder[Chunk]
    var ended = false
    for (r <- rows.toSeq.sortBy(_.pos)) {
      if (r.tok.isEmpty) { // end marker: flush the open trailing chunk
        if (st.nToks > 0) out += Chunk(docId, st.chunkId, st.nToks, md5hex(st.text))
        ended = true
      } else {
        val text = if (st.nToks == 0) r.tok else st.text + " " + r.tok
        st = ChunkState(st.chunkId, st.nToks + 1, text)
        if (DedupOps.cdcBoundaryJvm(r.tok)) { // boundary token CLOSES its chunk
          out += Chunk(docId, st.chunkId, st.nToks, md5hex(st.text))
          st = ChunkState(st.chunkId + 1, 0L, "")
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

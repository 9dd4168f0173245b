package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite for training-data pipelines: exact (hash
  * groupBy), MinHash+LSH (shingle → signature → band → bucket join),
  * SimHash (bitwise fingerprint + hamming bands), and exact n-gram
  * Jaccard. Embedding-cosine near-dup lives in SimilarityOps.
  *
  * Everything is deterministic and built on md5 (the one hash both
  * Spark and DuckDB evaluate identically), so each operator has an
  * exact SQL oracle. At 100 TB the shapes matter more than the hash:
  *   - exact dedup: one shuffle on the fingerprint;
  *   - MinHash LSH: one explode (bands) + one self-join on
  *     (band_idx, band_hash) — the join keys are uniform md5 buckets,
  *     so no skew; candidate verification touches only candidate pairs,
  *     never the full cross product;
  *   - n-gram Jaccard: inverted-index join with a hot-shingle frequency
  *     cap so a stop-shingle cannot create a quadratic bucket.
  */
object DedupOps {

  /** Normalized text: lowercase, whitespace collapsed. */
  private def norm: Column = trim(regexp_replace(lower(col("text")), "\\s+", " "))

  /** Word 3-gram shingles over the non-letter tokenizer, deduplicated. */
  private def shingleExpr(toks: Column): Column =
    array_distinct(
      transform(
        sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", slice(toks, i + 1, lit(3)))
      )
    )

  /** Exact dedup: fingerprint = md5(normalized text); keeper = min
    * doc_id per fingerprint group (one shuffle, no sort).
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), md5(norm).as("fp"))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("keeper_id", min(col("doc_id")).over(w))
      .withColumn("is_keeper", col("doc_id") === col("keeper_id"))
      .select(col("doc_id"), col("fp"), col("group_size"), col("keeper_id"), col("is_keeper"))
  }

  /** Docs with their shingle sets (empty-shingle docs excluded — they
    * have no near-dup semantics and would null-poison the signatures).
    */
  private def docShingles(spark: SparkSession, dir: String): DataFrame = {
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), TextOps.tokens(lower(col("text"))).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), shingleExpr(col("toks")).as("shingles"))
  }

  val MinhashPerms = 12
  val MinhashBands = 4 // 4 bands x 3 rows

  /** MinHash+LSH near-dup pairs. Signature k = min over shingles of
    * md5(k|shingle) (a string-min is a valid min-hash — md5 is a
    * uniform permutation of the shingle space). Bands of 3 rows hash to
    * buckets; docs sharing any band bucket are candidates; candidates
    * are verified with exact Jaccard >= 0.7.
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = docShingles(spark, dir)
    val withSigs = docs.withColumn(
      "sigs",
      transform(
        sequence(lit(0), lit(MinhashPerms - 1)),
        k => array_min(transform(col("shingles"), s => md5(concat(k.cast("string"), lit("|"), s))))
      )
    )
    val withBands = withSigs.withColumn(
      "bands",
      transform(
        sequence(lit(0), lit(MinhashBands - 1)),
        b => md5(concat_ws("", slice(col("sigs"), b * 3 + 1, lit(3))))
      )
    )
    val buckets = withBands
      .select(col("doc_id"), col("shingles"), posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val a = buckets.select(
      col("band_idx"),
      col("band_hash"),
      col("doc_id").as("doc_a"),
      col("shingles").as("sh_a")
    )
    val b = buckets.select(
      col("band_idx"),
      col("band_hash"),
      col("doc_id").as("doc_b"),
      col("shingles").as("sh_b")
    )
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")
      )
      .filter(col("jaccard") >= 0.7)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Exact n-gram Jaccard near-dup pairs: inverted-index candidate
    * generation (docs sharing at least one shingle), with shingles
    * occurring in more than maxDocFreq docs dropped (stop-shingle
    * skew guard), then exact Jaccard >= 0.5.
    */
  def ngramJaccard(spark: SparkSession, dir: String, maxDocFreq: Int = 50): DataFrame = {
    val docs = docShingles(spark, dir)
    val posting = docs
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val rare = posting
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
      .select(col("shingle"))
    val pruned = posting.join(rare, Seq("shingle"))
    val pairs = pruned
      .select(col("shingle"), col("doc_id").as("doc_a"))
      .join(pruned.select(col("shingle"), col("doc_id").as("doc_b")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
    pairs
      .join(docs.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), Seq("doc_b"))
      .withColumn(
        "jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")
      )
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Per-token ±1 bit vector of the 64-bit md5-derived SimHash plane.
    * Bit j of token hash h = bit (3 - j%4) of hex digit j/4 of md5(h),
    * expressed with div/pow arithmetic that both engines evaluate
    * identically on small ints.
    */
  private def bitVec(h: Column): Column =
    transform(
      sequence(lit(0), lit(63)),
      j => {
        val digit = conv(h.substr((j / 4).cast("int") + 1, lit(1)), 16, 10).cast("int")
        val bit = (floor(digit / pow(lit(2.0), lit(3.0) - (j % 4).cast("double"))).cast("int") % 2)
        when(bit === 1, lit(1)).otherwise(lit(-1))
      }
    )

  /** SimHash-64 fingerprints: sum the ±1 bit vectors of every token
    * occurrence (integer sums — order-independent), sign each of the
    * 64 positions. Output is the bit string; integer-exact on both
    * engines.
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(lower(col("text")))
    Tables
      .documents(spark, dir)
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("hashes", transform(col("toks"), t => md5(t)))
      .withColumn(
        "sums",
        aggregate(
          col("hashes"),
          array_repeat(lit(0), 64),
          (acc, h) => zip_with(acc, bitVec(h), (x, y) => x + y)
        )
      )
      .select(
        col("doc_id"),
        array_join(transform(col("sums"), s => when(s >= 0, "1").otherwise("0")), "")
          .as("simhash")
      )
  }

  /** SimHash near-dup pairs: band the 64 bits into 4 x 16-bit chunks
    * (hamming <= 3 guarantees a shared band; we use <= 10 as the
    * verification threshold on verified candidates).
    */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val fp = simhash(spark, dir)
    val banded = fp.select(
      col("doc_id"),
      col("simhash"),
      posexplode(
        transform(sequence(lit(0), lit(3)), b => col("simhash").substr(b * 16 + 1, lit(16)))
      ).as(Seq("band_idx", "band_bits"))
    )
    val a = banded.select(col("band_idx"), col("band_bits"), col("doc_id").as("doc_a"),
      col("simhash").as("sim_a"))
    val b = banded.select(col("band_idx"), col("band_bits"), col("doc_id").as("doc_b"),
      col("simhash").as("sim_b"))
    a.join(b, Seq("band_idx", "band_bits"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sim_a"), col("sim_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn(
        "hamming",
        size(
          filter(
            sequence(lit(1), lit(64)),
            j => col("sim_a").substr(j, lit(1)) =!= col("sim_b").substr(j, lit(1))
          )
        ).cast("bigint")
      )
      .filter(col("hamming") <= 10)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}

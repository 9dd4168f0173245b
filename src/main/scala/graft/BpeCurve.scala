package graft

/** Tokenizer-training cost-curve probe: runs the BPE fit
  * (`TextOps.bpeFitMerges`) at realistic merge counts — and once on
  * the sampled-corpus contract — against SPARK_GRAFT_SF_DIR, and
  * prints ONE JSON line with per-config totals and the per-round cost
  * shape (first/last-10 round averages: flat rounds = linear total,
  * the claim the BASELINE.md curve documents). Not part of the gate
  * board: the gate contract trains at TextOps.BpeMerges unsampled;
  * this main exists to price the path to production vocab sizes.
  */
object BpeCurve {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.build(cpus)
    // (merges, sampleBuckets): the merge-count ladder unsampled, then
    // the largest count on the 25%-bucket sampled-corpus contract
    val configs = Seq((6, 100), (32, 100), (128, 100), (256, 100), (256, 25))
    val lines = configs.map { case (m, s) =>
      val t0 = System.nanoTime()
      val (merges, types, rounds) =
        graft.operators.TextOps.bpeFitMerges(spark, sfDir, m, s)
      val nTypes = types.count()
      val total = (System.nanoTime() - t0) / 1e9
      GraftSession.dropAllBlocks(spark)
      val first10 = rounds.take(10)
      val last10 = rounds.takeRight(10)
      def avg(xs: Seq[Double]): Double = if (xs.isEmpty) 0.0 else xs.sum / xs.size
      s"""{"merges":$m,"sample_buckets":$s,"rounds_run":${rounds.size},""" +
        s""""learned":${merges.size},"n_types":$nTypes,"total_sec":$total,""" +
        s""""sec_per_round":${avg(rounds)},"first10_avg":${avg(first10)},""" +
        s""""last10_avg":${avg(last10)}}"""
    }
    spark.sparkContext.setLogLevel("OFF")
    val json = s"""{"metric":"bpe_curve","sf":"$sfDir","configs":[${lines.mkString(",")}]}"""
    println(json)
    System.out.flush()
    try spark.stop()
    catch { case _: Throwable => () }
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler: run ONE named SparkEntry query N times under the
  * exact Bench session config and print per-run wall times, so a slow
  * bench entry can be iterated on without running the whole suite.
  *
  * Usage: runMain graft.tools.Profile <queryName> [sfDir] [runs]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(cpus)
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.GraftSession.dropAllBlocks(spark)
      println(f"[profile] $name run $i: $dt%.2f s")
    }
    spark.stop()
  }
}

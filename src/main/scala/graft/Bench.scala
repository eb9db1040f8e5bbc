package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // local-mode knob: sf0.1 parquet files are 2-20 MB, far below the
      // 128 MB default split size — without this every scan is one task
      // and 31 of 32 cores idle on the map side. A real cluster with
      // full-size files keeps the default.
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/parquet-footer caches, so the first
    // measured query isn't charged session bring-up. One representative
    // per machinery family — plain scan/join (q1), kernel expressions
    // (x6), the producer/executor/backend path (q13: snapshot + build +
    // memoization code), a micro-batch streaming query (qs3: state
    // store + MicroBatchExecution classes), and the shingle/near-dup
    // machinery (x17: graft_shingle_hashes codegen, the inverted-index
    // join, array HOF re-verify, and the iterative label-propagation
    // loop shared by x2/x3/x15) — so framework/streaming/dedup queries
    // measure their WORK, not one-time class-loading + JIT.
    try {
      for (w <- Seq("q1_pricing_summary", "x6_ann_bruteforce",
                    "q13_partitioned_spend", "qs3_stream_state",
                    "x17_dedup_clusters"))
        SparkEntry.queries.get(w).foreach(_(spark, sfDir).count())
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      spark.catalog.clearCache() // previous query's persist() outside the timer
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

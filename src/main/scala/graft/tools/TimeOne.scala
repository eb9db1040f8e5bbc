package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Queries

/** Dev harness: time one named query N times on one session (args:
  * <sfDir> <queryName> [reps] [key=value ...]) — for isolating a
  * regression from ambient machine noise without paying a full Bench
  * sweep per sample. Trailing key=value args become runtime confs
  * (e.g. spark.graft.shuffleaudit.hexChars=4 for the x152
  * production-bucket-width row). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2 && !args(2).contains('=')) args(2).toInt else 3
    val confs = args.drop(2).filter(_.contains('=')).map { a =>
      val Array(k, v) = a.split("=", 2); (k, v)
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.local.dir", graft.util.TempDirs.sparkLocalDir)
      .config("spark.ui.enabled", "false")
      .appName("graft-timeone").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val q = Queries.byName(name)
    for (i <- 1 to reps) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      // noop-sink full materialization, same instrument as Bench — count()
      // lets join elimination drop whole legs (the r9 x141 undercount)
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[timeone] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

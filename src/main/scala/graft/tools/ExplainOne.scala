package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Queries

/** Dev harness: print the formatted physical plan of one named query
  * (args: <sfDir> <queryName> [mode]) — the plan-audit loop: check
  * broadcasts are broadcast, filters reached the scan (PushedFilters),
  * and WholeStageCodegen spans cover the hot path. Batch queries only
  * (streaming queries materialize sinks on run and explain differently). */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .appName("graft-explainone").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Queries.byName(name).run(spark, sfDir).explain(mode)
    spark.stop()
  }
}

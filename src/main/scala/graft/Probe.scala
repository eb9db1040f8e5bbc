package graft
import org.apache.spark.sql.SparkSession

/** Dev-only smoke: the driver's entry contract (rows > 0 at sf0.001). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println(s"ENTRY rows=${df.count()} cols=${df.columns.mkString(",")}")
    df.show(5, false)
    spark.stop()
  }
}

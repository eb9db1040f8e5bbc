package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver testdata (TESTDATA.md / FIXTURES.md §A).
  *
  * All timestamps in the parquet files are written with
  * `isAdjustedToUTC=false` (naive wall-clock): Spark 4 reads the ms-precision
  * ones (`lineitem.l_shipdate`, `orders.o_orderdate`) as `TIMESTAMP_NTZ`
  * natively. `events.ts` is **nanosecond** precision, which Spark cannot
  * represent: we read it as a long (`spark.sql.legacy.parquet.nanosAsLong`)
  * and truncate to microseconds with integral division (a double division
  * would lose precision — epoch nanos ~1.7e18 exceed 2^53), matching the
  * oracle protocol "timestamps compared at µs" (BASELINE.md).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read
        .parquet(s"$dir/events.parquet")
        .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
    case _ => spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}

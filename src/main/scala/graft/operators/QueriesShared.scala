package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Tiny cross-family helpers shared by every query trait. */
private[operators] trait QueriesShared { this: Queries.type =>

  private[operators] def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private[operators] def tsNtz(s: String): Column = lit(s).cast(TimestampNTZType)
  private[operators] def toks(c: Column): Column = split(c, " ")

}

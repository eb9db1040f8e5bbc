package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Artifact statistics (reference F38 — the interface the reference only
  * stubs, statistics/__init__.py:60-86, realized as real one-pass
  * aggregations): per-column count / nulls / distinct / min / max computed
  * in a single job over the output, recorded by the executor in the backend
  * alongside the partition (the `Statistic`/`Threshold` hook point of
  * executors/local.py:26-29). */
object Statistics {

  /** One-pass profile: one output row; column names are `<col>__<stat>`. */
  def profile(df: DataFrame): Map[String, String] = {
    val aggs = df.schema.fields.toSeq.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(c).as(s"${f.name}__count"),
        approx_count_distinct(c).as(s"${f.name}__approx_distinct"))
      val ranged = f.dataType match {
        case _: NumericType | DateType | TimestampType | TimestampNTZType | StringType =>
          Seq(min(c).cast(StringType).as(s"${f.name}__min"), max(c).cast(StringType).as(s"${f.name}__max"))
        case _ => Nil
      }
      base ++ ranged
    } :+ count(lit(1)).as("__rows")
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    row.schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      f.name -> String.valueOf(row.get(i))
    }.toMap
  }
}

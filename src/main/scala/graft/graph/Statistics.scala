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

  /** Declarative quality thresholds over collected statistics (reference
    * F38: thresholds/__init__.py:11-16 defines the `check` interface and
    * executors/local.py:26-29 leaves enforcement TODO — here both are
    * real). A Threshold checks the stats map produced by [[profile]]; the
    * executor evaluates thresholds on EVERY build — including memoized
    * skips, against the stored statistics — because thresholds may change
    * between runs without invalidating the data (they are deliberately
    * excluded from the producer fingerprint, exactly why the reference
    * re-checks "every time"). */
  sealed trait Threshold {
    /** Right(()) iff the stats satisfy this threshold. */
    def check(stats: Map[String, String]): Either[String, Unit]
  }

  object Threshold {
    private def num(stats: Map[String, String], key: String): Either[String, Double] =
      stats.get(key).toRight(s"statistic '$key' was not collected")
        .flatMap(v => scala.util.Try(v.toDouble).toOption.toRight(s"statistic '$key'=$v is not numeric"))

    final case class MinRows(n: Long) extends Threshold {
      def check(stats: Map[String, String]): Either[String, Unit] =
        num(stats, "__rows").flatMap(r => Either.cond(r >= n, (), s"rows $r < required $n"))
    }

    /** No NULLs in `column`: its non-null count must equal the row count. */
    final case class NoNulls(column: String) extends Threshold {
      def check(stats: Map[String, String]): Either[String, Unit] =
        for {
          rows <- num(stats, "__rows")
          cnt <- num(stats, s"${column}__count")
          _ <- Either.cond(cnt == rows, (), s"column '$column' has ${rows - cnt} null(s)")
        } yield ()
    }

    /** min/max of `column` within [lo, hi] (either side optional). */
    final case class Bounds(column: String, lo: Option[Double] = None, hi: Option[Double] = None) extends Threshold {
      def check(stats: Map[String, String]): Either[String, Unit] =
        for {
          mn <- num(stats, s"${column}__min")
          mx <- num(stats, s"${column}__max")
          _ <- Either.cond(lo.forall(mn >= _), (), s"column '$column' min $mn below ${lo.get}")
          _ <- Either.cond(hi.forall(mx <= _), (), s"column '$column' max $mx above ${hi.get}")
        } yield ()
    }

    /** Approximate distinct count of `column` at least n (HLL-based — use
      * for "is this column actually varied" checks, not exact audits). */
    final case class MinDistinct(column: String, n: Long) extends Threshold {
      def check(stats: Map[String, String]): Either[String, Unit] =
        num(stats, s"${column}__approx_distinct")
          .flatMap(d => Either.cond(d >= n, (), s"column '$column' distinct ~$d < required $n"))
    }
  }

  /** Evaluate all thresholds; Left = every violation message. */
  def checkThresholds(thresholds: Seq[Threshold], stats: Map[String, String]): Either[String, Unit] = {
    val violations = thresholds.flatMap(_.check(stats).left.toOption)
    if (violations.isEmpty) Right(()) else Left(violations.mkString("; "))
  }

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

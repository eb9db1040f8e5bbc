package graft.types

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.types.ArtiType._

/** Engine-side semantic enforcement for the declared types that Spark's
  * physical types can't carry (SURVEY §1.2 table):
  *   - `AEnum` → a check constraint over the declared items
  *     (reference validates items against the underlying type,
  *     types/__init__.py:109-123);
  *   - `ASet` → distinctness of the array elements (the reference keeps
  *     Set/List distinct types and round-trips sets, :127-131,233-236).
  *
  * `conform` rewrites a DataFrame to the declared struct (ASet columns get
  * `array_distinct`); `violations` returns the rows breaking Enum/Set
  * constraints — the building block for `Producer.validateOutputs` gates.
  */
object TypeEnforcement {

  /** Rewrite df columns to conform: dedup ASet arrays. */
  def conform(df: DataFrame, struct: AStruct): DataFrame =
    struct.fields.foldLeft(df) {
      case (acc, (name, _: ASet)) if acc.columns.contains(name) =>
        acc.withColumn(name, array_distinct(col(name)))
      case (acc, _) => acc
    }

  /** Predicate that is true where a column VIOLATES its declared type.
    * Nullability composes with the kind-specific check (an enum/set match
    * arm must not shadow a non-nullable declaration — null in a
    * non-nullable enum column is a violation too). */
  def violationPredicate(name: String, t: ArtiType): Option[Column] = {
    val kindViolation: Option[Column] = t match {
      case e: AEnum =>
        val items = e.items.map {
          case s: String => lit(s)
          case i: Int    => lit(i)
          case l: Long   => lit(l)
          case d: Double => lit(d)
          case other     => lit(String.valueOf(other))
        }
        Some(!col(name).isin(items: _*) && col(name).isNotNull)
      case _: ASet =>
        // coalesce: size(null) comparisons are null, which filter() drops
        Some(coalesce(size(col(name)) =!= size(array_distinct(col(name))), lit(false)))
      case _ => None
    }
    val nullViolation: Option[Column] = if (!t.nullable) Some(col(name).isNull) else None
    (kindViolation, nullViolation) match {
      case (Some(k), Some(n)) => Some(k || n)
      case (k, n)             => k.orElse(n)
    }
  }

  /** Rows violating any declared constraint of the struct. */
  def violations(df: DataFrame, struct: AStruct): DataFrame = {
    val preds = struct.fields.flatMap { case (n, t) =>
      if (df.columns.contains(n)) violationPredicate(n, t) else None
    }
    preds.reduceOption(_ || _).map(df.filter).getOrElse(df.limit(0))
  }

  /** A ready-made `validateOutputs` gate for producers. */
  def gate(struct: AStruct): Seq[DataFrame] => Either[String, Unit] =
    outs => {
      val bad = outs.map(violations(_, struct)).map(_.limit(1).count()).sum
      if (bad == 0) Right(()) else Left(s"$bad output(s) violate declared type constraints of '${struct.name}'")
    }
}

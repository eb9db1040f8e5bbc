package graft.graph

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Row, SparkSession}

import graft.types.ArtiType

/** F33 — View resolution through a PRIORITY REGISTRY (reference:
  * src/arti/views/__init__.py:20-145). A View is the in-memory
  * representation an artifact materializes into: the reference keys views by
  * python type with a class-level `priority` ("higher is better",
  * views/__init__.py:30) and resolves `View.get_class_for(annotation)` from
  * the registry; here the key is the JVM target class and resolution walks
  * registrations best-priority-first, taking the first whose target is
  * assignable to the request AND whose `compatible` check accepts the
  * artifact's declared type — the same two gates as the reference's
  * `_by_python_type_` lookup + `check_artifact_compatibility`
  * (views/__init__.py:96-145).
  *
  * The built-in views (DataFrame, typed Dataset, scalar) are REGISTRATIONS,
  * not special cases — a user view plugs in exactly the way a Storage codec
  * (ModelCodec.registerStorage) or a TypeSystem adapter
  * (TypeSystemRegistry.register) does, closing the third extension seam.
  */
trait ArtiView[T] {
  /** JVM analog of the reference's `python_type` class var. */
  def target: Class[_]
  /** Higher wins among views sharing an assignable target
    * (reference views/__init__.py:30). */
  def priority: Int = 0
  /** Artifact-type compatibility — the reference's
    * `check_artifact_compatibility` / `_check_type_compatibility`
    * (views/__init__.py:45-56,128-145), decided from the DECLARED type at
    * resolution time, before any data is touched. */
  def compatible(atype: ArtiType): Boolean
  /** Materialize the artifact's frame as this view. `df` is the engine's
    * already-partition-resolved read; views decide representation, never
    * partition selection. */
  def materialize(spark: SparkSession, df: DataFrame, atype: ArtiType): T
}

object ViewRegistry {

  private val registered = mutable.ListBuffer.empty[ArtiView[_]]

  /** Register a view (reference `__pydantic_init_subclass__` auto-register,
    * views/__init__.py:38-42). Later registrations win priority ties, so a
    * user view at the default priority still shadows a built-in it targets. */
  def register(view: ArtiView[_]): Unit = registered.synchronized {
    registered.prepend(view)
  }

  /** Resolve the best view for a target class + artifact type: highest
    * priority among registrations whose `target` is assignable to `cls` and
    * whose `compatible(atype)` holds. Loud failure lists what WAS registered
    * (reference raises "cannot be matched to a View", views/__init__.py:108). */
  def resolve[T](cls: Class[T], atype: ArtiType): ArtiView[T] = registered.synchronized {
    val candidates = registered.filter(v => cls.isAssignableFrom(v.target))
    candidates.sortBy(-_.priority).find(_.compatible(atype)) match {
      case Some(v) => v.asInstanceOf[ArtiView[T]]
      case None => throw new IllegalArgumentException(
        s"no registered view materializes ${cls.getName} from $atype — " +
          s"registered targets: ${registered.map(_.target.getSimpleName).distinct.mkString(", ")} " +
          "(register one via ViewRegistry.register)")
    }
  }

  /** The reference's capability check at WIRING time
    * (views/__init__.py:128-145 runs io lookups when the view binds): true
    * iff some registered view can serve this (class, type) pair. */
  def canResolve(cls: Class[_], atype: ArtiType): Boolean = registered.synchronized {
    registered.exists(v => cls.isAssignableFrom(v.target) && v.compatible(atype))
  }

  // ------------------------------------------------------------ built-ins
  // (reference views/python.py registers Int/Float/Str/Dicts/... the same
  // way — module import triggers registration; here object init does)

  /** Whole-frame view: any table-shaped artifact as a DataFrame. */
  final class DataFrameView extends ArtiView[DataFrame] {
    val target: Class[_] = classOf[Dataset[_]] // DataFrame = Dataset[Row]
    def compatible(atype: ArtiType): Boolean = atype match {
      case _: ArtiType.ACollection | _: ArtiType.AStruct => true
      case _ => false
    }
    def materialize(spark: SparkSession, df: DataFrame, atype: ArtiType): DataFrame = df
  }

  /** Driver-side rows view (the reference's default `list[dict]` python
    * view, views/python.py:215-250) — explicitly a SMALL-result view; big
    * artifacts stay in DataFrame/Dataset land. */
  final class RowsView extends ArtiView[Seq[Row]] {
    val target: Class[_] = classOf[Seq[Row]]
    def compatible(atype: ArtiType): Boolean = atype match {
      case _: ArtiType.ACollection | _: ArtiType.AStruct => true
      case _ => false
    }
    def materialize(spark: SparkSession, df: DataFrame, atype: ArtiType): Seq[Row] =
      df.collect().toSeq
  }

  /** Scalar views (reference views/python.py Int/Float/Str/Bool/Date): a
    * 1×1 frame of a scalar-typed artifact as the boxed value. */
  final class ScalarView[T](val target: Class[_], ok: ArtiType => Boolean) extends ArtiView[T] {
    def compatible(atype: ArtiType): Boolean = ok(atype)
    def materialize(spark: SparkSession, df: DataFrame, atype: ArtiType): T = {
      val rows = df.collect()
      require(rows.length == 1 && rows.head.size == 1,
        s"scalar view needs exactly one value, found ${rows.length} row(s)")
      rows.head.getAs[T](0)
    }
  }

  register(new DataFrameView)
  register(new RowsView)
  register(new ScalarView[java.lang.Long](classOf[java.lang.Long], {
    case _: ArtiType.AInt8 | _: ArtiType.AInt16 | _: ArtiType.AInt32 | _: ArtiType.AInt64 => true
    case _ => false
  }))
  register(new ScalarView[java.lang.Double](classOf[java.lang.Double], {
    case _: ArtiType.AFloat16 | _: ArtiType.AFloat32 | _: ArtiType.AFloat64 => true
    case _ => false
  }))
  register(new ScalarView[String](classOf[String], {
    case _: ArtiType.AString => true
    case _ => false
  }))
  register(new ScalarView[java.lang.Boolean](classOf[java.lang.Boolean], {
    case _: ArtiType.ABoolean => true
    case _ => false
  }))
}

object ArtiView {
  /** Build a typed-Dataset view from an Encoder — the analog of the
    * reference inferring a view from a `list[SomeModel]` annotation through
    * the pydantic adapter (F32 ∘ F33). Registered per call site because
    * encoders are compile-time summons, not runtime discoverables. */
  def datasetView[T](implicit enc: Encoder[T]): ArtiView[Dataset[T]] =
    new ArtiView[Dataset[T]] {
      val target: Class[_] = classOf[Dataset[_]]
      override val priority: Int = 1 // beats the untyped DataFrame view
      def compatible(atype: ArtiType): Boolean = atype match {
        case _: ArtiType.ACollection | _: ArtiType.AStruct => true
        case _ => false
      }
      def materialize(spark: SparkSession, df: DataFrame, atype: ArtiType): Dataset[T] =
        df.as[T](enc)
    }
}

package graft.types

import scala.collection.mutable

import org.apache.spark.sql.types.{DataType, StructField}

/** F28: the priority-ordered, extendable TypeAdapter registry (reference:
  * src/arti/types/__init__.py:284-391). An adapter maps between ArtiType
  * and a foreign system's type representation (opaque `Any`: a Spark
  * DataType, a JDBC DDL string, an Arrow field, …). Resolution walks this
  * system's adapters by DESCENDING priority, then falls back to each
  * `extendsFrom` system in order — matching the reference's
  * `to_artigraph`/`to_system` chain, including passing the ROOT system down
  * so recursive conversions re-enter at the top of the chain. */
trait TypeAdapter {
  def key: String = getClass.getName
  def priority: Int = 0
  def matchesArti(t: ArtiType): Boolean
  def matchesSystem(t: Any): Boolean
  def toArti(t: Any, root: TypeSystemRegistry): ArtiType
  def toSystem(t: ArtiType, root: TypeSystemRegistry): Any
}

final class TypeSystemRegistry(val key: String, val extendsFrom: Seq[TypeSystemRegistry] = Nil) {
  private val adapters = mutable.LinkedHashMap.empty[String, TypeAdapter]

  /** Double registration under one key is a wiring bug, as in the
    * reference's `register` helper. */
  def registerAdapter[A <: TypeAdapter](a: A): A = this.synchronized {
    require(!adapters.contains(a.key), s"type system '$key' already has an adapter '${a.key}'")
    adapters(a.key) = a
    a
  }

  private def sortedAdapters: Seq[TypeAdapter] =
    this.synchronized(adapters.values.toSeq.sortBy(-_.priority))

  def toArti(system: Any): ArtiType = toArti(system, this)

  def toArti(system: Any, root: TypeSystemRegistry): ArtiType =
    sortedAdapters.find(_.matchesSystem(system)).map(_.toArti(system, root))
      .orElse(extendsFrom.iterator.map(ts => scala.util.Try(ts.toArti(system, root)).toOption)
        .collectFirst { case Some(t) => t })
      .getOrElse(throw new UnsupportedOperationException(
        s"no '${root.key}' adapter for system type: $system"))

  def toSystem(t: ArtiType): Any = toSystem(t, this)

  def toSystem(t: ArtiType, root: TypeSystemRegistry): Any =
    sortedAdapters.find(_.matchesArti(t)).map(_.toSystem(t, root))
      .orElse(extendsFrom.iterator.map(ts => scala.util.Try(ts.toSystem(t, root)).toOption)
        .collectFirst { case Some(s) => s })
      .getOrElse(throw new UnsupportedOperationException(
        s"no '${root.key}' adapter for Artigraph type: $t"))
}

object TypeSystemRegistry {

  /** The built-in Spark system: the complete [[SparkTypeSystem]] mapping as
    * one priority-0 adapter (semantic markers ride on StructField, so both
    * DataType and StructField are accepted on the system side). New
    * engines' adapters register AROUND it — higher priority intercepts,
    * `extendsFrom` chains whole systems — without editing any match. */
  def spark(): TypeSystemRegistry = {
    val ts = new TypeSystemRegistry("spark")
    ts.registerAdapter(new TypeAdapter {
      override def key: String = "spark-core"
      def matchesArti(t: ArtiType): Boolean = true
      def matchesSystem(t: Any): Boolean = t.isInstanceOf[DataType] || t.isInstanceOf[StructField]
      def toArti(t: Any, root: TypeSystemRegistry): ArtiType = t match {
        case f: StructField => SparkTypeSystem.fieldToArti(f)
        case dt: DataType   => SparkTypeSystem.toArti(dt)
      }
      def toSystem(t: ArtiType, root: TypeSystemRegistry): Any = SparkTypeSystem.toSpark(t)
    })
    ts
  }
}

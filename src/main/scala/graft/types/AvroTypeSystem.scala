package graft.types

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.Schema.{Type => AT}

/** F28/F31 — a SECOND foreign type system wired through the TypeAdapter
  * registry, proving the seam is live code (the reference ships bigquery as
  * its second real adapter, src/arti/types/bigquery.py:19-279; BigQuery
  * itself is out of scope — zero egress — so Avro stands in: public schema
  * language, jars on the Spark classpath, and the natural wire format for a
  * Spark pipeline's Kafka/ingest edges).
  *
  * Mapping style follows the reference's bigquery adapter: faithful where
  * the systems agree, WIDENING where Avro lacks the type (UInt8/16 → int,
  * UInt32 → long, Float16 → float — the same one-way promotions bigquery.py
  * makes for ints/floats), and engine metadata rides as custom schema
  * properties the way the arrow adapter rides schema metadata
  * (types/pyarrow.py:216-270): Set-ness, Geography format/srid, and
  * Collection partition/cluster keys survive a round trip through props.
  *
  * Nullability maps to Avro's `union [null, T]` — the only Avro spelling of
  * an optional value — and back. `Null` itself maps to the bare NULL schema.
  */
object AvroTypeSystem {
  import ArtiType._

  /** Custom-prop keys (Avro schemas carry arbitrary string props). */
  val SetProp = "graft.set"
  val GeoFormatProp = "graft.geography.format"
  val GeoSridProp = "graft.geography.srid"
  val PartitionByProp = "graft.partition_by"
  val ClusterByProp = "graft.cluster_by"
  val CollectionProp = "graft.collection"
  val TimePrecisionProp = "graft.time.precision"

  // ------------------------------------------------------------- to Avro
  def toAvro(t: ArtiType): Schema = {
    val base = toAvroBase(t)
    if (t.nullable && base.getType != AT.UNION && base.getType != AT.NULL)
      Schema.createUnion(Schema.create(AT.NULL), base)
    else base
  }

  private def logical(lt: org.apache.avro.LogicalType, base: AT): Schema =
    lt.addToSchema(Schema.create(base))

  private def toAvroBase(t: ArtiType): Schema = t match {
    case ABinary(Some(n), _, _) => Schema.createFixed(s"fixed_$n", null, "graft", n.toInt)
    case ABinary(None, _, _)    => Schema.create(AT.BYTES)
    case _: ABoolean            => Schema.create(AT.BOOLEAN)
    case _: ADate               => logical(LogicalTypes.date(), AT.INT)
    case ADateTime(p, _, _)     => p match {
      // Avro's local-timestamp family IS the tz-naive DateTime; second
      // precision widens to millis (one-way, like bigquery.py's float
      // promotion — Avro has no seconds-precision logical type)
      case TimePrecision.Second | TimePrecision.Millisecond =>
        logical(LogicalTypes.localTimestampMillis(), AT.LONG)
      case TimePrecision.Microsecond => logical(LogicalTypes.localTimestampMicros(), AT.LONG)
      case TimePrecision.Nanosecond  => logical(LogicalTypes.localTimestampNanos(), AT.LONG)
    }
    case ATimestamp(p, _, _)    => p match {
      case TimePrecision.Second | TimePrecision.Millisecond =>
        logical(LogicalTypes.timestampMillis(), AT.LONG)
      case TimePrecision.Microsecond => logical(LogicalTypes.timestampMicros(), AT.LONG)
      case TimePrecision.Nanosecond  => logical(LogicalTypes.timestampNanos(), AT.LONG)
    }
    case ATime(p, _, _)         => p match {
      case TimePrecision.Second | TimePrecision.Millisecond =>
        logical(LogicalTypes.timeMillis(), AT.INT)
      case TimePrecision.Microsecond => logical(LogicalTypes.timeMicros(), AT.LONG)
      case TimePrecision.Nanosecond =>
        // no time-nanos logical type in Avro — nanos-of-day long + prop
        val s = Schema.create(AT.LONG)
        s.addProp(TimePrecisionProp, "nanosecond")
        s
    }
    case AEnum(name, _: AString, items, _, _)
      // string enums are real Avro enums when every item is a legal Avro
      // symbol; otherwise they stay strings (Avro symbols must match the
      // name rule — arbitrary item strings don't)
      if items.forall { case s: String => s.matches("[A-Za-z_][A-Za-z0-9_]*"); case _ => false } =>
      Schema.createEnum(name, null, "graft", items.map(_.toString).asJava)
    case AEnum(_, underlying, _, _, _) => toAvroBase(setNullable(underlying, v = false))
    case _: AFloat16 | _: AFloat32 => Schema.create(AT.FLOAT) // f16 widens (no Avro half)
    case _: AFloat64            => Schema.create(AT.DOUBLE)
    case _: AInt8 | _: AInt16 | _: AInt32 => Schema.create(AT.INT)
    case _: AInt64              => Schema.create(AT.LONG)
    case _: AUInt8 | _: AUInt16 => Schema.create(AT.INT)  // widen (no unsigned in Avro)
    case _: AUInt32             => Schema.create(AT.LONG)
    case _: AUInt64             => logical(LogicalTypes.decimal(20, 0), AT.BYTES) // lossless container
    case AGeography(format, srid, _, _) =>
      val s = Schema.create(if (format == "WKB") AT.BYTES else AT.STRING)
      s.addProp(GeoFormatProp, format)
      srid.foreach(s.addProp(GeoSridProp, _))
      s
    case _: ANull               => Schema.create(AT.NULL)
    case _: AString             => Schema.create(AT.STRING)
    case AList(e, _, _)         => Schema.createArray(toAvro(e))
    case ASet(e, _, _)          =>
      val s = Schema.createArray(toAvro(e))
      s.addProp(SetProp, "true")
      s
    case AMap(_: AString, v, _, _) => Schema.createMap(toAvro(v))
    case AMap(k, _, _, _) => throw new UnsupportedOperationException(
      s"Avro maps require string keys, got $k (same refusal as bigquery.py's unimplemented types)")
    case AStruct(name, fields, _, _) =>
      val fs = fields.map { case (fn, ft) =>
        new Schema.Field(fn, toAvro(ft), ft.description.orNull,
          if (ft.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
      }
      Schema.createRecord(name, null, "graft", false, fs.asJava)
    case ACollection(name, element, partitionBy, clusterBy, _, _) =>
      // prop VALUE is the collection name, so the element struct keeps its
      // own record name across the round trip
      val rec = toAvroBase(element)
      rec.addProp(CollectionProp, name)
      if (partitionBy.nonEmpty) rec.addProp(PartitionByProp, partitionBy.mkString(","))
      if (clusterBy.nonEmpty) rec.addProp(ClusterByProp, clusterBy.mkString(","))
      rec
  }

  // ------------------------------------------------------------- to Arti
  def toArti(s: Schema): ArtiType = s.getType match {
    case AT.UNION =>
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != AT.NULL)
      if (nonNull.isEmpty) ANull()
      else if (nonNull.size == 1 && branches.size == 2) setNullable(toArti(nonNull.head))
      else throw new UnsupportedOperationException(
        s"general Avro unions have no Arti analog (got ${s}); only [null, T] optionals map")
    case _ => toArtiBase(s)
  }

  private def toArtiBase(s: Schema): ArtiType = {
    val lt = Option(s.getLogicalType).map(_.getName).getOrElse("")
    s.getType match {
      case AT.BOOLEAN => ABoolean()
      case AT.INT => lt match {
        case "date"        => ADate()
        case "time-millis" => ATime(TimePrecision.Millisecond)
        case _             => AInt32()
      }
      case AT.LONG => lt match {
        case "time-micros"            => ATime(TimePrecision.Microsecond)
        case "timestamp-millis"       => ATimestamp(TimePrecision.Millisecond)
        case "timestamp-micros"       => ATimestamp(TimePrecision.Microsecond)
        case "timestamp-nanos"        => ATimestamp(TimePrecision.Nanosecond)
        case "local-timestamp-millis" => ADateTime(TimePrecision.Millisecond)
        case "local-timestamp-micros" => ADateTime(TimePrecision.Microsecond)
        case "local-timestamp-nanos"  => ADateTime(TimePrecision.Nanosecond)
        case _ if s.getProp(TimePrecisionProp) == "nanosecond" => ATime(TimePrecision.Nanosecond)
        case _                        => AInt64()
      }
      case AT.FLOAT  => AFloat32()
      case AT.DOUBLE => AFloat64()
      case AT.BYTES =>
        if (lt == "decimal") {
          val d = s.getLogicalType.asInstanceOf[LogicalTypes.Decimal]
          if (d.getPrecision == 20 && d.getScale == 0) AUInt64()
          else throw new UnsupportedOperationException(
            s"Avro decimal(${d.getPrecision},${d.getScale}) has no Arti analog " +
              "(the reference has no decimal type; only the UInt64 container decimal(20,0) maps)")
        }
        else if (s.getProp(GeoFormatProp) != null)
          AGeography(s.getProp(GeoFormatProp), Option(s.getProp(GeoSridProp)))
        else ABinary()
      case AT.FIXED  => ABinary(Some(s.getFixedSize.toLong))
      case AT.STRING =>
        if (s.getProp(GeoFormatProp) != null)
          AGeography(s.getProp(GeoFormatProp), Option(s.getProp(GeoSridProp)))
        else AString()
      case AT.NULL   => ANull()
      case AT.ENUM   => AEnum(s.getName, AString(), s.getEnumSymbols.asScala.toSeq)
      case AT.ARRAY  =>
        val e = toArti(s.getElementType)
        if (s.getProp(SetProp) == "true") ASet(e) else AList(e)
      case AT.MAP    => AMap(AString(), toArti(s.getValueType))
      case AT.RECORD =>
        val fields = s.getFields.asScala.toSeq.map { f =>
          val ft0 = toArti(f.schema())
          val ft = Option(f.doc()) match {
            case Some(d) => setDescription(ft0, d)
            case None => ft0
          }
          f.name() -> ft
        }
        val struct = AStruct(s.getName, fields)
        Option(s.getProp(CollectionProp)) match {
          case Some(collName) =>
            def split(p: String) = Option(s.getProp(p)).map(_.split(",").toSeq).getOrElse(Nil)
            ACollection(collName, struct, split(PartitionByProp), split(ClusterByProp))
          case None => struct
        }
    }
  }

  /** Copy-with-nullable across the ADT (nullability is a wrapper attribute,
    * reference types/__init__.py:26-41). */
  private[types] def setNullable(t: ArtiType, v: Boolean = true): ArtiType = t match {
    case x: ABinary => x.copy(nullable = v)
    case x: ABoolean => x.copy(nullable = v)
    case x: ADate => x.copy(nullable = v)
    case x: ADateTime => x.copy(nullable = v)
    case x: ATimestamp => x.copy(nullable = v)
    case x: ATime => x.copy(nullable = v)
    case x: AEnum => x.copy(nullable = v)
    case x: AFloat16 => x.copy(nullable = v)
    case x: AFloat32 => x.copy(nullable = v)
    case x: AFloat64 => x.copy(nullable = v)
    case x: AInt8 => x.copy(nullable = v)
    case x: AInt16 => x.copy(nullable = v)
    case x: AInt32 => x.copy(nullable = v)
    case x: AInt64 => x.copy(nullable = v)
    case x: AUInt8 => x.copy(nullable = v)
    case x: AUInt16 => x.copy(nullable = v)
    case x: AUInt32 => x.copy(nullable = v)
    case x: AUInt64 => x.copy(nullable = v)
    case x: AGeography => x.copy(nullable = v)
    case x: ANull => x
    case x: AString => x.copy(nullable = v)
    case x: AList => x.copy(nullable = v)
    case x: ASet => x.copy(nullable = v)
    case x: AMap => x.copy(nullable = v)
    case x: AStruct => x.copy(nullable = v)
    case x: ACollection => x.copy(nullable = v)
  }

  private[types] def setDescription(t: ArtiType, d: String): ArtiType = t match {
    case x: ABinary => x.copy(description = Some(d))
    case x: ABoolean => x.copy(description = Some(d))
    case x: ADate => x.copy(description = Some(d))
    case x: ADateTime => x.copy(description = Some(d))
    case x: ATimestamp => x.copy(description = Some(d))
    case x: ATime => x.copy(description = Some(d))
    case x: AEnum => x.copy(description = Some(d))
    case x: AFloat16 => x.copy(description = Some(d))
    case x: AFloat32 => x.copy(description = Some(d))
    case x: AFloat64 => x.copy(description = Some(d))
    case x: AInt8 => x.copy(description = Some(d))
    case x: AInt16 => x.copy(description = Some(d))
    case x: AInt32 => x.copy(description = Some(d))
    case x: AInt64 => x.copy(description = Some(d))
    case x: AUInt8 => x.copy(description = Some(d))
    case x: AUInt16 => x.copy(description = Some(d))
    case x: AUInt32 => x.copy(description = Some(d))
    case x: AUInt64 => x.copy(description = Some(d))
    case x: AGeography => x.copy(description = Some(d))
    case x: ANull => x.copy(description = Some(d))
    case x: AString => x.copy(description = Some(d))
    case x: AList => x.copy(description = Some(d))
    case x: ASet => x.copy(description = Some(d))
    case x: AMap => x.copy(description = Some(d))
    case x: AStruct => x.copy(description = Some(d))
    case x: ACollection => x.copy(description = Some(d))
  }

  /** The registered system: one priority-0 adapter over the full mapping,
    * shaped exactly like [[TypeSystemRegistry.spark]]'s — so a test can
    * resolve Avro↔Arti for every inventory row through the REGISTRY, not
    * through this object directly. */
  def registry(): TypeSystemRegistry = {
    val ts = new TypeSystemRegistry("avro")
    ts.registerAdapter(new TypeAdapter {
      override def key: String = "avro-core"
      def matchesArti(t: ArtiType): Boolean = true
      def matchesSystem(t: Any): Boolean = t.isInstanceOf[Schema]
      def toArti(t: Any, root: TypeSystemRegistry): ArtiType =
        AvroTypeSystem.toArti(t.asInstanceOf[Schema])
      def toSystem(t: ArtiType, root: TypeSystemRegistry): Any =
        AvroTypeSystem.toAvro(t)
    })
    ts
  }
}

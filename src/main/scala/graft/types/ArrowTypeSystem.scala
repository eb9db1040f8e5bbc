package graft.types

import scala.jdk.CollectionConverters._

import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}

/** F28/F32 — the THIRD foreign type system wired through the TypeAdapter
  * registry: Apache Arrow, the reference's own second adapter
  * (src/arti/types/pyarrow.py:12-368 maps arti types to `pa.field`/
  * `pa.DataType`; this maps them to `arrow-vector`'s
  * `org.apache.arrow.vector.types.pojo.Field`, the JVM spelling of the
  * identical schema model — the jars Spark itself ships for its Arrow
  * interchange).
  *
  * The system-side value is a `Field`, not a bare `ArrowType`, exactly as
  * the reference converts to `pa.field` (pyarrow.py:309-315): Arrow hangs
  * nullability, metadata, and children on the Field, so that is where
  * struct names, descriptions, and the engine markers ride. Metadata keys
  * reuse [[AvroTypeSystem]]'s prop names (the reference's pyarrow adapter
  * rides schema metadata the same way, pyarrow.py:216-270).
  *
  * Arrow is the most FAITHFUL of the three systems — unsigned ints, half
  * floats, second-precision temporals, and non-string map keys all exist
  * natively (each one a widening or refusal in the Avro leg), so the only
  * prop-carried markers are Set-ness, Geography, Enum, Collection
  * partition/cluster keys, and descriptions. */
object ArrowTypeSystem {
  import ArtiType._
  import AvroTypeSystem.{setDescription, setNullable, ClusterByProp, CollectionProp, GeoFormatProp, GeoSridProp, PartitionByProp, SetProp}

  val DescriptionProp = "graft.description"
  val EnumNameProp = "graft.enum.name"
  val EnumItemsProp = "graft.enum.items"
  /** Authoritative carrier of a struct's OWN name: Arrow has no separate
    * record-name slot (unlike Avro), and a struct nested as a field/map
    * entry must answer to the outer name — so the type name rides
    * metadata and the Field name stays positional. */
  val StructNameProp = "graft.struct.name"

  // ------------------------------------------------------------ to Arrow
  def toArrow(t: ArtiType): Field = toField(nameFor(t), t)

  /** Scalars convert under a conventional name; structs keep their own
    * (the round trip reads the struct name back off the Field, like
    * pa.field(name, ...) in the reference). A Collection's field is named
    * by its ELEMENT struct — the collection name rides CollectionProp, as
    * the Avro leg keeps the record name for the element. */
  private def nameFor(t: ArtiType): String = t match {
    case s: AStruct     => s.name
    case c: ACollection => nameFor(c.element)
    case _              => "value"
  }

  private def toField(name: String, t: ArtiType): Field = {
    val md = scala.collection.mutable.LinkedHashMap.empty[String, String]
    t.description.foreach(md(DescriptionProp) = _)
    val (at, children): (ArrowType, Seq[Field]) = t match {
      case ABinary(Some(n), _, _) => (new ArrowType.FixedSizeBinary(n.toInt), Nil)
      case ABinary(None, _, _)    => (new ArrowType.Binary, Nil)
      case _: ABoolean            => (new ArrowType.Bool, Nil)
      case _: ADate               => (new ArrowType.Date(DateUnit.DAY), Nil)
      // tz-naive DateTime is Arrow's null-timezone timestamp; the UTC
      // Timestamp carries the zone — both at FULL precision (Arrow has
      // SECOND..NANOSECOND; the Avro leg had to widen seconds to millis)
      case ADateTime(p, _, _)     => (new ArrowType.Timestamp(unit(p), null), Nil)
      case ATimestamp(p, _, _)    => (new ArrowType.Timestamp(unit(p), "UTC"), Nil)
      case ATime(p, _, _)         => p match {
        case TimePrecision.Second | TimePrecision.Millisecond =>
          (new ArrowType.Time(unit(p), 32), Nil)
        case _ => (new ArrowType.Time(unit(p), 64), Nil)
      }
      case AEnum(ename, underlying, items, _, _) =>
        // same symbol rule as the Avro leg: only (non-empty) simple-symbol
        // item sets ride the metadata (arbitrary items would need an
        // escaping codec, and "" can't encode an empty set distinguishably);
        // others convert as their underlying type, enum-ness dropped one-way
        if (items.nonEmpty &&
            items.forall { case s: String => s.matches("[A-Za-z_][A-Za-z0-9_]*"); case _ => false }) {
          md(EnumNameProp) = ename
          md(EnumItemsProp) = items.map(_.toString).mkString(",")
        }
        val u = toField(name, setNullable(underlying, v = false))
        (u.getType, u.getChildren.asScala.toSeq)
      case _: AFloat16            => (new ArrowType.FloatingPoint(FloatingPointPrecision.HALF), Nil)
      case _: AFloat32            => (new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE), Nil)
      case _: AFloat64            => (new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE), Nil)
      case _: AInt8               => (new ArrowType.Int(8, true), Nil)
      case _: AInt16              => (new ArrowType.Int(16, true), Nil)
      case _: AInt32              => (new ArrowType.Int(32, true), Nil)
      case _: AInt64              => (new ArrowType.Int(64, true), Nil)
      case _: AUInt8              => (new ArrowType.Int(8, false), Nil)
      case _: AUInt16             => (new ArrowType.Int(16, false), Nil)
      case _: AUInt32             => (new ArrowType.Int(32, false), Nil)
      case _: AUInt64             => (new ArrowType.Int(64, false), Nil)
      case AGeography(format, srid, _, _) =>
        md(GeoFormatProp) = format
        srid.foreach(md(GeoSridProp) = _)
        (if (format == "WKB") new ArrowType.Binary else new ArrowType.Utf8, Nil)
      case _: ANull               => (new ArrowType.Null, Nil)
      case _: AString             => (new ArrowType.Utf8, Nil)
      case AList(e, _, _)         => (new ArrowType.List, Seq(childField("element", e)))
      case ASet(e, _, _)          =>
        md(SetProp) = "true"
        (new ArrowType.List, Seq(childField("element", e)))
      case AMap(k, v, _, _)       =>
        // Arrow's map child layout: a non-nullable "entries" struct of
        // (key, value), key non-nullable — any key type (Avro refuses
        // non-string keys; Arrow is faithful)
        val entries = new Field("entries",
          new FieldType(false, new ArrowType.Struct, null, null),
          Seq(childField("key", setNullable(k, v = false)), childField("value", v)).asJava)
        (new ArrowType.Map(false), Seq(entries))
      case AStruct(sname, fields, _, _) =>
        md(StructNameProp) = sname
        (new ArrowType.Struct, fields.map { case (fn, ft) => toField(fn, ft) })
      case ACollection(cname, element, partitionBy, clusterBy, _, _) =>
        md(CollectionProp) = cname
        if (partitionBy.nonEmpty) md(PartitionByProp) = partitionBy.mkString(",")
        if (clusterBy.nonEmpty) md(ClusterByProp) = clusterBy.mkString(",")
        element match {
          case s: AStruct => md(StructNameProp) = s.name
          case _          => ()
        }
        val e = toField(nameFor(element), element)
        (e.getType, e.getChildren.asScala.toSeq)
    }
    new Field(name, new FieldType(t.nullable, at, null, md.asJava), children.asJava)
  }

  /** Container slots (list element, map key/value) take the conventional
    * slot name for scalars, but a STRUCT keeps its own name — struct names
    * have no other carrier in Arrow than the Field name, and the slot
    * names are convention, not spec (pyarrow itself uses "item" where
    * arrow-java uses "element"). */
  private def childField(slot: String, t: ArtiType): Field =
    toField(t match {
      case s: AStruct     => s.name
      case c: ACollection => nameFor(c)
      case _              => slot
    }, t)

  private def unit(p: TimePrecision): TimeUnit = p match {
    case TimePrecision.Second      => TimeUnit.SECOND
    case TimePrecision.Millisecond => TimeUnit.MILLISECOND
    case TimePrecision.Microsecond => TimeUnit.MICROSECOND
    case TimePrecision.Nanosecond  => TimeUnit.NANOSECOND
  }

  private def precision(u: TimeUnit): TimePrecision = u match {
    case TimeUnit.SECOND      => TimePrecision.Second
    case TimeUnit.MILLISECOND => TimePrecision.Millisecond
    case TimeUnit.MICROSECOND => TimePrecision.Microsecond
    case TimeUnit.NANOSECOND  => TimePrecision.Nanosecond
  }

  // ------------------------------------------------------------- to Arti
  def toArti(f: Field): ArtiType = {
    val md = Option(f.getMetadata).map(_.asScala.toMap).getOrElse(Map.empty)
    def prop(k: String): Option[String] = md.get(k)
    val base: ArtiType = f.getType match {
      case i: ArrowType.Int => (i.getBitWidth, i.getIsSigned) match {
        case (8, true)   => AInt8()
        case (16, true)  => AInt16()
        case (32, true)  => AInt32()
        case (64, true)  => AInt64()
        case (8, false)  => AUInt8()
        case (16, false) => AUInt16()
        case (32, false) => AUInt32()
        case (64, false) => AUInt64()
        case (w, s) => throw new UnsupportedOperationException(
          s"Arrow Int(bitWidth=$w, signed=$s) has no Arti analog")
      }
      case fp: ArrowType.FloatingPoint => fp.getPrecision match {
        case FloatingPointPrecision.HALF   => AFloat16()
        case FloatingPointPrecision.SINGLE => AFloat32()
        case FloatingPointPrecision.DOUBLE => AFloat64()
      }
      case _: ArrowType.Bool => ABoolean()
      case _: ArrowType.Utf8 =>
        prop(GeoFormatProp).map(fmt => AGeography(fmt, prop(GeoSridProp))).getOrElse(AString())
      case _: ArrowType.Binary =>
        prop(GeoFormatProp).map(fmt => AGeography(fmt, prop(GeoSridProp))).getOrElse(ABinary())
      case fb: ArrowType.FixedSizeBinary => ABinary(Some(fb.getByteWidth.toLong))
      case d: ArrowType.Date =>
        if (d.getUnit == DateUnit.DAY) ADate()
        else throw new UnsupportedOperationException(
          "Arrow Date(MILLISECOND) has no Arti analog (Date is day-granular)")
      case ts: ArrowType.Timestamp =>
        if (ts.getTimezone == null) ADateTime(precision(ts.getUnit))
        else ATimestamp(precision(ts.getUnit))
      case tm: ArrowType.Time => ATime(precision(tm.getUnit))
      case _: ArrowType.Null => ANull()
      case _: ArrowType.List =>
        val e = toArti(f.getChildren.get(0))
        if (prop(SetProp).contains("true")) ASet(e) else AList(e)
      case _: ArrowType.Map =>
        val entries = f.getChildren.get(0)
        AMap(toArti(entries.getChildren.get(0)), toArti(entries.getChildren.get(1)))
      case _: ArrowType.Struct =>
        val fields = f.getChildren.asScala.toSeq.map(c => c.getName -> toArti(c))
        val sname = prop(StructNameProp).getOrElse(f.getName)
        prop(CollectionProp) match {
          case Some(collName) =>
            def split(k: String) = prop(k).map(_.split(",").toSeq).getOrElse(Nil)
            ACollection(collName, AStruct(sname, fields),
              split(PartitionByProp), split(ClusterByProp))
          case None => AStruct(sname, fields)
        }
      case other => throw new UnsupportedOperationException(
        s"no Arti analog for Arrow type $other (same refusal shape as pyarrow.py's unmapped types)")
    }
    val withEnum = prop(EnumNameProp) match {
      case Some(ename) =>
        AEnum(ename, base, prop(EnumItemsProp).map(_.split(",").toSeq).getOrElse(Nil))
      case None => base
    }
    val withNullable =
      if (f.isNullable && !withEnum.isInstanceOf[ANull]) setNullable(withEnum) else withEnum
    prop(DescriptionProp).map(setDescription(withNullable, _)).getOrElse(withNullable)
  }

  /** The registered system: one priority-0 adapter over the full mapping,
    * shaped exactly like the spark/avro registries — tests resolve
    * Arrow↔Arti for every §1.2 inventory row THROUGH the registry. */
  def registry(): TypeSystemRegistry = {
    val ts = new TypeSystemRegistry("arrow")
    ts.registerAdapter(new TypeAdapter {
      override def key: String = "arrow-core"
      def matchesArti(t: ArtiType): Boolean = true
      def matchesSystem(t: Any): Boolean = t.isInstanceOf[Field]
      def toArti(t: Any, root: TypeSystemRegistry): ArtiType =
        ArrowTypeSystem.toArti(t.asInstanceOf[Field])
      def toSystem(t: ArtiType, root: TypeSystemRegistry): Any =
        ArrowTypeSystem.toArrow(t)
    })
    ts
  }
}

package graft

import scala.jdk.CollectionConverters._

import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType}
import org.scalatest.funsuite.AnyFunSuite

import graft.types.ArtiType._
import graft.types.{ArrowTypeSystem, ArtiType}

/** F28/F32 — the Arrow adapter resolved THROUGH the TypeSystemRegistry:
  * the third registered system (spark, avro, arrow), completing the
  * reference's pyarrow leg (src/arti/types/pyarrow.py:12-368; its test
  * style is the paired table of tests/arti/types/test_pyarrow.py). Arrow
  * is the most faithful carrier of the three — rows that widen or refuse
  * in the Avro leg (unsigned ints, half floats, second-precision
  * temporals, non-string map keys) round-trip EXACTLY here. */
class ArrowTypesSpec extends AnyFunSuite {
  import TimePrecision._

  private val arrow = ArrowTypeSystem.registry()

  private def sys(t: ArtiType): Field = arrow.toSystem(t).asInstanceOf[Field]
  private def arti(f: Field): ArtiType = arrow.toArti(f)

  // ---- exact rows: toSystem then toArti is the identity. Note the rows
  // that are NOT in AvroTypesSpec's exact table: every unsigned int,
  // float16, the full second-precision temporal family, and an int-keyed
  // map — Arrow carries each natively.
  private val exactRows: Seq[(String, ArtiType)] = Seq(
    "boolean" -> ABoolean(),
    "int8" -> AInt8(),
    "int16" -> AInt16(),
    "int32" -> AInt32(),
    "int64" -> AInt64(),
    "uint8" -> AUInt8(),
    "uint16" -> AUInt16(),
    "uint32" -> AUInt32(),
    "uint64" -> AUInt64(),
    "float16" -> AFloat16(),
    "float32" -> AFloat32(),
    "float64" -> AFloat64(),
    "string" -> AString(),
    "binary" -> ABinary(),
    "binary(16)" -> ABinary(Some(16)),
    "date" -> ADate(),
    "timestamp(s)" -> ATimestamp(Second),
    "timestamp(ms)" -> ATimestamp(Millisecond),
    "timestamp(us)" -> ATimestamp(Microsecond),
    "timestamp(ns)" -> ATimestamp(Nanosecond),
    "datetime(s)" -> ADateTime(Second),
    "datetime(ms)" -> ADateTime(Millisecond),
    "datetime(us)" -> ADateTime(Microsecond),
    "datetime(ns)" -> ADateTime(Nanosecond),
    "time(s)" -> ATime(Second),
    "time(ms)" -> ATime(Millisecond),
    "time(us)" -> ATime(Microsecond),
    "time(ns)" -> ATime(Nanosecond),
    "geography" -> AGeography("WKT", Some("4326")),
    "geography-wkb" -> AGeography("WKB", None),
    "null" -> ANull(),
    "enum" -> AEnum("color", AString(), Seq("RED", "GREEN", "BLUE")),
    "list" -> AList(AInt64()),
    "set" -> ASet(AString()),
    "map" -> AMap(AString(), AFloat64()),
    "map-int-key" -> AMap(AInt64(), AString()), // Avro refuses this row
    "struct" -> AStruct("point", Seq("x" -> AFloat64(), "y" -> AFloat64())),
    "nested-struct" -> AStruct("outer", Seq(
      "id" -> AInt64(),
      "tags" -> AList(AString()),
      "inner" -> AStruct("inner", Seq("b" -> ABoolean())))),
    "collection" -> ACollection("events", AStruct("event", Seq(
      "day" -> AInt32(), "kind" -> AString(), "value" -> AFloat64())),
      partitionBy = Seq("day"), clusterBy = Seq("kind")))

  for ((label, t) <- exactRows)
    test(s"arrow round-trip: $label") {
      assert(arti(sys(t)) === t)
    }

  test("nullable rides Field.isNullable and survives nesting") {
    val f = sys(AInt64(nullable = true))
    assert(f.isNullable && f.getType.isInstanceOf[ArrowType.Int])
    assert(arti(f) === AInt64(nullable = true))
    assert(arti(sys(AList(AString(nullable = true)))) === AList(AString(nullable = true)))
    val st = AStruct("r", Seq("a" -> AInt64(), "b" -> AString(nullable = true)))
    assert(arti(sys(st)) === st)
  }

  test("descriptions ride field metadata on every level (Avro only keeps struct-field docs)") {
    val t = AStruct("r", Seq(
      "a" -> AInt64(nullable = false, description = Some("the key")),
      "b" -> AList(AString(description = Some("tag")))))
    assert(arti(sys(t)) === t)
    assert(sys(t).getChildren.get(0).getMetadata.get(ArrowTypeSystem.DescriptionProp) === "the key")
  }

  test("enum with non-symbol items degrades to its underlying; int enum likewise") {
    assert(arti(sys(AEnum("langs", AString(), Seq("en-US", "pt-BR")))) === AString())
    assert(arti(sys(AEnum("codes", AInt32(), Seq(1, 2, 3)))) === AInt32())
  }

  test("explicit refusals: millisecond dates and unmapped Arrow types fall out loudly") {
    val msDate = new Field("value",
      FieldType.notNullable(new ArrowType.Date(DateUnit.MILLISECOND)), null)
    assertThrows[UnsupportedOperationException] { arti(msDate) }
    val interval = new Field("value",
      FieldType.notNullable(new ArrowType.Interval(
        org.apache.arrow.vector.types.IntervalUnit.YEAR_MONTH)), null)
    assertThrows[UnsupportedOperationException] { arti(interval) }
    assertThrows[UnsupportedOperationException] { arrow.toArti("not a field") }
  }

  test("bridge: a Spark schema crosses to an Arrow schema through ArtiType") {
    // the F28 payoff with the third system: export an artifact's Spark
    // schema as the Arrow schema for a Flight/IPC edge, no hand-mapping
    import org.apache.spark.sql.types._
    val sparkRegistry = graft.types.TypeSystemRegistry.spark()
    val sparkSchema = StructType(Seq(
      StructField("o_orderkey", LongType, nullable = false),
      StructField("o_orderstatus", StringType, nullable = false),
      StructField("o_totalprice", DoubleType, nullable = true),
      StructField("o_orderdate", TimestampNTZType, nullable = false),
      StructField("tags", ArrayType(StringType, containsNull = false), nullable = false)))
    val hub = sparkRegistry.toArti(sparkSchema)
    val f = sys(hub.asInstanceOf[ArtiType])
    assert(f.getType.isInstanceOf[ArrowType.Struct])
    val kids = f.getChildren.asScala.map(c => c.getName -> c).toMap
    assert(kids("o_orderkey").getType === new ArrowType.Int(64, true))
    assert(!kids("o_orderkey").isNullable)
    assert(kids("o_totalprice").isNullable)
    val ts = kids("o_orderdate").getType.asInstanceOf[ArrowType.Timestamp]
    assert(ts.getUnit === TimeUnit.MICROSECOND && ts.getTimezone == null)
    assert(kids("tags").getType.isInstanceOf[ArrowType.List])
    // and back: the Arrow side round-trips to the same hub type
    assert(arti(f) === hub)
  }

  test("collection metadata rides field metadata (partition/cluster keys, name)") {
    import graft.types.AvroTypeSystem.{ClusterByProp, CollectionProp, PartitionByProp}
    val c = exactRows.collectFirst { case ("collection", t: ACollection) => t }.get
    val f = sys(c)
    assert(f.getType.isInstanceOf[ArrowType.Struct] && f.getName === "event")
    val md = f.getMetadata
    assert(md.get(CollectionProp) === "events")
    assert(md.get(PartitionByProp) === "day")
    assert(md.get(ClusterByProp) === "kind")
  }

  test("float16 and unsigned ints hit the native Arrow types, no widening") {
    assert(sys(AFloat16()).getType ===
      new ArrowType.FloatingPoint(FloatingPointPrecision.HALF))
    assert(sys(AUInt8()).getType === new ArrowType.Int(8, false))
    assert(sys(AUInt64()).getType === new ArrowType.Int(64, false))
  }
}

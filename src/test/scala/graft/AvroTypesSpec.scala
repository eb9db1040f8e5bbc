package graft

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.Schema.{Type => AT}
import org.scalatest.funsuite.AnyFunSuite

import graft.types.ArtiType._
import graft.types.{ArtiType, AvroTypeSystem}

/** F28/F31 — the Avro adapter resolved THROUGH the TypeSystemRegistry,
  * proving the registry seam with a second real system (the reference's
  * second adapter is bigquery; its test style is the paired-table of
  * tests/arti/types/test_bigquery_adapters.py — exact round-trips, widening
  * one-ways, and explicit refusals). */
class AvroTypesSpec extends AnyFunSuite {
  import TimePrecision._

  private val avro = AvroTypeSystem.registry()

  private def sys(t: ArtiType): Schema = avro.toSystem(t).asInstanceOf[Schema]
  private def arti(s: Schema): ArtiType = avro.toArti(s)

  // ---- exact rows: toSystem then toArti is the identity (the reference's
  // `assert bigquery_type_system.to_artigraph(to_system(a)) == a` pattern)
  private val exactRows: Seq[(String, ArtiType)] = Seq(
    "boolean" -> ABoolean(),
    "int32" -> AInt32(),
    "int64" -> AInt64(),
    "float32" -> AFloat32(),
    "float64" -> AFloat64(),
    "string" -> AString(),
    "binary" -> ABinary(),
    "binary(16)" -> ABinary(Some(16)),
    "uint64" -> AUInt64(),
    "date" -> ADate(),
    "timestamp(ms)" -> ATimestamp(Millisecond),
    "timestamp(us)" -> ATimestamp(Microsecond),
    "timestamp(ns)" -> ATimestamp(Nanosecond),
    "datetime(ms)" -> ADateTime(Millisecond),
    "datetime(us)" -> ADateTime(Microsecond),
    "datetime(ns)" -> ADateTime(Nanosecond),
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
    "struct" -> AStruct("point", Seq("x" -> AFloat64(), "y" -> AFloat64())),
    "nested-struct" -> AStruct("outer", Seq(
      "id" -> AInt64(),
      "tags" -> AList(AString()),
      "inner" -> AStruct("inner", Seq("b" -> ABoolean())))),
    "collection" -> ACollection("events", AStruct("event", Seq(
      "day" -> AInt32(), "kind" -> AString(), "value" -> AFloat64())),
      partitionBy = Seq("day"), clusterBy = Seq("kind")))

  for ((label, t) <- exactRows)
    test(s"avro round-trip: $label") {
      assert(arti(sys(t)) === t)
    }

  test("nullable maps to union [null, T] and back") {
    val s = sys(AInt64(nullable = true))
    assert(s.getType === AT.UNION)
    assert(s.getTypes.asScala.map(_.getType) === Seq(AT.NULL, AT.LONG))
    assert(arti(s) === AInt64(nullable = true))
    // nullable survives inside containers and struct fields
    assert(arti(sys(AList(AString(nullable = true)))) === AList(AString(nullable = true)))
    val st = AStruct("r", Seq("a" -> AInt64(), "b" -> AString(nullable = true)))
    assert(arti(sys(st)) === st)
  }

  // ---- widening one-ways (the reference promotes the int/float families
  // into BigQuery's single INTEGER/FLOAT64 the same way,
  // types/bigquery.py:80-87) — system-direction mapping asserted, and the
  // return trip lands on the canonical wide type, not the original
  private val wideningRows: Seq[(ArtiType, AT, ArtiType)] = Seq(
    (AInt8(), AT.INT, AInt32()),
    (AInt16(), AT.INT, AInt32()),
    (AUInt8(), AT.INT, AInt32()),
    (AUInt16(), AT.INT, AInt32()),
    (AUInt32(), AT.LONG, AInt64()),
    (AFloat16(), AT.FLOAT, AFloat32()))

  for ((t, at, back) <- wideningRows)
    test(s"avro widening: $t -> $at -> $back") {
      val s = sys(t)
      assert(s.getType === at && s.getLogicalType == null)
      assert(arti(s) === back)
    }

  test("second-precision time family widens to millis") {
    assert(sys(ATimestamp(Second)).getLogicalType.getName === "timestamp-millis")
    assert(sys(ADateTime(Second)).getLogicalType.getName === "local-timestamp-millis")
    assert(sys(ATime(Second)).getLogicalType.getName === "time-millis")
  }

  test("uint64 is the decimal(20,0) container, other decimals refuse") {
    val s = sys(AUInt64())
    assert(s.getType === AT.BYTES)
    val d = s.getLogicalType.asInstanceOf[LogicalTypes.Decimal]
    assert(d.getPrecision === 20 && d.getScale === 0)
    val other = LogicalTypes.decimal(10, 2).addToSchema(Schema.create(AT.BYTES))
    assertThrows[UnsupportedOperationException] { arti(other) }
  }

  test("enum with non-symbol items degrades to string; int enum to its underlying") {
    assert(sys(AEnum("langs", AString(), Seq("en-US", "pt-BR"))).getType === AT.STRING)
    assert(sys(AEnum("codes", AInt32(), Seq(1, 2, 3))).getType === AT.INT)
  }

  test("explicit refusals: non-string map keys and general unions") {
    assertThrows[UnsupportedOperationException] { sys(AMap(AInt64(), AString())) }
    val genUnion = Schema.createUnion(Schema.create(AT.STRING), Schema.create(AT.LONG))
    assertThrows[UnsupportedOperationException] { arti(genUnion) }
  }

  test("registry resolution is live: unknown system type falls out loudly") {
    assertThrows[UnsupportedOperationException] { avro.toArti("not a schema") }
  }

  test("bridge: a Spark schema crosses to an Avro schema through ArtiType") {
    // the F28 payoff: two REGISTERED systems interoperate through the hub
    // type — a user exports an artifact's Spark schema as the Avro schema
    // for their Kafka/ingest edge without hand-mapping either side
    import org.apache.spark.sql.types._
    val sparkRegistry = graft.types.TypeSystemRegistry.spark()
    val sparkSchema = StructType(Seq(
      StructField("o_orderkey", LongType, nullable = false),
      StructField("o_orderstatus", StringType, nullable = false),
      StructField("o_totalprice", DoubleType, nullable = true),
      StructField("o_orderdate", TimestampNTZType, nullable = false),
      StructField("tags", ArrayType(StringType, containsNull = false), nullable = false)))
    val hub = sparkRegistry.toArti(sparkSchema)
    val avroSchema = sys(hub.asInstanceOf[ArtiType])
    assert(avroSchema.getType === AT.RECORD)
    val fields = avroSchema.getFields.asScala.map(f => f.name() -> f.schema()).toMap
    assert(fields("o_orderkey").getType === AT.LONG)
    assert(fields("o_orderstatus").getType === AT.STRING)
    assert(fields("o_totalprice").getType === AT.UNION) // nullable -> [null, double]
    assert(fields("o_orderdate").getLogicalType.getName === "local-timestamp-micros")
    assert(fields("tags").getType === AT.ARRAY)
    // and back: the Avro side round-trips to the same hub type
    assert(arti(avroSchema) === hub)
  }

  test("collection metadata rides Avro props (partition/cluster keys, name)") {
    val c = exactRows.collectFirst { case ("collection", t: ACollection) => t }.get
    val s = sys(c)
    assert(s.getType === AT.RECORD && s.getName === "event")
    assert(s.getProp(AvroTypeSystem.CollectionProp) === "events")
    assert(s.getProp(AvroTypeSystem.PartitionByProp) === "day")
    assert(s.getProp(AvroTypeSystem.ClusterByProp) === "kind")
  }
}

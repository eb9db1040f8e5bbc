package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.types.ArtiType._
import graft.types.{ArtiType, SparkTypeSystem => S}

/** Type-system adapter round trips, modeled on the reference's adapter tests
  * (reference: tests/arti/types/test_pyarrow_adapters.py et al). */
class TypesSpec extends AnyFunSuite {

  val scalars: Seq[(ArtiType, DataType)] = Seq(
    ABinary() -> BinaryType,
    ABoolean() -> BooleanType,
    ADate() -> DateType,
    ADateTime() -> TimestampNTZType,
    ATimestamp() -> TimestampType,
    AFloat32() -> FloatType,
    AFloat64() -> DoubleType,
    AInt8() -> ByteType,
    AInt16() -> ShortType,
    AInt32() -> IntegerType,
    AInt64() -> LongType,
    AUInt64() -> DecimalType(20, 0),
    AString() -> StringType)

  test("scalar mapping") {
    for ((arti, spark) <- scalars) assert(S.toSpark(arti) === spark, s"$arti")
  }

  test("round trip: arti -> spark -> arti is identity for canonical scalars") {
    for ((arti, _) <- scalars if !arti.isInstanceOf[ABinary]) // Binary roundtrips w/o byteSize
      assert(S.toArti(S.toSpark(arti)) === arti)
  }

  test("unsigned promotion") {
    assert(S.toSpark(AUInt8()) === ShortType)
    assert(S.toSpark(AUInt16()) === IntegerType)
    assert(S.toSpark(AUInt32()) === LongType)
  }

  test("containers") {
    assert(S.toSpark(AList(AInt64())) === ArrayType(LongType, containsNull = false))
    assert(S.toSpark(AList(AString(nullable = true))) === ArrayType(StringType, containsNull = true))
    assert(S.toSpark(AMap(AString(), AFloat64())) === MapType(StringType, DoubleType, valueContainsNull = false))
    val st = AStruct("s", Seq("a" -> AInt32(), "b" -> AString(nullable = true)))
    assert(S.toSpark(st) === StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", StringType, nullable = true))))
  }

  test("collection validators reject unknown and overlapping fields") {
    val el = AStruct("row", Seq("id" -> AInt64(), "date" -> ADate()))
    assertThrows[IllegalArgumentException] {
      ACollection("c", el, partitionBy = Seq("nope"))
    }
    assertThrows[IllegalArgumentException] {
      ACollection("c", el, partitionBy = Seq("date"), clusterBy = Seq("date"))
    }
    val ok = ACollection("c", el, partitionBy = Seq("date"), clusterBy = Seq("id"))
    assert(ok.isPartitioned)
  }

  test("collection schema carries partition metadata") {
    val c = ACollection("t", AStruct("row", Seq("id" -> AInt64(), "date" -> ADate())), partitionBy = Seq("date"))
    val schema = S.toSchema(c)
    val meta = schema("id").metadata.getMetadata(S.CollectionMetaKey)
    assert(meta.getStringArray("partition_by").toSeq === Seq("date"))
  }
}

package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.fingerprints.Fingerprint
import graft.partitions.PartitionField.{DateField, IntField}
import graft.storage.PathTemplate

/** Template render/parse tables, mirroring the reference's parametrized
  * cases (reference: tests/arti/storage/test_storage_internal.py:61-232). */
class PathTemplateSpec extends AnyFunSuite {

  val d = DateField(LocalDate.of(1970, 1, 2))

  test("render {date.iso}.json") {
    val t = PathTemplate("/data/{date.iso}.json", Map("date" -> "date"))
    assert(t.render(Map("date" -> d)) === "/data/1970-01-02.json")
  }

  test("render composite {date.Y}/{date.m}/{date.d}") {
    val t = PathTemplate("/data/{date.Y}/{date.m}/{date.d}/part", Map("date" -> "date"))
    assert(t.render(Map("date" -> d)) === "/data/1970/01/02/part")
  }

  test("render int hex and default component") {
    val t = PathTemplate("/p/{i.hex}/{i}", Map("i" -> "int"))
    assert(t.render(Map("i" -> IntField(255))) === "/p/ff/255")
  }

  test("parse inverts render (iso)") {
    val t = PathTemplate("/data/{date.iso}.json", Map("date" -> "date"))
    val Some((key, fp)) = t.parse("/data/1970-01-02.json")
    assert(key === Map("date" -> d))
    assert(fp === None)
  }

  test("parse inverts render (composite Y/m/d reassembles one DateField)") {
    val t = PathTemplate("/data/{date.Y}/{date.m}/{date.d}/part", Map("date" -> "date"))
    val Some((key, _)) = t.parse("/data/1970/01/02/part")
    assert(key === Map("date" -> d))
  }

  test("parse extracts input_fingerprint") {
    val t = PathTemplate("/out/{date.iso}/{input_fingerprint}/f.parquet", Map("date" -> "date"))
    val rendered = t.render(Map("date" -> d), Map("input_fingerprint" -> "-12345"))
    assert(rendered === "/out/1970-01-02/-12345/f.parquet")
    val Some((key, fp)) = t.parse(rendered)
    assert(key === Map("date" -> d))
    assert(fp === Some(Fingerprint(-12345L)))
  }

  test("non-matching path returns None") {
    val t = PathTemplate("/data/{date.iso}.json", Map("date" -> "date"))
    assert(t.parse("/data/not-a-date.json") === None)
    assert(t.parse("/other/1970-01-02.json") === None)
  }

  test("wildcard form for globbing") {
    val t = PathTemplate("/data/{date.iso}.json", Map("date" -> "date"))
    assert(t.wildcard === "/data/*.json")
  }

  test("unbound field in render throws") {
    val t = PathTemplate("/data/{date.iso}.json", Map("date" -> "date"))
    assertThrows[IllegalArgumentException] { t.render(Map.empty) }
  }

  test("semantic metadata round-trips Enum/Set/Time/unsigned through Spark schemas") {
    import graft.types.{SparkTypeSystem => S}
    import graft.types.ArtiType._
    val s = AStruct("m", Seq(
      "e" -> AEnum("color", AString(), Seq("red", "blue"), nullable = true),
      "t" -> ASet(AInt64()),
      "u" -> AUInt32(),
      "clock" -> ATime(TimePrecision.Nanosecond)))
    val spark = S.toSpark(s).asInstanceOf[org.apache.spark.sql.types.StructType]
    val back = spark.fields.toSeq.map(S.fieldToArti)
    assert(back(0) === AEnum("color", AString(nullable = true), Seq("red", "blue"), nullable = true))
    assert(back(1) === ASet(AInt64()))
    assert(back(2) === AUInt32())
    assert(back(3) === ATime(TimePrecision.Nanosecond))
  }

  test("hard-coded index {date.Y[1970]} renders fixed value and checks consistency") {
    val t = PathTemplate("/data/{date.Y[1970]}/{date.m}/{date.d}", Map("date" -> "date"))
    assert(t.render(Map("date" -> d)) === "/data/1970/01/02")
    // a conflicting key fails the consistency check
    val conflicting = DateField(java.time.LocalDate.of(1999, 1, 2))
    assertThrows[IllegalArgumentException] { t.render(Map("date" -> conflicting)) }
    // parse only matches the fixed value
    val Some((key, _)) = t.parse("/data/1970/03/04")
    assert(key === Map("date" -> DateField(java.time.LocalDate.of(1970, 3, 4))))
    assert(t.parse("/data/1999/03/04") === None)
  }

  test("partial bind resolves graph-level placeholders, keeps key fields templated") {
    val t = PathTemplate("/wh/{graph_name}/{names}/{date.iso}.json", Map("date" -> "date"))
    val bound = t.bind(Map("graph_name" -> "spend", "names" -> "tx/daily"))
    assert(bound.template === "/wh/spend/tx/daily/{date.iso}.json")
    assert(bound.render(Map("date" -> d)) === "/wh/spend/tx/daily/1970-01-02.json")
    val Some((key, _)) = bound.parse("/wh/spend/tx/daily/1970-01-02.json")
    assert(key === Map("date" -> d))
  }
}

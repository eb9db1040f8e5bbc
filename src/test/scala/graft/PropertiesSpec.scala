package graft

import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.fingerprints.{Canonical, Fingerprint}
import graft.partitions.PartitionField.{DateField, IntField}
import graft.storage.PathTemplate
import graft.types.{ArtiType, SparkTypeSystem => S}
import graft.types.ArtiType._
import graft.util.MiniJson
import graft.util.MiniJson._

/** Property-based invariants for the algebraic cores: fingerprint XOR
  * algebra, render∘parse identity for path templates, and the two
  * persistence codecs (MiniJson, ArtiType). These are the laws everything
  * else leans on — memoization, partition discovery, model read-back. */
class PropertiesSpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, s"$name: ${r.status}")
  }

  // ------------------------------------------------------- fingerprints
  test("fingerprint combine is commutative, associative, identity-0, self-inverse") {
    check("xor-algebra", Prop.forAll { (a: Long, b: Long, c: Long) =>
      val (fa, fb, fc) = (Fingerprint(a), Fingerprint(b), Fingerprint(c))
      fa.combine(fb) == fb.combine(fa) &&
        fa.combine(fb).combine(fc) == fa.combine(fb.combine(fc)) &&
        fa.combine(Fingerprint.identity) == fa &&
        fa.combine(fa) == Fingerprint.identity
    })
  }

  test("combineAll folds identically in ANY order (shuffle-safety)") {
    check("combineAll-order", Prop.forAll { (xs: List[Long]) =>
      val fps = xs.map(Fingerprint(_))
      val forward = Fingerprint.combineAll(fps)
      forward == Fingerprint.combineAll(fps.reverse) &&
        forward == Fingerprint.combineAll(fps.sortBy(_.key))
    })
  }

  test("canonical encoding separates distinct scalar tuples") {
    check("canonical-injective", Prop.forAll { (a: (Long, String), b: (Long, String)) =>
      a == b || Canonical.encode(a) != Canonical.encode(b)
    })
  }

  // ------------------------------------------------------ path templates
  private val genDate: Gen[java.time.LocalDate] =
    Gen.choose(0L, 200L * 365).map(java.time.LocalDate.ofEpochDay)

  test("path templates: parse(render(key)) == key for date+int keys") {
    val tpl = PathTemplate("/data/{graph_name}/y={i}/d={date.iso}/{input_fingerprint}",
      Map("i" -> "int", "date" -> "date")).bind(Map("graph_name" -> "g"))
    check("render-parse-id",
      Prop.forAll(Gen.choose(-1000000L, 1000000L), genDate, Arbitrary.arbitrary[Long]) {
        (i, d, fp) =>
          val key = Map[String, graft.partitions.PartitionField]("i" -> IntField(i), "date" -> DateField(d))
          val path = tpl.render(key, Map("input_fingerprint" -> fp.toString))
          tpl.parse(path) == Some((key, Some(Fingerprint(fp))))
      })
  }

  test("path templates: trailing junk never parses") {
    val tpl = PathTemplate("/d/y={i}", Map("i" -> "int"))
    check("no-junk-parse",
      Prop.forAll(Gen.choose(-9999L, 9999L), Gen.alphaNumStr.suchThat(_.nonEmpty)) {
        (i, junk) =>
          val path = tpl.render(Map("i" -> IntField(i)))
          tpl.parse(path + "/" + junk).isEmpty
      })
  }

  // ------------------------------------------------------------ MiniJson
  private lazy val genJson: Gen[J] = Gen.sized { size =>
    val scalar = Gen.oneOf(
      Arbitrary.arbitrary[String].map(JStr.apply),
      Arbitrary.arbitrary[Long].map(JNum.apply),
      Arbitrary.arbitrary[Boolean].map(JBool.apply),
      Gen.const(JNull: J))
    if (size <= 1) scalar
    else Gen.oneOf(
      scalar,
      Gen.resize(size / 2, Gen.listOfN(3, genJson)).map(xs => JArr(xs): J),
      Gen.resize(size / 2, Gen.listOfN(3, Gen.zip(Arbitrary.arbitrary[String], genJson)))
        .map(fs => JObj(fs.distinctBy(_._1)): J))
  }

  test("MiniJson: parse(render(j)) == j for arbitrary trees (incl. control chars)") {
    check("minijson-roundtrip", Prop.forAll(genJson) { j =>
      MiniJson.parse(MiniJson.render(j)) == j
    })
  }

  // ------------------------------------------------------ ArtiType codec
  private lazy val genScalar: Gen[ArtiType] = Gen.oneOf(
    Gen.const(ABoolean(): ArtiType), Gen.const(ADate(): ArtiType), Gen.const(ADateTime(): ArtiType),
    Gen.const(ATimestamp(): ArtiType), Gen.const(AInt8(): ArtiType), Gen.const(AInt16(): ArtiType),
    Gen.const(AInt32(): ArtiType), Gen.const(AInt64(): ArtiType), Gen.const(AUInt8(): ArtiType),
    Gen.const(AUInt16(): ArtiType), Gen.const(AUInt32(): ArtiType), Gen.const(AUInt64(): ArtiType),
    Gen.const(AFloat32(): ArtiType), Gen.const(AFloat64(): ArtiType),
    Gen.oneOf(true, false).map(n => AString(nullable = n): ArtiType),
    Gen.oneOf(ArtiType.TimePrecision.all).map(p => ATime(p): ArtiType),
    Gen.nonEmptyListOf(Gen.asciiPrintableStr).map(items =>
      AEnum("e", AString(), items.distinct): ArtiType))

  private lazy val genType: Gen[ArtiType] = Gen.sized { size =>
    if (size <= 1) genScalar
    else Gen.oneOf(
      genScalar,
      Gen.resize(size / 2, genType).map(t => AList(t): ArtiType),
      Gen.resize(size / 2, genType).map(t => ASet(t): ArtiType),
      // Spark's MapType has no key-nullability attribute, so a TOP-LEVEL
      // nullable key is physically unrepresentable — a real limit of the
      // carrier, excluded from generation (nested nullability is fine)
      Gen.resize(size / 2, Gen.zip(genType.suchThat(!_.nullable), genType))
        .map { case (k, v) => AMap(k, v): ArtiType },
      Gen.resize(size / 2, Gen.listOfN(2, genType)).map(ts =>
        AStruct("s", ts.zipWithIndex.map { case (t, i) => s"f$i" -> t }): ArtiType))
  }

  test("ArtiType JSON codec: typeFromJson(typeToJson(t)) == t for generated types") {
    check("type-codec-roundtrip", Prop.forAll(genType) { t =>
      S.typeFromJson(S.typeToJson(t)) == t
    })
  }
}

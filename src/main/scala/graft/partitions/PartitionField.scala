package graft.partitions

import java.time.LocalDate
import graft.fingerprints.Fingerprint

/** Typed partition-key fields with formattable/parsable components,
  * mirroring the reference's registry (reference:
  * src/arti/partitions/__init__.py:21-159): only Date, Int*, and Null are
  * partitionable; DateField exposes Y/m/d/iso components, IntFields expose
  * value/hex.
  */
sealed trait PartitionField {
  /** component name → rendered string */
  def components: Map[String, String]
  def defaultComponent: String
  def render(component: String): String =
    components.getOrElse(component,
      throw new IllegalArgumentException(s"$this has no component '$component' (has ${components.keys.mkString(",")})"))
  def fingerprint: Fingerprint
}

object PartitionField {
  final case class DateField(date: LocalDate) extends PartitionField {
    def components: Map[String, String] = Map(
      "Y"   -> f"${date.getYear}%04d",
      "m"   -> f"${date.getMonthValue}%02d",
      "d"   -> f"${date.getDayOfMonth}%02d",
      "iso" -> date.toString)
    def defaultComponent = "iso"
    def fingerprint: Fingerprint = Fingerprint.fromString(s"DateField:${date.toString}")
  }

  final case class IntField(value: Long) extends PartitionField {
    def components: Map[String, String] = Map(
      "value" -> value.toString,
      "hex"   -> java.lang.Long.toHexString(value))
    def defaultComponent = "value"
    def fingerprint: Fingerprint = Fingerprint.fromString(s"IntField:$value")
  }

  case object NullField extends PartitionField {
    def components: Map[String, String] = Map("value" -> "null")
    def defaultComponent = "value"
    def fingerprint: Fingerprint = Fingerprint.fromString("NullField")
  }

  /** Reconstruct a field from parsed component strings (the inverse of
    * render, used by the path-template parser). */
  def fromComponents(kind: String, comps: Map[String, String]): PartitionField = kind match {
    case "date" =>
      comps.get("iso") match {
        case Some(iso) => DateField(LocalDate.parse(iso))
        case None =>
          DateField(LocalDate.of(
            comps.getOrElse("Y", throw new IllegalArgumentException(s"date needs Y or iso, got $comps")).toInt,
            comps.getOrElse("m", "1").toInt,
            comps.getOrElse("d", "1").toInt))
      }
    case "int" =>
      comps.get("value") match {
        case Some(v) => IntField(v.toLong)
        case None    => IntField(java.lang.Long.parseUnsignedLong(comps("hex"), 16))
      }
    case "null" => NullField
    case other  => throw new IllegalArgumentException(s"unpartitionable field kind: $other")
  }

  /** regex fragment matching one rendered component. */
  def componentPattern(kind: String, component: String): String = (kind, component) match {
    case ("date", "iso") => """\d{4}-\d{2}-\d{2}"""
    case ("date", "Y")   => """\d{4}"""
    case ("date", _)     => """\d{2}"""
    case ("int", "hex")  => """[0-9a-f]+"""
    case ("int", _)      => """-?\d+"""
    case ("null", _)     => """null"""
    case other           => throw new IllegalArgumentException(s"unknown $other")
  }
}

object PartitionKey {
  /** A composite partition key: field name → typed field. Empty map =
    * NotPartitioned (reference: src/arti/partitions/__init__.py:59-74). */
  type PartitionKey = Map[String, PartitionField]
  val NotPartitioned: PartitionKey = Map.empty

  def fingerprint(key: PartitionKey): Fingerprint =
    Fingerprint.combineAll(key.toSeq.sortBy(_._1).map { case (n, f) =>
      Fingerprint.fromString(n).combine(f.fingerprint)
    })
}

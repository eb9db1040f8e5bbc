package graft.fingerprints

import com.google.common.hash.Hashing
import java.nio.charset.StandardCharsets

/** Content-addressing fingerprint: int64 farmhash with XOR combination
  * (identity 0), mirroring the reference's algebra
  * (reference: src/arti/fingerprints/__init__.py:18-66). XOR makes combine
  * commutative/associative — partition content fingerprints fold in any
  * order, which is what lets the distributed executor combine per-partition
  * hashes without a deterministic traversal order.
  */
final case class Fingerprint(key: Long) extends AnyVal {
  def combine(others: Fingerprint*): Fingerprint =
    Fingerprint(others.foldLeft(key)(_ ^ _.key))
  def isIdentity: Boolean = key == 0L
  def hex: String = java.lang.Long.toHexString(key)
}

object Fingerprint {
  /** XOR identity (combine(identity, x) == x). */
  val identity: Fingerprint = Fingerprint(0L)

  def fromString(s: String): Fingerprint =
    Fingerprint(Hashing.farmHashFingerprint64().hashString(s, StandardCharsets.UTF_8).asLong())

  def fromBytes(b: Array[Byte]): Fingerprint =
    Fingerprint(Hashing.farmHashFingerprint64().hashBytes(b).asLong())

  def fromLong(l: Long): Fingerprint = fromString(l.toString)

  def combineAll(fps: IterableOnce[Fingerprint]): Fingerprint =
    fps.iterator.foldLeft(identity)((a, b) => Fingerprint(a.key ^ b.key))
}

/** Canonical deterministic serialization for fingerprinting engine models —
  * the analog of the reference's sorted-JSON pydantic codec
  * (reference: src/arti/internal/models.py:88-168). Hand-rolled so the byte
  * stream is stable across JVM runs; hash parity with the Python reference
  * is NOT a goal (fresh engine), internal stability is.
  */
object Canonical {
  def fingerprint(model: Any): Fingerprint = Fingerprint.fromString(encode(model))

  def encode(v: Any): String = v match {
    case null                => "null"
    case None                => "null"
    case Some(x)             => encode(x)
    case s: String           => quote(s)
    case b: Boolean          => b.toString
    case b: Byte             => b.toString
    case s: Short            => s.toString
    case i: Int              => i.toString
    case l: Long             => l.toString
    case f: Float            => f.toString
    case d: Double           => d.toString
    case bd: BigDecimal      => bd.toString
    case f: Fingerprint      => f.key.toString
    case a: Array[_]         => a.iterator.map(encode).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => (String.valueOf(k), encode(x)) }.toSeq.sortBy(_._1)
        .map { case (k, x) => s"${quote(k)}:$x" }.mkString("{", ",", "}")
    case it: Iterable[_]     => it.map(encode).mkString("[", ",", "]")
    case p: Product =>
      // skip human-metadata fields so doc edits never cascade into rebuilds
      // (reference SkipFingerprint: description on types :31-32, annotations
      // on artifacts :44-56)
      val fields = p.productElementNames.zip(p.productIterator).toSeq
        .filterNot { case (k, _) => k == "description" || k == "annotations" }
      if (fields.isEmpty) quote(p.productPrefix)
      else fields.sortBy(_._1)
        .map { case (k, x) => s"${quote(k)}:${encode(x)}" }
        .mkString(s"{${quote("__type__")}:${quote(p.productPrefix)},", ",", "}")
    case other => quote(other.toString)
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}

/** Producer/artifact version semantics (reference: src/arti/versions/__init__.py:118-195).
  * SemVer fingerprints the major component only when major > 0, so minor and
  * patch bumps do not trigger rebuilds.
  */
sealed trait Version { def fingerprint: Fingerprint }
object Version {
  final case class SemVer(major: Int, minor: Int, patch: Int) extends Version {
    def fingerprint: Fingerprint =
      if (major > 0) Fingerprint.fromString(s"SemVer:$major")
      else Fingerprint.fromString(s"SemVer:$major.$minor.$patch")
  }
  final case class GitCommit(sha: String) extends Version {
    def fingerprint: Fingerprint = Fingerprint.fromString(s"GitCommit:$sha")
  }
  final case class Str(value: String) extends Version {
    def fingerprint: Fingerprint = Fingerprint.fromString(s"String:$value")
  }
}

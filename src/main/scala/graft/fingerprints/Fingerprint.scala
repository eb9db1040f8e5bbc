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

  /** Wall-clock version (reference Timestamp, versions/__init__.py:75-88 —
    * there it requires a tz-aware datetime; `Instant` is unambiguously UTC
    * by construction). `floorTo` implements the reference's own TODO
    * (versions/__init__.py:90-95): flooring to a frequency means "rebuild
    * at most once per period" — e.g. `floorTo = Some(Duration.ofDays(1))`
    * re-fingerprints daily, not per run. */
  final case class Timestamp(
      instant: java.time.Instant = java.time.Instant.now(),
      floorTo: Option[java.time.Duration] = None) extends Version {
    require(floorTo.forall(d => !d.isZero && !d.isNegative), "floorTo must be a positive duration")
    def fingerprint: Fingerprint = {
      val ms = floorTo.fold(instant.toEpochMilli)(d => instant.toEpochMilli / d.toMillis * d.toMillis)
      Fingerprint.fromString(s"Timestamp:$ms")
    }
  }

  /** Version-from-code (the reference's experimental `_Source`,
    * versions/__init__.py:65-72: `inspect.getsource` of the class). The JVM
    * analog hashes the DEFINING CLASS'S BYTECODE of the given object (e.g.
    * a producer's build function), which changes exactly when the compiled
    * logic changes — a recompile-triggered rebuild without manual bumps. */
  final case class Source(of: AnyRef) extends Version {
    lazy val fingerprint: Fingerprint = {
      val cls = of.getClass
      // LambdaMetafactory classes ("Host$$Lambda$N/0x…") have no .class
      // resource; hash the HOST class that defines the lambda body instead
      // (its bytecode contains the lambda's compiled method)
      val name = cls.getName.indexOf("$$Lambda") match {
        case -1 => cls.getName
        case i  => cls.getName.substring(0, i)
      }
      val res = name.replace('.', '/') + ".class"
      val in = cls.getClassLoader.getResourceAsStream(res)
      require(in != null, s"no bytecode resource for $name (dynamically generated class?)")
      try Fingerprint.fromBytes(in.readAllBytes())
      finally in.close()
    }
  }
}

package graft.storage

import scala.util.matching.Regex
import graft.fingerprints.Fingerprint
import graft.partitions.PartitionField
import graft.partitions.PartitionKey.PartitionKey

/** Storage path templating: render a concrete partition path from a typed
  * key + input fingerprint, and parse typed keys back out of discovered
  * paths (reference: src/arti/storage/_internal.py:15-183 — the
  * template→wildcard→regex machinery; src/arti/storage/__init__.py:124-246).
  *
  * Grammar: `{field.component}` (e.g. `{date.iso}`, `{i.hex}`),
  * `{field}` (default component), `{field.component[value]}` (hard-coded
  * index — renders/matches exactly `value`, mirroring the reference's
  * `{date.Y[1970]}` cases), and `{input_fingerprint}`. Field kinds are
  * declared by the caller (schema-driven), so the parser knows which
  * regex/constructor to use per placeholder.
  */
final case class PathTemplate(template: String, fieldKinds: Map[String, String]) {

  private val Placeholder: Regex =
    """\{([A-Za-z_][A-Za-z0-9_]*)(?:\.([A-Za-z_][A-Za-z0-9_]*))?(?:\[([^\]]*)\])?\}""".r

  /** placeholders in template order: (field, component) */
  val placeholders: Seq[(String, String)] = Placeholder.findAllMatchIn(template).map { m =>
    val field = m.group(1)
    val comp = Option(m.group(2)).getOrElse {
      fieldKinds.get(field) match {
        case Some("date") => "iso"
        case Some("int")  => "value"
        case _            => "value"
      }
    }
    (field, comp)
  }.toSeq

  /** Render with all placeholders bound; throws on unbound fields. A
    * hard-coded index `{f.c[v]}` renders `v` and requires the key (when
    * present) to agree — the reference's key/template consistency check
    * (storage/__init__.py:179-222). */
  def render(key: PartitionKey, extras: Map[String, String] = Map.empty): String =
    Placeholder.replaceAllIn(template, m => {
      val field = m.group(1)
      val comp = Option(m.group(2))
      val fixed = Option(m.group(3))
      Regex.quoteReplacement(
        (extras.get(field), fixed) match {
          case (Some(v), _) => v
          case (None, Some(v)) =>
            key.get(field).foreach { f =>
              val rendered = f.render(comp.getOrElse(f.defaultComponent))
              require(rendered == v,
                s"key value '$rendered' conflicts with template's hard-coded '$field[$v]'")
            }
            v
          case (None, None) =>
            val f = key.getOrElse(field,
              throw new IllegalArgumentException(s"template references '$field' not present in key ${key.keys.mkString(",")}"))
            f.render(comp.getOrElse(f.defaultComponent))
        })
    })

  /** Partial binding (the reference's late-binding storage templates,
    * storage/__init__.py:124-157: `{graph_name}`/`{names}` resolve when the
    * artifact is assigned into a graph, key fields stay templated): replace
    * only the given placeholders, keep the rest for render/parse time. */
  def bind(extras: Map[String, String]): PathTemplate =
    copy(template = Placeholder.replaceAllIn(template, m =>
      extras.get(m.group(1)) match {
        case Some(v) => Regex.quoteReplacement(v)
        case None    => Regex.quoteReplacement(m.matched)
      }))

  /** Wildcard form for filesystem globbing (every placeholder → `*`). */
  def wildcard: String = Placeholder.replaceAllIn(template, "*")

  private lazy val parseRegex: Regex = {
    val sb = new StringBuilder("^")
    var idx = 0
    var group = 0
    val groupInfo = Seq.newBuilder[(String, String)] // (field, component)
    for (m <- Placeholder.findAllMatchIn(template)) {
      sb.append(Regex.quote(template.substring(idx, m.start)))
      val field = m.group(1)
      val comp = Option(m.group(2))
      if (Option(m.group(3)).isDefined) {
        // hard-coded index: match exactly the fixed value
        sb.append("(").append(Regex.quote(m.group(3))).append(")")
      } else if (field == "input_fingerprint") {
        sb.append("""(-?\d+)""")
      } else {
        val kind = fieldKinds.getOrElse(field,
          throw new IllegalArgumentException(s"no declared kind for template field '$field'"))
        val c = comp.getOrElse(defaultComponent(kind))
        sb.append("(").append(PartitionField.componentPattern(kind, c)).append(")")
      }
      group += 1
      groupInfo += ((field, comp.getOrElse(defaultComponent(fieldKinds.getOrElse(field, "int")))))
      idx = m.end
    }
    sb.append(Regex.quote(template.substring(idx))).append("$")
    parsedGroups = groupInfo.result()
    new Regex(sb.toString)
  }
  private var parsedGroups: Seq[(String, String)] = Nil

  private def defaultComponent(kind: String): String = if (kind == "date") "iso" else "value"

  /** Parse a concrete path → (typed key, optional input fingerprint);
    * None if the path does not match the template. */
  def parse(path: String): Option[(PartitionKey, Option[Fingerprint])] = {
    parseRegex.findFirstMatchIn(path).map { m =>
      val valuesByField = parsedGroups.zipWithIndex
        .map { case ((field, comp), i) => (field, comp, m.group(i + 1)) }
        .groupBy(_._1)
      var fp: Option[Fingerprint] = None
      val key = Map.newBuilder[String, PartitionField]
      for ((field, triples) <- valuesByField) {
        if (field == "input_fingerprint") fp = Some(Fingerprint(triples.head._3.toLong))
        else fieldKinds.get(field) match {
          case Some(kind) =>
            val comps = triples.map(t => t._2 -> t._3).toMap
            key += field -> PartitionField.fromComponents(kind, comps)
          case None => // hard-coded decoration (e.g. {region.name[emea]}): not a key field
        }
      }
      (key.result(), fp)
    }
  }
}

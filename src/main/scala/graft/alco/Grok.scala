package graft.alco

import scala.collection.mutable

/** Minimal grok-pattern compiler (SURVEY.md O11).
  *
  * Translates `%{NAME:field}` / `%{NAME}` templates into plain Java/RE2-safe
  * regexes with numbered capture groups, compiled ONCE at plan-build time —
  * the Catalyst `RegExpExtract`/`RLike` expressions then hold the compiled
  * pattern as a foldable literal, so the hot path never recompiles
  * ("vectorized grok parse stage ... compiled pattern library", BASELINE.json
  * north_star). Reference analog: rsyslog's template/regex parse feeding
  * alco's collector [PK].
  */
object Grok {

  /** Base pattern library (subset of the public grok standard set). */
  val base: Map[String, String] = Map(
    "WORD" -> """\w+""",
    "NOTSPACE" -> """\S+""",
    "INT" -> """[+-]?\d+""",
    "NUMBER" -> """[+-]?\d+(?:\.\d+)?""",
    "DATA" -> """.*?""",
    "GREEDYDATA" -> """.*""",
    // Flat string-valued JSON object body ("k":"v",... without the braces,
    // possibly empty). This is the exact grammar the pipeline's attrs
    // extractor supports — using it in a pattern (instead of DATA) makes the
    // classifier REJECT structurally-JSON-but-not-flat-string-map bodies
    // (nested objects, non-string values), routing them to quarantine
    // instead of crashing map_from_arrays downstream.
    "FLATMAP" -> """(?:"[^"]+"\s*:\s*"[^"]*"(?:\s*,\s*"[^"]+"\s*:\s*"[^"]*")*)?""",
    "TIMESTAMP_ISO8601" ->
      """\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?""")

  /** A compiled grok pattern: the final regex plus the capture-group name for
    * each numbered group (group i+1 ← fields(i)).
    */
  final case class Compiled(name: String, regex: String, fields: Seq[String]) {
    def groupOf(field: String): Int = fields.indexOf(field) + 1
    def has(field: String): Boolean = fields.contains(field)
  }

  private val token = """%\{(\w+)(?::(\w+))?\}""".r

  /** Compile a grok template into (regex, ordered capture fields). Literal
    * text between tokens is already regex (caller escapes as needed).
    */
  def compile(name: String, template: String): Compiled = {
    val fields = mutable.ArrayBuffer.empty[String]
    val sb = new StringBuilder
    var last = 0
    for (m <- token.findAllMatchIn(template)) {
      sb.append(template.substring(last, m.start))
      val pat = base.getOrElse(m.group(1),
        throw new IllegalArgumentException(s"unknown grok pattern %{${m.group(1)}}"))
      Option(m.group(2)) match {
        case Some(field) => fields += field; sb.append("(").append(pat).append(")")
        case None => sb.append("(?:").append(pat).append(")")
      }
      last = m.end
    }
    sb.append(template.substring(last))
    Compiled(name, sb.toString, fields.toSeq)
  }
}

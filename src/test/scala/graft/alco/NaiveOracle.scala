package graft.alco

import java.time.{Instant, LocalDate, ZoneOffset}
import java.util.regex.Pattern

/** The reference-semantics oracle (SURVEY.md §5.2): a deliberately naive,
  * single-threaded Scala replay of alco's collect → parse → store →
  * aggregate loop over the same rows. The Spark pipeline must produce
  * IDENTICAL routed rows, rollup counts and per-turn text (BASELINE.json
  * north_rule equality criteria). Shares NO Spark code with the pipeline —
  * plain java.util.regex + Scala collections.
  */
object NaiveOracle {

  final case class RoutedRow(
      conv_id: String, turn_idx: Int, role: String, tool: String,
      day: LocalDate, tsMicros: Long, text: String,
      called_tool: Option[String], dur_ms: Option[Int],
      status: Option[String], bytes: Option[Long])

  final case class Rollup(tool: String, role: String, windowStartMicros: Long, n: Long)

  private val p1 = Pattern.compile(Parse.P1.regex)
  private val p2 = Pattern.compile(Parse.P2.regex)

  def dayOf(tsMicros: Long): LocalDate =
    Instant.ofEpochSecond(Math.floorDiv(tsMicros, 1000000L))
      .atZone(ZoneOffset.UTC).toLocalDate

  /** parse + enrich-missing handling + route + REPLACE, single-threaded. */
  def route(turns: Seq[Turn]): (Seq[RoutedRow], Seq[Turn]) = {
    val routed = collection.mutable.LinkedHashMap.empty[(String, Int), RoutedRow]
    val quarantine = collection.mutable.ArrayBuffer.empty[Turn]
    turns.foreach { tr =>
      val m1 = p1.matcher(tr.text)
      val m2 = p2.matcher(tr.text)
      val structuredPrefix = tr.text.startsWith("CALL") || tr.text.startsWith("RESULT")
      val inst = tr.ts.toInstant
      val tsMicros = inst.getEpochSecond * 1000000L + inst.getNano / 1000L
      val parsed: Option[RoutedRow] =
        if (m1.matches())
          Some(RoutedRow(tr.conv_id, tr.turn_idx, tr.role, tr.tool,
            dayOf(tsMicros), tsMicros, tr.text,
            Some(m1.group(Parse.P1.groupOf("called_tool"))),
            Some(m1.group(Parse.P1.groupOf("dur_ms")).toInt), None, None))
        else if (m2.matches())
          Some(RoutedRow(tr.conv_id, tr.turn_idx, tr.role, tr.tool,
            dayOf(tsMicros), tsMicros, tr.text, None, None,
            Some(m2.group(Parse.P2.groupOf("status"))),
            Some(m2.group(Parse.P2.groupOf("bytes")).toLong)))
        else if (!structuredPrefix && tr.text.nonEmpty)
          Some(RoutedRow(tr.conv_id, tr.turn_idx, tr.role, tr.tool,
            dayOf(tsMicros), tsMicros, tr.text, None, None, None, None))
        else None
      parsed match {
        case Some(r) =>
          // REPLACE semantics: last-write-wins by (ts, then insertion order)
          val key = (r.conv_id, r.turn_idx)
          routed.get(key) match {
            case Some(prev) if prev.tsMicros > r.tsMicros => // keep prev
            case _ => routed.put(key, r)
          }
        case None => quarantine += tr
      }
    }
    (routed.values.toSeq, quarantine.toSeq)
  }

  /** Per-(tool, role) 1-day tumbling window counts. */
  def rollups(routed: Seq[RoutedRow]): Seq[Rollup] =
    routed.groupBy(r => (r.tool, r.role,
        r.day.atStartOfDay(ZoneOffset.UTC).toInstant.getEpochSecond * 1000000L))
      .map { case ((tool, role, w), rs) => Rollup(tool, role, w, rs.size.toLong) }
      .toSeq

  /** Distinct-value sets per sink × column. */
  def distincts(routed: Seq[RoutedRow], columns: Seq[String]): Map[(String, String), Set[String]] = {
    def value(r: RoutedRow, c: String): Option[String] = c match {
      case "role" => Some(r.role)
      case "called_tool" => r.called_tool
      case "status" => r.status
      case _ => None
    }
    routed.flatMap { r =>
      val sink = s"${r.tool}/${r.role}"
      columns.flatMap(c => value(r, c).map(v => ((sink, c), v)))
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
  }
}

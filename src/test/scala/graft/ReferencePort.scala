package graft

import java.time.LocalDate
import scala.collection.mutable

/** Test-only independent transcription of the reference algorithm
  * (reference main.py:129-227: load_cdx single fused pass, filler,
  * load_data scoring loop) — a deliberately DIFFERENT decomposition from
  * the engine's window/aggregate pipeline, used as the golden oracle for
  * parity tests. Structure mirrors the Python line-by-line.
  */
object ReferencePort {

  final case class Rec(day: String) {
    var datetime: String = "~"
    var c2xx = 0; var c3xx = 0; var c4xx = 0; var c5xx = 0
    var specimen: String = "~"
    var resilience = 0.0
    var digest: String = "~"
    var content: String = "Unknown"
    var fixity = 0.0
    var chaos = 0.0
    var chaosn = 0.0
    def all: Int = c2xx + c3xx + c4xx + c5xx
    def filled: Boolean = specimen != "~" && all == 0
    def incr(s: String): Unit = s match { // archive.py:51-57, junk ignored
      case "2xx" => c2xx += 1
      case "3xx" => c3xx += 1
      case "4xx" => c4xx += 1
      case "5xx" => c5xx += 1
      case _     => ()
    }
  }

  def sigmoid(x: Double, shift: Double, slope: Double, spread: Double): Double =
    spread / (1 + math.exp(shift - x / slope)) // main.py:45-51

  /** main.py:129-183 for one url's sorted (ts, status, digest) lines. */
  def loadCdx(lines: Seq[(String, String, String)]): mutable.LinkedHashMap[String, Rec] = {
    val digestStatus = mutable.Map[String, String]()
    val dateRecord = mutable.LinkedHashMap[String, Rec]()
    val STPR = Map("2xx" -> 4, "4xx" -> 3, "5xx" -> 2, "3xx" -> 1)
    val SWS = 1000
    val sw = Array.fill(SWS)("~")
    var cp = -1
    var dr: Rec = null
    var pt = ""
    var pc = "~"
    var ps = "~"
    var rs = 0; var us = 0; var uw = 0
    for ((ts, s0, dFull) <- lines) {
      val t = s"${ts.substring(0, 4)}-${ts.substring(4, 6)}-${ts.substring(6, 8)}"
      var s = if ("200" <= s0 && s0 <= "599") s0.substring(0, 1) + "xx" else s0
      if (s == "-") s = digestStatus.getOrElse(dFull, "~")
      else digestStatus(dFull) = s
      val d = dFull.substring(0, math.min(8, dFull.length))
      if (t != pt) {
        if (pt.nonEmpty) {
          pc = dr.digest
          dr.chaos = us.toDouble / rs
          dr.chaosn = uw.toDouble / math.min(SWS, rs)
          dateRecord(pt) = dr
        }
        dr = Rec(t); cp = -1; pt = t
      }
      dr.incr(s)
      val pr = STPR.getOrElse(s, 0)
      if (pr > cp) {
        dr.specimen = s; dr.datetime = ts; dr.digest = d
        dr.content = if (d == pc) "Unchanged" else "Changed"
        cp = pr
      }
      val wp = rs % SWS
      rs += 1
      if (s != ps) { ps = s; us += 1; uw += 1 }
      val wrapped = ((wp - SWS + 1) % SWS + SWS) % SWS // python negative index
      if (sw(wp) != sw(wrapped)) uw -= 1
      sw(wp) = s
    }
    if (pt.nonEmpty) {
      dr.chaos = us.toDouble / rs
      dr.chaosn = uw.toDouble / math.min(SWS, rs)
      dateRecord(pt) = dr
    }
    dateRecord
  }

  /** main.py:89-102 + 54-78. */
  def filler(
      drs: mutable.LinkedHashMap[String, Rec],
      fill: Int,
      policy: String): mutable.LinkedHashMap[String, Rec] = {
    val f = mutable.LinkedHashMap[String, Rec]()
    val it = drs.iterator
    var (pk, pv0) = it.next()
    var pv = pv0.specimen
    for ((k, v0) <- it) {
      val v = v0.specimen
      val gap = java.time.temporal.ChronoUnit.DAYS
        .between(LocalDate.parse(pk), LocalDate.parse(k)).toInt - 1
      if (gap != 0 && (fill == -1 || gap <= fill)) {
        val days = Iterator.iterate(LocalDate.parse(pk).plusDays(1))(_.plusDays(1))
          .takeWhile(_.isBefore(LocalDate.parse(k))).toSeq
        policy match {
          case "identical" =>
            if (pv == v) days.foreach { day =>
              val r = Rec(day.toString); r.specimen = pv; f(day.toString) = r
            }
          case "closest" =>
            val mid = gap / 2.0
            days.zipWithIndex.foreach { case (day, i) =>
              val r = Rec(day.toString); r.specimen = if (i < mid) pv else v
              f(day.toString) = r
            }
          case "forward" =>
            days.foreach { day => val r = Rec(day.toString); r.specimen = pv; f(day.toString) = r }
          case "backward" =>
            days.foreach { day => val r = Rec(day.toString); r.specimen = v; f(day.toString) = r }
        }
      }
      pk = k; pv = v
    }
    f
  }

  /** main.py:186-227 (scoring loop over the densified calendar). */
  def loadData(
      lines: Seq[(String, String, String)],
      fill: Int,
      policy: String,
      asOf: String,
      params: Map[String, (Double, Double, Double)]): Seq[Rec] = {
    val dateRecord = loadCdx(lines)
    if (fill != 0) dateRecord ++= filler(dateRecord, fill, policy)
    val res = mutable.ArrayBuffer[Rec]()
    var ps = "~"; var pc = "Unknown"
    var pch = 0.0; var pchn = 0.0
    var base = 0.5; var basec = 0.5; var scale = 0.5; var scalec = 0.5
    var h = 0.5; var hc = 0.5
    var x = 0L; var xc = 0L
    val first = LocalDate.parse(dateRecord.head._1)
    val until = LocalDate.parse(asOf)
    var day = first
    while (!day.isAfter(until)) {
      val t = day.toString
      val dr = dateRecord.getOrElse(t, Rec(t))
      if (dr.chaos != 0) { pch = dr.chaos; pchn = dr.chaosn }
      else { dr.chaos = pch; dr.chaosn = pchn }
      val s = dr.specimen
      val p = params.getOrElse(s, params("~")) // engine's junk fallback
      if (s != ps) {
        base = h
        scale = if (p._3 < 0) base else 1 - base
        ps = s; x = 0
      }
      x += 1
      h = base + scale * sigmoid(x.toDouble, p._1, p._2, p._3)
      dr.resilience = h
      val c = dr.content
      val cp2 = params.getOrElse(c, params("Unknown"))
      if (c != pc) {
        basec = hc
        scalec = if (cp2._3 < 0) basec else 1 - basec
        pc = c; xc = 0
      }
      xc += 1
      hc = basec + scalec * sigmoid(xc.toDouble, cp2._1, cp2._2, cp2._3)
      dr.fixity = hc
      res += dr
      day = day.plusDays(1)
    }
    res.toSeq
  }
}

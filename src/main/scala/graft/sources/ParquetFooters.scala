package graft.sources

import java.nio.file.Path

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.column.statistics.{IntStatistics, LongStatistics}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

/** Footer-only statistics for freshly staged part files.
  *
  * Every staged write used to be followed by a READ-BACK Spark job
  * (`spark.read.parquet(...).groupBy(_metadata.file_name).count()`) just
  * to learn per-file record counts (and, for Delta data-skipping stats,
  * per-file integral min/max). That job re-reads every byte the write
  * just produced — a full extra data pass per commit, which at 100 TB is
  * the difference between one write pass and two. The parquet footer
  * already carries both facts exactly (row counts per row group;
  * per-column-chunk min/max/null statistics), so this helper answers
  * them with O(KB) footer reads on the metadata plane — the same plane
  * the writers already touch for `Files.size`.
  *
  * Equivalence contract (why swapping the read-back job for this is NOT
  * a results change):
  *   - `numRecords` = sum of row-group row counts = what COUNT(*) over
  *     the file returns, definitionally.
  *   - min/max: parquet statistics for integral physical types are
  *     exact (truncation applies only to variable-length binary), and
  *     ignore NULLs exactly like Spark's min/max aggregates. A column
  *     whose values are all NULL reports no bounds — matching the old
  *     aggregate's NULL result, which callers skipped.
  *   - Any file/column where footer stats are unavailable or the type
  *     is not a plain INT32/INT64 makes [[statsOf]] return None, and the
  *     caller falls back to the original read-back aggregation — the
  *     footer path is an optimization with a guaranteed-identical
  *     fallback, never a new source of truth for odd types.
  */
object ParquetFooters {

  private val conf = new Configuration()

  /** (rows, bounds) for one file: bounds maps column name -> (min, max)
    * as Long, only for requested columns that have at least one non-NULL
    * value. None when any requested column exists but its stats are
    * unusable (missing stats, non-integral type) — caller must fall back. */
  def statsOf(file: Path, statsCols: Seq[String]): Option[(Long, Map[String, (Long, Long)])] = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toUri), conf)
    val reader = ParquetFileReader.open(in)
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      if (statsCols.isEmpty) return Some((rows, Map.empty))
      val wanted = statsCols.toSet
      // per column: (min, max, sawNonNull) merged across row groups
      val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
      // a wanted column absent from the file schema entirely (misnamed
      // statsFor entry, logical vs physical spelling) must return None —
      // the read-back fallback then fails LOUDLY with an unresolved
      // column instead of silently dropping data-skipping stats
      val seen = scala.collection.mutable.Set.empty[String]
      var usable = true
      for (b <- blocks; c <- b.getColumns.asScala) {
        val name = c.getPath.toDotString
        if (wanted.contains(name)) {
          seen += name
          val st: org.apache.parquet.column.statistics.Statistics[_] = c.getStatistics
          if (st == null || st.isEmpty) usable = false
          else if (st.hasNonNullValue) {
            val mnmx: Option[(Long, Long)] =
              (c.getPrimitiveType.getPrimitiveTypeName, st) match {
                case (PrimitiveTypeName.INT64, s: LongStatistics) =>
                  Some((s.getMin, s.getMax))
                case (PrimitiveTypeName.INT32, s: IntStatistics) =>
                  Some((s.getMin.toLong, s.getMax.toLong))
                case _ => None
              }
            mnmx match {
              case None => usable = false
              case Some((mn, mx)) =>
                val (m0, m1) = acc.getOrElse(name, (Long.MaxValue, Long.MinValue))
                acc(name) = (math.min(m0, mn), math.max(m1, mx))
            }
          } // all-NULL chunk: contributes nothing, like the aggregate
        }
      }
      if (blocks.nonEmpty && !wanted.subsetOf(seen)) usable = false
      if (usable) Some((rows, acc.toMap)) else None
    } finally reader.close()
  }

  /** Row count only — always answerable from block metadata. */
  def rowCount(file: Path): Long = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toUri), conf)
    val reader = ParquetFileReader.open(in)
    try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    finally reader.close()
  }
}

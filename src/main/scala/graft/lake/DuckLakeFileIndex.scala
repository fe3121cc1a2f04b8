package graft.lake

import org.apache.hadoop.fs.{FileStatus, Path => HPath}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._

/** Stats-skipping [[FileIndex]] over a DuckLake table's live data files —
  * the plan-time counterpart of `ducklake_file_column_statistics`
  * (SURVEY.md §4.2: file-level skipping is OUR job; DuckLake keeps per-file
  * min/max exactly so the scan can list fewer files).
  *
  * Spark calls `listFiles(partitionFilters, dataFilters)` during physical
  * planning with the pushed-down predicates; any file whose [min,max]
  * interval provably excludes every matching row is dropped BEFORE the scan
  * is built, so `SELECT … WHERE k BETWEEN a AND b` over a 100 TB table
  * reads only the surviving files. This is the same integration point
  * Delta Lake's stats pruning uses (public pattern) — no custom Catalyst
  * rule needed; the V1 `HadoopFsRelation` path hands us the filters.
  *
  * Evaluation is CONSERVATIVE: a file is only skipped when the stats PROVE
  * no row can match (unknown columns, uncomparable types, missing stats →
  * keep). Supported: And/Or, =, <, <=, >, >=, IN, IS [NOT] NULL over
  * numeric / string / date columns compared to literals.
  */
class DuckLakeFileIndex(
    files: Seq[DataFileRow],
    statsByFile: Map[Long, Map[String, FileColumnStatsRow]],
    /** per-file partition values (`ducklake_file_partition_value`), keyed
      * by lowercase column name. A partition value is an EXACT min==max
      * interval, so it prunes through the same conservative interval logic
      * as stats — but never depends on a stats row existing, which is what
      * makes `WHERE part_col = v` skip files written by any DuckLake writer
      * that records partition values without column stats.
      */
    partValues: Map[Long, Map[String, String]] = Map.empty)
  extends FileIndex {

  override def rootPaths: Seq[HPath] = files.map(f => new HPath(f.path))
  override def partitionSchema: StructType = new StructType()
  override def sizeInBytes: Long = files.map(_.fileSizeBytes).sum
  override def inputFiles: Array[String] = files.map(_.path).toArray
  override def refresh(): Unit = ()

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val live =
      if (dataFilters.isEmpty) files
      else files.filter(f => dataFilters.forall(e => may(e, f)))
    Seq(PartitionDirectory(InternalRow.empty, live.map(status).toArray))
  }

  private def status(f: DataFileRow): FileStatus =
    new FileStatus(f.fileSizeBytes, false, 1, 128L << 20, 0L, new HPath(f.path))

  private def statsFor(f: DataFileRow, col: String): Option[FileColumnStatsRow] =
    partValues.get(f.dataFileId).flatMap(_.get(col.toLowerCase)) match {
      // partition value first: an exact single-value interval beats (and
      // never needs) the min/max stats row
      case Some(v) =>
        Some(FileColumnStatsRow(f.dataFileId, 0L, 0L, Some(v), Some(v), 0L))
      case None => statsByFile.get(f.dataFileId).flatMap(_.get(col.toLowerCase))
    }

  /** compare a stat string (written by `CAST(col AS STRING)` at insert
    * time) against a literal value; None = not comparable → never skip.
    * A null literal (e.g. `IN (1, NULL)`) is never comparable. Strings
    * compare in UTF-8 binary order (what parquet/Spark order stats by) —
    * Java String.compareTo is UTF-16 code-unit order, which diverges for
    * supplementary characters and could wrongly prune a file.
    */
  private def cmpStat(dt: DataType, stat: String, v: Any): Option[Int] =
    if (v == null) None
    else dt match {
      case _: NumericType =>
        try Some(BigDecimal(stat).compare(BigDecimal(v.toString)))
        catch { case scala.util.control.NonFatal(_) => None }
      case StringType =>
        Some(org.apache.spark.unsafe.types.UTF8String.fromString(stat)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(v.toString)))
      case DateType => v match {
        // DateType literals carry epoch days; stats hold ISO yyyy-MM-dd,
        // which compares correctly as a string
        case days: Int =>
          Some(stat.compareTo(java.time.LocalDate.ofEpochDay(days.toLong).toString))
        case _ => None
      }
      case _ => None
    }

  /** col = v possible in f? (min <= v <= max) */
  private def eqMay(f: DataFileRow, col: String, v: Any, dt: DataType): Boolean =
    statsFor(f, col).forall { s =>
      s.minValue.flatMap(cmpStat(dt, _, v)).forall(_ <= 0) &&
        s.maxValue.flatMap(cmpStat(dt, _, v)).forall(_ >= 0)
    }

  /** col > v (strict) / col >= v possible? (max above v) */
  private def gtMay(f: DataFileRow, col: String, v: Any, dt: DataType, strict: Boolean): Boolean =
    statsFor(f, col).forall(_.maxValue.flatMap(cmpStat(dt, _, v))
      .forall(c => if (strict) c > 0 else c >= 0))

  /** col < v (strict) / col <= v possible? (min below v) */
  private def ltMay(f: DataFileRow, col: String, v: Any, dt: DataType, strict: Boolean): Boolean =
    statsFor(f, col).forall(_.minValue.flatMap(cmpStat(dt, _, v))
      .forall(c => if (strict) c < 0 else c <= 0))

  /** conservative "file may contain a matching row" */
  private def may(e: Expression, f: DataFileRow): Boolean = e match {
    case And(l, r) => may(l, f) && may(r, f)
    case Or(l, r)  => may(l, f) || may(r, f)
    case EqualTo(a: Attribute, Literal(v, dt)) => eqMay(f, a.name, v, dt)
    case EqualTo(Literal(v, dt), a: Attribute) => eqMay(f, a.name, v, dt)
    case GreaterThan(a: Attribute, Literal(v, dt)) => gtMay(f, a.name, v, dt, strict = true)
    case GreaterThan(Literal(v, dt), a: Attribute) => ltMay(f, a.name, v, dt, strict = true)
    case GreaterThanOrEqual(a: Attribute, Literal(v, dt)) => gtMay(f, a.name, v, dt, strict = false)
    case GreaterThanOrEqual(Literal(v, dt), a: Attribute) => ltMay(f, a.name, v, dt, strict = false)
    case LessThan(a: Attribute, Literal(v, dt)) => ltMay(f, a.name, v, dt, strict = true)
    case LessThan(Literal(v, dt), a: Attribute) => gtMay(f, a.name, v, dt, strict = true)
    case LessThanOrEqual(a: Attribute, Literal(v, dt)) => ltMay(f, a.name, v, dt, strict = false)
    case LessThanOrEqual(Literal(v, dt), a: Attribute) => gtMay(f, a.name, v, dt, strict = false)
    case In(a: Attribute, list) if list.forall(_.isInstanceOf[Literal]) =>
      list.exists { case Literal(v, dt) => eqMay(f, a.name, v, dt) }
    // OptimizeIn rewrites IN lists longer than 10 values to InSet — the
    // documented IN pruning must not silently stop at 11 elements
    case InSet(a: Attribute, hset) =>
      hset.exists(v => eqMay(f, a.name, v, a.dataType))
    // null-count questions consult ONLY the real stats rows: the fabricated
    // partition-value interval (statsFor) claims nullCount=0, but a NULL
    // partition value is recorded as an empty string at write time, so that
    // claim is not evidence — `WHERE part_col IS NULL` must keep the file
    // unless a genuine stats row proves it holds no nulls (r5 verdict #1).
    case IsNull(a: Attribute) =>
      statsByFile.get(f.dataFileId).flatMap(_.get(a.name.toLowerCase))
        .forall(_.nullCount > 0)
    case IsNotNull(a: Attribute) =>
      // recordCount parses to 0 when a foreign workbook leaves the
      // data_file column blank — 0 is ABSENCE of evidence, not an
      // all-null proof (nullCount >= 0 == recordCount would prune every
      // file and silently return zero rows; review-found)
      f.recordCount <= 0 ||
        statsByFile.get(f.dataFileId).flatMap(_.get(a.name.toLowerCase))
          .forall(_.nullCount < f.recordCount)
    case _ => true // unsupported shape -> cannot skip
  }
}

package graft.api

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.Instant
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake._
import graft.xlsx.{ExcelRemote, XlsxCodec}

/** The DuckLakeXL artifact, Spark-native (SURVEY.md Face B): an Excel
  * workbook is the metadata catalog of a parquet lakehouse, and every
  * `sql()` call is bracketed by pull (xlsx -> catalog) and push
  * (catalog -> xlsx) — the reference's whole engine
  * (/root/reference/ducklakexl/ducklakexl.py:387-397).
  *
  * {{{
  * val lake = new DuckLakeXLSpark(spark, "lake.xlsx", "/data/lake")
  * lake.sql("CREATE TABLE t(id INTEGER, val VARCHAR)")
  * lake.sql("INSERT INTO t VALUES (1,'alpha'); SELECT * FROM t")  // multi-statement
  * }}}
  *
  * Semantics preserved from the reference:
  *  - pull/push bracket EVERY call, even pure SELECT (ducklakexl.py:387-397)
  *  - bootstrap: all catalog sheets present in the workbook -> adopt remote
  *    state (pull); else seed and push (ducklakexl.py:261-296)
  *  - multi-statement scripts run in order; the LAST select's DataFrame is
  *    returned, lazily (README.md:70-79, notebook cells 4/8)
  *  - the workbook is the source of truth: a new instance opened on the
  *    same xlsx + parquet answers the same queries (ducklakexl.py:746-762)
  *
  * Spark-native divergences (documented, deliberate):
  *  - DELETE is file-granular copy-on-write (untouched files are kept
  *    verbatim; fully-matching files are dropped without IO; partially
  *    matching files are rewritten) instead of positional delete files —
  *    the scan stays a plain parquet union, which Catalyst optimizes
  *    like any other scan.
  *  - catalog mutation is an atomic in-memory swap + atomic xlsx rename,
  *    so a crashed push never leaves a torn workbook (reference rewrites
  *    sheet-by-sheet, non-atomic — README.md:28).
  *  - time travel is first-class: `snapshots()` and `tableAt(name, id)`
  *    (the reference lists it as a TODO, README.md:162-165).
  *
  * Single-writer, last-push-wins — same caveat as the reference
  * (README.md:3-4,150-156).
  */
class DuckLakeXLSpark(
    val spark: SparkSession,
    val excelPath: String,
    val dataPath: String,
    val lakeName: String = "my_ducklake",
    driveId: Option[String] = None) {

  /** local xlsx or Graph workbook, picked like the reference's
    * _pick_client (ducklakexl.py:85-97)
    */
  private val remote: ExcelRemote = ExcelRemote.pick(excelPath, driveId)

  @volatile private var state: CatalogState = CatalogState.empty

  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    .withZone(java.time.ZoneOffset.UTC)

  initialize()

  // ------------------------------------------------------------ bootstrap
  /** reference _initialize_ducklake (ducklakexl.py:232-299): all sheets
    * present -> pull (adopt remote); else seed + push
    */
  private def initialize(): Unit = {
    Files.createDirectories(Paths.get(dataPath))
    val wanted = CatalogSchema.tables.map { case (t, _) => CatalogSchema.sheetName(t) }
    val canPull = remote.exists && {
      val present = remote.sheetNames.toSet
      wanted.forall(present.contains)
    }
    if (canPull) pull()
    else {
      state = seedState()
      push()
    }
    registerViews()
  }

  private def seedState(): CatalogState = {
    val now = tsFmt.format(Instant.now().truncatedTo(ChronoUnit.SECONDS))
    CatalogState.empty.copy(
      metadata = Vector("version" -> "0.1", "created_by" -> "ducklakexlspark",
        "data_path" -> dataPath, "encrypted" -> "false"),
      snapshots = Vector(SnapshotRow(0L, now, 0L, 2L, 1L)),
      schemas = Vector(SchemaRow(1L, UUID.randomUUID().toString, 0L, None, "main")))
  }

  // ------------------------------------------------------------ pull/push
  /** xlsx -> CatalogState; the single-reference swap is the transaction
    * (reference: TRUNCATE+INSERT per metadata table, ducklakexl.py:459-464)
    */
  def pull(): Unit = {
    val sheets = remote.readAll().map { case (n, rows) => XlsxSheet(n, rows) }
    state = CatalogState.fromSheets(sheets)
  }

  /** CatalogState -> xlsx, full rewrite of every sheet (reference
    * _push, ducklakexl.py:512-582), atomically
    */
  def push(): Unit =
    remote.writeAll(state.toSheets.map(s => (s.name, s.rows)))

  // ------------------------------------------------------------ query API
  /** THE query path (reference `sql`, ducklakexl.py:387-397):
    * pull -> execute statements -> push -> return last SELECT's DataFrame
    */
  def sql(script: String): DataFrame = {
    if (remote.exists) pull()
    registerViews()
    var last: Option[DataFrame] = None
    StatementRouter.split(script).foreach { stmt =>
      StatementRouter.classify(stmt) match {
        case s: StatementRouter.CreateTable   => executeCreate(s); registerViews()
        case s: StatementRouter.CreateTableAs => executeCtas(s); registerViews()
        case s: StatementRouter.InsertValues =>
          // a literal VALUES list is driver-sized by definition -> one data
          // file per INSERT (the DuckLake shape); INSERT..SELECT below keeps
          // file-per-partition, the shape a distributed INSERT produces
          executeInsertDF(s.table, valuesDF(s.table, s.valuesSql).coalesce(1))
          registerViews()
        case s: StatementRouter.InsertSelect  => executeInsertDF(s.table, spark.sql(s.select)); registerViews()
        case s: StatementRouter.Delete        => executeDelete(s); registerViews()
        case s: StatementRouter.Update        => executeUpdate(s); registerViews()
        case s: StatementRouter.DropTable     => executeDrop(s); registerViews()
        case StatementRouter.Use(name) =>
          require(name.equalsIgnoreCase(lakeName) || name.equalsIgnoreCase("main"),
            s"unknown catalog/schema: $name")
        case StatementRouter.Select(q) => last = Some(spark.sql(q))
      }
    }
    push()
    last.getOrElse(spark.emptyDataFrame)
  }

  /** current-snapshot scan of a lake table: union of live parquet files */
  def table(name: String): DataFrame = tableAt(name, state.currentSnapshot)

  /** time travel: the table as of a snapshot id */
  def tableAt(name: String, snapshot: Long): DataFrame = {
    val t = state.tableByName(name, snapshot)
      .getOrElse(throw new IllegalArgumentException(s"no such table: $name @ $snapshot"))
    val schema = state.schemaOf(t.tableId, snapshot)
    val files = state.filesOf(t.tableId, snapshot).map(_.path)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
  }

  /** snapshot history (reference TODO `snapshots()`, README.md:162) */
  def snapshots(): DataFrame = {
    val rows = state.snapshots.map(s =>
      Row(s.snapshotId, s.snapshotTime, s.schemaVersion))
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("snapshot_id", LongType, false),
      StructField("snapshot_time", StringType, false),
      StructField("schema_version", LongType, false))))
  }

  /** plan-time file pruning by ducklake_file_column_statistics: the files
    * of `name` whose [min,max] interval may intersect [lo,hi] on `column`
    * (numeric compare). This is the DuckLake stats-skipping counterpart
    * (SURVEY.md §4.2) — at scale the scan only lists these files.
    */
  def prunedFiles(name: String, column: String, lo: Double, hi: Double): Seq[String] = {
    val t = state.tableByName(name).getOrElse(
      throw new IllegalArgumentException(s"no such table: $name"))
    val col = state.columnsOf(t.tableId).find(_.columnName.equalsIgnoreCase(column))
      .getOrElse(throw new IllegalArgumentException(s"no such column: $column"))
    val statsByFile = state.fileColumnStats
      .filter(s => s.tableId == t.tableId && s.columnId == col.columnId)
      .map(s => s.dataFileId -> s).toMap
    state.filesOf(t.tableId).filter { f =>
      statsByFile.get(f.dataFileId) match {
        case Some(s) =>
          val mn = s.minValue.flatMap(_.toDoubleOption)
          val mx = s.maxValue.flatMap(_.toDoubleOption)
          mn.forall(_ <= hi) && mx.forall(_ >= lo)
        case None => true // no stats -> cannot skip
      }
    }.map(_.path)
  }

  def currentState: CatalogState = state

  // ----------------------------------------------------------- internals
  private def registerViews(): Unit =
    state.liveTables().foreach { t =>
      tableAt(t.tableName, state.currentSnapshot).createOrReplaceTempView(t.tableName)
    }

  private def newSnapshot(nextCatalogId: Long, nextFileId: Long): Long = {
    val id = state.currentSnapshot + 1
    val now = tsFmt.format(Instant.now().truncatedTo(ChronoUnit.SECONDS))
    state = state.copy(snapshots = state.snapshots :+
      SnapshotRow(id, now, state.snapshots.last.schemaVersion + 1, nextCatalogId, nextFileId))
    id
  }

  private def executeCreate(s: StatementRouter.CreateTable): Unit = {
    if (state.tableByName(s.name).isDefined) {
      if (s.ifNotExists) return
      throw new IllegalArgumentException(s"table exists: ${s.name}")
    }
    // validate types early
    s.cols.foreach { case (_, t) => CatalogSchema.parseType(t) }
    var cid = state.nextCatalogId
    val tableId = cid
    cid += 1
    val snap = state.currentSnapshot + 1
    val colRows = s.cols.zipWithIndex.map { case ((cn, ct), i) =>
      val r = ColumnRow(cid, snap, None, tableId, i, cn,
        CatalogSchema.typeName(CatalogSchema.parseType(ct)), nullsAllowed = true)
      cid += 1
      r
    }
    state = state.copy(
      tables = state.tables :+ TableRow(tableId, UUID.randomUUID().toString,
        snap, None, 1L, s.name),
      columns = state.columns ++ colRows,
      tableStats = state.tableStats :+ TableStatsRow(tableId, 0L))
    newSnapshot(cid, state.nextFileId)
  }

  private def executeCtas(s: StatementRouter.CreateTableAs): Unit = {
    if (state.tableByName(s.name).isDefined && s.ifNotExists) return
    val df = spark.sql(s.select)
    val cols = df.schema.fields.map(f => (f.name, CatalogSchema.typeName(f.dataType))).toSeq
    executeCreate(StatementRouter.CreateTable(s.name, cols, ifNotExists = false))
    executeInsertDF(s.name, df)
  }

  /** `VALUES (…),(…)` -> DataFrame with the table's column names */
  private def valuesDF(table: String, valuesSql: String): DataFrame = {
    val t = state.tableByName(table).getOrElse(
      throw new IllegalArgumentException(s"no such table: $table"))
    val names = state.columnsOf(t.tableId).map(_.columnName)
    spark.sql(s"SELECT * FROM ($valuesSql) AS t(${names.mkString(", ")})")
  }

  /** append: write df as parquet data file(s) under dataPath/<table>/, add
    * ducklake_data_file + per-file column stats rows, advance snapshot.
    * Each task partition lands as its own data file — the same
    * file-per-parallel-writer shape a 1000-executor INSERT produces.
    */
  private def executeInsertDF(table: String, dfIn: DataFrame): Unit = {
    val t = state.tableByName(table).getOrElse(
      throw new IllegalArgumentException(s"no such table: $table"))
    val schema = state.schemaOf(t.tableId)
    require(dfIn.schema.length == schema.length,
      s"INSERT column count ${dfIn.schema.length} != table arity ${schema.length}")
    // positional insert with cast-to-declared-type (reference relies on
    // DuckDB's implicit cast of VALUES to column types)
    val df = dfIn.select(dfIn.columns.zip(schema.fields).map { case (c, f) =>
      colq(dfIn, c).cast(f.dataType).as(f.name)
    }: _*)

    val written = writeParquetFiles(df, t.tableName)
    if (written.isEmpty) { newSnapshot(state.nextCatalogId, state.nextFileId); return }

    val snap = state.currentSnapshot + 1
    var fid = state.nextFileId
    val cols = state.columnsOf(t.tableId)
    val newFiles = scala.collection.mutable.ArrayBuffer[DataFileRow]()
    val newStats = scala.collection.mutable.ArrayBuffer[FileColumnStatsRow]()
    written.foreach { p =>
      val (cnt, st) = fileStats(p.toString, schema, cols)
      newFiles += DataFileRow(fid, t.tableId, snap, None, p.toString, cnt, Files.size(p))
      cols.foreach { c =>
        val (mn, mx, nl) = st(c.columnId)
        newStats += FileColumnStatsRow(fid, t.tableId, c.columnId, mn, mx, nl)
      }
      fid += 1
    }
    val added = newFiles.map(_.recordCount).sum
    state = state.copy(
      dataFiles = state.dataFiles ++ newFiles,
      fileColumnStats = state.fileColumnStats ++ newStats,
      tableStats = bumpStats(t.tableId, added))
    newSnapshot(state.nextCatalogId, fid)
  }

  private def executeDelete(s: StatementRouter.Delete): Unit = {
    val t = state.tableByName(s.table).getOrElse(
      throw new IllegalArgumentException(s"no such table: ${s.table}"))
    val schema = state.schemaOf(t.tableId)
    val pred = s.where.map(expr).getOrElse(lit(true))
    val snap = state.currentSnapshot + 1
    var fid = state.nextFileId
    var removed = 0L
    var newState = state
    state.filesOf(t.tableId).foreach { f =>
      val fdf = spark.read.schema(schema).parquet(f.path)
      val hit = fdf.filter(pred).count()
      if (hit > 0L) {
        removed += hit
        // end this file's lifetime; tombstone row records provenance
        newState = newState.copy(
          dataFiles = newState.dataFiles.map(d =>
            if (d.dataFileId == f.dataFileId) d.copy(endSnapshot = Some(snap)) else d),
          deleteFiles = newState.deleteFiles :+ DeleteFileRow(
            fid, t.tableId, snap, None, f.dataFileId, "", hit))
        fid += 1
        if (hit < f.recordCount) {
          // partial match -> copy-on-write rewrite of the survivors
          val keep = fdf.filter(!pred)
          val written = writeParquetFiles(keep, t.tableName)
          written.foreach { p =>
            val cnt = spark.read.schema(schema).parquet(p.toString).count()
            newState = newState.copy(dataFiles = newState.dataFiles :+
              DataFileRow(fid, t.tableId, snap, None, p.toString, cnt, Files.size(p)))
            fid += 1
          }
        }
      } // hit == 0 -> file untouched, zero IO
    }
    state = newState.copy(tableStats = bumpStats(t.tableId, -removed))
    newSnapshot(state.nextCatalogId, fid)
  }

  /** file-granular copy-on-write UPDATE, like DELETE: files with no
    * matching row are kept verbatim (zero IO); a file with matches is
    * end-snapshotted and rewritten in full, every SET expression evaluated
    * against the pre-update row (standard SQL semantics — one select does
    * exactly that). Row counts are unchanged, so table stats stay put.
    */
  private def executeUpdate(s: StatementRouter.Update): Unit = {
    val t = state.tableByName(s.table).getOrElse(
      throw new IllegalArgumentException(s"no such table: ${s.table}"))
    val schema = state.schemaOf(t.tableId)
    val sets = s.sets.map { case (c, e) => c.toLowerCase -> expr(e) }.toMap
    val unknown = sets.keySet -- schema.fieldNames.map(_.toLowerCase).toSet
    require(unknown.isEmpty, s"UPDATE sets unknown column(s): ${unknown.mkString(", ")}")
    val pred = s.where.map(expr).getOrElse(lit(true))
    val snap = state.currentSnapshot + 1
    var fid = state.nextFileId
    var newState = state
    state.filesOf(t.tableId).foreach { f =>
      val fdf = spark.read.schema(schema).parquet(f.path)
      val hit = fdf.filter(pred).count()
      if (hit > 0L) {
        newState = newState.copy(
          dataFiles = newState.dataFiles.map(d =>
            if (d.dataFileId == f.dataFileId) d.copy(endSnapshot = Some(snap)) else d),
          deleteFiles = newState.deleteFiles :+ DeleteFileRow(
            fid, t.tableId, snap, None, f.dataFileId, "", hit))
        fid += 1
        val updated = fdf.select(schema.fields.map { fld =>
          sets.get(fld.name.toLowerCase) match {
            case Some(e) => when(pred, e.cast(fld.dataType)).otherwise(colq(fdf, fld.name)).as(fld.name)
            case None    => colq(fdf, fld.name)
          }
        }: _*)
        val written = writeParquetFiles(updated, t.tableName)
        written.foreach { p =>
          val cnt = spark.read.schema(schema).parquet(p.toString).count()
          newState = newState.copy(dataFiles = newState.dataFiles :+
            DataFileRow(fid, t.tableId, snap, None, p.toString, cnt, Files.size(p)))
          fid += 1
        }
      }
    }
    state = newState
    newSnapshot(state.nextCatalogId, fid)
  }

  private def executeDrop(s: StatementRouter.DropTable): Unit = {
    state.tableByName(s.name) match {
      case None =>
        if (!s.ifExists) throw new IllegalArgumentException(s"no such table: ${s.name}")
      case Some(t) =>
        val snap = state.currentSnapshot + 1
        state = state.copy(
          tables = state.tables.map(x =>
            if (x.tableId == t.tableId && x.endSnapshot.isEmpty) x.copy(endSnapshot = Some(snap)) else x),
          columns = state.columns.map(x =>
            if (x.tableId == t.tableId && x.endSnapshot.isEmpty) x.copy(endSnapshot = Some(snap)) else x),
          dataFiles = state.dataFiles.map(x =>
            if (x.tableId == t.tableId && x.endSnapshot.isEmpty) x.copy(endSnapshot = Some(snap)) else x))
        newSnapshot(state.nextCatalogId, state.nextFileId)
        spark.catalog.dropTempView(s.name)
    }
  }

  /** per-file record count + min/max/nullcount per column in ONE agg job —
    * the same stats DuckLake's writer records per data file
    */
  private def fileStats(path: String, schema: StructType, cols: Vector[ColumnRow])
      : (Long, Map[Long, (Option[String], Option[String], Long)]) = {
    val fdf = spark.read.schema(schema).parquet(path)
    val statAggs = cols.flatMap(c => Seq(
      min(colq(fdf, c.columnName)).cast(StringType).as(s"mn_${c.columnOrder}"),
      max(colq(fdf, c.columnName)).cast(StringType).as(s"mx_${c.columnOrder}"),
      sum(when(colq(fdf, c.columnName).isNull, 1L).otherwise(0L)).as(s"nl_${c.columnOrder}"))) :+
      count(lit(1)).as("cnt")
    val r = fdf.agg(statAggs.head, statAggs.tail: _*).collect()(0)
    (r.getAs[Long]("cnt"), cols.map(c => c.columnId -> ((
      Option(r.getAs[String](s"mn_${c.columnOrder}")),
      Option(r.getAs[String](s"mx_${c.columnOrder}")),
      r.getAs[Long](s"nl_${c.columnOrder}")))).toMap)
  }

  /** Maintenance: merge the small-file tail of `table` into ~targetBytes
    * files under a new snapshot. Rows are bit-identical; old files are
    * end-snapshotted so time travel still resolves them. Cost is
    * proportional to the small tail, never table size — files at or above
    * the target are not read at all. This is the upkeep a 1000-executor
    * INSERT stream needs: each micro-append lands one file per writer, and
    * unchecked that tail turns every scan into a file-listing storm.
    */
  def compact(table: String, targetBytes: Long = 128L << 20): Unit = {
    if (remote.exists) pull()
    val t = state.tableByName(table).getOrElse(
      throw new IllegalArgumentException(s"no such table: $table"))
    val schema = state.schemaOf(t.tableId)
    val cols = state.columnsOf(t.tableId)
    val small = state.filesOf(t.tableId).filter(_.fileSizeBytes < targetBytes)
    if (small.size <= 1) return
    // sequential bin-pack of the small tail into ~targetBytes groups
    val groups = scala.collection.mutable.ArrayBuffer[Vector[DataFileRow]]()
    var cur = Vector.empty[DataFileRow]
    var curSz = 0L
    small.foreach { f =>
      if (cur.nonEmpty && curSz + f.fileSizeBytes > targetBytes) {
        groups += cur; cur = Vector.empty; curSz = 0L
      }
      cur :+= f
      curSz += f.fileSizeBytes
    }
    if (cur.nonEmpty) groups += cur
    val toMerge = groups.filter(_.size >= 2)
    if (toMerge.isEmpty) return
    val snap = state.currentSnapshot + 1
    var fid = state.nextFileId
    var newState = state
    toMerge.foreach { g =>
      val merged = spark.read.schema(schema).parquet(g.map(_.path): _*).coalesce(1)
      val written = writeParquetFiles(merged, t.tableName)
      val gids = g.map(_.dataFileId).toSet
      newState = newState.copy(dataFiles = newState.dataFiles.map(d =>
        if (gids.contains(d.dataFileId) && d.endSnapshot.isEmpty) d.copy(endSnapshot = Some(snap)) else d))
      written.foreach { p =>
        val (cnt, st) = fileStats(p.toString, schema, cols)
        newState = newState.copy(
          dataFiles = newState.dataFiles :+
            DataFileRow(fid, t.tableId, snap, None, p.toString, cnt, Files.size(p)),
          fileColumnStats = newState.fileColumnStats ++ cols.map { c =>
            val (mn, mx, nl) = st(c.columnId)
            FileColumnStatsRow(fid, t.tableId, c.columnId, mn, mx, nl)
          })
        fid += 1
      }
    }
    state = newState
    newSnapshot(state.nextCatalogId, fid)
    registerViews()
    push()
  }

  private def bumpStats(tableId: Long, delta: Long): Vector[TableStatsRow] =
    if (state.tableStats.exists(_.tableId == tableId))
      state.tableStats.map(s =>
        if (s.tableId == tableId) s.copy(recordCount = s.recordCount + delta) else s)
    else state.tableStats :+ TableStatsRow(tableId, delta)

  /** write df to a tmp dir, move each part file to a stable name under
    * dataPath/<table>/; returns the final paths (empty for 0-row df)
    */
  private def writeParquetFiles(df: DataFrame, tableName: String): Seq[Path] = {
    val tmp = Files.createTempDirectory(Paths.get(dataPath), s".write_$tableName")
    df.write.mode("overwrite").parquet(tmp.toString)
    val parts = Files.list(tmp).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("part-") &&
                   p.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.getFileName.toString)
    val dir = Paths.get(dataPath, tableName)
    Files.createDirectories(dir)
    val moved = parts.zipWithIndex.map { case (p, i) =>
      val dest = dir.resolve(s"data_${UUID.randomUUID().toString.take(8)}_$i.parquet")
      Files.move(p, dest, StandardCopyOption.REPLACE_EXISTING)
      dest
    }
    // clean the tmp dir (crc/_SUCCESS leftovers)
    Files.walk(tmp).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    moved
  }

  private def colq(df: DataFrame, name: String) = df(s"`$name`")
}

package graft.lake

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.api.DuckLakeXLSpark

/** DataSource V2 [[TableCatalog]] for a DuckLakeXL lake (SURVEY.md §1.1/
  * §7.1): registered as `spark.sql.catalog.<lakeName>`, so qualified names
  * (`my_ducklake.main.t`), `USE my_ducklake`, and the native time-travel
  * syntax (`t VERSION AS OF n` / `t TIMESTAMP AS OF 'ts'`) all resolve
  * inside Catalyst — the reference gets the same resolution for free from
  * DuckDB's catalog (ducklakexl.py:657,716); the former regex rewrites
  * (`QualRe`/`MainRe`) are gone.
  *
  * Reads go through [[V1Scan]] — the official DSv2→V1 bridge (the same one
  * Spark's JDBC connector uses) — so a catalog-resolved scan reuses the
  * ENTIRE existing scan path: [[DuckLakeFileIndex]] stats + partition-value
  * pruning, rename-epoch physical-name resolution, and inlined-row unions.
  * Pushed-down filters are applied to the inner DataFrame (so plan-time
  * file pruning still fires) but reported as unhandled, so Spark re-checks
  * them — conservative and always correct. Writes go through [[V1Write]] →
  * [[InsertableRelation]] into the lake's normal INSERT path (file-per-
  * writer parquet + per-file stats + snapshot + xlsx push), which is what
  * a distributed `INSERT INTO my_ducklake.main.t SELECT …` needs at scale.
  *
  * The catalog instance holds only its NAME; every call resolves the
  * current [[DuckLakeXLSpark]] through [[DuckLakeCatalog.register]]'s
  * registry, so reopening a lake (new instance, same name) is picked up
  * without poking Spark's catalog-plugin cache.
  */
class DuckLakeCatalog extends TableCatalog with SupportsNamespaces {
  private var catName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catName = name

  override def name(): String = catName
  override def defaultNamespace(): Array[String] = Array("main")

  private def lake: DuckLakeXLSpark = DuckLakeCatalog.lakeFor(catName)

  private def schemaNames: Seq[String] =
    lake.currentState.liveSchemas().map(_.schemaName)

  private def nsOk(ns: Array[String]): Boolean =
    ns.isEmpty || (ns.length == 1 && schemaNames.exists(_.equalsIgnoreCase(ns(0))))

  // ------------------------------------------------------------ namespaces
  override def listNamespaces(): Array[Array[String]] =
    schemaNames.map(Array(_)).toArray

  override def listNamespaces(ns: Array[String]): Array[Array[String]] =
    if (ns.isEmpty) listNamespaces()
    else if (nsOk(ns)) Array.empty
    else throw new NoSuchNamespaceException(ns)

  override def namespaceExists(ns: Array[String]): Boolean = nsOk(ns)

  override def loadNamespaceMetadata(ns: Array[String]): util.Map[String, String] =
    if (nsOk(ns)) util.Collections.emptyMap()
    else throw new NoSuchNamespaceException(ns)

  override def createNamespace(ns: Array[String], meta: util.Map[String, String]): Unit = {
    require(ns.length == 1, s"nested namespaces unsupported: ${ns.mkString(".")}")
    lake.sql(s"CREATE SCHEMA ${ns(0)}")
  }

  override def alterNamespace(ns: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE is not supported")

  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean = {
    if (!nsOk(ns) || ns.isEmpty) return false
    lake.sql(s"DROP SCHEMA ${ns(0)}${if (cascade) " CASCADE" else ""}")
    true
  }

  // ---------------------------------------------------------------- tables
  private def schemaOf(ns: Array[String]): String =
    if (ns.isEmpty) "main" else ns(0)

  override def listTables(ns: Array[String]): Array[Identifier] = {
    if (!nsOk(ns)) throw new NoSuchNamespaceException(ns)
    val sn = schemaOf(ns)
    lake.currentState.liveTablesIn(sn).map(t => Identifier.of(Array(sn), t.tableName)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    nsOk(ident.namespace) &&
      lake.currentState.tableByNameIn(schemaOf(ident.namespace), ident.name).isDefined

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF n` — native DSv2 time travel */
  override def loadTable(ident: Identifier, version: String): Table = {
    val snap = version.toLongOption.getOrElse(
      throw new IllegalArgumentException(s"snapshot version must be numeric: $version"))
    load(ident, Some(snap))
  }

  /** `TIMESTAMP AS OF ts` — Spark hands micros-since-epoch resolved in the
    * session time zone; convert back to the catalog's second-resolution
    * snapshot-time format and pick the latest snapshot at or before it
    */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val tz = SparkSession.active.conf.get(
      "spark.sql.session.timeZone", java.util.TimeZone.getDefault.getID)
    val inst = java.time.Instant.EPOCH.plusSeconds(timestampMicros / 1000000L)
    val s = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneId.of(tz)).format(inst)
    load(ident, Some(lake.snapshotIdAt(s)))
  }

  private def load(ident: Identifier, snapshot: Option[Long]): Table = {
    if (!nsOk(ident.namespace)) throw new NoSuchTableException(ident)
    val sn = schemaOf(ident.namespace)
    val st = lake.currentState
    val t = st.tableByNameIn(sn, ident.name, snapshot.getOrElse(st.currentSnapshot))
      .getOrElse(throw new NoSuchTableException(ident))
    DuckLakeTable(catName, sn, t.tableName, snapshot)
  }

  /** identifiers are interpolated into generated lake SQL — anything the
    * router's word-shaped grammar cannot round-trip (spaces, quotes,
    * punctuation, reserved-word collisions aside) must fail HERE with a
    * clear message, not parse into a corrupted statement (review-found)
    */
  private def validIdent(name: String, what: String): String = {
    require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"$what '$name' is not a plain identifier ([A-Za-z_][A-Za-z0-9_]*) — " +
      "quoted/special identifiers are not supported by the lake SQL surface")
    name
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "PARTITIONED BY at CREATE is unsupported; use ALTER TABLE … SET PARTITIONED BY")
    validIdent(ident.name, "table name")
    val cols = schema.fields.map(f =>
      s"${validIdent(f.name, "column name")} ${CatalogSchema.typeName(f.dataType)}")
      .mkString(", ")
    lake.sql(s"CREATE TABLE ${qualified(ident)} ($cols)")
    // apply the one property with lake semantics instead of dropping it
    // silently (CREATE TABLE ... COMMENT '...'); other properties are
    // Spark-side bookkeeping with no DuckLake home
    Option(properties.get(TableCatalog.PROP_COMMENT)).foreach { c =>
      lake.sql(s"COMMENT ON TABLE ${qualified(ident)} IS '${c.replace("'", "''")}'")
    }
    loadTable(ident)
  }

  /** route DSv2 TableChanges to the router's ALTER statements, so plain
    * `spark.sql("ALTER TABLE my_ducklake.main.t …")` works: add/drop/
    * rename column, type widening, and table/column comments
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val q = qualified(ident)
    // VALIDATE every change before executing ANY: each lake.sql commits a
    // snapshot, so a change that throws mid-list would leave the table
    // half-altered with Spark reporting failure (review-found). Type
    // conversions and arity checks run up front; per-change identifier
    // checks run inside the same pass.
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1, "nested columns are unsupported")
        validIdent(a.fieldNames()(0), "column name")
        CatalogSchema.typeName(a.dataType())
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1, "nested columns are unsupported")
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1, "nested columns are unsupported")
        validIdent(r.newName(), "column name")
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames.length == 1, "nested columns are unsupported")
        CatalogSchema.typeName(u.newDataType())
      case c: TableChange.UpdateColumnComment =>
        require(c.fieldNames.length == 1, "nested columns are unsupported")
      case _: TableChange.SetProperty => ()
      case other =>
        throw new UnsupportedOperationException(s"unsupported table change: $other")
    }
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1, "nested columns are unsupported")
        lake.sql(s"ALTER TABLE $q ADD COLUMN ${a.fieldNames()(0)} " +
          CatalogSchema.typeName(a.dataType()))
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1, "nested columns are unsupported")
        lake.sql(s"ALTER TABLE $q DROP COLUMN ${d.fieldNames()(0)}")
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1, "nested columns are unsupported")
        lake.sql(s"ALTER TABLE $q RENAME COLUMN ${r.fieldNames()(0)} TO ${r.newName()}")
      case u: TableChange.UpdateColumnType =>
        require(u.fieldNames.length == 1, "nested columns are unsupported")
        lake.sql(s"ALTER TABLE $q ALTER COLUMN ${u.fieldNames()(0)} TYPE " +
          CatalogSchema.typeName(u.newDataType()))
      case c: TableChange.UpdateColumnComment =>
        require(c.fieldNames.length == 1, "nested columns are unsupported")
        val lit = c.newComment().replace("'", "''")
        lake.sql(s"COMMENT ON COLUMN $q.${c.fieldNames()(0)} IS '$lit'")
      case p: TableChange.SetProperty if p.property() == TableCatalog.PROP_COMMENT =>
        lake.sql(s"COMMENT ON TABLE $q IS '${p.value().replace("'", "''")}'")
      case _: TableChange.SetProperty => () // Spark-side bookkeeping
      case other =>
        throw new UnsupportedOperationException(s"unsupported table change: $other")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    if (!tableExists(ident)) false
    else { lake.sql(s"DROP TABLE ${qualified(ident)}"); true }

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    // a cross-namespace rename is a MOVE, which ALTER ... RENAME TO does
    // not perform — refuse rather than silently rename within the source
    // schema (r5 advice)
    if (!(from.namespace sameElements to.namespace))
      throw new UnsupportedOperationException(
        s"renameTable across namespaces is not supported: " +
        s"${qualified(from)} -> ${qualified(to)}")
    lake.sql(s"ALTER TABLE ${qualified(from)} RENAME TO ${validIdent(to.name, "table name")}")
  }

  private def qualified(ident: Identifier): String =
    (ident.namespace :+ ident.name).mkString(".")
}

object DuckLakeCatalog {
  /** lakeName (lowercase) -> the live lake object. The catalog plugin
    * Spark caches per session holds only the NAME; the lookup happens per
    * call, so `new DuckLakeXLSpark(...)` on the same name (reopen) is
    * always the instance that answers.
    */
  private val registry = new java.util.concurrent.ConcurrentHashMap[String, DuckLakeXLSpark]()

  /** test observability: how many pushed-down predicates the last
    * catalog-path scan translated onto its inner DataFrame (proves the
    * DSv2 bridge hands filters to the stats-pruning FileIndex)
    */
  private[graft] val lastScanPushedFilters = new java.util.concurrent.atomic.AtomicInteger(-1)

  private[graft] def register(name: String, lake: DuckLakeXLSpark): Unit =
    registry.put(name.toLowerCase, lake)

  private[lake] def lakeFor(name: String): DuckLakeXLSpark = {
    val l = registry.get(name.toLowerCase)
    require(l != null, s"no DuckLakeXLSpark instance registered for catalog '$name'")
    l
  }

  /** translate a pushed-down V1 [[Filter]] to a Column over `df`; None =
    * shape we cannot express (fine — Spark re-applies every filter anyway;
    * the translation only exists so the INNER scan sees the predicate and
    * [[DuckLakeFileIndex]] can prune files at plan time)
    */
  private[lake] def filterToColumn(df: DataFrame, f: Filter): Option[Column] = {
    // pushed V1 filter attributes arrive through Spark's quoteIfNeeded:
    // names with specials (spaces, dots) come ALREADY backticked (r14)
    def c(n: String): Column = if (n.startsWith("`")) df(n) else df(s"`$n`")
    f match {
      case sources.EqualTo(a, v)            => Some(c(a) === lit(v))
      case sources.EqualNullSafe(a, v)      => Some(c(a) <=> lit(v))
      case sources.GreaterThan(a, v)        => Some(c(a) > lit(v))
      case sources.GreaterThanOrEqual(a, v) => Some(c(a) >= lit(v))
      case sources.LessThan(a, v)           => Some(c(a) < lit(v))
      case sources.LessThanOrEqual(a, v)    => Some(c(a) <= lit(v))
      case sources.In(a, vs)                => Some(c(a).isInCollection(vs.toSeq))
      case sources.IsNull(a)                => Some(c(a).isNull)
      case sources.IsNotNull(a)             => Some(c(a).isNotNull)
      case sources.StringStartsWith(a, v)   => Some(c(a).startsWith(v))
      case sources.StringEndsWith(a, v)     => Some(c(a).endsWith(v))
      case sources.StringContains(a, v)     => Some(c(a).contains(v))
      case sources.Not(x)                   => filterToColumn(df, x).map(!_)
      case sources.And(l, r) =>
        for { lc <- filterToColumn(df, l); rc <- filterToColumn(df, r) } yield lc && rc
      case sources.Or(l, r) =>
        for { lc <- filterToColumn(df, l); rc <- filterToColumn(df, r) } yield lc || rc
      case _ => None
    }
  }
}

/** A lake table as a DSv2 [[Table]]. `snapshot` pins time travel
  * (`VERSION AS OF` / `TIMESTAMP AS OF`); None = current snapshot at scan
  * time.
  */
private[lake] final case class DuckLakeTable(catName: String, schemaName: String,
    tableName: String, snapshot: Option[Long]) extends Table with SupportsRead with SupportsWrite {

  private def lake: DuckLakeXLSpark = DuckLakeCatalog.lakeFor(catName)

  override def name(): String = s"$catName.$schemaName.$tableName"

  override def schema(): StructType = {
    val st = lake.currentState
    val snap = snapshot.getOrElse(st.currentSnapshot)
    val t = st.tableByNameIn(schemaName, tableName, snap).getOrElse(
      throw new IllegalStateException(s"table vanished: ${name()}"))
    st.schemaOf(t.tableId, snap)
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DuckLakeScanBuilder(catName, schemaName, tableName, snapshot, schema())

  /** INSERT INTO / INSERT OVERWRITE `my_ducklake.main.t` through plain
    * `spark.sql` (or `df.writeTo(...).append()`): the V1 write bridge into
    * the lake's normal insert path
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation = new InsertableRelation {
          override def insert(data: DataFrame, legacyOverwrite: Boolean): Unit =
            lake.insertFromCatalog(schemaName, tableName, data,
              overwrite || legacyOverwrite)
        }
      }
    }
}

private[lake] final class DuckLakeScanBuilder(catName: String, schemaName: String,
    tableName: String, snapshot: Option[Long], full: StructType)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = full
  private var filters: Array[Filter] = Array.empty

  /** remember every filter for the inner scan, return them ALL as
    * unhandled — Spark re-applies them post-scan (correctness), while the
    * inner DataFrame's plan pushes them into the parquet scan and the
    * stats-pruning FileIndex (performance)
    */
  override def pushFilters(fs: Array[Filter]): Array[Filter] = { filters = fs; fs }
  override def pushedFilters(): Array[Filter] = Array.empty

  override def pruneColumns(s: StructType): Unit = required = s

  override def build(): Scan =
    new DuckLakeV1Scan(catName, schemaName, tableName, snapshot, required, filters)
}

/** the DSv2→V1 bridge scan: `buildScan` re-derives the inner DataFrame
  * from the lake (stats-pruning FileIndex + rename epochs + inlined rows),
  * applies the remembered pushdown, prunes to the required columns, and
  * hands Spark the RDD
  */
private[lake] final class DuckLakeV1Scan(catName: String, schemaName: String,
    tableName: String, snapshot: Option[Long], required: StructType,
    filters: Array[Filter]) extends V1Scan {

  override def readSchema(): StructType = required

  override def description(): String =
    s"DuckLakeV1Scan($catName.$schemaName.$tableName" +
      snapshot.map(s => s" @v$s").getOrElse("") + ")"

  override def toV1TableScan[T <: BaseRelation with TableScan](ctx: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = required
      override def toString: String =
        s"DuckLakeScan parquet $catName.$schemaName.$tableName" +
          snapshot.map(s => s" @v$s").getOrElse("")
      override def buildScan(): RDD[Row] = {
        val lake = DuckLakeCatalog.lakeFor(catName)
        var df = lake.tableIn(schemaName, tableName,
          snapshot.getOrElse(lake.currentState.currentSnapshot))
        val conds = filters.flatMap(DuckLakeCatalog.filterToColumn(df, _))
        DuckLakeCatalog.lastScanPushedFilters.set(conds.length)
        if (conds.nonEmpty) df = df.filter(conds.reduce(_ && _))
        df.select(required.fieldNames.toSeq.map(n => df(s"`$n`")): _*).rdd
      }
    }.asInstanceOf[T]
}

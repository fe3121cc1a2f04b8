package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.api.DuckLakeXLSpark

/** Face B exercised through the driver's oracle gate: each query runs a
  * complete lake lifecycle (xlsx catalog + parquet data + pull/push sync)
  * in a fresh temp dir and returns a result whose expected value is a
  * VALUES literal — so the DuckDB oracle verifies the END STATE of the
  * reference's test_excel flow (ducklakexl.py:695-743), not just row
  * counts.
  */
object QueriesLake {
  type QFn = (SparkSession, String) => DataFrame

  private def freshLake(s: SparkSession): DuckLakeXLSpark = {
    val dir = Files.createTempDirectory("graft_lake_q").toString
    new DuckLakeXLSpark(s, s"$dir/lake.xlsx", s"$dir/data")
  }

  val queries: Map[String, QFn] = Map(
    // the test_excel flow, reopened from the workbook alone (E1+E5)
    "q_lake_e2e" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql("CREATE TABLE my_table(id INTEGER, val VARCHAR)")
      lake.sql("INSERT INTO my_table VALUES (1,'alpha'),(2,'beta'),(3,'gamma'),(4,'delta')")
      lake.sql("DELETE FROM my_table WHERE id = 3")
      val reopened = new DuckLakeXLSpark(s, lake.excelPath, lake.dataPath)
      reopened.sql("SELECT * FROM my_table ORDER BY id")
    },
    // multi-statement script semantics (ipynb cell 8 shape)
    "q_lake_multistatement" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE t(id INTEGER, val VARCHAR);
          |INSERT INTO t VALUES (1,'alpha'),(2,'beta'),(3,'gamma'),(4,'delta')""".stripMargin)
      lake.sql(
        """DELETE FROM t WHERE id = 3;
          |INSERT INTO t VALUES (5, 'epsilon');
          |SELECT * FROM t ORDER BY id""".stripMargin)
    },
    // time travel: the table as of the pre-DELETE snapshot
    "q_lake_time_travel" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql("CREATE TABLE tt(id INTEGER, val VARCHAR)")
      lake.sql("INSERT INTO tt VALUES (1,'alpha'),(2,'beta'),(3,'gamma'),(4,'delta')")
      val beforeDelete = lake.currentState.currentSnapshot
      lake.sql("DELETE FROM tt WHERE id <= 2")
      lake.tableAt("tt", beforeDelete).orderBy("id")
    },
    // copy-on-write UPDATE with an expression over the pre-update row
    "q_lake_update" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE u(id INTEGER, qty INTEGER, val VARCHAR);
          |INSERT INTO u VALUES (1,10,'alpha'),(2,20,'beta'),(3,30,'gamma'),(4,40,'delta');
          |UPDATE u SET qty = qty + 5, val = 'bumped' WHERE id >= 3;
          |SELECT * FROM u ORDER BY id""".stripMargin)
    },
    // r3: SQL views persisted in the catalog, answered after reopen
    "q_lake_views" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE vt(id INTEGER, val VARCHAR);
          |INSERT INTO vt VALUES (1,'alpha'),(2,'beta'),(3,'gamma');
          |CREATE VIEW big AS SELECT id, upper(val) AS vu FROM vt WHERE id >= 2""".stripMargin)
      val reopened = new DuckLakeXLSpark(s, lake.excelPath, lake.dataPath)
      reopened.sql("SELECT * FROM big ORDER BY id")
    },
    // r3: qualified names + SQL time travel through sql() (README.md:70,162)
    "q_lake_qualified_travel" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE qt(id INTEGER, val VARCHAR);
          |INSERT INTO qt VALUES (1,'alpha'),(2,'beta'),(3,'gamma'),(4,'delta')""".stripMargin)
      val beforeDelete = lake.currentState.currentSnapshot
      lake.sql("DELETE FROM qt WHERE id <= 2")
      lake.sql(
        s"""USE my_ducklake;
           |SELECT cur.id, cur.val, old.val AS old_val
           |FROM my_ducklake.main.qt AS cur
           |JOIN qt VERSION AS OF $beforeDelete AS old ON old.id = cur.id
           |ORDER BY cur.id""".stripMargin)
    },
    // r3: ALTER TABLE schema evolution — add column (old files scan as
    // NULL), rename table — all metadata-only
    "q_lake_alter" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE al(id INTEGER, val VARCHAR);
          |INSERT INTO al VALUES (1,'alpha'),(2,'beta');
          |ALTER TABLE al ADD COLUMN qty INTEGER;
          |INSERT INTO al VALUES (3,'gamma',30);
          |ALTER TABLE al RENAME TO al2;
          |SELECT * FROM al2 ORDER BY id""".stripMargin)
    },
    // r3: MERGE upsert — Spark-native extension (no DuckDB MERGE; the
    // oracle states the end state as VALUES)
    "q_lake_merge" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE mt(id INTEGER, qty INTEGER, val VARCHAR);
          |INSERT INTO mt VALUES (1,10,'alpha'),(2,20,'beta');
          |CREATE TABLE ms(id INTEGER, qty INTEGER);
          |INSERT INTO ms VALUES (2,99),(3,30);
          |MERGE INTO mt USING ms ON mt.id = ms.id
          |WHEN MATCHED THEN UPDATE SET qty = ms.qty + 1
          |WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (ms.id, ms.qty);
          |SELECT * FROM mt ORDER BY id""".stripMargin)
    },
    // r3: compaction correctness — rows identical after the small-file
    // tail merges under a new snapshot
    "q_lake_compact" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql("CREATE TABLE co(id INTEGER, val VARCHAR)")
      for (i <- 1 to 4) lake.sql(s"INSERT INTO co VALUES ($i, 'r$i')") // 4 tiny files
      lake.compact("co")
      lake.sql("SELECT * FROM co ORDER BY id")
    },
    // r3: COPY round trip — export to csv, ingest into a second table
    "q_lake_copy" -> { (s, _) =>
      val lake = freshLake(s)
      val out = s"${lake.dataPath}/export/co.csv"
      lake.sql(
        s"""CREATE TABLE src(id INTEGER, val VARCHAR);
           |INSERT INTO src VALUES (1,'alpha'),(2,'beta');
           |COPY src TO '$out';
           |CREATE TABLE dst(id INTEGER, val VARCHAR);
           |COPY dst FROM '$out';
           |SELECT * FROM dst ORDER BY id""".stripMargin)
    },
    // r9: EXPORT DATABASE from one lake, IMPORT DATABASE into a second,
    // fresh lake — the DuckDB whole-database backup/restore round trip
    // (schema.sql + load.sql + one data file per table)
    "q_lake_export" -> { (s, _) =>
      val lake = freshLake(s)
      val dir = s"${lake.dataPath}/exportdb"
      lake.sql(
        s"""CREATE TABLE ex(id INTEGER, qty DOUBLE, val VARCHAR);
           |INSERT INTO ex VALUES (1, 1.5, 'alpha'), (2, 2.5, 'beta'), (3, NULL, NULL);
           |CREATE TABLE ex2(k BIGINT);
           |INSERT INTO ex2 VALUES (7), (8);
           |EXPORT DATABASE '$dir' (FORMAT 'csv')""".stripMargin)
      val restored = freshLake(s)
      restored.sql(
        s"""IMPORT DATABASE '$dir';
           |SELECT e.id, e.qty, e.val, (SELECT count(*) FROM ex2) AS n2
           |FROM ex e ORDER BY e.id""".stripMargin)
    },
    // r3: DESCRIBE through sql() — catalog-backed information schema
    "q_lake_describe" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE de(id INTEGER, qty DOUBLE, val VARCHAR);
          |DESCRIBE de""".stripMargin)
    },
    // r4: COMMENT ON -> ducklake_tag / ducklake_column_tag, read back
    // through information_schema after reopen
    "q_lake_comment" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE cm(id INTEGER, val VARCHAR);
          |COMMENT ON TABLE cm IS 'fact table';
          |COMMENT ON COLUMN cm.id IS 'pk'""".stripMargin)
      val reopened = new DuckLakeXLSpark(s, lake.excelPath, lake.dataPath)
      reopened.sql(
        """SELECT c.column_name, c.comment AS col_comment, t.comment AS tbl_comment
          |FROM information_schema.columns c
          |JOIN information_schema.tables t ON t.table_name = c.table_name
          |WHERE c.table_name = 'cm' AND c.column_name = 'id'""".stripMargin)
    },
    // r4: data inlining — tiny INSERTs live in the catalog, reopen
    // answers from the workbook alone, DML flushes then applies
    "q_lake_inline" -> { (s, _) =>
      val dir = Files.createTempDirectory("graft_lake_q").toString
      val lake = new DuckLakeXLSpark(s, s"$dir/lake.xlsx", s"$dir/data",
        inlineRowLimit = 10)
      lake.sql(
        """CREATE TABLE il(id INTEGER, val VARCHAR);
          |INSERT INTO il VALUES (1,'a'),(2,'b');
          |INSERT INTO il VALUES (3,'c')""".stripMargin)
      val reopened = new DuckLakeXLSpark(s, lake.excelPath, lake.dataPath,
        inlineRowLimit = 10)
      reopened.sql("DELETE FROM il WHERE id = 2; SELECT * FROM il ORDER BY id")
    },
    // r4: retention — expire history, vacuum unreachable files, reopen
    "q_lake_retention" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE rt(id INTEGER, val VARCHAR);
          |INSERT INTO rt VALUES (1,'a'),(2,'b'),(3,'c');
          |DELETE FROM rt WHERE id = 2""".stripMargin)
      lake.expireSnapshots(lake.currentState.currentSnapshot)
      lake.vacuum()
      val reopened = new DuckLakeXLSpark(s, lake.excelPath, lake.dataPath)
      reopened.sql("SELECT * FROM rt ORDER BY id")
    },
    // r4: RENAME COLUMN — columnId-keyed name epochs; old files answer
    // under the new name, filters and DML cross the rename
    "q_lake_rename_col" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE rc(id INTEGER, v VARCHAR);
          |INSERT INTO rc VALUES (1,'a'),(2,'b');
          |ALTER TABLE rc RENAME COLUMN v TO label;
          |INSERT INTO rc VALUES (3,'c');
          |UPDATE rc SET label = 'z' WHERE id = 1;
          |DELETE FROM rc WHERE label = 'b';
          |SELECT id, label FROM rc ORDER BY id""".stripMargin)
    },
    // r4: partitioned table — spec DDL, per-value file split + catalog
    // partition values, answered after reopen from the workbook alone
    "q_lake_partition" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE pt(id INTEGER, region VARCHAR);
          |ALTER TABLE pt SET PARTITIONED BY (region);
          |INSERT INTO pt VALUES (1,'eu'),(2,'us'),(3,'eu'),(4,'ap');
          |INSERT INTO pt VALUES (5,'us'),(6,'eu')""".stripMargin)
      val reopened = new DuckLakeXLSpark(s, lake.excelPath, lake.dataPath)
      reopened.sql("SELECT id, region FROM pt WHERE region = 'eu' ORDER BY id")
    },
    // r4: the reference's init script replayed verbatim — ATTACH + the
    // information_schema.tables probe over the metadata catalog
    // (ducklakexl.py:236-241)
    "q_lake_infoschema" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql("CREATE TABLE it(id INTEGER, val VARCHAR)")
      lake.sql(
        s"""ATTACH 'ducklake:${lake.excelPath}' AS my_ducklake (DATA_PATH '${lake.dataPath}');
           |SELECT table_name FROM information_schema.tables
           |WHERE table_catalog LIKE '__ducklake_metadata_my_ducklake'
           |ORDER BY table_name""".stripMargin)
    },
    // r4: time travel by timestamp — latest snapshot at or before ts
    "q_lake_ts_travel" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE tst(id INTEGER, val VARCHAR);
          |INSERT INTO tst VALUES (1,'a'),(2,'b'),(3,'c');
          |DELETE FROM tst WHERE id = 1""".stripMargin)
      lake.sql(
        "SELECT id, val FROM tst AT (TIMESTAMP => '2100-01-01 00:00:00') ORDER BY id")
    },
    // r5: DSv2 catalog acceptance — an alias legitimately named `main`
    // parses (the old regex strip would have mangled it), and qualified
    // time travel runs through PLAIN spark.sql via the native
    // `VERSION AS OF` hook on DuckLakeCatalog.loadTable
    "q_lake_dsv2" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE ordx(id INTEGER, val VARCHAR);
          |INSERT INTO ordx VALUES (1,'alpha'),(2,'beta'),(3,'gamma')""".stripMargin)
      val before = lake.currentState.currentSnapshot
      lake.sql("DELETE FROM ordx WHERE id = 2")
      s.sql(
        s"""SELECT main.id, main.val, old.val AS old_val
           |FROM my_ducklake.main.ordx main
           |JOIN my_ducklake.main.ordx VERSION AS OF $before old ON old.id = main.id
           |ORDER BY main.id""".stripMargin)
    },
    // r5: multi-schema — same-named tables in two schemas, schema-qualified
    // DML/SELECT, survives reopen from the workbook alone
    "q_lake_schemas" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE SCHEMA staging;
          |CREATE TABLE sx(id INTEGER, val VARCHAR);
          |INSERT INTO sx VALUES (1,'main_row');
          |CREATE TABLE staging.sx(id INTEGER, val VARCHAR);
          |INSERT INTO staging.sx VALUES (10,'stg_a'),(11,'stg_b')""".stripMargin)
      val reopened = new DuckLakeXLSpark(s, lake.excelPath, lake.dataPath)
      reopened.sql(
        """SELECT m.id AS main_id, m.val AS main_val, st.id AS stg_id, st.val AS stg_val
          |FROM main.sx m CROSS JOIN staging.sx st
          |ORDER BY st.id""".stripMargin)
    },
    // r5: ALTER COLUMN TYPE widening — pre-alter INT files scan under
    // BIGINT via per-epoch cast, post-alter insert stores 64-bit values,
    // time travel across the alter still answers (exercised in spec)
    "q_lake_widen" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE wd(id INTEGER, qty INTEGER);
          |INSERT INTO wd VALUES (1, 10),(2, 20);
          |ALTER TABLE wd ALTER COLUMN qty TYPE BIGINT;
          |INSERT INTO wd VALUES (3, 30000000000);
          |SELECT id, qty FROM wd ORDER BY id""".stripMargin)
    },
    // r5: foreign positional delete files — a workbook whose
    // ducklake_delete_file rows carry REAL delete parquet (as written by
    // DuckDB-DuckLake) opens with deletes honored (merge-on-read), and DML
    // materializes them into the native CoW shape before applying
    "q_lake_foreign_deletes" -> { (s, _) =>
      import java.nio.file.{Files => JF, Paths => JP, StandardCopyOption}
      import scala.jdk.CollectionConverters._
      val dir = JF.createTempDirectory("graft_lake_q").toString
      val lake = new DuckLakeXLSpark(s, s"$dir/lake.xlsx", s"$dir/data")
      lake.sql(
        """CREATE TABLE fd(id INTEGER, val VARCHAR);
          |INSERT INTO fd VALUES (1,'alpha'),(2,'beta'),(3,'gamma'),(4,'delta')""".stripMargin)
      val t = lake.currentState.tableByName("fd").get
      val dataFile = lake.currentState.filesOf(t.tableId).head
      // forge the delete parquet: drop row ordinals 1 and 3
      import s.implicits._
      val delDir = JF.createTempDirectory(JP.get(dir), "delw")
      Seq((dataFile.path, 1L), (dataFile.path, 3L)).toDF("file_path", "pos")
        .coalesce(1).write.mode("overwrite").parquet(delDir.toString)
      val part = JF.list(delDir).iterator().asScala
        .find(p => p.getFileName.toString.startsWith("part-") &&
                   p.getFileName.toString.endsWith(".parquet")).get
      val delPath = JP.get(dir, "delete_0.parquet")
      JF.move(part, delPath, StandardCopyOption.REPLACE_EXISTING)
      val remote = graft.xlsx.ExcelRemote.pick(s"$dir/lake.xlsx")
      remote.writeAll(remote.readAll().map {
        case ("delete_file", rws) =>
          ("delete_file", rws :+ Seq("9001", t.tableId.toString,
            lake.currentState.currentSnapshot.toString, "",
            dataFile.dataFileId.toString, delPath.toString, "2"))
        case other => other
      })
      val reopened = new DuckLakeXLSpark(s, s"$dir/lake.xlsx", s"$dir/data")
      reopened.sql(
        """DELETE FROM fd WHERE id = 3;
          |SELECT id, val FROM fd ORDER BY id""".stripMargin)
    },
    // r3: column-list INSERT fills unlisted columns with NULL
    "q_lake_insert_cols" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE ci(id INTEGER, qty INTEGER, val VARCHAR);
          |INSERT INTO ci(val, id) VALUES ('alpha', 1);
          |INSERT INTO ci(id) VALUES (2);
          |BEGIN TRANSACTION;
          |INSERT INTO ci(id, qty) VALUES (3, 30);
          |COMMIT;
          |SELECT * FROM ci ORDER BY id""".stripMargin)
    },
    // r7: DuckDB-only spellings through the dialect rewrite layer —
    // DISTINCT ON (in a CTAS), * REPLACE, ASOF JOIN, list_* lambdas.
    // The reference's contract is the verbatim DuckDB dialect
    // (ducklakexl.py:394), so these must run as pasted.
    "q_lake_dialect" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE px(id INTEGER, name VARCHAR, price DOUBLE, ts INTEGER);
          |INSERT INTO px VALUES (1,'a',10.0,5),(1,'b',12.0,8),(2,'c',7.0,3),(2,'d',9.0,9);
          |CREATE TABLE quotes(k INTEGER, qts INTEGER, quote DOUBLE);
          |INSERT INTO quotes VALUES (1,4,100.0),(1,7,110.0),(2,1,50.0),(2,8,60.0);
          |CREATE TABLE latest AS SELECT DISTINCT ON (id) * FROM px ORDER BY id, ts DESC""".stripMargin)
      lake.sql(
        """SELECT l.id, l.name, l.price, q.qts, q.quote,
          |       list_contains(list_value(1, 7, 8), l.ts) AS ts_listed
          |FROM (SELECT * REPLACE (round(price * 2, 1) AS price) FROM latest) l
          |ASOF JOIN quotes q ON l.id = q.k AND l.ts >= q.qts
          |ORDER BY l.id""".stripMargin)
    },
    // r7: add_data_files — register existing parquet by NAME (DuckLake
    // column mapping, write side): foreign field names + a hive path
    // segment resolve through ducklake_name_mapping, no data copied
    "q_lake_add_files" -> { (s, _) =>
      import s.implicits._
      val lake = freshLake(s)
      lake.sql("CREATE TABLE af(id INTEGER, v VARCHAR, region VARCHAR)")
      lake.sql("INSERT INTO af VALUES (1, 'native', 'west')")
      val dir = Files.createTempDirectory("graft_foreign")
      val tgt = java.nio.file.Paths.get(lake.dataPath, "region=east", "f1.parquet")
      Seq((10, "x"), (11, "y")).toDF("ID", "V")
        .coalesce(1).write.mode("overwrite").parquet(dir.toString)
      Files.createDirectories(tgt.getParent)
      val part = Files.list(dir).iterator()
      var moved = false
      while (part.hasNext && !moved) {
        val f = part.next()
        if (f.toString.endsWith(".parquet")) { Files.move(f, tgt); moved = true }
      }
      lake.addDataFiles("af", Seq(tgt.toString))
      lake.sql("SELECT id, v, region FROM af ORDER BY id")
    },
    // r7 dialect breadth: `//` int division, list() aggregate,
    // starts_with, regexp_matches (rewritten), plus ::casts and
    // GROUP/ORDER BY ALL (Spark-native, proven as pasted pass-through)
    "q_lake_dialect2" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE dx(id INTEGER, grp VARCHAR, v INTEGER);
          |INSERT INTO dx VALUES (1,'aa',7),(2,'ab',9),(3,'bb',4),(4,'ab',5)""".stripMargin)
      lake.sql(
        """SELECT grp,
          |       sum(v) // 2 AS half,
          |       sum(v)::VARCHAR AS total_str,
          |       array_to_string(list_sort(list(v)), ',') AS vs,
          |       count(*) FILTER (WHERE starts_with(grp, 'a')) AS a_cnt
          |FROM dx
          |WHERE regexp_matches(grp, '^[ab]+$')
          |GROUP BY ALL
          |ORDER BY ALL""".stripMargin)
    },
    // r7b dialect breadth: 1-BASED bracket subscripts + bare list
    // literals (DuckDB `[…]` — passing these through unchanged would be
    // silently off by one in Spark), strftime C-directives, literal-
    // separator string_split, date_diff('day', …)
    "q_lake_dialect3" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE ev3(id INTEGER, s VARCHAR, d DATE);
          |INSERT INTO ev3 VALUES (1, 'a|b|c', DATE '1995-03-15'),
          |                       (2, 'x|y',   DATE '1995-04-01')""".stripMargin)
      lake.sql(
        """SELECT id,
          |       string_split(s, '|')[1] AS first_tok,
          |       [id, id * 2][2] AS dbl,
          |       strftime(d, '%Y/%m/%d') AS dstr,
          |       date_diff('day', DATE '1995-01-01', d) AS dd
          |FROM ev3 ORDER BY id""".stripMargin)
    },
    // r8 dialect breadth: DuckDB FROM-first syntax (bare `FROM t` and
    // `FROM t SELECT … WHERE …`) + SUMMARIZE — the remaining first-hour
    // spellings from the r7 verdict. Both FROM-first forms feed the
    // summarized table, so the checked output covers all three.
    "q_lake_dialect4" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE d4(id INTEGER, grp VARCHAR, v INTEGER);
          |INSERT INTO d4 VALUES (1,'a',5),(2,'b',NULL),(3,'a',9),(4,'c',2)""".stripMargin)
      lake.sql("CREATE TABLE d4a AS FROM d4")
      lake.sql("CREATE TABLE d4f AS FROM d4a SELECT grp, v WHERE id < 4")
      lake.sql("SUMMARIZE d4f")
    },
    // r8 dialect breadth: DuckDB list comprehensions (with IF filter),
    // composed with the other list rewrites they ride on
    "q_lake_dialect5" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE d5(id INTEGER, xs VARCHAR);
          |INSERT INTO d5 VALUES (1, '1|2|3'), (2, '4|5')""".stripMargin)
      lake.sql(
        """SELECT id,
          |       array_to_string([CAST(x AS INTEGER) * 2 FOR x IN string_split(xs, '|') IF x <> '2'], ',') AS doubled,
          |       [x * 10 FOR x IN [id, id + 1]][2] AS second,
          |       array_to_string(string_split(xs, '|')[1:2], ';') AS head2
          |FROM d5 ORDER BY id""".stripMargin)
    },
    // r8 dialect breadth: struct literals {'k': v} (nested), MAP {k: v},
    // struct_pack(k := v), dot field access, and map['key'] — the DuckDB
    // struct/map surface; final outputs stay scalar (§7.5). r13: map
    // subscript returns a LIST of matches (measured), so `[1]` scalarizes.
    "q_lake_dialect6" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE d6(id INTEGER, a INTEGER, b VARCHAR);
          |INSERT INTO d6 VALUES (1, 4, 'x'), (2, 9, 'y')""".stripMargin)
      lake.sql(
        """SELECT id, st.a AS sa, st.nest.twice AS tw, el['k1'][1] AS mk, sp.p AS spp
          |FROM (SELECT id,
          |             {'a': a, 'nest': {'twice': a * 2}} AS st,
          |             MAP {'k1': b, 'k2': 'z'} AS el,
          |             struct_pack(p := a + 1) AS sp
          |      FROM d6)
          |ORDER BY id""".stripMargin)
    },
    // r8: COLUMNS('re') star expansion — bare form and aggregate-wrapped
    // form (expands per matching column with <head>_<col> aliases); the
    // CTAS exercises expansion inside a derived-table write
    "q_lake_dialect7" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE d7(id INTEGER, q1 INTEGER, q2 INTEGER, q3 INTEGER);
          |INSERT INTO d7 VALUES (1, 10, 20, NULL), (2, 5, 6, 7)""".stripMargin)
      lake.sql("CREATE TABLE d7s AS SELECT id, sum(COLUMNS('q[12]')) FROM d7 GROUP BY id")
      lake.sql("SELECT id, COLUMNS('sum') FROM d7s ORDER BY id")
    },
    // r8 wave 2: UNION ALL BY NAME (columns matched by NAME, missing side
    // null-padded, trailing ORDER BY scoping to the whole union) + the
    // DuckDB power operators `**` and `^` (Spark parses `^` as XOR —
    // 2 ^ 3 would silently return 1 without the rewrite)
    "q_lake_dialect9" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE d9a(id INTEGER, x INTEGER);
          |INSERT INTO d9a VALUES (1, 2), (2, 3);
          |CREATE TABLE d9b(y INTEGER, id INTEGER);
          |INSERT INTO d9b VALUES (7, 5), (8, 6)""".stripMargin)
      lake.sql(
        """SELECT id, x, x ** 2 AS pw FROM d9a
          |UNION ALL BY NAME
          |SELECT id, y, 2 ^ y AS pw FROM d9b
          |ORDER BY id""".stripMargin)
    },
    // r8 wave 2: POSITIONAL JOIN — row-by-position pairing, shorter side
    // null-padded; operands are ORDER BY'd subqueries so the pairing is
    // deterministic on a distributed engine too
    "q_lake_dialect10" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE pa(id INTEGER, v VARCHAR);
          |INSERT INTO pa VALUES (1, 'a'), (2, 'b'), (3, 'c');
          |CREATE TABLE pb(w VARCHAR);
          |INSERT INTO pb VALUES ('x'), ('y')""".stripMargin)
      lake.sql(
        """SELECT id, v, w
          |FROM (SELECT * FROM pa ORDER BY id) POSITIONAL JOIN
          |     (SELECT * FROM pb ORDER BY w)
          |ORDER BY id""".stripMargin)
    },
    // r9: direct file queries — DuckDB's first-hour spellings where a
    // quoted path IS the table (`FROM 'x.parquet'`) plus the
    // read_csv/read_json table functions (r8 verdict's last missing
    // high-traffic surface; ducklakexl.py:394 pass-through). All three
    // formats in one statement, joined against each other; the parquet
    // side is the driver's own nation fixture so the oracle cross-checks
    // real file contents, not just literals.
    "q_lake_dialect11" -> { (s, dir) =>
      val lake = freshLake(s)
      val tmp = Files.createTempDirectory("graft_fileq")
      Files.writeString(tmp.resolve("pts.csv"),
        "id,label\n1,alpha\n2,beta\n3,gamma\n")
      Files.writeString(tmp.resolve("tags.jsonl"),
        "{\"id\": 1, \"tag\": \"x\"}\n{\"id\": 2, \"tag\": \"y\"}\n")
      lake.sql(
        s"""SELECT c.id, n.n_name AS nation, c.label, j.tag
           |FROM '$dir/nation.parquet' n
           |JOIN read_csv('${tmp.resolve("pts.csv")}', header=true) c
           |  ON n.n_nationkey = c.id
           |LEFT JOIN read_json('${tmp.resolve("tags.jsonl")}') j ON j.id = c.id
           |ORDER BY c.id""".stripMargin)
    },
    // r9 wave 2: partitioned export — COPY ... (PARTITION_BY (col)):
    // hive-layout directory, fully distributed write (no one-file
    // funnel), partition column recovered on read-back
    "q_lake_copy_part" -> { (s, _) =>
      val lake = freshLake(s)
      val out = Files.createTempDirectory("graft_part").resolve("exp")
      lake.sql(
        """CREATE TABLE pe(id INTEGER, region VARCHAR, v DOUBLE);
          |INSERT INTO pe VALUES (1,'east',1.5),(2,'west',2.5),(3,'east',3.5)""".stripMargin)
      lake.sql(s"COPY pe TO '$out' (FORMAT parquet, PARTITION_BY (region))")
      lake.sql(s"SELECT id, region, v FROM read_parquet('$out') ORDER BY id")
    },
    // r9 wave 2: CREATE SEQUENCE / nextval / currval — sequence state
    // rides ducklake_metadata (push/pull-persistent); draws evaluate on
    // the driver, one per textual occurrence, left to right
    "q_lake_seq" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE SEQUENCE ids START 100 INCREMENT 10;
          |CREATE TABLE st(id INTEGER, v VARCHAR);
          |INSERT INTO st VALUES (nextval('ids'), 'a'), (nextval('ids'), 'b');
          |INSERT INTO st VALUES (nextval('ids'), 'c')""".stripMargin)
      lake.sql("SELECT st.id, st.v, currval('ids') AS cv FROM st ORDER BY st.id")
    },
    // r10: sequence draws over a DISTRIBUTED SCAN — nextval as a select
    // item over a real FROM reserves a count-sized range and assigns
    // base + row_index*incr in one distributed pass; the advanced head
    // CAS-commits with the insert, and persists through a reopen
    "q_lake_seq2" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE src2(v VARCHAR);
          |INSERT INTO src2 VALUES ('a'),('b'),('c'),('d');
          |CREATE SEQUENCE ids2 START 100 INCREMENT 10;
          |CREATE TABLE dst2(id BIGINT, v VARCHAR);
          |INSERT INTO dst2 SELECT nextval('ids2'), v FROM src2
          |WHERE v <> 'c' ORDER BY v""".stripMargin)
      // reopen from the workbook alone: the advanced head must persist
      val re = new DuckLakeXLSpark(s, lake.excelPath, lake.dataPath)
      re.sql("INSERT INTO dst2 VALUES (nextval('ids2'), 'tail')")
      re.sql("SELECT id, v FROM dst2 ORDER BY id")
    },
    // r9 wave 2: glob('pattern') file-listing table function (DuckDB's
    // exploration spelling before reading anything) — metadata plane,
    // Hadoop glob matcher, deterministic sorted output
    "q_lake_glob" -> { (s, _) =>
      val lake = freshLake(s)
      val tmp = Files.createTempDirectory("graft_glob")
      Seq("a.csv", "b.csv", "c.txt").foreach(f =>
        Files.writeString(tmp.resolve(f), "x\n"))
      lake.sql(
        s"""SELECT regexp_extract(file, '[^/]+$$', 0) AS name
           |FROM glob('$tmp/*.csv') ORDER BY name""".stripMargin)
    },
    // r9 wave 2: duckdb_tables()/duckdb_columns() metadata functions —
    // the native-metadata spellings; estimated_size answers from the
    // catalog's exact record counts (metadata plane, zero scan)
    "q_lake_duckdb_meta" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE m1(id INTEGER PRIMARY KEY, v VARCHAR);
          |INSERT INTO m1 VALUES (1,'a'),(2,'b');
          |CREATE TABLE m2(x INTEGER)""".stripMargin)
      lake.sql(
        """SELECT t.table_name, t.has_primary_key, t.column_count, t.estimated_size, c.ncols
          |FROM duckdb_tables() t
          |JOIN (SELECT table_name, count(*) AS ncols
          |      FROM duckdb_columns() GROUP BY table_name) c USING (table_name)
          |ORDER BY t.table_name""".stripMargin)
    },
    // r9 wave 2: join DML — UPDATE ... FROM and DELETE ... USING (the
    // DuckDB/Postgres spellings), both desugared onto the MERGE
    // copy-on-write path; SET expressions see target and source aliases
    "q_lake_update_join" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE tj(id INTEGER, v VARCHAR, n INTEGER);
          |INSERT INTO tj VALUES (1,'a',10),(2,'b',20),(3,'c',30),(4,'d',40);
          |CREATE TABLE adj(id INTEGER, delta INTEGER);
          |INSERT INTO adj VALUES (2, 5), (3, 7)""".stripMargin)
      lake.sql(
        """UPDATE tj SET n = tj.n + a.delta, v = upper(tj.v) FROM adj a WHERE tj.id = a.id;
          |DELETE FROM tj USING adj a WHERE tj.id = a.id AND a.delta > 5;
          |SELECT * FROM tj ORDER BY id""".stripMargin)
    },
    // r9 wave 2: DuckDB's upsert spellings — INSERT ... ON CONFLICT
    // (explicit target, DO UPDATE with EXCLUDED + target refs, DO
    // NOTHING) and INSERT OR REPLACE resolving the declared PRIMARY KEY;
    // all desugar onto the MERGE copy-on-write path
    "q_lake_upsert" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE up2(id INTEGER PRIMARY KEY, v VARCHAR, n INTEGER);
          |INSERT INTO up2 VALUES (1,'a',10),(2,'b',20),(3,'c',30)""".stripMargin)
      lake.sql(
        """INSERT INTO up2 VALUES (2,'B',99),(4,'d',40)
          |  ON CONFLICT (id) DO UPDATE SET v = EXCLUDED.v, n = up2.n + EXCLUDED.n;
          |INSERT OR REPLACE INTO up2 VALUES (3,'C',33),(5,'e',50);
          |INSERT INTO up2 VALUES (1,'z',0),(6,'f',60) ON CONFLICT (id) DO NOTHING;
          |SELECT * FROM up2 ORDER BY id""".stripMargin)
    },
    // r9 wave 2: the lazy-typist surface DuckDB users reach for first —
    // GROUP BY ALL (group on every non-aggregate select item), ORDER BY
    // ALL, TRY_CAST (NULL on conversion failure, never an error), and
    // the in-parens null treatment `lag(x IGNORE NULLS)` (Spark wants
    // the clause AFTER the call — the router relocates it)
    "q_lake_dialect12" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE d12(id INTEGER, g VARCHAR, v VARCHAR, x INTEGER);
          |INSERT INTO d12 VALUES (1,'a','7',10),(2,'a','z',NULL),(3,'b','9',30),(4,'b','4',NULL)""".stripMargin)
      lake.sql(
        """SELECT d.id, d.g, lag(d.x IGNORE NULLS) OVER (ORDER BY d.id) AS prev_x,
          |       a.n, a.sv
          |FROM d12 d JOIN (SELECT g, count(*) AS n,
          |                        sum(TRY_CAST(v AS INTEGER)) AS sv
          |                 FROM d12 GROUP BY ALL) a ON a.g = d.g
          |ORDER BY ALL""".stripMargin)
    },
    // r10: WITH RECURSIVE pass-through (reference reachable via DuckDB
    // pass-through, ducklakexl.py:394) — Spark 4.x executes recursive
    // CTEs natively; what this row pins is that the router's clause
    // strip/re-wrap and dialect regexes do not mangle the recursive
    // member. Transitive closure over a graph WITH a cycle (4->2),
    // bounded by a depth guard, dedup'd by min(depth).
    "q_lake_dialect13" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE edges13(src INTEGER, dst INTEGER);
          |INSERT INTO edges13 VALUES (1,2),(2,3),(3,4),(2,5),(4,2),(6,7)""".stripMargin)
      lake.sql(
        """WITH RECURSIVE reach(node, depth) AS (
          |  SELECT 1, 0
          |  UNION ALL
          |  SELECT e.dst, r.depth + 1
          |  FROM reach r JOIN edges13 e ON e.src = r.node
          |  WHERE r.depth < 6
          |)
          |SELECT node, CAST(min(depth) AS INTEGER) AS d
          |FROM reach GROUP BY node ORDER BY node""".stripMargin)
    },
    // r10: the UNION-distinct recursion (no depth guard — termination
    // comes from dedup) over a CYCLIC graph: Spark only runs the UNION
    // ALL form natively, so this exercises the semi-naive iterative
    // evaluator in rewriteSelect
    "q_lake_dialect14" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE edges14(src INTEGER, dst INTEGER);
          |INSERT INTO edges14 VALUES (1,2),(2,3),(3,1),(3,4),(5,6)""".stripMargin)
      lake.sql(
        """WITH RECURSIVE reach(node) AS (
          |  SELECT 1
          |  UNION
          |  SELECT e.dst FROM reach r JOIN edges14 e ON e.src = r.node
          |)
          |SELECT node FROM reach ORDER BY node""".stripMargin)
    },
    // r10: string_agg (default ',' + in-call ORDER BY), select- and
    // FROM-position unnest, quantile_cont/median — the everyday DuckDB
    // aggregate/flatten spellings
    "q_lake_dialect15" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE d15(g VARCHAR, v VARCHAR, x INTEGER);
          |INSERT INTO d15 VALUES ('a','u',1),('a','w',3),('a','v',2),('b','z',9)""".stripMargin)
      lake.sql(
        """SELECT g,
          |       string_agg(v ORDER BY x DESC) AS vs,
          |       string_agg(v, '|' ORDER BY v) AS vs2,
          |       CAST(quantile_cont(x, 0.5) AS DOUBLE) AS med,
          |       CAST(median(x) AS DOUBLE) AS med2
          |FROM d15 GROUP BY g ORDER BY g""".stripMargin)
    },
    "q_lake_dialect16" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE d16(id INTEGER, xs VARCHAR);
          |INSERT INTO d16 VALUES (1,'a,b'),(2,'c')""".stripMargin)
      lake.sql(
        """SELECT id, unnest(string_split(xs, ',')) AS u FROM d16
          |UNION ALL
          |SELECT 0 AS id, unnest FROM unnest(['q','r']) ORDER BY id, u""".stripMargin)
    },
    // r10: 3-arg regexp_replace is FIRST-match-only in DuckDB (Spark's
    // builtin is global) — routed to a native replaceFirst expression
    // with \N backref translation; 'g' stays global
    "q_lake_dialect19" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE d19(id INTEGER, s VARCHAR);
          |INSERT INTO d19 VALUES (1,'one two three four'),(2,'o o o')""".stripMargin)
      lake.sql(
        """SELECT id,
          |       regexp_replace(s, '(\w+) (\w+)', '\2 \1') AS swapped,
          |       regexp_replace(s, 'o', '0') AS first_only,
          |       regexp_replace(s, 'o', '0', 'g') AS all_o
          |FROM d19 ORDER BY id""".stripMargin)
    },
    // r10: FROM range() table function + GROUP BY ROLLUP/CUBE native
    // pass-through — proven as pasted, like GROUP BY ALL was
    "q_lake_dialect18" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE d18(r VARCHAR, p VARCHAR, amt INTEGER);
          |INSERT INTO d18 VALUES ('e','x',1),('e','y',2),('w','x',4)""".stripMargin)
      lake.sql(
        """SELECT coalesce(r, 'ALL') AS r, coalesce(p, 'ALL') AS p,
          |       CAST(sum(amt) AS BIGINT) AS total,
          |       (SELECT CAST(sum(range) AS BIGINT) FROM range(4)) AS rng
          |FROM d18 GROUP BY ROLLUP (r, p) ORDER BY r, p""".stripMargin)
    },
    // r10: PREPARE/EXECUTE — parameterized statements, the DuckDB app
    // pattern for repeated queries; $N and ? binding, DML included
    "q_lake_prepare" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE pp(id INTEGER, v VARCHAR, n INTEGER);
          |INSERT INTO pp VALUES (1,'a',10),(2,'b',20),(3,'c',30);
          |PREPARE bump AS UPDATE pp SET n = n + $2 WHERE id = $1;
          |EXECUTE bump(2, 5);
          |EXECUTE bump(3, 7);
          |PREPARE pick AS SELECT id, v, n FROM pp WHERE n <= ? ORDER BY id""".stripMargin)
      lake.sql("EXECUTE pick(37)")
    },
    // r10: the third star modifier (* RENAME), literal-bounds list_slice,
    // dayname/monthname, datepart/datetrunc aliases — composed
    "q_lake_dialect17" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE d17(a INTEGER, b VARCHAR, d DATE);
          |INSERT INTO d17 VALUES (1,'x',DATE '1995-03-15'),(2,'y',DATE '1995-07-04')""".stripMargin)
      lake.sql(
        """SELECT * RENAME (a AS id) FROM (
          |  SELECT a, dayname(d) AS dn, monthname(d) AS mn,
          |         CAST(datepart('year', d) AS BIGINT) AS yr,
          |         array_to_string(list_slice(string_split(b || ',u,v,w', ','), 2, 3), '|') AS sl
          |  FROM d17) ORDER BY id""".stripMargin)
    },
    // r10: DuckDB JSON accessors — -> / ->> arrows (simple, chained,
    // array index), json_extract family, 2-arg json_array_length
    "q_lake_json" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE js(id INTEGER, j VARCHAR);
          |INSERT INTO js VALUES
          |  (1,'{"a":{"b":7},"xs":[1,2,3],"s":"txt"}'),
          |  (2,'{"a":{"b":9},"xs":[],"s":"y"}')""".stripMargin)
      lake.sql(
        """SELECT id,
          |       CAST(j -> 'a' ->> 'b' AS BIGINT) AS ab,
          |       CAST(json_array_length(j, '$.xs') AS BIGINT) AS n,
          |       j ->> 's' AS sv,
          |       CAST(json_extract(j, '$.xs[1]') AS BIGINT) AS x1
          |FROM js ORDER BY id""".stripMargin)
    },
    // r10: SET VARIABLE / getvariable + DuckDB's 4-arg regexp_replace
    // flags — the everyday parameterized-script spelling
    "q_lake_vars" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE vr(id INTEGER, s VARCHAR);
          |INSERT INTO vr VALUES (1,'a  b'),(2,'c   d e');
          |SET VARIABLE pat = '\s+';
          |SET VARIABLE rep = '_'""".stripMargin)
      lake.sql(
        """SELECT id,
          |       regexp_replace(s, getvariable('pat'), getvariable('rep'), 'g') AS clean
          |FROM vr ORDER BY id""".stripMargin)
    },
    // r10: explicit transactions — ROLLBACK must DISCARD the transaction's
    // writes (catalog-state restore), COMMIT closes the scope; a silent
    // no-op here kept rolled-back rows
    "q_lake_txn" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE tx(id INTEGER, v VARCHAR);
          |INSERT INTO tx VALUES (1,'base');
          |BEGIN;
          |INSERT INTO tx VALUES (2,'rolled');
          |UPDATE tx SET v = 'mutated' WHERE id = 1;
          |ROLLBACK;
          |BEGIN;
          |INSERT INTO tx VALUES (3,'committed');
          |COMMIT""".stripMargin)
      lake.sql("SELECT id, v FROM tx ORDER BY id")
    },
    // r10: INSERT ... BY NAME — the source's own column names pick the
    // target columns, order-free, unnamed columns NULL
    "q_lake_byname" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE bn(a INTEGER, b VARCHAR, c DOUBLE);
          |INSERT INTO bn BY NAME SELECT 'x' AS b, 1 AS a;
          |INSERT INTO bn BY NAME SELECT 2.5 AS c, 'y' AS b, 7 AS a""".stripMargin)
      lake.sql("SELECT a, b, c FROM bn ORDER BY a")
    },
    // r8 wave 2: the PRAGMAs a DuckDB user reads output from — show_tables
    // lists, table_info('t') gives the sqlite-style column rows
    "q_lake_pragma" -> { (s, _) =>
      val lake = freshLake(s)
      // r9: the readout long tail rides along mid-script (database_size,
      // version, version()/current_setting scalars) — each must execute
      // without error; their VALUES are asserted in DuckLakeXLSparkSpec,
      // the driver-checked output stays the table_info rows
      lake.sql(
        """CREATE TABLE pr(id INTEGER, v VARCHAR);
          |PRAGMA show_tables;
          |SHOW TABLES;
          |SHOW pr;
          |SHOW DATABASES;
          |SHOW SCHEMAS;
          |PRAGMA database_size;
          |PRAGMA version;
          |SET memory_limit = '8GB';
          |SELECT version() AS v, current_setting('memory_limit') AS ml;
          |PRAGMA table_info('pr')""".stripMargin)
    },
    // r8: SIMILAR TO (anchored regex) + generate_series in both positions,
    // composed with the comprehension/rename rewrites they ride on
    "q_lake_dialect8" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE d8(id INTEGER, v VARCHAR);
          |INSERT INTO d8 VALUES (1, 'abc'), (2, 'azc'), (3, 'ab'), (9, 'zz')""".stripMargin)
      lake.sql(
        """SELECT id, v,
          |       CASE WHEN v SIMILAR TO 'a.c' THEN 1 ELSE 0 END AS m,
          |       array_to_string([CAST(x AS VARCHAR) FOR x IN generate_series(1, id)], '|') AS gs
          |FROM d8 WHERE id IN (SELECT generate_series FROM generate_series(1, 3))
          |ORDER BY id""".stripMargin)
    },
    // r8: DuckDB UNPIVOT statement form (NULL cells excluded, both engines)
    "q_lake_unpivot_stmt" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE up(id INTEGER, q1 INTEGER, q2 INTEGER, q3 INTEGER);
          |INSERT INTO up VALUES (1, 10, 20, NULL), (2, 5, 6, 7)""".stripMargin)
      lake.sql("UNPIVOT up ON q1, q2, q3 INTO NAME quarter VALUE amount")
        .orderBy("id", "quarter")
    },
    // r8: DuckDB PIVOT statement — the binder discovers the value list,
    // Spark needs it stated; the executor scans distinct pivot values
    // (sorted = DuckDB's column order) and builds the grouped pivot
    "q_lake_pivot" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE sales(region VARCHAR, quarter VARCHAR, amount INTEGER);
          |INSERT INTO sales VALUES ('east','q1',10),('east','q2',15),('west','q1',7),('west','q2',3),('east','q1',5)""".stripMargin)
      lake.sql("PIVOT sales ON quarter USING sum(amount) GROUP BY region")
    },
    // r8: Structured-Streaming sink into the lake — micro-batches append
    // through the pull -> insert -> push (CAS) bracket with a
    // ducklake_metadata batch watermark for exactly-once across replays;
    // the checked output is the END STATE a reopened lake sees
    "q_lake_stream_sink" -> { (s, _) =>
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val lake = freshLake(s)
      lake.sql("CREATE TABLE ev_sink(id INTEGER, v VARCHAR)")
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Int, String)]
      val ckpt = Files.createTempDirectory("graft_sink_ckpt").toString
      val q = lake.writeStreamTo(in.toDF().toDF("id", "v"), "ev_sink", ckpt)
      try {
        in.addData((1, "a"), (2, "b"))
        q.processAllAvailable()
        in.addData((3, "c"))
        q.processAllAvailable()
      } finally q.stop()
      val reopened = new DuckLakeXLSpark(s, lake.excelPath, lake.dataPath)
      reopened.sql("SELECT id, v FROM ev_sink ORDER BY id")
    },

    // r8: CREATE [OR REPLACE] MACRO — session-lifetime scalar macros
    // (the reference's per-connection DuckDB catalog lifetime), expanded
    // textually and composed with the dialect rewrites (`//` -> div)
    "q_lake_macro" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE mt(id INTEGER, v INTEGER);
          |INSERT INTO mt VALUES (1, 10), (2, 20), (3, 30);
          |CREATE MACRO addtax(x) AS x + x // 10;
          |CREATE OR REPLACE MACRO addtax(x) AS x + x // 5""".stripMargin)
      lake.sql("SELECT id, addtax(v) AS taxed FROM mt WHERE addtax(v) > 12 ORDER BY id")
    },
    // r11: lake column types beyond scalars — LIST / STRUCT / MAP / JSON
    // / BLOB / UUID / HUGEINT as CREATE TABLE column types (DuckDB DDL
    // reaches the reference verbatim, ducklakexl.py:394; DuckLake v0.1
    // stores these), with element access, the full xlsx round-trip, and
    // a REOPEN from the workbook alone proving the catalog's type
    // strings survive the sheet trip
    "q_lake_types" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE typed(
          |  id INTEGER,
          |  tags VARCHAR[],
          |  meta STRUCT(mime VARCHAR, w INTEGER),
          |  attrs MAP(VARCHAR, INTEGER),
          |  doc JSON,
          |  payload BLOB,
          |  uid UUID,
          |  big HUGEINT)""".stripMargin)
      lake.sql(
        """INSERT INTO typed VALUES
          |  (1, ['a','b'], {'mime': 'text/plain', 'w': 640}, map(['k1','k2'], [1,2]),
          |   '{"x": 7}', 'abc'::BLOB, '00000000-0000-0000-0000-000000000001',
          |   99999999999999999999),
          |  (2, ['c'], {'mime': 'image/png', 'w': 800}, map(['k1'], [5]),
          |   '{"x": 9}', 'xy'::BLOB, '00000000-0000-0000-0000-000000000002', -3)""".stripMargin)
      val reopened = new DuckLakeXLSpark(s, lake.excelPath, lake.dataPath)
      reopened.sql(
        """SELECT id, array_to_string(tags, ',') AS tags_str, tags[1] AS tag1, meta.mime AS mime, meta.w AS w,
          |       attrs['k1'][1] AS k1, doc->>'x' AS x,
          |       payload::VARCHAR AS payload_str, octet_length(payload) AS n_bytes,
          |       uid, big::VARCHAR AS big_str
          |FROM typed ORDER BY id""".stripMargin)
    },
    // r11: CREATE TEMP TABLE — the standard DuckDB ETL session idiom
    // (stage into a temp, join against the lake). Session-lifetime only:
    // never synced to the workbook, gone on reopen (TempTableSpec pins
    // both), shadowing lake names like DuckDB's temp schema
    "q_lake_temp" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE base(id INTEGER, v VARCHAR);
          |INSERT INTO base VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d')""".stripMargin)
      lake.sql(
        """CREATE TEMP TABLE stage AS SELECT id, upper(v) AS vu FROM base WHERE id >= 2;
          |INSERT INTO stage VALUES (9, 'ZZ')""".stripMargin)
      lake.sql(
        """SELECT b.id, b.v, st.vu
          |FROM base b JOIN stage st ON b.id = st.id
          |ORDER BY b.id""".stripMargin)
    },
    // r11: generate_series as a TABLE FUNCTION (inclusive bounds, the
    // DuckDB spelling the repo's own oracle twins already use) + the
    // unnest(generate_series(…)) select-position form + 3-arg step —
    // the oracle runs the IDENTICAL text natively in DuckDB
    "q_lake_dialect20" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
          |       CAST(array_length(generate_series(0, 20, 5)) AS BIGINT) AS step_len
          |FROM (SELECT n, unnest(generate_series(1, n)) AS k
          |      FROM (SELECT generate_series AS n FROM generate_series(2, 4)) g) u
          |ORDER BY n, k""".stripMargin)
    },
    // r11: named WINDOW clause (Spark-native pass-through, pinned) +
    // frame EXCLUDE modifiers (NO OTHERS drops; CURRENT ROW rewrites as
    // frame-aggregate minus the current row's contribution for
    // sum/count/avg — StatementRouter.rewriteWindowExclude); the oracle
    // runs the identical text natively in DuckDB
    // r12: INTERVAL lake column type — logical INTERVAL on the canonical
    // DuckDB-text VARCHAR carrier (functions/IntervalText renders any
    // Spark interval flavor or interval string at write time; rendering
    // measured against DuckDB 1.0), surviving the workbook round-trip
    // and a REOPEN. Bare interval-literal VALUES cells canonicalize
    // TEXTUALLY before Spark parses them (valuesDF), so one multi-row
    // INSERT can mix year-month, day-time and string spellings exactly
    // like DuckDB's.
    "q_lake_interval" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE ivt(id INTEGER, iv INTERVAL);
          |INSERT INTO ivt VALUES
          |  (1, INTERVAL '3 hours'), (2, INTERVAL '2 days'),
          |  (3, INTERVAL '1 year 2 months'), (4, '1 month 2 days 03:04:05'),
          |  (5, INTERVAL '90 seconds'), (6, INTERVAL '-3 hours'),
          |  (7, INTERVAL '1 day 1 microsecond')""".stripMargin)
      val reopened = new DuckLakeXLSpark(s, lake.excelPath, lake.dataPath)
      reopened.sql("SELECT id, CAST(iv AS VARCHAR) AS iv_str FROM ivt ORDER BY id")
    },
    // r12: window EXCLUDE GROUP / TIES — frame-aggregate minus the
    // peer-group aggregate (a second window with RANGE BETWEEN CURRENT
    // ROW AND CURRENT ROW), TIES adding the current row back; NULL
    // members and whole-peer-group frames covered (values measured
    // against DuckDB; the oracle replays the IDENTICAL text)
    "q_lake_dialect23" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """SELECT id, g, k, v,
          |  CAST(sum(v) OVER (PARTITION BY g ORDER BY k
          |    RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
          |    EXCLUDE GROUP) AS BIGINT) AS s_xgrp,
          |  CAST(sum(v) OVER (PARTITION BY g ORDER BY k
          |    RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
          |    EXCLUDE TIES) AS BIGINT) AS s_xties,
          |  CAST(count(v) OVER (PARTITION BY g ORDER BY k
          |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP) AS BIGINT) AS c_xgrp,
          |  round(avg(v) OVER (PARTITION BY g ORDER BY k
          |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE TIES), 3) AS a_xties,
          |  CAST(count(*) OVER (PARTITION BY g ORDER BY k
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS BIGINT) AS cs_xties
          |FROM (VALUES (1,'a',1,10),(2,'a',1,NULL),(3,'a',2,30),(4,'a',2,40),(5,'a',3,50),
          |             (6,'b',1,5),(7,'b',1,7)) t(id, g, k, v)
          |ORDER BY id""".stripMargin)
    },
    // r12: time_bucket — sub-day widths epoch-align in micros, whole-day
    // widths count from Monday 2000-01-03, month widths from 2000-01-01,
    // the INTERVAL offset shifts in/out (all measured; the oracle
    // replays the IDENTICAL text). VARCHAR-cast outputs per §7.5.
    "q_lake_dialect22" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """SELECT
          |  CAST(time_bucket(INTERVAL '15 minutes', TIMESTAMP '2024-03-15 10:37:22') AS VARCHAR) AS b15,
          |  CAST(time_bucket(INTERVAL '1 hour 30 minutes', TIMESTAMP '2024-03-15 10:37:22') AS VARCHAR) AS b90,
          |  CAST(time_bucket(INTERVAL '10 seconds', TIMESTAMP '1969-12-31 23:59:55') AS VARCHAR) AS bneg,
          |  CAST(time_bucket(INTERVAL '2 days', TIMESTAMP '1999-12-31 10:00:00') AS VARCHAR) AS b2d,
          |  CAST(time_bucket(INTERVAL '48 hours', TIMESTAMP '2024-03-16 10:37:22') AS VARCHAR) AS b48h,
          |  CAST(time_bucket(INTERVAL '1 week', TIMESTAMP '2024-03-15 10:37:22') AS VARCHAR) AS bwk,
          |  CAST(time_bucket(INTERVAL '3 months', TIMESTAMP '2024-03-15 10:37:22') AS VARCHAR) AS b3mo,
          |  CAST(time_bucket(INTERVAL '2 months', TIMESTAMP '1999-11-15 10:00:00') AS VARCHAR) AS b2mo,
          |  CAST(time_bucket(INTERVAL '15 minutes', TIMESTAMP '2024-03-15 10:37:22', INTERVAL '5 minutes') AS VARCHAR) AS boff""".stripMargin)
    },
    "q_lake_dialect21" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """SELECT id, g,
          |  CAST(sum(v) OVER w AS BIGINT) AS s_run,
          |  CAST(sum(v) OVER (PARTITION BY g ORDER BY id
          |    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS BIGINT) AS s_nbrs,
          |  CAST(count(*) OVER (PARTITION BY g
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
          |    EXCLUDE CURRENT ROW) AS BIGINT) AS n_others,
          |  round(avg(v) OVER (PARTITION BY g
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
          |    EXCLUDE CURRENT ROW), 3) AS a_others,
          |  CAST(count(v) OVER (PARTITION BY g
          |    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE NO OTHERS) AS BIGINT) AS n_frame
          |FROM (VALUES (1,'a',10),(2,'a',NULL),(3,'a',30),(4,'b',5),(5,'b',7)) t(id, g, v)
          |WINDOW w AS (PARTITION BY g ORDER BY id)
          |ORDER BY id""".stripMargin)
    },
    // r11 function-family wave (barrage-probe closures): strpos, to_hex
    // (lowercase like DuckDB), list_unique (count of distinct non-NULLs),
    // isfinite/isinf, fmt-style format -> printf, jaccard/hamming string
    // metrics, list_dot_product / list_cosine_similarity / list_distance
    // (single-pass higher-order compositions), string_to_array,
    // try_strptime — the oracle replays the IDENTICAL text in DuckDB
    "q_lake_fn_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """SELECT
          |  CAST(strpos('Hello World', 'World') AS BIGINT) AS sp,
          |  to_hex(255) AS hx,
          |  CAST(list_unique([1, 2, 2, NULL, 3]) AS BIGINT) AS lu,
          |  isfinite(1.5) AS fin,
          |  isinf(CAST('Infinity' AS DOUBLE)) AS inf,
          |  format('{} and {}', 1, 'x') AS fm,
          |  round(jaccard('abc', 'abd'), 6) AS jc,
          |  CAST(hamming('abc', 'abd') AS BIGINT) AS hm,
          |  round(list_dot_product([1.0, 2.0], [3.0, 4.0]), 6) AS dp,
          |  round(list_cosine_similarity([1.0, 0.0], [0.6, 0.8]), 6) AS cs,
          |  round(list_distance([1.0, 2.0], [4.0, 6.0]), 6) AS ld,
          |  array_to_string(string_to_array('a|b', '|'), '+') AS sta,
          |  CAST(try_strptime('2024-03-15', '%Y-%m-%d') AS VARCHAR) AS tsv,
          |  CAST(try_strptime('nope', '%Y-%m-%d') AS VARCHAR) AS tsn""".stripMargin)
    },
    // r12 scalar wave (the r11 verdict's remaining refusals, each
    // measured against DuckDB 1.0 — functions/ScalarWave): age (interval
    // text via the componentwise borrow algorithm), full
    // damerau_levenshtein over UTF-8 bytes, even, bit-exact nextafter,
    // `//` (ints trunc-divide, doubles PLAIN-divide), bar() with the
    // pad-to-width-BYTES quirk — the oracle replays the IDENTICAL text
    "q_lake_fn_wave2" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """SELECT
          |  CAST(age(TIMESTAMP '2024-03-10 05:00:00', TIMESTAMP '2024-01-15 10:30:00') AS VARCHAR) AS ag1,
          |  CAST(age(DATE '2024-03-10', DATE '2024-01-15') AS VARCHAR) AS ag2,
          |  CAST(age(DATE '2024-01-15', DATE '2024-03-10') AS VARCHAR) AS ag3,
          |  CAST(age(DATE '2025-07-04', DATE '2022-12-25') AS VARCHAR) AS ag4,
          |  CAST(damerau_levenshtein('ca', 'abc') AS BIGINT) AS dl1,
          |  CAST(damerau_levenshtein('kitten', 'sitting') AS BIGINT) AS dl2,
          |  even(2.5) AS ev1, even(-2.5) AS ev2, even(0) AS ev3,
          |  nextafter(1.0, 2.0) AS na1, nextafter(0.0, -1.0) AS na2,
          |  CAST(7 // 2 AS BIGINT) AS fd1, CAST((-7) // 2 AS BIGINT) AS fd2,
          |  7.5 // 2 AS fd3,
          |  bar(3, 0, 5, 5) AS b1, bar(2.7, 0, 5, 10) AS b2,
          |  bar(0, 0, 5, 5) AS b3, bar(4.99, 0, 5, 5) AS b4""".stripMargin)
    },
    // r12 wave-2 (gap probe): 2-arg trim family via ANSI TRIM (Spark's
    // 2-arg ltrim/rtrim argument order is REVERSED from DuckDB's —
    // the bare rename was a silent wrong-value), type-dispatching
    // len/length, gcd/lcm, to_base, ISO weekofyear/yearweek, interval
    // constructors (to_days/to_hours), 3-arg date_sub, list_reduce /
    // list_aggregate / list_any_value, array_reverse,
    // regexp_split_to_array, Postgres ~~ LIKE operators — the oracle
    // replays the IDENTICAL text
    "q_lake_fn_wave3" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """SELECT
          |  ltrim('xxabc', 'x') AS lt, rtrim('abcyy', 'y') AS rt,
          |  trim('xxabcxx', 'x') AS tr,
          |  CAST(len('héllo') AS BIGINT) AS ln1,
          |  CAST(len([1, 2, NULL]) AS BIGINT) AS ln2,
          |  CAST(gcd(-12, 18) AS BIGINT) AS g1,
          |  CAST(lcm(-4, 6) AS BIGINT) AS l1,
          |  to_base(255, 16) AS tb,
          |  CAST(weekofyear(DATE '2021-01-01') AS BIGINT) AS wy,
          |  CAST(yearweek(DATE '2024-12-31') AS BIGINT) AS yw,
          |  CAST(DATE '2024-01-01' + to_days(3) AS DATE) AS dd,
          |  CAST(TIMESTAMP '2024-01-01 00:00:00' + to_hours(2) AS VARCHAR) AS dh,
          |  CAST(date_sub('day', DATE '2024-03-01', DATE '2024-01-01') AS BIGINT) AS ds1,
          |  CAST(date_sub('month', DATE '2024-03-10', DATE '2024-01-15') AS BIGINT) AS ds2,
          |  CAST(list_reduce([1, 2, 3, 4], (a, b) -> a + b) AS BIGINT) AS lr,
          |  list_aggregate(['a', 'b'], 'min') AS la1,
          |  CAST(list_aggregate([1, NULL, 3], 'count') AS BIGINT) AS la2,
          |  CAST(list_any_value([NULL, 3, 4]) AS BIGINT) AS lav,
          |  array_to_string(array_reverse([1, 2, 3]), ',') AS ar,
          |  array_to_string(regexp_split_to_array('a1b2c', '[0-9]'), ',') AS rs,
          |  ('abc' ~~ 'a%') AS lk1, ('ABC' ~~* 'a%') AS lk2,
          |  ('abc' !~~ 'b%') AS lk3""".stripMargin)
    },
    // r12 aggregate wave 2 (aggregate-differential closures): exact
    // DECIMAL-aware avg, input-type-preserving median/quantiles,
    // DECIMAL mad, bias-corrected skewness/kurtosis — identical text
    // replays in DuckDB
    "q_lake_agg_wave2" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """SELECT g,
          |  avg(d) AS av,
          |  CAST(median(d) AS VARCHAR) AS md,
          |  CAST(quantile_cont(d, 0.25) AS VARCHAR) AS qc,
          |  CAST(quantile_disc(i, 0.5) AS BIGINT) AS qd,
          |  CAST(mad(d) AS VARCHAR) AS md2,
          |  round(skewness(d), 6) AS sk,
          |  round(kurtosis(d), 6) AS kt
          |FROM (VALUES (0, 'a', 8, 4.59), (1, 'c', 4, 2.27), (2, 'a', 20, 2.22),
          |  (3, 'c', 0, 2.56), (4, 'a', 20, -2.97), (5, 'b', 13, 1.71),
          |  (6, 'a', 20, 5.26), (7, 'a', 17, -2.53), (8, 'c', 19, 6.63),
          |  (9, 'c', 9, -2.63), (10, 'b', 12, 2.47), (11, 'a', 15, 7.47),
          |  (12, 'b', -5, -1.30), (13, 'a', -2, 5.89)) t(id, g, i, d)
          |GROUP BY g ORDER BY g""".stripMargin)
    },
    // r12 date wave (differential-barrage closures, all measured):
    // date_trunc DATE results, boundary-crossing date_diff units,
    // Sunday=0 dow / isodow / century, clamp-aware date_sub months,
    // DATE - DATE day counts, negative left/right — the oracle replays
    // the IDENTICAL text
    "q_lake_date_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """SELECT
          |  CAST(date_trunc('month', TIMESTAMP '2004-08-20 23:07:35') AS VARCHAR) AS dt1,
          |  CAST(date_trunc('week', TIMESTAMP '2005-12-14 16:25:21') AS VARCHAR) AS dt2,
          |  CAST(date_diff('week', DATE '2024-03-13', DATE '2024-03-18') AS BIGINT) AS dd1,
          |  CAST(date_diff('month', DATE '2024-01-31', DATE '2024-02-01') AS BIGINT) AS dd2,
          |  CAST(date_diff('second', DATE '2001-11-27', DATE '2001-11-28') AS BIGINT) AS dd3,
          |  CAST(date_part('dow', DATE '2024-01-07') AS BIGINT) AS dp1,
          |  CAST(date_part('isodow', DATE '2024-01-07') AS BIGINT) AS dp2,
          |  CAST(date_part('century', DATE '2029-02-12') AS BIGINT) AS dp3,
          |  CAST(date_part('second', TIMESTAMP '2024-01-01 00:00:46.75') AS BIGINT) AS dp4,
          |  CAST(date_sub('month', TIMESTAMP '2024-01-31 10:00:00', TIMESTAMP '2024-02-29 10:00:00') AS BIGINT) AS ds1,
          |  CAST(date_sub('month', TIMESTAMP '2024-01-31 10:00:00', TIMESTAMP '2024-02-28 09:00:00') AS BIGINT) AS ds2,
          |  CAST((DATE '2024-03-10' - DATE '2024-03-01') AS BIGINT) AS dm1,
          |  left('Hello World', -5) AS lf1,
          |  right('The quick brown fox', -1) AS rt1,
          |  CAST(yearweek(DATE '2021-01-01') AS BIGINT) AS yw1""".stripMargin)
    },
    // r12 percent limit: floor(n*pct/100) rows of the ORDERED query
    // (two passes — count, then plain limit; DuckDB's own percent limit
    // also materializes the count)
    "q_lake_limit_pct" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """SELECT id, v FROM (VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d'),(5,'e'))
          |  t(id, v) ORDER BY id LIMIT 40%""".stripMargin)
    },
    // r11 aggregate wave (barrage #3): geomean, fsum (Kahan spelling),
    // 2-arg min/max (top-n LIST), quantile_disc (-> WITHIN GROUP),
    // FILTER-without-WHERE shorthand, in-call ORDER BY dropped on
    // commutative aggregates — oracle replays the IDENTICAL text
    "q_lake_agg_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """SELECT round(geomean(x), 6) AS gm,
          |       CAST(fsum(x) AS DOUBLE) AS fs,
          |       quantile_disc(x, 0.5) AS qd,
          |       CAST(count(*) FILTER (g = 'a') AS BIGINT) AS cf,
          |       round(sum(x ORDER BY id), 6) AS so
          |FROM (SELECT id, g, CAST(x AS DOUBLE) AS x FROM (VALUES (1,'a',1.0),(2,'a',2.0),(3,'b',3.0),(4,'b',4.0)) t0(id, g, x)) t""".stripMargin)
    },
    // r12 profiling aggregates (top r11 refusals): histogram / entropy /
    // mad / product as native partial-able TypedImperativeAggregates
    // (functions/ProfileAggs.scala) — the histogram MAP serializes to a
    // canonical `k:v,...` string on BOTH sides (the r11 ARRAY-output
    // lesson: oracle rows emit atomic types only); DuckDB replays the
    // IDENTICAL text
    "q_lake_profile_aggs" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """SELECT g,
          |  round(product(x), 6) AS pr,
          |  round(entropy(c), 6) AS en,
          |  round(mad(x), 6) AS md,
          |  array_to_string(list_transform(map_entries(histogram(c)),
          |    e -> concat(e.key, ':', e.value)), ',') AS hg
          |FROM (SELECT g, c, CAST(x AS DOUBLE) AS x FROM (VALUES
          |  ('a','u',1.0),('a','v',2.0),('a','u',3.0),
          |  ('b','w',0.5),('b','w',-4.0),('b','u',2.5)) t0(g,c,x)) t
          |GROUP BY g ORDER BY g""".stripMargin)
    },
    // r11: USING SAMPLE — the seeded row-count form is DETERMINISTIC by
    // definition here (md5 rank over (seed, row values), see
    // StatementRouter.rewriteSampleSeeded), so the oracle can replay the
    // identical draw with explicit columns; unseeded % / ROWS forms pass
    // through as TABLESAMPLE (no oracle — R11EdgeSpec pins behavior)
    "q_lake_sample" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE smp(id INTEGER, v VARCHAR);
          |INSERT INTO smp VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d'),
          |  (5,'e'),(6,'f'),(7,'g'),(8,'h')""".stripMargin)
      lake.sql(
        "SELECT id, v FROM smp USING SAMPLE 3 ROWS REPEATABLE (42) ORDER BY id")
    },
    // r11: column constraints — NOT NULL and CHECK are ENFORCED at write
    // time (raise_error projection, zero extra jobs), DEFAULT fills
    // unlisted columns / DEFAULT tokens / DEFAULT VALUES; constraints
    // round-trip the workbook as tags (reopen below still enforces —
    // R11EdgeSpec pins the violation paths)
    "q_lake_constraints" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE ct2(
          |  id INTEGER PRIMARY KEY,
          |  name VARCHAR NOT NULL,
          |  qty INTEGER DEFAULT 1 CHECK (qty >= 0),
          |  tag VARCHAR DEFAULT 'none',
          |  CHECK (id < 1000))""".stripMargin)
      lake.sql("INSERT INTO ct2(id, name) VALUES (1, 'a')")
      lake.sql("INSERT INTO ct2 VALUES (2, 'b', 5, DEFAULT)")
      lake.sql("INSERT INTO ct2(id, name, qty) VALUES (3, 'c', 7)")
      val reopened = new DuckLakeXLSpark(s, lake.excelPath, lake.dataPath)
      reopened.sql("SELECT id, name, qty, tag FROM ct2 ORDER BY id")
    },
    // r11: DML RETURNING — INSERT returns the post-image (unlisted
    // columns as their NULL fill), UPDATE the post-image of matched
    // rows, DELETE the removed rows; expressions project over them
    "q_lake_returning" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql("CREATE TABLE rt(id INTEGER, qty INTEGER, v VARCHAR)")
      val ins = lake.sql(
        "INSERT INTO rt VALUES (1,10,'a'),(2,20,'b'),(3,30,'c') " +
        "RETURNING id, qty * 2 AS dbl")
      val upd = lake.sql(
        "UPDATE rt SET qty = qty + 5, v = 'bumped' WHERE id >= 2 RETURNING id, qty, v")
      val del = lake.sql("DELETE FROM rt WHERE id = 1 RETURNING *")
      import org.apache.spark.sql.functions.lit
      ins.withColumn("stmt", lit("insert"))
        .select("stmt", "id", "dbl")
        .unionByName(upd.withColumn("stmt", lit("update"))
          .selectExpr("stmt", "id", "qty AS dbl"))
        .unionByName(del.withColumn("stmt", lit("delete"))
          .selectExpr("stmt", "id", "qty AS dbl"))
        .orderBy("stmt", "id")
    },
    // r11: the multimodal north star lake-native — the payload column
    // LIVES IN a lake table (BLOB + STRUCT metadata), not beside it in a
    // fixture view; INSERT … SELECT from the corpus, reopen, digest
    "q_lake_multimodal_blob" -> { (s, d) =>
      val lake = freshLake(s)
      Tables.t(s, d, "documents").createOrReplaceTempView("mm_docs_src")
      lake.sql(
        "CREATE TABLE media(doc_id BIGINT, payload BLOB, " +
        "meta STRUCT(mime VARCHAR, n_chars BIGINT))")
      lake.sql(
        """INSERT INTO media
          |SELECT doc_id, text::BLOB, {'mime': 'text/plain', 'n_chars': n_chars}
          |FROM mm_docs_src""".stripMargin)
      val reopened = new DuckLakeXLSpark(s, lake.excelPath, lake.dataPath)
      reopened.sql(
        """SELECT doc_id, octet_length(payload) AS n_bytes, md5(payload) AS digest,
          |       meta.mime AS mime, meta.n_chars AS n_chars
          |FROM media ORDER BY doc_id""".stripMargin)
    },
    // r13 JOIN USING / NATURAL JOIN pins (verdict #2): SELECT * emits
    // the using/shared key ONCE and FIRST, RIGHT/FULL joins COALESCE it
    // across sides, NATURAL matches on every shared name — all measured
    // on DuckDB 1.0 (JoinUsingSpec pins column lists and SEMI/ANTI
    // shapes); the oracle replays the IDENTICAL text
    "q_lake_join_using" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE jul(k INTEGER, lv VARCHAR);
          |INSERT INTO jul VALUES (1,'a'),(2,'b'),(3,'c');
          |CREATE TABLE jur(k INTEGER, rv VARCHAR);
          |INSERT INTO jur VALUES (2,'x'),(3,'y'),(4,'z')""".stripMargin)
      lake.sql(
        """SELECT 'full_using' AS src, k, lv, rv FROM jul FULL JOIN jur USING (k)
          |UNION ALL
          |SELECT 'natural', k, lv AS v, rv AS w
          |FROM (SELECT k, lv FROM jul) nl NATURAL FULL JOIN (SELECT k, rv FROM jur) nr
          |UNION ALL
          |SELECT 'semi', k, lv, NULL FROM jul SEMI JOIN jur USING (k)
          |UNION ALL
          |SELECT 'anti', k, lv, NULL FROM jul ANTI JOIN jur USING (k)
          |ORDER BY src, k""".stripMargin)
    },
    // r13 JSON differential wave (barrage #7): -> keeps JSON text while
    // ->> unquotes leaves, negative subscripts are NULL, json_extract's
    // path grammar ($-path / JSON-pointer / bare SINGLE key — 'a.b' is
    // one key, NOT a traversal), 2-arg json_array_length is 0 on
    // non-array and NULL on missing, json_valid — the semantics
    // JsonDifferentialSpec fixed, replayed as an oracle row (DuckDB runs
    // the IDENTICAL text)
    "q_lake_json_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE jw(id INTEGER, j VARCHAR);
          |INSERT INTO jw VALUES
          |  (1,'{"a":{"b":7},"xs":[1,2,3],"s":"txt"}'),
          |  (2,'{"a":{"b":9},"xs":[],"s":"y"}')""".stripMargin)
      lake.sql(
        """SELECT id,
          |  CAST(j -> 'a' AS VARCHAR) AS j_obj,
          |  j ->> 's' AS j_str,
          |  CAST(j -> 's' AS VARCHAR) AS j_q,
          |  CAST(j -> 'xs' ->> 1 AS BIGINT) AS j_idx,
          |  j ->> 'missing' AS j_miss,
          |  j -> 'xs' ->> -1 AS j_neg,
          |  CAST(json_extract(j, '/a/b') AS VARCHAR) AS j_ptr,
          |  json_extract_string(j, '$.a.b') AS j_path,
          |  CAST(json_extract(j, 'a.b') AS VARCHAR) AS j_bare,
          |  CAST(json_array_length(j, '$.xs') AS BIGINT) AS n_xs,
          |  CAST(json_array_length(j, '$.s') AS BIGINT) AS n_s,
          |  CAST(json_array_length(j, '$.zz') AS BIGINT) AS n_zz,
          |  json_valid(j) AS ok1,
          |  json_valid(j || '{') AS ok2
          |FROM jw ORDER BY id""".stripMargin)
    },
    // r13 struct/map differential wave: struct literals render with
    // field names ({'a': 1, 'b': x}), row() prints parens, struct
    // comparisons are lexicographic by field, map subscript returns a
    // LIST of matches ([10] / []), map VARCHAR render is {k=v} — the
    // semantics StructMapDifferentialSpec fixed, replayed as an oracle
    // row (DuckDB runs the IDENTICAL text)
    "q_lake_struct_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """SELECT
          |  CAST({'a': 1, 'b': 'x'} AS VARCHAR) AS st1,
          |  CAST(({'n': {'m': 7}}).n.m AS BIGINT) AS st2,
          |  {'a': 1, 'b': 'x'}['b'] AS st3,
          |  CAST(struct_pack(a := 5).a AS BIGINT) AS st4,
          |  CAST(struct_insert({'a': 1}, b := 9) AS VARCHAR) AS st5,
          |  CAST(row(1, 'two', 3.5) AS VARCHAR) AS st6,
          |  ({'a': 1, 'b': 2} < {'a': 1, 'b': 3}) AS st7,
          |  CAST(({'a': NULL}).a AS VARCHAR) AS st8,
          |  CAST(({'d': DATE '2024-03-01'}).d + 1 AS VARCHAR) AS st9,
          |  CAST(map(['k1','k2'],[10,20])['k1'] AS VARCHAR) AS mp1,
          |  CAST(map(['k1','k2'],[10,20])['nope'] AS VARCHAR) AS mp2,
          |  array_to_string(map_keys(map(['k1','k2'],[10,20])), ',') AS mp3,
          |  CAST(cardinality(map(['k1','k2'],[10,20])) AS BIGINT) AS mp4,
          |  CAST(map(['k'],[1]) AS VARCHAR) AS mp5,
          |  CAST(map_from_entries([{'k': 'a', 'v': 1}, {'k': 'b', 'v': 2}]) AS VARCHAR) AS mp6,
          |  CAST(element_at(map(['k'],[7]), 'k') AS VARCHAR) AS mp7,
          |  array_to_string(list_transform([{'a': 1}, {'a': 2}], x -> x.a), ',') AS ls1""".stripMargin)
    },
    // r13 compare differential wave (barrage wave 2): IEEE NaN SQL
    // semantics, three-valued CONTAINER comparisons (a NULL element
    // before any decided inequality makes the result NULL — Spark's
    // native compare calls NULL elements equal), mixed-type coercion
    // compares, greatest/least NULL-skipping — the semantics
    // CompareDifferentialSpec pinned, replayed as an oracle row
    "q_lake_compare_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """SELECT
          |  ('nan'::DOUBLE = 'nan'::DOUBLE) AS n1,
          |  ('nan'::DOUBLE > 1e308) AS n2,
          |  (-0.0::DOUBLE = 0.0::DOUBLE) AS n3,
          |  (1 = '1') AS m1,
          |  (10 < '9') AS m2,
          |  (2 BETWEEN '1' AND '3') AS m3,
          |  (DATE '2024-01-02' < '2024-01-03') AS m4,
          |  ([1, NULL] = [1, NULL]) AS a1,
          |  ([1, NULL] = [2, NULL]) AS a2,
          |  ([NULL] = []) AS a3,
          |  ([1, NULL] < [2]) AS a4,
          |  ([1, NULL] < [1, 2]) AS a5,
          |  ([1, NULL] IS NOT DISTINCT FROM [1, NULL]) AS a6,
          |  ({'a': NULL} = {'a': NULL}) AS s1,
          |  ({'a': 1} IS DISTINCT FROM {'a': 2}) AS s2,
          |  CAST(greatest(1, NULL, 3) AS BIGINT) AS g1,
          |  ('nan'::DOUBLE IS DISTINCT FROM 'nan'::DOUBLE) AS g2""".stripMargin)
    },
    // r14 coercion differential wave: DuckDB's set-op branch typing
    // (string vs anything -> VARCHAR, bool vs numeric -> numeric),
    // VALUES-list string-row conversion, bool IN-lists, CASE branch
    // typing, greatest/least unknown-string rules — the semantics
    // CoercionDifferentialSpec pinned (graft.lake.CoercionRepair),
    // replayed as one oracle row (DuckDB runs the IDENTICAL text)
    "q_lake_coerce_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(coerceWaveSql)
    },
    // r14 function-battery wave: fuzzy-text, format_bytes, date parts,
    // grade-up, parse_path family (FnWaveDifferentialSpec semantics)
    "q_lake_fn2_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(fnWaveSql)
    },
    // r15 waves — see the *WaveSql docs above
    "q_lake_unicase_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(unicaseWaveSql)
    },
    "q_lake_numedge_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(numedgeWaveSql)
    },
    // r16 waves — see strftimeWaveSql / uuidblobWaveSql / printfWaveSql
    "q_lake_strftime_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(strftimeWaveSql)
    },
    "q_lake_printf_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(printfWaveSql)
    },
    "q_lake_likeglob_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(likeglobWaveSql)
    },
    "q_lake_uuidblob_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(uuidblobWaveSql)
    },
    // r16 waves — see mapdepthWaveSql / listmathWaveSql / aggdepthWaveSql
    "q_lake_mapdepth_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(mapdepthWaveSql)
    },
    "q_lake_listmath_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(listmathWaveSql)
    },
    "q_lake_aggdepth_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(aggdepthWaveSql)
    },
    "q_lake_windepth_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(windepthWaveSql)
    },
    // r16: meta-catalog time travel (reference README.md:164-165 TODO —
    // "time travel on the catalog itself"). Catalog rows are versioned
    // by begin/end snapshot, so `ducklake_table AT (VERSION => n)`
    // answers the table list as of n: before the DROP both tables show,
    // after it only the survivor. Oracle is the pinned VALUES literal.
    "q_lake_meta_travel" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql("CREATE TABLE mt1(id INTEGER)")
      lake.sql("CREATE TABLE mt2(id INTEGER)")
      val atCreates = lake.sql(
        "SELECT max(snapshot_id) FROM ducklake_snapshot").head().getLong(0)
      lake.sql("DROP TABLE mt1")
      lake.sql(
        s"""SELECT 'then' AS era, table_name FROM ducklake_table AT (VERSION => $atCreates)
           |UNION ALL
           |SELECT 'now' AS era, table_name FROM ducklake_table WHERE end_snapshot IS NULL
           |ORDER BY era, table_name""".stripMargin)
    },
    // r17 waves — reader-option depth + statement shapes (CsvOpt/JsonOpt/
    // StmtShape differential specs pinned 84 fixtures; these replay the
    // highest-traffic shapes as oracle rows). The COPY QUOTE '' raw-line
    // writes build the option-bearing files inside the lake's dataPath.
    "q_lake_csvopt_wave" -> { (s, _) =>
      val lake = freshLake(s)
      val dp = lake.dataPath
      lake.sql(
        s"""COPY (SELECT 'id,c,d' || chr(10) || '1,NA,7' || chr(10) || '2,none,NA' || chr(10) || '3,x,9' AS j) TO '$dp/w.csv' (FORMAT CSV, QUOTE '', HEADER false);
           |COPY (SELECT 'id,c' || chr(10) || '1,' || chr(10) || '2,x' AS j) TO '$dp/f.csv' (FORMAT CSV, QUOTE '', HEADER false);
           |COPY (SELECT 'garbage' || chr(10) || 'a' || chr(10) || '10' || chr(10) || '20' AS j) TO '$dp/s.csv' (FORMAT CSV, QUOTE '', HEADER false);
           |SELECT 'nulls' AS k, CAST(id AS VARCHAR) AS a, coalesce(c, 'None') || '/' || coalesce(CAST(d + 1 AS VARCHAR), 'None') AS b FROM read_csv('$dp/w.csv', nullstr=['NA','none'])
           |UNION ALL SELECT 'force', CAST(id AS VARCHAR), '[' || c || ']' FROM read_csv('$dp/f.csv', force_not_null=['c'])
           |UNION ALL SELECT 'cols', CAST(x AS VARCHAR), coalesce(y, 'None') || '/' || coalesce(CAST(z AS VARCHAR), 'None') FROM read_csv('$dp/w.csv', columns={'x':'INTEGER','y':'VARCHAR','z':'DOUBLE'}, nullstr=['NA','none'])
           |UNION ALL SELECT 'skip', CAST(a AS VARCHAR), CAST(a + 1 AS VARCHAR) FROM read_csv('$dp/s.csv', skip=1)
           |UNION ALL SELECT 'types', c, c || '!' FROM read_csv('$dp/s.csv', skip=1, types=['VARCHAR'], names=['c'], header=true)
           |ORDER BY k, a""".stripMargin)
    },
    "q_lake_jsonopt_wave" -> { (s, _) =>
      val lake = freshLake(s)
      val dp = lake.dataPath
      lake.sql(
        s"""COPY (SELECT '[{"a": 1, "b": "x"},' || chr(10) || '{"a": 2, "b": "y"}]' AS j) TO '$dp/arr.json' (FORMAT CSV, QUOTE '', HEADER false);
           |COPY (SELECT '{"a": 1, "b": "x"}' || chr(10) || '{"a": 2}' AS j) TO '$dp/nd.json' (FORMAT CSV, QUOTE '', HEADER false);
           |COPY (SELECT '1' || chr(10) || '2' || chr(10) || '3' AS j) TO '$dp/sc.json' (FORMAT CSV, QUOTE '', HEADER false);
           |COPY (SELECT '{"d": "2024-02-29", "t": "2024-02-29 01:02:03"}' AS j) TO '$dp/pr.json' (FORMAT CSV, QUOTE '', HEADER false);
           |COPY (SELECT '{"a": 1}' || chr(10) || 'oops' || chr(10) || '{"a": 3}' AS j) TO '$dp/ig.json' (FORMAT CSV, QUOTE '', HEADER false);
           |SELECT 'arr' AS k, CAST(a AS VARCHAR) AS a2, b AS b2 FROM read_json('$dp/arr.json')
           |UNION ALL SELECT 'recs', CAST(a AS VARCHAR), CAST(json AS VARCHAR) FROM (SELECT json, json.a AS a FROM read_json('$dp/nd.json', records=false))
           |UNION ALL SELECT 'scal', 'sum', CAST(sum(json) AS VARCHAR) FROM read_json('$dp/sc.json')
           |UNION ALL SELECT 'cols', a, a || '?' FROM read_json('$dp/nd.json', columns={'a':'VARCHAR'})
           |UNION ALL SELECT 'prom', CAST(d + INTERVAL 1 DAY AS VARCHAR), CAST(t AS VARCHAR) FROM read_json('$dp/pr.json')
           |UNION ALL SELECT 'ign', coalesce(CAST(a AS VARCHAR), 'None'), 'x' FROM read_json('$dp/ig.json', ignore_errors=true)
           |ORDER BY k, a2""".stripMargin)
    },
    // r18 slice differential (SliceDifferentialSpec pins the 62-fixture
    // barrage; this row puts the surface under the driver's oracle gate)
    "q_lake_slice_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(SliceWaveSql)
    },
    // r18 tvf differential (TvfDifferentialSpec): the unnest ZIP, the
    // recursive flatten, half-open range, and the cumulative calendar
    // walk — the oracle is the IDENTICAL dialect text run by DuckDB
    "q_lake_tvf_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(TvfWaveSql)
    },
    // r19 (VERDICT r18 task 3): the winspec and lambda differential
    // surfaces under the driver oracle gate, closing the r18 asymmetry
    // — oracle = the IDENTICAL dialect text run by DuckDB
    "q_lake_winspec_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(WinSpecWaveSql)
    },
    "q_lake_lambda_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(LambdaWaveSql)
    },
    // r19 nested-type ordering (NestOrdDifferentialSpec pins the 40-
    // fixture barrage) — inner NULLs largest, DuckDB's total order
    "q_lake_nestord_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(NestOrdWaveSql)
    },
    // r19 lateral depth (LateralDifferentialSpec pins the 30-fixture
    // barrage) — auto-LATERAL unnest via LATERAL VIEW explode
    "q_lake_lateral_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(LateralWaveSql)
    },
    "q_lake_stmtshape_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """WITH u(y) AS (SELECT x + 1 FROM t), t(x) AS (SELECT 7)
          |SELECT 'fwd' AS k, CAST(y AS VARCHAR) AS v FROM u
          |UNION ALL SELECT 'prec', CAST(x AS VARCHAR) FROM (SELECT 1 AS x UNION SELECT 2 INTERSECT SELECT 2)
          |UNION ALL SELECT 'fetch', CAST(x AS VARCHAR) FROM (SELECT x FROM (VALUES (3),(1),(2)) t(x) ORDER BY 1 FETCH FIRST 2 ROWS ONLY)
          |UNION ALL SELECT 'coerce', CAST(x AS VARCHAR) FROM (VALUES (1), (2.5), (3)) t(x)
          |UNION ALL SELECT 'don', CAST(x AS VARCHAR) FROM (SELECT DISTINCT ON (x % 2) x FROM (VALUES (4),(2),(1),(3)) t(x) ORDER BY x % 2, x)
          |UNION ALL SELECT 'off', CAST(x AS VARCHAR) FROM (SELECT x FROM (VALUES (1),(2),(3)) t(x) ORDER BY 1 OFFSET 1)
          |ORDER BY k, v""".stripMargin)
    },
    // r17 (VERDICT r16 task 8): schema archaeology END-TO-END — two
    // metadata tables joined AS-OF one version. ducklake_table +
    // ducklake_column at the pre-ALTER/DROP snapshot reconstruct the
    // dropped column and the dropped table; ducklake_data_file at the
    // same version answers which files that snapshot could read.
    "q_lake_meta_travel_join" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql("CREATE TABLE mj1(id INTEGER, v VARCHAR)")
      lake.sql("CREATE TABLE mj2(k INTEGER)")
      lake.sql("INSERT INTO mj1 VALUES (1, 'a'), (2, 'b')")
      val v = lake.sql(
        "SELECT max(snapshot_id) FROM ducklake_snapshot").head().getLong(0)
      lake.sql("ALTER TABLE mj1 DROP COLUMN v")
      lake.sql("DROP TABLE mj2")
      lake.sql(
        s"""SELECT 'then' AS era, t.table_name, c.column_name AS a, c.column_type AS b
           |FROM ducklake_table AT (VERSION => $v) t
           |JOIN ducklake_column AT (VERSION => $v) c ON c.table_id = t.table_id
           |UNION ALL
           |SELECT 'now' AS era, t.table_name, c.column_name AS a, c.column_type AS b
           |FROM ducklake_table t JOIN ducklake_column c ON c.table_id = t.table_id
           |WHERE t.end_snapshot IS NULL AND c.end_snapshot IS NULL
           |UNION ALL
           |SELECT 'files@then' AS era, t.table_name,
           |       CAST(count(*) AS VARCHAR) AS a,
           |       CAST(sum(f.record_count) AS VARCHAR) AS b
           |FROM ducklake_data_file AT (VERSION => $v) f
           |JOIN ducklake_table AT (VERSION => $v) t ON t.table_id = f.table_id
           |GROUP BY t.table_name
           |ORDER BY era, table_name, a""".stripMargin)
    },
    // r14 interval-arithmetic wave: per-field * / int with integer
    // division, unnormalized ± renders, mixed-family literals — the
    // semantics IntervalDifferentialSpec pinned, replayed as one
    // oracle row (DuckDB runs the IDENTICAL text)
    "q_lake_interval_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(intervalWaveSql)
    },
    // r14 ENUM lake column type: VARCHAR carrier, canonical ENUM(...)
    // catalog render, synthesized membership CHECK (LakeEnumSpec pins
    // the reopen round-trip and the loud non-member refusal)
    "q_lake_enum" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql("CREATE TABLE et(c ENUM('a','b'), i INTEGER)")
      lake.sql("INSERT INTO et VALUES ('a', 1), ('b', 2), ('a', 3), (NULL, 4)")
      lake.sql("SELECT CAST(c AS VARCHAR) AS c, i FROM et ORDER BY i")
    },
    // r14 decimal-arithmetic wave: + - * % precision/scale propagation
    // through the VARCHAR render, incl. the 38-cap regime where the
    // formula scale is KEPT (allowPrecisionLoss=false) — the semantics
    // DecimalArithDifferentialSpec pinned, replayed as one oracle row
    "q_lake_decimal_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(decimalWaveSql)
    },
    // r13 subquery differential wave (barrage wave 2): correlated
    // scalar subqueries, EXISTS, NOT IN with NULL (three-valued
    // logic), quantified ordering ANY/ALL (router reduces to min/max
    // scalar subqueries), LATERAL both flavors — the shapes
    // SubqueryDifferentialSpec pinned, replayed as one oracle row
    // (DuckDB runs the IDENTICAL text)
    "q_lake_subquery_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """CREATE TABLE sqt(id INTEGER, g VARCHAR, v INTEGER);
          |INSERT INTO sqt VALUES (1,'a',10),(2,'b',20),(3,'a',30);
          |CREATE TABLE squ(v INTEGER, w VARCHAR);
          |INSERT INTO squ VALUES (10,'x'),(20,'y'),(99,'z')""".stripMargin)
      lake.sql(
        """SELECT 'scalar' AS src, id, (SELECT w FROM squ WHERE squ.v = sqt.v) AS x FROM sqt
          |UNION ALL
          |SELECT 'exists', id, NULL FROM sqt WHERE EXISTS (SELECT 1 FROM squ WHERE squ.v = sqt.v)
          |UNION ALL
          |SELECT 'notin_null', id, NULL FROM sqt WHERE v NOT IN (SELECT v FROM (VALUES (10),(NULL)) n(v))
          |UNION ALL
          |SELECT 'gt_any', id, NULL FROM sqt WHERE v > ANY (SELECT v FROM squ WHERE v < 50)
          |UNION ALL
          |SELECT 'le_all', id, NULL FROM sqt WHERE v <= ALL (SELECT v FROM (VALUES (15),(25)) a(v))
          |UNION ALL
          |SELECT 'lateral', sqt.id, CAST(l.m AS VARCHAR)
          |FROM sqt, LATERAL (SELECT max(squ.v) AS m FROM squ WHERE squ.v <= sqt.v) l
          |UNION ALL
          |SELECT 'corr_count', id, CAST((SELECT count(*) FROM squ WHERE squ.v <= sqt.v) AS VARCHAR) FROM sqt
          |ORDER BY src, id""".stripMargin)
    },
    // r13 cast/hashbit differential wave (barrage wave 2): DuckDB's
    // shortest-repr DOUBLE render with python-style exponent
    // thresholds, per-source integral rounding (double half-EVEN,
    // string/decimal half-AWAY), decimal downcast truncation, the
    // restricted boolean spellings, BLOB \xHH escape render, codepoint
    // chr/unicode, sha256/xor — the semantics CastDifferentialSpec and
    // HashBitDifferentialSpec fixed, replayed as an oracle row (DuckDB
    // runs the IDENTICAL text)
    "q_lake_cast_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """SELECT
          |  CAST(CAST(1e16 AS DOUBLE) AS VARCHAR) AS c1,
          |  CAST(CAST(1e15 AS DOUBLE) AS VARCHAR) AS c2,
          |  CAST(CAST(1e-5 AS DOUBLE) AS VARCHAR) AS c3,
          |  CAST(CAST('inf' AS DOUBLE) AS VARCHAR) AS c4,
          |  CAST(CAST('nan' AS DOUBLE) AS VARCHAR) AS c5,
          |  concat('v=', 1e18) AS c6,
          |  CAST(CAST('3.7' AS INTEGER) AS BIGINT) AS c7,
          |  CAST(CAST('-3.5' AS INTEGER) AS BIGINT) AS c8,
          |  CAST(CAST(CAST(2.5 AS DOUBLE) AS INTEGER) AS BIGINT) AS c9,
          |  CAST(CAST(CAST(3.5 AS DOUBLE) AS INTEGER) AS BIGINT) AS c10,
          |  CAST(CAST(CAST(3.99 AS DECIMAL(10,2)) AS INTEGER) AS BIGINT) AS c11,
          |  CAST(TRY_CAST('abc' AS INTEGER) AS BIGINT) AS c12,
          |  TRY_CAST('yes' AS BOOLEAN) AS c13,
          |  CAST(CAST(CAST(2.5 AS DECIMAL(3,1)) AS DECIMAL(3,0)) AS VARCHAR) AS c14,
          |  md5('héllo') AS h1,
          |  sha256('abc') AS h2,
          |  base64('abc'::BLOB) AS h3,
          |  CAST(encode('héllo') AS VARCHAR) AS h4,
          |  decode('abc'::BLOB) AS h5,
          |  CAST(xor(5, 3) AS BIGINT) AS h6,
          |  CAST(bit_count(7) AS BIGINT) AS h7,
          |  chr(9731) AS h8,
          |  CAST(unicode('') AS BIGINT) AS h9,
          |  CAST(ascii('☃x') AS BIGINT) AS h10""".stripMargin)
    },
    // r13 tz differential wave: TIMESTAMPTZ literals normalize offsets
    // to the UTC session and render '+00'; AT TIME ZONE dispatches on
    // input tz-ness (incl. DST gap + LATER-instant ambiguity resolve);
    // TIME wraps modulo 24h — the semantics TzDifferentialSpec fixed,
    // replayed as an oracle row (DuckDB runs the IDENTICAL text)
    "q_lake_tz_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """SELECT
          |  CAST(TIMESTAMPTZ '2024-03-10 12:00:00-05' AS VARCHAR) AS tz1,
          |  CAST(TIMESTAMPTZ '2024-03-10 12:00:00+05:30' AS VARCHAR) AS tz2,
          |  CAST(CAST(TIMESTAMPTZ '2024-07-01 00:00:00+02' AS TIMESTAMP) AS VARCHAR) AS tz3,
          |  CAST(TIMESTAMP '2024-03-10 02:30:00' AT TIME ZONE 'America/New_York' AS VARCHAR) AS tz4,
          |  CAST(TIMESTAMP '2024-11-03 01:30:00' AT TIME ZONE 'America/New_York' AS VARCHAR) AS tz5,
          |  CAST(TIMESTAMPTZ '2024-07-10 12:00:00+00' AT TIME ZONE 'Asia/Tokyo' AS VARCHAR) AS tz6,
          |  CAST(timezone('Europe/Paris', TIMESTAMP '2024-11-03 01:30:00') AS VARCHAR) AS tz7,
          |  CAST(TIMESTAMPTZ '2024-03-10 12:00:00+00' + INTERVAL 1 DAY AS VARCHAR) AS tz8,
          |  CAST(TIMESTAMPTZ '2024-06-01 10:00:00+00' - TIMESTAMPTZ '2024-05-31 08:00:00+00' AS VARCHAR) AS tz9,
          |  CAST(date_part('epoch', TIMESTAMPTZ '2024-03-10 17:00:00+00') AS BIGINT) AS tz10,
          |  CAST(TIME '13:45:30' AS VARCHAR) AS tm1,
          |  CAST(TIME '23:30:00' + INTERVAL 1 HOUR AS VARCHAR) AS tm2,
          |  CAST(TIME '00:30:00' - INTERVAL 1 HOUR AS VARCHAR) AS tm3,
          |  CAST(CAST(TIMESTAMP '2024-03-10 17:25:13' AS TIME) AS VARCHAR) AS tm4,
          |  CAST(make_time(7, 30, 12.5) AS VARCHAR) AS tm5,
          |  CAST(date_part('minute', TIME '13:45:30') AS BIGINT) AS tm6,
          |  (TIME '13:45:30' < TIME '14:00:00') AS tm7""".stripMargin)
    },
    // r13 regexp differential wave: extract defaults to group 0 (Spark
    // errors on groupless patterns at group 1), a LIST third argument
    // names groups into a struct, matches/full_match carry i/s/m option
    // letters and RE2 POSIX classes, replace is FIRST-match unless 'g'
    // with \N backrefs, split keeps empty fields — the semantics
    // RegexpDifferentialSpec fixed, replayed as an oracle row (DuckDB
    // runs the IDENTICAL text)
    "q_lake_regexp_wave" -> { (s, _) =>
      val lake = freshLake(s)
      lake.sql(
        """SELECT
          |  regexp_extract('abc123', '([a-z]+)(\d+)') AS re1,
          |  regexp_extract('abc123', '([a-z]+)(\d+)', 2) AS re2,
          |  regexp_extract('abc', '(\d+)') AS re3,
          |  CAST(regexp_extract('2024-05-06', '(\d+)-(\d+)-(\d+)', ['y','m','d']) AS VARCHAR) AS re4,
          |  array_to_string(regexp_extract_all('a1b2c3', '([a-z])(\d)', 2), ',') AS re5,
          |  regexp_matches('Hello', 'hello') AS rm1,
          |  regexp_matches('Hello', 'hello', 'i') AS rm2,
          |  regexp_matches('a' || chr(10) || 'b', 'a.b', 's') AS rm3,
          |  regexp_matches('ABC', '[[:upper:]]+') AS rm4,
          |  regexp_full_match('abcd', 'a.c') AS rf1,
          |  regexp_full_match('AbC', 'abc', 'i') AS rf2,
          |  regexp_replace('aaa', 'a', 'b') AS rr1,
          |  regexp_replace('aaa', 'a', 'b', 'g') AS rr2,
          |  regexp_replace('Hello World', '[aeiou]', '_', 'gi') AS rr3,
          |  regexp_replace('a1b2', '(\d)', '[\1]', 'g') AS rr4,
          |  regexp_replace('abc', 'b', '\0\0') AS rr5,
          |  array_to_string(regexp_split_to_array('a,b,,c', ','), '|') AS rs1,
          |  array_to_string(regexp_split_to_array('abc', ''), '|') AS rs2,
          |  ('abc' ~ 'a.c') AS bx1,
          |  ('abc' ~ 'b') AS bx2,
          |  ('abc' !~ 'b') AS bx3,
          |  ('a' || 'bc' ~ 'abc') AS bx4,
          |  CAST(~5 AS BIGINT) AS bx5""".stripMargin)
    }
  )

  /** r14 coercion-wave text — run VERBATIM by both engines (the Spark
    * side through the router + CoercionRepair, the oracle by DuckDB) */
  private[ops] val coerceWaveSql: String =
    """SELECT 'u_str' AS src, CAST(x AS VARCHAR) AS v FROM (SELECT 1 AS x UNION ALL SELECT 'a') a
      |UNION ALL
      |SELECT 'u_dec', CAST(x AS VARCHAR) FROM (SELECT 1 AS x UNION ALL SELECT 2.5) b
      |UNION ALL
      |SELECT 'u_bool', CAST(x AS VARCHAR) FROM (SELECT true AS x UNION ALL SELECT 2) c
      |UNION ALL
      |SELECT 'i_str', CAST(x AS VARCHAR) FROM (SELECT 1 AS x INTERSECT SELECT '1.0') d
      |UNION ALL
      |SELECT 'e_str', CAST(x AS VARCHAR) FROM (SELECT 1 AS x EXCEPT SELECT '1.00') e
      |UNION ALL
      |SELECT 'vals', CAST(x AS VARCHAR) FROM (VALUES (1),(2.5),('3')) f(x)
      |UNION ALL
      |SELECT 'vals_date', CAST(x AS VARCHAR) FROM (VALUES (DATE '2024-01-02'),('2024-6-7')) g(x)
      |UNION ALL
      |SELECT 'in_bool', CAST((true IN (1, 0)) AS VARCHAR)
      |UNION ALL
      |SELECT 'case_str', CAST(CASE WHEN true THEN 1 ELSE 'x' END AS VARCHAR)
      |UNION ALL
      |SELECT 'greatest', CAST(greatest(1, '2.5') AS VARCHAR)
      |UNION ALL
      |SELECT 'least', CAST(least('10', 9) AS VARCHAR)
      |UNION ALL
      |SELECT 'concat', 1 || 'a'
      |ORDER BY src, v""".stripMargin

  /** r14 decimal-arithmetic wave text — run VERBATIM by both engines */
  private[ops] val decimalWaveSql: String =
    """SELECT
      |  CAST(CAST(99.9 AS DECIMAL(3,1)) + CAST(99.9 AS DECIMAL(3,1)) AS VARCHAR) AS d1,
      |  CAST(CAST(1.5 AS DECIMAL(3,1)) - CAST(2.75 AS DECIMAL(4,2)) AS VARCHAR) AS d2,
      |  CAST(CAST(99.9 AS DECIMAL(3,1)) * CAST(99.9 AS DECIMAL(3,1)) AS VARCHAR) AS d3,
      |  CAST(CAST(12.34 AS DECIMAL(5,2)) * CAST(1.234 AS DECIMAL(5,3)) AS VARCHAR) AS d4,
      |  CAST(CAST(10.25 AS DECIMAL(4,2)) % CAST(3.0 AS DECIMAL(3,1)) AS VARCHAR) AS d5,
      |  CAST(CAST(1.1 AS DECIMAL(38,10)) + CAST(2.2 AS DECIMAL(38,10)) AS VARCHAR) AS d6,
      |  CAST(CAST(1.1 AS DECIMAL(38,10)) * CAST(2 AS DECIMAL(10,5)) AS VARCHAR) AS d7,
      |  CAST(CAST(123456.789012 AS DECIMAL(18,6)) * CAST(2.5 AS DECIMAL(18,6)) AS VARCHAR) AS d8,
      |  CAST(CAST(1.5 AS DECIMAL(3,1)) + 1 AS VARCHAR) AS d9,
      |  CAST(CAST(1.5 AS DECIMAL(3,1)) * 2 AS VARCHAR) AS d10,
      |  CAST((CAST(1.5 AS DECIMAL(3,1)) + CAST(2.5 AS DECIMAL(3,1))) * CAST(0.5 AS DECIMAL(2,1)) AS VARCHAR) AS d11,
      |  CAST(CAST(2 AS DECIMAL(10,5)) * CAST(3 AS DECIMAL(10,5)) AS VARCHAR) AS d12,
      |  CAST(-CAST(1.5 AS DECIMAL(3,1)) AS VARCHAR) AS d13""".stripMargin

  /** r14 interval-arithmetic wave text — run VERBATIM by both engines */
  private[ops] val intervalWaveSql: String =
    """SELECT
      |  CAST(INTERVAL '1 day' * 2 AS VARCHAR) AS i1,
      |  CAST(INTERVAL '1 day' / 2 AS VARCHAR) AS i2,
      |  CAST(INTERVAL '1 day 2 hours' / 2 AS VARCHAR) AS i3,
      |  CAST(INTERVAL '1 day' - INTERVAL '26 hours' AS VARCHAR) AS i4,
      |  CAST(-INTERVAL '1 day 2 hours' AS VARCHAR) AS i5,
      |  CAST(INTERVAL '1 month 1 day 1 hour' * 2 AS VARCHAR) AS i6,
      |  CAST(INTERVAL '1 minute' / 7 AS VARCHAR) AS i7,
      |  (INTERVAL '1 day' > INTERVAL '23 hours') AS i8,
      |  (INTERVAL '2 hours' = INTERVAL '120 minutes') AS i9,
      |  (INTERVAL '1 month' = INTERVAL '30 days') AS i10,
      |  (INTERVAL '1 month 1 day' > INTERVAL '30 days') AS i11,
      |  CAST(DATE '2024-01-15' + INTERVAL '1 month 1 day' AS VARCHAR) AS i12""".stripMargin

  /** r14 function-battery wave text — run VERBATIM by both engines */
  /** r15 Unicode-case + COLLATE wave: utf8proc SIMPLE fold (ß->ẞ, İ->i,
    * ligatures unchanged, astral planes), strip_accents, simple-fold
    * ILIKE, and NOCASE/NOACCENT collations at comparison/IN sites — the
    * semantics Unicase/CollateDifferentialSpec pinned, replayed as one
    * oracle row (DuckDB runs the IDENTICAL text). The trailing comma
    * before FROM-less end is deliberate: the r15 tolerance matrix is
    * part of the replayed surface.
    */
  private[ops] val unicaseWaveSql: String =
    """SELECT
      |  upper('straße') AS u1,
      |  lower('İSTANBUL') AS u2,
      |  upper('ﬁx') AS u3,
      |  lower('𐐀X') AS u4,
      |  strip_accents('Ångström') AS u5,
      |  CAST('ẞ' ILIKE 'ß' AS VARCHAR) AS u6,
      |  CAST('STRASSE' ILIKE 'straße' AS VARCHAR) AS u7,
      |  CAST('Ä' = 'ä' COLLATE NOCASE AS VARCHAR) AS u8,
      |  CAST('STRASSE' = 'straße' COLLATE NOCASE AS VARCHAR) AS u9,
      |  CAST('é' = 'e' COLLATE NOACCENT AS VARCHAR) AS u10,
      |  CAST(('a' COLLATE NOCASE) IN ('A', 'x') AS VARCHAR) AS u11,
      |  CAST(length('👨‍👩‍👧') AS BIGINT) AS u12,
      |  CAST(strlen('👍') AS BIGINT) AS u13,""".stripMargin

  /** r15 numeric-edge wave: NULL on /0 and %0, log() as LOG10, window
    * substr, concat NULL-skipping, typed shifts, floored fmod, TINYINT
    * sign, HUGEINT-sized factorial — the semantics
    * NumEdgeDifferentialSpec pinned, replayed as one oracle row.
    */
  private[ops] val numedgeWaveSql: String =
    """SELECT
      |  CAST(1 / 0 AS VARCHAR) AS n1,
      |  CAST(1 % 0 AS VARCHAR) AS n2,
      |  CAST(-7 % 3 AS BIGINT) AS n3,
      |  fmod(-7.5, 2) AS n4,
      |  CAST(log(100) AS DOUBLE) AS n5,
      |  CAST(trunc(-1.7) AS VARCHAR) AS n6,
      |  CAST(sign(-3) AS BIGINT) AS n7,
      |  CAST(factorial(21) AS VARCHAR) AS n8,
      |  substr('abcdef', 0, 3) AS n9,
      |  substr('abcdef', 2, -1) AS n10,
      |  concat('a', NULL, 'b') AS n11,
      |  CAST(5 << 2 AS BIGINT) AS n12,
      |  CAST(-8 >> 1 AS BIGINT) AS n13,
      |  CAST(5 >> 64 AS BIGINT) AS n14,
      |  CAST(1 + 2 << 1 AS BIGINT) AS n15,
      |  CAST(xor(5, 3) AS BIGINT) AS n16""".stripMargin

  /** r16 uuid/bit/blob wave: canonical-lowercase UUID casts/literals,
    * the BIT function set over the '0'/'1' carrier, BLOB `\xHH` escape
    * decode + codecs — UuidBlobDifferentialSpec pinned 54 fixtures;
    * replayed as one oracle row (DuckDB runs IDENTICAL text).
    */
  private[ops] val uuidblobWaveSql: String =
    """SELECT
      |  CAST('550E8400-E29B-41D4-A716-446655440000' AS UUID)::VARCHAR AS u1,
      |  CAST(uuid '550e8400-e29b-41d4-a716-446655440000' AS VARCHAR) AS u2,
      |  TRY_CAST('not-a-uuid' AS UUID)::VARCHAR AS u3,
      |  bitstring('0101', 8)::VARCHAR AS b1,
      |  CAST(bit_count('1111'::BIT) AS BIGINT) AS b2,
      |  CAST(bit_position('010'::BIT, '0110101'::BIT) AS BIGINT) AS b3,
      |  set_bit('0110'::BIT, 1, 0)::VARCHAR AS b4,
      |  CAST(octet_length('101010101'::BIT) AS BIGINT) AS b5,
      |  ('001'::BIT << 1)::VARCHAR AS b6,
      |  CAST('\x41\x42'::BLOB AS VARCHAR) AS l1,
      |  encode('héllo')::VARCHAR AS l2,
      |  to_base64('abc'::BLOB) AS l3,
      |  CAST(unhex('27') AS VARCHAR) AS l4,
      |  ('ab'::BLOB || 'cd'::BLOB)::VARCHAR AS l5""".stripMargin

  /** r16 strftime/strptime wave: C-directive matrix (week numbers, ISO
    * fields, fraction units, padding flags) and the parse semantics
    * (1900 defaults, pivot %y, ignored %j/%a, %f as a microsecond VALUE,
    * case-insensitive names) — StrftimeDifferentialSpec pinned 91
    * fixtures; replayed as one oracle row (DuckDB runs IDENTICAL text).
    */
  private[ops] val strftimeWaveSql: String =
    """SELECT
      |  strftime(TIMESTAMP '2024-03-05 04:07:09.123456', '%a %A %w %u') AS s1,
      |  strftime(TIMESTAMP '2024-03-05 04:07:09.123456', '%G|%V|%U|%W') AS s2,
      |  strftime(TIMESTAMP '2024-03-05 04:07:09.123456', '%g|%f|%n') AS s3,
      |  strftime(TIMESTAMP '0044-03-15 12:00:00', '%Y|%y|%-y') AS s4,
      |  strftime(TIMESTAMP '2021-01-03 00:30:00', '%c') AS s5,
      |  strftime(DATE '2024-03-05', '%Y/%m/%d %H:%M') AS s6,
      |  strftime(TIMESTAMP '2024-03-05 00:07:09', '%-I %p') AS s7,
      |  CAST(strptime('March 5, 2024', '%B %-d, %Y') AS VARCHAR) AS s8,
      |  CAST(strptime('69-12-31', '%y-%m-%d') AS VARCHAR) AS s9,
      |  CAST(strptime('2024-066', '%Y-%j') AS VARCHAR) AS s10,
      |  CAST(strptime('11 pm', '%I %p') AS VARCHAR) AS s11,
      |  CAST(strptime('1 2024', '%f %Y') AS VARCHAR) AS s12,
      |  CAST(strptime('2024-03-15 +01:30', '%Y-%m-%d %z') AS VARCHAR) AS s13,
      |  CAST(strptime('31.12.1999', ['%d.%m.%Y']) AS VARCHAR) AS s14,
      |  CAST(try_strptime('2024-02-31', '%Y-%m-%d') AS VARCHAR) AS s15""".stripMargin

  /** r16 printf/format wave (PrintfDifferentialSpec pinned 163 fixtures;
    * this replays the highest-traffic silent divergences as one oracle
    * row — Spark's java.util.Formatter would print `true` for %b, round
    * %.0f ties HALF_UP, keep %g trailing zeros and uppercase NaN).
    */
  private[graft] val printfWaveSql: String =
    """SELECT
      |  printf('%5d|%-5d|%05d|%,d', 42, 42, -42, 1234567) AS p1,
      |  printf('%x|%X|%o|%b|%#x', 255, 255, 8, 5, 255) AS p2,
      |  printf('%x|%u', CAST(-1 AS BIGINT), -5) AS p3,
      |  printf('%.0f|%.0f|%.2f', 2.5, 3.5, 2.675) AS p4,
      |  printf('%g|%g|%.2g', 100000.0, 1000000.0, 1234.5) AS p5,
      |  printf('%e|%a', 12345.678, 1.5) AS p6,
      |  printf('%f|%F', CAST('nan' AS DOUBLE), CAST('-inf' AS DOUBLE)) AS p7,
      |  printf('%2$s %1$s', 'world', 'hello') || printf('|%c', 65) AS p8,
      |  printf('%*d|%.*f', 6, 42, 2, 3.14159) AS p9,
      |  printf('%s|%s', DATE '2024-01-02', [1, 2, 3]) AS p10,
      |  format('{1} {0}', 'a', 'b') || format('|{:>8}|{:*^7}', 'hi', 'ab') AS p11,
      |  format('{:010}|{:x}|{:#b}|{:,}', -42, -1, 5, 1234567) AS p12,
      |  format('{:06.2f}|{:.3}|{}', 3.14159, 3.14159, 1e16) AS p13,
      |  format('{:>{}}|{:.{}f}|{{}}', 'x', 5, 3.14159, 3) AS p14""".stripMargin

  /** r16 LIKE/GLOB/SIMILAR TO wave (LikeGlobDifferentialSpec pinned 89
    * fixtures): no-default-escape LIKE backslashes, byte-wise GLOB,
    * regex SIMILAR TO, like_escape family — replayed as one oracle row.
    */
  private[graft] val likeglobWaveSql: String =
    """SELECT
      |  'a\b' LIKE 'a\b' AS g1,
      |  'ab' LIKE 'a\b' AS g2,
      |  'a%c' LIKE 'a!%c' ESCAPE '!' AS g3,
      |  'héllo' LIKE 'h_llo' AS g4,
      |  'main.c' GLOB '*.[ch]' AS g5,
      |  'héllo' GLOB 'h?llo' AS g6,
      |  'héllo' GLOB 'h??llo' AS g7,
      |  'a*b' GLOB 'a\*b' AS g8,
      |  'a]c' GLOB 'a[]b]c' AS g9,
      |  'b' GLOB '[a-]' AS g10,
      |  'abc' SIMILAR TO 'a%' AS g11,
      |  'abc' SIMILAR TO 'a[bc]{2}' AS g12,
      |  like_escape('a%c', 'a$%c', '$') AS g13,
      |  not_ilike_escape('ABC', 'a_c', '$') AS g14,
      |  (SELECT count(*) FROM (VALUES ('alpha'),('beta'),('a%b')) t(s)
      |    WHERE s LIKE 'a\%%') AS g15""".stripMargin

  private[ops] val fnWaveSql: String =
    """SELECT
      |  jaro_winkler_similarity('martha', 'marhta') AS f1,
      |  jaro_similarity('duck', 'luck') AS f2,
      |  format_bytes(123456789) AS f3,
      |  format_bytes(1023) AS f4,
      |  CAST(isodow(DATE '2024-03-03') AS BIGINT) AS f5,
      |  CAST(decade(DATE '2024-03-05') AS BIGINT) AS f6,
      |  CAST(century(DATE '2000-12-31') AS BIGINT) AS f7,
      |  julian(TIMESTAMP '2024-03-05 18:00:00') AS f8,
      |  CAST(epoch_ms(TIMESTAMP '2024-01-01 00:00:00.5') AS BIGINT) AS f9,
      |  CAST(list_grade_up([3, 1, 2, 1]) AS VARCHAR) AS f10,
      |  list_has_all([1,2,3], [2,3]) AS f11,
      |  CAST(parse_path('/a/b/c.txt') AS VARCHAR) AS f12,
      |  parse_dirname('a/b/c.txt') AS f13,
      |  parse_filename('/a/b/c.txt', true) AS f14,
      |  CAST(editdist3('abc', 'axc') AS BIGINT) AS f15""".stripMargin

  /** r16 map-depth wave (MapDepthDifferentialSpec pinned 35 fixtures;
    * this replays the headline measured semantics as one oracle row —
    * subscript/map_extract answer a LIST of matches with `[]` on miss,
    * map_concat is last-wins first-seen-order, nested values ride the
    * `{k=v}` render).
    */
  private[graft] val mapdepthWaveSql: String =
    """SELECT
      |  CAST(map(['a','b'],[1,2]) AS VARCHAR) AS m1,
      |  CAST(map(['x','y'],[10,20])['z'] AS VARCHAR) AS m2,
      |  CAST(map_extract(map(['x','y'],[10,20]),'x') AS VARCHAR) AS m3,
      |  CAST(map_concat(map(['a','b'],[1,2]), map(['b','c'],[9,3])) AS VARCHAR) AS m4,
      |  CAST(map_entries(map(['a','b'],[1,2])) AS VARCHAR) AS m5,
      |  CAST(map_from_entries([('a',1),('b',2)]) AS VARCHAR) AS m6,
      |  CAST(cardinality(map(['a','b'],[1,2])) AS BIGINT) AS m7,
      |  CAST(map(['k'],[{'a': 1, 'b': 'x'}])['k'] AS VARCHAR) AS m8""".stripMargin

  /** r16 list-math/shape wave (ListMathDifferentialSpec pinned 64
    * fixtures; the zero-vector cosine of -1.0, NULL-padding list_zip
    * tuples, 1-based list_select, NULLS-LAST grade-up, NULL-skipping
    * flatten, reversed-distinct list_intersect, NULL-ignoring has_any).
    */
  private[graft] val listmathWaveSql: String =
    """SELECT
      |  list_cosine_similarity([1.0,2.0],[2.0,4.0]) AS l1,
      |  list_cosine_similarity([0.0,0.0],[1.0,1.0]) AS l2,
      |  list_distance([1,2],[4,6]) AS l3,
      |  CAST(list_zip([1,2],['a','b','c']) AS VARCHAR) AS l4,
      |  CAST(list_select([10,20,30],[3,1]) AS VARCHAR) AS l5,
      |  CAST(list_where([10],[true,false,true]) AS VARCHAR) AS l6,
      |  CAST(list_grade_up([NULL,3,1]) AS VARCHAR) AS l7,
      |  CAST(flatten([[1],NULL,[2]]) AS VARCHAR) AS l8,
      |  CAST(list_resize([1,2],4,9) AS VARCHAR) AS l9,
      |  CAST(list_intersect([5,1,5,2],[1,2,5]) AS VARCHAR) AS l10,
      |  CAST(list_has_any([1,NULL],[NULL]) AS VARCHAR) AS l11""".stripMargin

  /** r16 aggregate-depth wave (AggDepthDifferentialSpec pinned 38
    * fixtures; list-argument quantiles, in-call ORDER BY on the
    * order-sensitive collectors, the WITHIN GROUP ordered-set
    * spellings, bounded bitstring_agg — exactly-reproducible values
    * only, the moment-accumulation doubles stay in the spec where the
    * compare carries the 1e-12 tolerance).
    */
  private[graft] val aggdepthWaveSql: String =
    """SELECT g,
      |  CAST(quantile_cont(i, [0.25, 0.5, 0.75]) AS VARCHAR) AS a1,
      |  CAST(list(i ORDER BY i DESC) AS VARCHAR) AS a2,
      |  CAST(first(i ORDER BY d) AS BIGINT) AS a3,
      |  CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY i) AS DOUBLE) AS a4,
      |  CAST(mode() WITHIN GROUP (ORDER BY i) AS BIGINT) AS a5,
      |  CAST(bitstring_agg(i, -5, 20) AS VARCHAR) AS a6,
      |  CAST(sum(DISTINCT i) AS BIGINT) AS a7,
      |  CAST(quantile(i, 0.5) AS BIGINT) AS a8,
      |  CAST(arg_max(i, d) AS BIGINT) AS a9
      |FROM (VALUES (0, 'a', 8, 4.59), (1, 'c', 4, 2.27), (2, 'a', 20, 2.22), (3, 'c', 0, 2.56), (4, 'a', 20, -2.97), (5, 'b', 13, 1.71), (6, 'a', 20, 5.26), (7, 'a', 17, -2.53), (8, 'c', 19, 6.63), (9, 'c', 9, -2.63), (10, 'b', 12, 2.47), (11, 'a', 15, 7.47), (12, 'b', -5, -1.3), (13, 'a', -2, 5.89)) t(id, g, i, d)
      |GROUP BY g ORDER BY g""".stripMargin

  /** r16 window-depth wave (WinDepthDifferentialSpec pinned 22
    * fixtures; frame EXCLUDE clauses, aggregates-as-window, lag
    * defaults — replayed per-row as one oracle query).
    */
  private[graft] val windepthWaveSql: String =
    """SELECT id,
      |  CAST(sum(v) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS BIGINT) AS w1,
      |  CAST(sum(v) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE TIES) AS BIGINT) AS w2,
      |  string_agg(CAST(v AS VARCHAR), ',') OVER (PARTITION BY g ORDER BY id) AS w3,
      |  mode(least(v, 6)) OVER (PARTITION BY g) AS w4,
      |  arg_max(id, v) OVER (PARTITION BY g) AS w5,
      |  CAST(list(v) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS VARCHAR) AS w6,
      |  quantile_cont(v, 0.5) OVER (PARTITION BY g) AS w7,
      |  lag(v, 2, -1) OVER (PARTITION BY g ORDER BY id) AS w8
      |FROM (VALUES (0, 'b', 1), (1, 'b', 8), (2, 'b', 9), (3, 'b', 4), (4, 'b', 6), (5, 'a', 6), (6, 'a', 1), (7, 'a', 4), (8, 'b', 8), (9, 'a', 5), (10, 'b', 3), (11, 'a', 8)) t(id, g, v)
      |ORDER BY id""".stripMargin

  /** r18 slice barrage representatives (SliceDifferentialSpec pins the
    * full 62): end-relative negative bounds (same len+b+1 formula for
    * lists AND strings), stepped slices, string subscripts, map-extract
    * lists, chained receivers.
    */
  private[graft] val SliceWaveSql: String =
    """SELECT 'chain' AS k, CAST(([[1,2],[3,4]])[2][1:2] AS VARCHAR) AS v
      |UNION ALL SELECT 'lix', CAST(([10,20,30])[-1] AS VARCHAR)
      |UNION ALL SELECT 'lsl', CAST(([10,20,30])[:-2] AS VARCHAR)
      |UNION ALL SELECT 'map', CAST(map([1,2],[10,20])[1] AS VARCHAR)
      |UNION ALL SELECT 'step', CAST(([1,2,3,4,5])[1:5:2] AS VARCHAR)
      |UNION ALL SELECT 'str', 'hello'[2:4]
      |UNION ALL SELECT 'strix', 'hello'[-2]
      |ORDER BY k, v""".stripMargin

  /** r18 tvf barrage representatives (TvfDifferentialSpec pins the full
    * 43): the unnest ZIP with NULL pad, the recursive flatten, the
    * half-open range list, and generate_series's CUMULATIVE calendar
    * walk (03-31 → 04-30 → 05-30, not start+i*step's 05-31).
    */
  private[graft] val TvfWaveSql: String =
    """SELECT 'zip' AS k, CAST(a AS VARCHAR) || '|' || coalesce(CAST(b AS VARCHAR), 'N') AS v
      |FROM (SELECT unnest([1,2]) AS a, unnest([10,20,30]) AS b)
      |UNION ALL SELECT 'rec', coalesce(CAST(unnest([[1,NULL],[3]], recursive:=true) AS VARCHAR), 'None')
      |UNION ALL SELECT 'rng', CAST(range AS VARCHAR) FROM range(7, 2, -2)
      |UNION ALL SELECT 'ser', CAST(generate_series AS VARCHAR)
      |FROM generate_series(TIMESTAMP '2024-03-31', TIMESTAMP '2024-06-30', INTERVAL 1 MONTH)
      |UNION ALL SELECT 'lst', CAST(range(1, 10, 4) AS VARCHAR)
      |ORDER BY k, v""".stripMargin

  /** r18 winspec differential representatives (WinSpecDifferentialSpec
    * pins the full 45): frame-over-named-window, the one-level copy
    * (w2 AS (w1 ORDER BY id) copies w1's PARTITION BY), the measured
    * two-level chain (u3 AS (u2) does NOT re-copy u1's partition — the
    * running sum goes global), and a plain named rank. Window names are
    * unique ACROSS set-op branches (DuckDB's dup-check span).
    */
  private[graft] val WinSpecWaveSql: String =
    """SELECT 'base' AS k, CAST(id AS VARCHAR) || '=' || CAST(sum(v) OVER (w ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS v
      |FROM (VALUES (1,'a',10),(2,'a',20),(3,'b',30),(4,'b',40)) t(id,g,v) WINDOW w AS (PARTITION BY g ORDER BY id)
      |UNION ALL SELECT 'copy', CAST(id AS VARCHAR) || '=' || CAST(sum(v) OVER w2 AS VARCHAR)
      |FROM (VALUES (1,'a',10),(2,'a',20),(3,'b',30),(4,'b',40)) t(id,g,v) WINDOW w1 AS (PARTITION BY g), w2 AS (w1 ORDER BY id)
      |UNION ALL SELECT 'chain', CAST(id AS VARCHAR) || '=' || CAST(sum(v) OVER (u3 ROWS UNBOUNDED PRECEDING) AS VARCHAR)
      |FROM (VALUES (1,'a',10),(2,'a',20),(3,'b',30),(4,'b',40)) t(id,g,v) WINDOW u3 AS (u2), u2 AS (u1 ORDER BY id), u1 AS (PARTITION BY g)
      |UNION ALL SELECT 'mixrank', CAST(id AS VARCHAR) || '=' || CAST(rank() OVER m AS VARCHAR)
      |FROM (VALUES (1,'a',10),(2,'a',20),(3,'b',30),(4,'b',40)) t(id,g,v) WINDOW m AS (PARTITION BY g ORDER BY v DESC)
      |ORDER BY k, v""".stripMargin

  /** r18 lambda differential representatives (LambdaDifferentialSpec
    * pins the full 50): 1-based index lambdas, the 3-param list_reduce
    * merge counter, list_aggregate name dispatch (string_agg skips
    * NULLs, any_value takes the first NON-NULL), and nested index
    * shadowing (r19: the inner (y,i) rebinds i).
    */
  private[graft] val LambdaWaveSql: String =
    """SELECT 'aggd' AS k, CAST(list_aggregate([1,NULL,3], 'string_agg', '-') AS VARCHAR) AS v
      |UNION ALL SELECT 'anyv', CAST(list_aggregate([NULL,2,3], 'any_value') AS VARCHAR)
      |UNION ALL SELECT 'filt', CAST(list_filter([10,20,30], (x, i) -> i % 2 = 1) AS VARCHAR)
      |UNION ALL SELECT 'idx', CAST(list_transform(['a','b'], (x, i) -> x || CAST(i AS VARCHAR)) AS VARCHAR)
      |UNION ALL SELECT 'red3', CAST(list_reduce([1,2,3], (a, b, i) -> a + b * i) AS VARCHAR)
      |UNION ALL SELECT 'shadow', CAST(list_transform([1,2], (x,i) -> list_transform([10], (y,i) -> i)) AS VARCHAR)
      |ORDER BY k, v""".stripMargin

  /** r19 nested-ordering representatives (NestOrdDifferentialSpec pins
    * the full 40): full order via row_number over a nested key, LIMIT
    * top-k membership, the max-is-[NULL] aggregate, nested list_sort,
    * and NULL-element grouping.
    */
  private[graft] val NestOrdWaveSql: String =
    """SELECT 'ord' AS k, CAST(rn AS VARCHAR) || '=' || CAST(x AS VARCHAR) AS v FROM (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM (VALUES ([1,NULL]),([1,2]),([NULL]),([2])) t(x))
      |UNION ALL SELECT 'top', CAST(x AS VARCHAR) FROM (SELECT x FROM (VALUES (['a']),(['ab']),(['a',NULL]),([NULL])) t(x) ORDER BY x LIMIT 2)
      |UNION ALL SELECT 'agg', CAST(max(x) AS VARCHAR) FROM (VALUES ([1]),([NULL::INT]),([1,2])) t(x)
      |UNION ALL SELECT 'lsort', CAST(list_sort([[1],[NULL],NULL,[1,2]]) AS VARCHAR)
      |UNION ALL SELECT 'grp', CAST(x AS VARCHAR) || '#' || CAST(count(*) AS VARCHAR) FROM (VALUES ([1,NULL]),([1,NULL]),([1])) t(x) GROUP BY x
      |ORDER BY k, v""".stripMargin

  /** r19 lateral representatives (LateralDifferentialSpec pins the full
    * 30): correlated comma-position unnest, the LEFT-JOIN-LATERAL keep
    * row, the FROM-position cartesian, and aggregation over the lateral
    * output.
    */
  private[graft] val LateralWaveSql: String =
    """SELECT 'aggl' AS k, t.g || '#' || CAST(sum(u.x) AS VARCHAR) AS v FROM (VALUES ('a',[1,2]),('b',[3])) t(g,l), unnest(t.l) u(x) GROUP BY t.g
      |UNION ALL SELECT 'cart', CAST(u.x AS VARCHAR) || '|' || CAST(v.y AS VARCHAR) FROM (VALUES ([1,2],[10,20])) t(a,b), unnest(t.a) u(x), unnest(t.b) v(y)
      |UNION ALL SELECT 'corr', t.g || '=' || CAST(u.x AS VARCHAR) FROM (VALUES ('a',[1,2]),('b',[3])) t(g,l), unnest(t.l) u(x)
      |UNION ALL SELECT 'outer', t.g || '=' || coalesce(CAST(u.x AS VARCHAR),'None') FROM (VALUES ('a',[1]),('b',[]::INT[])) t(g,l) LEFT JOIN LATERAL unnest(t.l) u(x) ON true
      |ORDER BY k, v""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_lake_slice_wave" -> SliceWaveSql,
    "q_lake_tvf_wave" -> TvfWaveSql,
    "q_lake_winspec_wave" -> WinSpecWaveSql,
    "q_lake_lambda_wave" -> LambdaWaveSql,
    "q_lake_nestord_wave" -> NestOrdWaveSql,
    "q_lake_lateral_wave" -> LateralWaveSql,
    "q_lake_windepth_wave" -> windepthWaveSql,
    "q_lake_mapdepth_wave" -> mapdepthWaveSql,
    "q_lake_listmath_wave" -> listmathWaveSql,
    "q_lake_aggdepth_wave" -> aggdepthWaveSql,
    "q_lake_coerce_wave" -> coerceWaveSql,
    "q_lake_fn2_wave" -> fnWaveSql,
    "q_lake_unicase_wave" -> unicaseWaveSql,
    "q_lake_numedge_wave" -> numedgeWaveSql,
    "q_lake_strftime_wave" -> strftimeWaveSql,
    "q_lake_uuidblob_wave" -> uuidblobWaveSql,
    "q_lake_printf_wave" -> printfWaveSql,
    "q_lake_likeglob_wave" -> likeglobWaveSql,
    "q_lake_meta_travel" ->
      ("SELECT * FROM (VALUES ('now','mt2'),('then','mt1'),('then','mt2')) " +
       "t(era, table_name) ORDER BY era, table_name"),
    "q_lake_csvopt_wave" ->
      ("SELECT * FROM (VALUES " +
       "('cols','1','None/7.0'),('cols','2','None/None'),('cols','3','x/9.0')," +
       "('force','1','[]'),('force','2','[x]')," +
       "('nulls','1','None/8'),('nulls','2','None/None'),('nulls','3','x/10')," +
       "('skip','10','11'),('skip','20','21')," +
       "('types','10','10!'),('types','20','20!')) " +
       "t(k, a, b) ORDER BY k, a"),
    "q_lake_jsonopt_wave" ->
      ("SELECT * FROM (VALUES " +
       "('arr','1','x'),('arr','2','y')," +
       "('cols','1','1?'),('cols','2','2?')," +
       "('ign','1','x'),('ign','3','x'),('ign','None','x')," +
       "('prom','2024-03-01 00:00:00','2024-02-29 01:02:03')," +
       "('recs','1','{''a'': 1, ''b'': x}'),('recs','2','{''a'': 2, ''b'': NULL}')," +
       "('scal','sum','6')) " +
       "t(k, a2, b2) ORDER BY k, a2"),
    "q_lake_stmtshape_wave" ->
      ("SELECT * FROM (VALUES " +
       "('coerce','1.0'),('coerce','2.5'),('coerce','3.0')," +
       "('don','1'),('don','2')," +
       "('fetch','1'),('fetch','2')," +
       "('fwd','8')," +
       "('off','2'),('off','3')," +
       "('prec','1'),('prec','2')) " +
       "t(k, v) ORDER BY k, v"),
    "q_lake_meta_travel_join" ->
      ("SELECT * FROM (VALUES " +
       "('files@then','mj1','1','2')," +
       "('now','mj1','id','INTEGER')," +
       "('then','mj1','id','INTEGER'),('then','mj1','v','VARCHAR')," +
       "('then','mj2','k','INTEGER')) " +
       "t(era, table_name, a, b) ORDER BY era, table_name, a"),
    "q_lake_decimal_wave" -> decimalWaveSql,
    "q_lake_interval_wave" -> intervalWaveSql,
    "q_lake_enum" ->
      """SELECT CAST(c AS VARCHAR) AS c, i FROM (VALUES
        |  (CAST('a' AS ENUM('a','b')), 1), (CAST('b' AS ENUM('a','b')), 2),
        |  (CAST('a' AS ENUM('a','b')), 3), (CAST(NULL AS ENUM('a','b')), 4)) t(c, i)
        |ORDER BY i""".stripMargin,
    "q_lake_e2e" ->
      ("SELECT * FROM (VALUES (1,'alpha'),(2,'beta'),(4,'delta')) t(id, val) ORDER BY id"),
    "q_lake_multistatement" ->
      ("SELECT * FROM (VALUES (1,'alpha'),(2,'beta'),(4,'delta'),(5,'epsilon')) t(id, val) ORDER BY id"),
    "q_lake_time_travel" ->
      ("SELECT * FROM (VALUES (1,'alpha'),(2,'beta'),(3,'gamma'),(4,'delta')) t(id, val) ORDER BY id"),
    "q_lake_update" ->
      ("SELECT * FROM (VALUES (1,10,'alpha'),(2,20,'beta'),(3,35,'bumped'),(4,45,'bumped')) " +
       "t(id, qty, val) ORDER BY id"),
    "q_lake_views" ->
      ("SELECT * FROM (VALUES (2,'BETA'),(3,'GAMMA')) t(id, vu) ORDER BY id"),
    "q_lake_qualified_travel" ->
      ("SELECT * FROM (VALUES (3,'gamma','gamma'),(4,'delta','delta')) " +
       "t(id, val, old_val) ORDER BY id"),
    "q_lake_insert_cols" ->
      ("SELECT id, CAST(qty AS INTEGER) AS qty, CAST(val AS VARCHAR) AS val FROM (VALUES " +
       "(1, NULL, 'alpha'), (2, NULL, NULL), (3, 30, NULL)) t(id, qty, val) ORDER BY id"),
    "q_lake_merge" ->
      ("SELECT id, CAST(qty AS INTEGER) AS qty, CAST(val AS VARCHAR) AS val FROM (VALUES " +
       "(1, 10, 'alpha'), (2, 100, 'beta'), (3, 30, NULL)) t(id, qty, val) ORDER BY id"),
    "q_lake_compact" ->
      ("SELECT * FROM (VALUES (1,'r1'),(2,'r2'),(3,'r3'),(4,'r4')) t(id, val) ORDER BY id"),
    "q_lake_copy" ->
      ("SELECT * FROM (VALUES (1,'alpha'),(2,'beta')) t(id, val) ORDER BY id"),
    "q_lake_export" ->
      ("SELECT id, CAST(qty AS DOUBLE) AS qty, CAST(val AS VARCHAR) AS val, " +
       "CAST(n2 AS BIGINT) AS n2 FROM (VALUES " +
       "(1, 1.5, 'alpha', 2), (2, 2.5, 'beta', 2), (3, NULL, NULL, 2)) " +
       "t(id, qty, val, n2) ORDER BY id"),
    "q_lake_comment" ->
      ("SELECT * FROM (VALUES ('id','pk','fact table')) " +
       "t(column_name, col_comment, tbl_comment)"),
    "q_lake_inline" ->
      ("SELECT * FROM (VALUES (1,'a'),(3,'c')) t(id, val) ORDER BY id"),
    "q_lake_retention" ->
      ("SELECT * FROM (VALUES (1,'a'),(3,'c')) t(id, val) ORDER BY id"),
    "q_lake_rename_col" ->
      ("SELECT * FROM (VALUES (1,'z'),(3,'c')) t(id, label) ORDER BY id"),
    "q_lake_partition" ->
      ("SELECT * FROM (VALUES (1,'eu'),(3,'eu'),(6,'eu')) t(id, region) ORDER BY id"),
    "q_lake_infoschema" ->
      ("SELECT * FROM (VALUES ('ducklake_column'),('ducklake_column_mapping')," +
       "('ducklake_column_tag')," +
       "('ducklake_data_file')," +
       "('ducklake_delete_file'),('ducklake_file_column_statistics')," +
       "('ducklake_file_partition_value')," +
       "('ducklake_files_scheduled_for_deletion'),('ducklake_inlined_data_tables')," +
       "('ducklake_metadata'),('ducklake_name_mapping')," +
       "('ducklake_partition_column'),('ducklake_partition_info')," +
       "('ducklake_schema'),('ducklake_snapshot'),('ducklake_snapshot_changes')," +
       "('ducklake_table'),('ducklake_tag')," +
       "('ducklake_table_stats'),('ducklake_view')) t(table_name) ORDER BY table_name"),
    "q_lake_ts_travel" ->
      ("SELECT * FROM (VALUES (2,'b'),(3,'c')) t(id, val) ORDER BY id"),
    "q_lake_foreign_deletes" ->
      ("SELECT * FROM (VALUES (1,'alpha')) t(id, val) ORDER BY id"),
    "q_lake_widen" ->
      ("SELECT id, CAST(qty AS BIGINT) AS qty FROM (VALUES " +
       "(1, 10),(2, 20),(3, 30000000000)) t(id, qty) ORDER BY id"),
    "q_lake_dsv2" ->
      ("SELECT * FROM (VALUES (1,'alpha','alpha'),(3,'gamma','gamma')) " +
       "t(id, val, old_val) ORDER BY id"),
    "q_lake_schemas" ->
      ("SELECT * FROM (VALUES (1,'main_row',10,'stg_a'),(1,'main_row',11,'stg_b')) " +
       "t(main_id, main_val, stg_id, stg_val) ORDER BY stg_id"),
    "q_lake_describe" ->
      ("SELECT * FROM (VALUES ('id','INTEGER','YES'), ('qty','DOUBLE','YES'), " +
       "('val','VARCHAR','YES')) t(column_name, column_type, \"null\")"),
    "q_lake_alter" ->
      ("SELECT id, CAST(val AS VARCHAR) AS val, CAST(qty AS INTEGER) AS qty FROM (VALUES " +
       "(1, 'alpha', NULL), (2, 'beta', NULL), (3, 'gamma', 30)) t(id, val, qty) ORDER BY id"),
    "q_lake_dialect" ->
      ("SELECT id, name, CAST(price AS DOUBLE) AS price, qts, CAST(quote AS DOUBLE) AS quote, " +
       "ts_listed FROM (VALUES (1,'b',24.0,7,110.0,true),(2,'d',18.0,8,60.0,false)) " +
       "t(id, name, price, qts, quote, ts_listed) ORDER BY id"),
    "q_lake_dialect2" ->
      ("SELECT grp, CAST(half AS BIGINT) AS half, total_str, vs, CAST(a_cnt AS BIGINT) AS a_cnt " +
       "FROM (VALUES ('aa', 3, '7', '7', 1), ('ab', 7, '14', '5,9', 2), ('bb', 2, '4', '4', 0)) " +
       "t(grp, half, total_str, vs, a_cnt) ORDER BY grp"),
    "q_lake_add_files" ->
      ("SELECT * FROM (VALUES (1,'native','west'),(10,'x','east'),(11,'y','east')) " +
       "t(id, v, region) ORDER BY id"),
    "q_lake_dialect3" ->
      ("SELECT * FROM (VALUES (1, 'a', 2, '1995/03/15', 73), (2, 'x', 4, '1995/04/01', 90)) " +
       "t(id, first_tok, dbl, dstr, dd) ORDER BY id"),
    "q_lake_dialect4" ->
      // full 12-column SUMMARIZE shape (r14): avg/std match DuckDB's
      // aggregates exactly; the quantiles are the engine's DOCUMENTED
      // exact interpolated percentiles (DuckDB's approx_quantile is a
      // t-digest sketch no other engine reproduces bit-exact)
      ("SELECT * FROM (VALUES " +
       "('grp','VARCHAR','a','b',CAST(2 AS BIGINT),CAST(NULL AS VARCHAR)," +
       "CAST(NULL AS VARCHAR),CAST(NULL AS VARCHAR),CAST(NULL AS VARCHAR)," +
       "CAST(NULL AS VARCHAR),CAST(3 AS BIGINT),CAST(0.0 AS DOUBLE)), " +
       "('v','INTEGER','5','9',CAST(2 AS BIGINT),'7.0','2.8284271247461903'," +
       "'6','7','8',CAST(3 AS BIGINT),CAST(33.33 AS DOUBLE))) " +
       "t(column_name, column_type, \"min\", \"max\", approx_unique, " +
       "\"avg\", \"std\", q25, q50, q75, \"count\", null_percentage) " +
       "ORDER BY column_name"),
    "q_lake_dialect5" ->
      ("SELECT * FROM (VALUES (1, '2,6', 20, '1;2'), (2, '8,10', 30, '4;5')) " +
       "t(id, doubled, second, head2) ORDER BY id"),
    "q_lake_dialect6" ->
      ("SELECT * FROM (VALUES (1, 4, 8, 'x', 5), (2, 9, 18, 'y', 10)) " +
       "t(id, sa, tw, mk, spp) ORDER BY id"),
    "q_lake_pivot" ->
      ("SELECT * FROM (VALUES ('east', CAST(15 AS BIGINT), CAST(15 AS BIGINT)), " +
       "('west', 7, 3)) t(region, q1, q2) ORDER BY region"),
    "q_lake_macro" ->
      ("SELECT * FROM (VALUES (2, 24), (3, 36)) t(id, taxed) ORDER BY id"),
    "q_lake_stream_sink" ->
      ("SELECT * FROM (VALUES (1,'a'),(2,'b'),(3,'c')) t(id, v) ORDER BY id"),
    "q_lake_dialect7" ->
      ("SELECT * FROM (VALUES (1, 10, 20), (2, 5, 6)) " +
       "t(id, sum_q1, sum_q2) ORDER BY id"),
    "q_lake_unpivot_stmt" ->
      ("SELECT * FROM (VALUES (1,'q1',10),(1,'q2',20),(2,'q1',5),(2,'q2',6),(2,'q3',7)) " +
       "t(id, quarter, amount) ORDER BY id, quarter"),
    "q_lake_dialect8" ->
      ("SELECT * FROM (VALUES (1,'abc',1,'1'),(2,'azc',1,'1|2'),(3,'ab',0,'1|2|3')) " +
       "t(id, v, m, gs) ORDER BY id"),
    "q_lake_dialect9" ->
      ("SELECT id, CAST(x AS INTEGER) AS x, CAST(pw AS DOUBLE) AS pw, " +
       "CAST(y AS INTEGER) AS y FROM (VALUES " +
       "(1, 2, 4.0, NULL), (2, 3, 9.0, NULL), " +
       "(5, NULL, 128.0, 7), (6, NULL, 256.0, 8)) t(id, x, pw, y) ORDER BY id"),
    "q_lake_dialect10" ->
      ("SELECT * FROM (VALUES (1, 'a', 'x'), (2, 'b', 'y'), (3, 'c', NULL)) " +
       "t(id, v, w) ORDER BY id"),
    "q_lake_dialect11" ->
      ("SELECT c.id, n.n_name AS nation, c.label, j.tag " +
       "FROM nation n " +
       "JOIN (VALUES (1,'alpha'),(2,'beta'),(3,'gamma')) c(id, label) " +
       "  ON n.n_nationkey = c.id " +
       "LEFT JOIN (VALUES (1,'x'),(2,'y')) j(id, tag) ON j.id = c.id " +
       "ORDER BY c.id"),
    "q_lake_glob" ->
      "SELECT * FROM (VALUES ('a.csv'), ('b.csv')) t(name) ORDER BY name",
    "q_lake_copy_part" ->
      ("SELECT CAST(id AS INTEGER) AS id, region, CAST(v AS DOUBLE) AS v FROM (VALUES " +
       "(1,'east',1.5),(2,'west',2.5),(3,'east',3.5)) t(id, region, v) ORDER BY id"),
    "q_lake_seq" ->
      ("SELECT CAST(id AS INTEGER) AS id, v, CAST(cv AS BIGINT) AS cv FROM (VALUES " +
       "(100,'a',120),(110,'b',120),(120,'c',120)) t(id, v, cv) ORDER BY id"),
    "q_lake_seq2" ->
      ("SELECT CAST(id AS BIGINT) AS id, v FROM (VALUES " +
       "(100,'a'),(110,'b'),(120,'d'),(130,'tail')) t(id, v) ORDER BY id"),
    "q_lake_duckdb_meta" ->
      ("SELECT table_name, has_primary_key, CAST(column_count AS BIGINT) AS column_count, " +
       "CAST(estimated_size AS BIGINT) AS estimated_size, CAST(ncols AS BIGINT) AS ncols " +
       "FROM (VALUES ('m1', true, 2, 2, 2), ('m2', false, 1, 0, 1)) " +
       "t(table_name, has_primary_key, column_count, estimated_size, ncols) " +
       "ORDER BY table_name"),
    "q_lake_update_join" ->
      ("SELECT CAST(id AS INTEGER) AS id, v, CAST(n AS INTEGER) AS n FROM (VALUES " +
       "(1,'a',10),(2,'B',25),(4,'d',40)) t(id, v, n) ORDER BY id"),
    "q_lake_upsert" ->
      ("SELECT CAST(id AS INTEGER) AS id, v, CAST(n AS INTEGER) AS n FROM (VALUES " +
       "(1,'a',10),(2,'B',119),(3,'C',33),(4,'d',40),(5,'e',50),(6,'f',60)) " +
       "t(id, v, n) ORDER BY id"),
    "q_lake_dialect12" ->
      ("SELECT CAST(id AS INTEGER) AS id, g, CAST(prev_x AS INTEGER) AS prev_x, " +
       "CAST(n AS BIGINT) AS n, CAST(sv AS BIGINT) AS sv FROM (VALUES " +
       "(1,'a',NULL,2,7),(2,'a',10,2,7),(3,'b',10,2,13),(4,'b',30,2,13)) " +
       "t(id, g, prev_x, n, sv) ORDER BY id"),
    "q_lake_dialect14" ->
      """WITH RECURSIVE edges14(src, dst) AS (
        |  SELECT * FROM (VALUES (1,2),(2,3),(3,1),(3,4),(5,6)) v
        |), reach(node) AS (
        |  SELECT 1
        |  UNION
        |  SELECT e.dst FROM reach r JOIN edges14 e ON e.src = r.node
        |)
        |SELECT node FROM reach ORDER BY node""".stripMargin,
    "q_lake_byname" ->
      ("SELECT CAST(a AS INTEGER) AS a, b, CAST(c AS DOUBLE) AS c FROM (VALUES " +
       "(1, 'x', NULL), (7, 'y', 2.5)) t(a, b, c) ORDER BY a"),
    "q_lake_txn" ->
      ("SELECT CAST(id AS INTEGER) AS id, v FROM (VALUES " +
       "(1,'base'),(3,'committed')) t(id, v) ORDER BY id"),
    // (driver DuckDB 1.0.0 predates `* RENAME` — the twin aliases
    // explicitly; the Spark side runs the star-modifier spelling)
    "q_lake_prepare" ->
      ("SELECT CAST(id AS INTEGER) AS id, v, CAST(n AS INTEGER) AS n FROM (VALUES " +
       "(1,'a',10),(2,'b',25),(3,'c',37)) t(id, v, n) ORDER BY id"),
    "q_lake_dialect19" ->
      """SELECT id,
        |       regexp_replace(s, '(\w+) (\w+)', '\2 \1') AS swapped,
        |       regexp_replace(s, 'o', '0') AS first_only,
        |       regexp_replace(s, 'o', '0', 'g') AS all_o
        |FROM (VALUES (1,'one two three four'),(2,'o o o')) t(id, s)
        |ORDER BY id""".stripMargin,
    "q_lake_dialect18" ->
      """WITH d18(r, p, amt) AS (SELECT * FROM (VALUES ('e','x',1),('e','y',2),('w','x',4)))
        |SELECT coalesce(r, 'ALL') AS r, coalesce(p, 'ALL') AS p,
        |       CAST(sum(amt) AS BIGINT) AS total,
        |       (SELECT CAST(sum(range) AS BIGINT) FROM range(4)) AS rng
        |FROM d18 GROUP BY ROLLUP (r, p) ORDER BY r, p""".stripMargin,
    "q_lake_dialect17" ->
      """SELECT a AS id, dn, mn, yr, sl FROM (
        |  SELECT a, dayname(d) AS dn, monthname(d) AS mn,
        |         CAST(datepart('year', d) AS BIGINT) AS yr,
        |         array_to_string(list_slice(string_split(b || ',u,v,w', ','), 2, 3), '|') AS sl
        |  FROM (VALUES (1,'x',DATE '1995-03-15'),(2,'y',DATE '1995-07-04')) t(a, b, d)
        |) ORDER BY id""".stripMargin,
    // the twin runs DuckDB's own arrows/json functions over inline VALUES
    "q_lake_json" ->
      """SELECT id,
        |       CAST(j -> 'a' ->> 'b' AS BIGINT) AS ab,
        |       CAST(json_array_length(j, '$.xs') AS BIGINT) AS n,
        |       j ->> 's' AS sv,
        |       CAST(json_extract(j, '$.xs[1]') AS BIGINT) AS x1
        |FROM (VALUES
        |  (1,'{"a":{"b":7},"xs":[1,2,3],"s":"txt"}'),
        |  (2,'{"a":{"b":9},"xs":[],"s":"y"}')) t(id, j) ORDER BY id""".stripMargin,
    "q_lake_vars" ->
      ("SELECT CAST(id AS INTEGER) AS id, " +
       "regexp_replace(s, '\\s+', '_', 'g') AS clean FROM (VALUES " +
       "(1,'a  b'),(2,'c   d e')) t(id, s) ORDER BY id"),
    // twins run the SAME aggregate/flatten spellings natively in DuckDB
    "q_lake_dialect15" ->
      """WITH d15(g, v, x) AS (SELECT * FROM (VALUES
        |  ('a','u',1),('a','w',3),('a','v',2),('b','z',9)))
        |SELECT g,
        |       string_agg(v, ',' ORDER BY x DESC) AS vs,
        |       string_agg(v, '|' ORDER BY v) AS vs2,
        |       CAST(quantile_cont(x, 0.5) AS DOUBLE) AS med,
        |       CAST(median(x) AS DOUBLE) AS med2
        |FROM d15 GROUP BY g ORDER BY g""".stripMargin,
    "q_lake_dialect16" ->
      """WITH d16(id, xs) AS (SELECT * FROM (VALUES (1,'a,b'),(2,'c')))
        |SELECT id, u FROM (
        |  SELECT id, unnest(string_split(xs, ',')) AS u FROM d16
        |  UNION ALL
        |  SELECT 0 AS id, unnest(['q','r']) AS u
        |) ORDER BY id, u""".stripMargin,
    // the twin runs the SAME recursive query in DuckDB (edges inlined) —
    // recursion semantics themselves are oracle-checked, not hand-listed
    "q_lake_dialect13" ->
      """WITH RECURSIVE edges13(src, dst) AS (
        |  SELECT * FROM (VALUES (1,2),(2,3),(3,4),(2,5),(4,2),(6,7)) v
        |), reach(node, depth) AS (
        |  SELECT 1, 0
        |  UNION ALL
        |  SELECT e.dst, r.depth + 1
        |  FROM reach r JOIN edges13 e ON e.src = r.node
        |  WHERE r.depth < 6
        |)
        |SELECT node, CAST(min(depth) AS INTEGER) AS d
        |FROM reach GROUP BY node ORDER BY node""".stripMargin,
    "q_lake_pragma" ->
      ("SELECT CAST(cid AS BIGINT) AS cid, name, type, \"notnull\", " +
       "CAST(dflt_value AS VARCHAR) AS dflt_value, pk FROM (VALUES " +
       "(0, 'id', 'INTEGER', false, NULL, false), " +
       "(1, 'v', 'VARCHAR', false, NULL, false)) " +
       "t(cid, name, type, \"notnull\", dflt_value, pk) ORDER BY cid"),
    "q_lake_types" ->
      ("SELECT * FROM (VALUES " +
       "(1, 'a,b', 'a', 'text/plain', 640, 1, '7', 'abc', 3, " +
       "'00000000-0000-0000-0000-000000000001', '99999999999999999999'), " +
       "(2, 'c', 'c', 'image/png', 800, 5, '9', 'xy', 2, " +
       "'00000000-0000-0000-0000-000000000002', '-3')) " +
       "t(id, tags_str, tag1, mime, w, k1, x, payload_str, n_bytes, uid, big_str) " +
       "ORDER BY id"),
    "q_lake_multimodal_blob" ->
      ("SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS digest, " +
       "'text/plain' AS mime, n_chars FROM documents ORDER BY doc_id"),
    "q_lake_temp" ->
      ("SELECT * FROM (VALUES (2,'b','B'),(3,'c','C'),(4,'d','D')) " +
       "t(id, v, vu) ORDER BY id"),
    // DuckDB unifies the literal flavors and the string cell into one
    // INTERVAL column and renders the identical canonical text
    "q_lake_interval" ->
      """SELECT id, CAST(iv AS VARCHAR) AS iv_str FROM (VALUES
        | (1, INTERVAL '3 hours'), (2, INTERVAL '2 days'),
        | (3, INTERVAL '1 year 2 months'), (4, '1 month 2 days 03:04:05'),
        | (5, INTERVAL '90 seconds'), (6, INTERVAL '-3 hours'),
        | (7, INTERVAL '1 day 1 microsecond')) t(id, iv)
        |ORDER BY id""".stripMargin,
    "q_lake_dialect23" ->
      """SELECT id, g, k, v,
        |  CAST(sum(v) OVER (PARTITION BY g ORDER BY k
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE GROUP) AS BIGINT) AS s_xgrp,
        |  CAST(sum(v) OVER (PARTITION BY g ORDER BY k
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE TIES) AS BIGINT) AS s_xties,
        |  CAST(count(v) OVER (PARTITION BY g ORDER BY k
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP) AS BIGINT) AS c_xgrp,
        |  round(avg(v) OVER (PARTITION BY g ORDER BY k
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE TIES), 3) AS a_xties,
        |  CAST(count(*) OVER (PARTITION BY g ORDER BY k
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE TIES) AS BIGINT) AS cs_xties
        |FROM (VALUES (1,'a',1,10),(2,'a',1,NULL),(3,'a',2,30),(4,'a',2,40),(5,'a',3,50),
        |             (6,'b',1,5),(7,'b',1,7)) t(id, g, k, v)
        |ORDER BY id""".stripMargin,
    "q_lake_dialect22" ->
      """SELECT
        |  CAST(time_bucket(INTERVAL '15 minutes', TIMESTAMP '2024-03-15 10:37:22') AS VARCHAR) AS b15,
        |  CAST(time_bucket(INTERVAL '1 hour 30 minutes', TIMESTAMP '2024-03-15 10:37:22') AS VARCHAR) AS b90,
        |  CAST(time_bucket(INTERVAL '10 seconds', TIMESTAMP '1969-12-31 23:59:55') AS VARCHAR) AS bneg,
        |  CAST(time_bucket(INTERVAL '2 days', TIMESTAMP '1999-12-31 10:00:00') AS VARCHAR) AS b2d,
        |  CAST(time_bucket(INTERVAL '48 hours', TIMESTAMP '2024-03-16 10:37:22') AS VARCHAR) AS b48h,
        |  CAST(time_bucket(INTERVAL '1 week', TIMESTAMP '2024-03-15 10:37:22') AS VARCHAR) AS bwk,
        |  CAST(time_bucket(INTERVAL '3 months', TIMESTAMP '2024-03-15 10:37:22') AS VARCHAR) AS b3mo,
        |  CAST(time_bucket(INTERVAL '2 months', TIMESTAMP '1999-11-15 10:00:00') AS VARCHAR) AS b2mo,
        |  CAST(time_bucket(INTERVAL '15 minutes', TIMESTAMP '2024-03-15 10:37:22', INTERVAL '5 minutes') AS VARCHAR) AS boff""".stripMargin,
    "q_lake_dialect21" ->
      """SELECT id, g,
        |  CAST(sum(v) OVER w AS BIGINT) AS s_run,
        |  CAST(sum(v) OVER (PARTITION BY g ORDER BY id
        |    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) AS BIGINT) AS s_nbrs,
        |  CAST(count(*) OVER (PARTITION BY g
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE CURRENT ROW) AS BIGINT) AS n_others,
        |  round(avg(v) OVER (PARTITION BY g
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE CURRENT ROW), 3) AS a_others,
        |  CAST(count(v) OVER (PARTITION BY g
        |    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE NO OTHERS) AS BIGINT) AS n_frame
        |FROM (VALUES (1,'a',10),(2,'a',NULL),(3,'a',30),(4,'b',5),(5,'b',7)) t(id, g, v)
        |WINDOW w AS (PARTITION BY g ORDER BY id)
        |ORDER BY id""".stripMargin,
    "q_lake_agg_wave" ->
      """SELECT round(geomean(x), 6) AS gm,
        |       CAST(fsum(x) AS DOUBLE) AS fs,
        |       quantile_disc(x, 0.5) AS qd,
        |       CAST(count(*) FILTER (g = 'a') AS BIGINT) AS cf,
        |       round(sum(x ORDER BY id), 6) AS so
        |FROM (SELECT id, g, CAST(x AS DOUBLE) AS x FROM (VALUES (1,'a',1.0),(2,'a',2.0),(3,'b',3.0),(4,'b',4.0)) t0(id, g, x)) t""".stripMargin,
    "q_lake_fn_wave" ->
      """SELECT
        |  CAST(strpos('Hello World', 'World') AS BIGINT) AS sp,
        |  to_hex(255) AS hx,
        |  CAST(list_unique([1, 2, 2, NULL, 3]) AS BIGINT) AS lu,
        |  isfinite(1.5) AS fin,
        |  isinf(CAST('Infinity' AS DOUBLE)) AS inf,
        |  format('{} and {}', 1, 'x') AS fm,
        |  round(jaccard('abc', 'abd'), 6) AS jc,
        |  CAST(hamming('abc', 'abd') AS BIGINT) AS hm,
        |  round(list_dot_product([1.0, 2.0], [3.0, 4.0]), 6) AS dp,
        |  round(list_cosine_similarity([1.0, 0.0], [0.6, 0.8]), 6) AS cs,
        |  round(list_distance([1.0, 2.0], [4.0, 6.0]), 6) AS ld,
        |  array_to_string(string_to_array('a|b', '|'), '+') AS sta,
        |  CAST(try_strptime('2024-03-15', '%Y-%m-%d') AS VARCHAR) AS tsv,
        |  CAST(try_strptime('nope', '%Y-%m-%d') AS VARCHAR) AS tsn""".stripMargin,
    // DuckDB replays the identical scalar-wave text natively
    "q_lake_fn_wave2" ->
      """SELECT
        |  CAST(age(TIMESTAMP '2024-03-10 05:00:00', TIMESTAMP '2024-01-15 10:30:00') AS VARCHAR) AS ag1,
        |  CAST(age(DATE '2024-03-10', DATE '2024-01-15') AS VARCHAR) AS ag2,
        |  CAST(age(DATE '2024-01-15', DATE '2024-03-10') AS VARCHAR) AS ag3,
        |  CAST(age(DATE '2025-07-04', DATE '2022-12-25') AS VARCHAR) AS ag4,
        |  CAST(damerau_levenshtein('ca', 'abc') AS BIGINT) AS dl1,
        |  CAST(damerau_levenshtein('kitten', 'sitting') AS BIGINT) AS dl2,
        |  even(2.5) AS ev1, even(-2.5) AS ev2, even(0) AS ev3,
        |  nextafter(1.0, 2.0) AS na1, nextafter(0.0, -1.0) AS na2,
        |  CAST(7 // 2 AS BIGINT) AS fd1, CAST((-7) // 2 AS BIGINT) AS fd2,
        |  7.5 // 2 AS fd3,
        |  bar(3, 0, 5, 5) AS b1, bar(2.7, 0, 5, 10) AS b2,
        |  bar(0, 0, 5, 5) AS b3, bar(4.99, 0, 5, 5) AS b4""".stripMargin,
    "q_lake_limit_pct" ->
      """SELECT id, v FROM (VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d'),(5,'e'))
        |  t(id, v) ORDER BY id LIMIT 40%""".stripMargin,
    // DuckDB replays the identical agg-wave-2 text natively
    "q_lake_agg_wave2" ->
      """SELECT g,
        |  avg(d) AS av,
        |  CAST(median(d) AS VARCHAR) AS md,
        |  CAST(quantile_cont(d, 0.25) AS VARCHAR) AS qc,
        |  CAST(quantile_disc(i, 0.5) AS BIGINT) AS qd,
        |  CAST(mad(d) AS VARCHAR) AS md2,
        |  round(skewness(d), 6) AS sk,
        |  round(kurtosis(d), 6) AS kt
        |FROM (VALUES (0, 'a', 8, 4.59), (1, 'c', 4, 2.27), (2, 'a', 20, 2.22),
        |  (3, 'c', 0, 2.56), (4, 'a', 20, -2.97), (5, 'b', 13, 1.71),
        |  (6, 'a', 20, 5.26), (7, 'a', 17, -2.53), (8, 'c', 19, 6.63),
        |  (9, 'c', 9, -2.63), (10, 'b', 12, 2.47), (11, 'a', 15, 7.47),
        |  (12, 'b', -5, -1.30), (13, 'a', -2, 5.89)) t(id, g, i, d)
        |GROUP BY g ORDER BY g""".stripMargin,
    // DuckDB replays the identical date-wave text natively
    "q_lake_date_wave" ->
      """SELECT
        |  CAST(date_trunc('month', TIMESTAMP '2004-08-20 23:07:35') AS VARCHAR) AS dt1,
        |  CAST(date_trunc('week', TIMESTAMP '2005-12-14 16:25:21') AS VARCHAR) AS dt2,
        |  CAST(date_diff('week', DATE '2024-03-13', DATE '2024-03-18') AS BIGINT) AS dd1,
        |  CAST(date_diff('month', DATE '2024-01-31', DATE '2024-02-01') AS BIGINT) AS dd2,
        |  CAST(date_diff('second', DATE '2001-11-27', DATE '2001-11-28') AS BIGINT) AS dd3,
        |  CAST(date_part('dow', DATE '2024-01-07') AS BIGINT) AS dp1,
        |  CAST(date_part('isodow', DATE '2024-01-07') AS BIGINT) AS dp2,
        |  CAST(date_part('century', DATE '2029-02-12') AS BIGINT) AS dp3,
        |  CAST(date_part('second', TIMESTAMP '2024-01-01 00:00:46.75') AS BIGINT) AS dp4,
        |  CAST(date_sub('month', TIMESTAMP '2024-01-31 10:00:00', TIMESTAMP '2024-02-29 10:00:00') AS BIGINT) AS ds1,
        |  CAST(date_sub('month', TIMESTAMP '2024-01-31 10:00:00', TIMESTAMP '2024-02-28 09:00:00') AS BIGINT) AS ds2,
        |  CAST((DATE '2024-03-10' - DATE '2024-03-01') AS BIGINT) AS dm1,
        |  left('Hello World', -5) AS lf1,
        |  right('The quick brown fox', -1) AS rt1,
        |  CAST(yearweek(DATE '2021-01-01') AS BIGINT) AS yw1""".stripMargin,
    // DuckDB replays the identical wave-2 text natively
    "q_lake_fn_wave3" ->
      """SELECT
        |  ltrim('xxabc', 'x') AS lt, rtrim('abcyy', 'y') AS rt,
        |  trim('xxabcxx', 'x') AS tr,
        |  CAST(len('héllo') AS BIGINT) AS ln1,
        |  CAST(len([1, 2, NULL]) AS BIGINT) AS ln2,
        |  CAST(gcd(-12, 18) AS BIGINT) AS g1,
        |  CAST(lcm(-4, 6) AS BIGINT) AS l1,
        |  to_base(255, 16) AS tb,
        |  CAST(weekofyear(DATE '2021-01-01') AS BIGINT) AS wy,
        |  CAST(yearweek(DATE '2024-12-31') AS BIGINT) AS yw,
        |  CAST(DATE '2024-01-01' + to_days(3) AS DATE) AS dd,
        |  CAST(TIMESTAMP '2024-01-01 00:00:00' + to_hours(2) AS VARCHAR) AS dh,
        |  CAST(date_sub('day', DATE '2024-03-01', DATE '2024-01-01') AS BIGINT) AS ds1,
        |  CAST(date_sub('month', DATE '2024-03-10', DATE '2024-01-15') AS BIGINT) AS ds2,
        |  CAST(list_reduce([1, 2, 3, 4], (a, b) -> a + b) AS BIGINT) AS lr,
        |  list_aggregate(['a', 'b'], 'min') AS la1,
        |  CAST(list_aggregate([1, NULL, 3], 'count') AS BIGINT) AS la2,
        |  CAST(list_any_value([NULL, 3, 4]) AS BIGINT) AS lav,
        |  array_to_string(array_reverse([1, 2, 3]), ',') AS ar,
        |  array_to_string(regexp_split_to_array('a1b2c', '[0-9]'), ',') AS rs,
        |  ('abc' ~~ 'a%') AS lk1, ('ABC' ~~* 'a%') AS lk2,
        |  ('abc' !~~ 'b%') AS lk3""".stripMargin,
    "q_lake_profile_aggs" ->
      """SELECT g,
        |  round(product(x), 6) AS pr,
        |  round(entropy(c), 6) AS en,
        |  round(mad(x), 6) AS md,
        |  array_to_string(list_transform(map_entries(histogram(c)),
        |    e -> concat(e.key, ':', e.value)), ',') AS hg
        |FROM (SELECT g, c, CAST(x AS DOUBLE) AS x FROM (VALUES
        |  ('a','u',1.0),('a','v',2.0),('a','u',3.0),
        |  ('b','w',0.5),('b','w',-4.0),('b','u',2.5)) t0(g,c,x)) t
        |GROUP BY g ORDER BY g""".stripMargin,
    "q_lake_constraints" ->
      ("SELECT * FROM (VALUES (1, 'a', 1, 'none'), (2, 'b', 5, 'none'), " +
       "(3, 'c', 7, 'none')) t(id, name, qty, tag) ORDER BY id"),
    "q_lake_returning" ->
      ("SELECT * FROM (VALUES ('delete', 1, 10), " +
       "('insert', 1, 20), ('insert', 2, 40), ('insert', 3, 60), " +
       "('update', 2, 25), ('update', 3, 35)) t(stmt, id, dbl) " +
       "ORDER BY stmt, id"),
    // DuckDB runs the identical generate_series text natively
    "q_lake_dialect20" ->
      """SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |       CAST(array_length(generate_series(0, 20, 5)) AS BIGINT) AS step_len
        |FROM (SELECT n, unnest(generate_series(1, n)) AS k
        |      FROM (SELECT generate_series AS n FROM generate_series(2, 4)) g) u
        |ORDER BY n, k""".stripMargin,
    // the oracle REPLAYS the engine's documented deterministic draw:
    // md5 rank over (seed, id, v) — identical strings hash identically
    "q_lake_sample" ->
      ("SELECT id, v FROM (SELECT id, v FROM (VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d')," +
       "(5,'e'),(6,'f'),(7,'g'),(8,'h')) t(id, v) " +
       "ORDER BY md5(concat_ws('|', 42, id, v)) LIMIT 3) ORDER BY id"),
    // r13 differential waves: DuckDB runs the IDENTICAL text natively —
    // the oracle IS the reference semantics the barrages pinned
    "q_lake_join_using" ->
      """WITH jul(k, lv) AS (SELECT * FROM (VALUES (1,'a'),(2,'b'),(3,'c'))),
        |     jur(k, rv) AS (SELECT * FROM (VALUES (2,'x'),(3,'y'),(4,'z')))
        |SELECT 'full_using' AS src, k, lv, rv FROM jul FULL JOIN jur USING (k)
        |UNION ALL
        |SELECT 'natural', k, lv AS v, rv AS w
        |FROM (SELECT k, lv FROM jul) nl NATURAL FULL JOIN (SELECT k, rv FROM jur) nr
        |UNION ALL
        |SELECT 'semi', k, lv, NULL FROM jul SEMI JOIN jur USING (k)
        |UNION ALL
        |SELECT 'anti', k, lv, NULL FROM jul ANTI JOIN jur USING (k)
        |ORDER BY src, k""".stripMargin,
    "q_lake_json_wave" ->
      """SELECT id,
        |  CAST(j -> 'a' AS VARCHAR) AS j_obj,
        |  j ->> 's' AS j_str,
        |  CAST(j -> 's' AS VARCHAR) AS j_q,
        |  CAST(j -> 'xs' ->> 1 AS BIGINT) AS j_idx,
        |  j ->> 'missing' AS j_miss,
        |  j -> 'xs' ->> -1 AS j_neg,
        |  CAST(json_extract(j, '/a/b') AS VARCHAR) AS j_ptr,
        |  json_extract_string(j, '$.a.b') AS j_path,
        |  CAST(json_extract(j, 'a.b') AS VARCHAR) AS j_bare,
        |  CAST(json_array_length(j, '$.xs') AS BIGINT) AS n_xs,
        |  CAST(json_array_length(j, '$.s') AS BIGINT) AS n_s,
        |  CAST(json_array_length(j, '$.zz') AS BIGINT) AS n_zz,
        |  json_valid(j) AS ok1,
        |  json_valid(j || '{') AS ok2
        |FROM (VALUES
        |  (1,'{"a":{"b":7},"xs":[1,2,3],"s":"txt"}'),
        |  (2,'{"a":{"b":9},"xs":[],"s":"y"}')) jw(id, j) ORDER BY id""".stripMargin,
    "q_lake_struct_wave" ->
      """SELECT
        |  CAST({'a': 1, 'b': 'x'} AS VARCHAR) AS st1,
        |  CAST(({'n': {'m': 7}}).n.m AS BIGINT) AS st2,
        |  {'a': 1, 'b': 'x'}['b'] AS st3,
        |  CAST(struct_pack(a := 5).a AS BIGINT) AS st4,
        |  CAST(struct_insert({'a': 1}, b := 9) AS VARCHAR) AS st5,
        |  CAST(row(1, 'two', 3.5) AS VARCHAR) AS st6,
        |  ({'a': 1, 'b': 2} < {'a': 1, 'b': 3}) AS st7,
        |  CAST(({'a': NULL}).a AS VARCHAR) AS st8,
        |  CAST(({'d': DATE '2024-03-01'}).d + 1 AS VARCHAR) AS st9,
        |  CAST(map(['k1','k2'],[10,20])['k1'] AS VARCHAR) AS mp1,
        |  CAST(map(['k1','k2'],[10,20])['nope'] AS VARCHAR) AS mp2,
        |  array_to_string(map_keys(map(['k1','k2'],[10,20])), ',') AS mp3,
        |  CAST(cardinality(map(['k1','k2'],[10,20])) AS BIGINT) AS mp4,
        |  CAST(map(['k'],[1]) AS VARCHAR) AS mp5,
        |  CAST(map_from_entries([{'k': 'a', 'v': 1}, {'k': 'b', 'v': 2}]) AS VARCHAR) AS mp6,
        |  CAST(element_at(map(['k'],[7]), 'k') AS VARCHAR) AS mp7,
        |  array_to_string(list_transform([{'a': 1}, {'a': 2}], x -> x.a), ',') AS ls1""".stripMargin,
    "q_lake_compare_wave" ->
      """SELECT
        |  ('nan'::DOUBLE = 'nan'::DOUBLE) AS n1,
        |  ('nan'::DOUBLE > 1e308) AS n2,
        |  (-0.0::DOUBLE = 0.0::DOUBLE) AS n3,
        |  (1 = '1') AS m1,
        |  (10 < '9') AS m2,
        |  (2 BETWEEN '1' AND '3') AS m3,
        |  (DATE '2024-01-02' < '2024-01-03') AS m4,
        |  ([1, NULL] = [1, NULL]) AS a1,
        |  ([1, NULL] = [2, NULL]) AS a2,
        |  ([NULL] = []) AS a3,
        |  ([1, NULL] < [2]) AS a4,
        |  ([1, NULL] < [1, 2]) AS a5,
        |  ([1, NULL] IS NOT DISTINCT FROM [1, NULL]) AS a6,
        |  ({'a': NULL} = {'a': NULL}) AS s1,
        |  ({'a': 1} IS DISTINCT FROM {'a': 2}) AS s2,
        |  CAST(greatest(1, NULL, 3) AS BIGINT) AS g1,
        |  ('nan'::DOUBLE IS DISTINCT FROM 'nan'::DOUBLE) AS g2""".stripMargin,
    "q_lake_subquery_wave" ->
      """WITH sqt(id, g, v) AS (SELECT * FROM (VALUES (1,'a',10),(2,'b',20),(3,'a',30))),
        |     squ(v, w) AS (SELECT * FROM (VALUES (10,'x'),(20,'y'),(99,'z')))
        |SELECT 'scalar' AS src, id, (SELECT w FROM squ WHERE squ.v = sqt.v) AS x FROM sqt
        |UNION ALL
        |SELECT 'exists', id, NULL FROM sqt WHERE EXISTS (SELECT 1 FROM squ WHERE squ.v = sqt.v)
        |UNION ALL
        |SELECT 'notin_null', id, NULL FROM sqt WHERE v NOT IN (SELECT v FROM (VALUES (10),(NULL)) n(v))
        |UNION ALL
        |SELECT 'gt_any', id, NULL FROM sqt WHERE v > ANY (SELECT v FROM squ WHERE v < 50)
        |UNION ALL
        |SELECT 'le_all', id, NULL FROM sqt WHERE v <= ALL (SELECT v FROM (VALUES (15),(25)) a(v))
        |UNION ALL
        |SELECT 'lateral', sqt.id, CAST(l.m AS VARCHAR)
        |FROM sqt, LATERAL (SELECT max(squ.v) AS m FROM squ WHERE squ.v <= sqt.v) l
        |UNION ALL
        |SELECT 'corr_count', id, CAST((SELECT count(*) FROM squ WHERE squ.v <= sqt.v) AS VARCHAR) FROM sqt
        |ORDER BY src, id""".stripMargin,
    "q_lake_cast_wave" ->
      """SELECT
        |  CAST(CAST(1e16 AS DOUBLE) AS VARCHAR) AS c1,
        |  CAST(CAST(1e15 AS DOUBLE) AS VARCHAR) AS c2,
        |  CAST(CAST(1e-5 AS DOUBLE) AS VARCHAR) AS c3,
        |  CAST(CAST('inf' AS DOUBLE) AS VARCHAR) AS c4,
        |  CAST(CAST('nan' AS DOUBLE) AS VARCHAR) AS c5,
        |  concat('v=', 1e18) AS c6,
        |  CAST(CAST('3.7' AS INTEGER) AS BIGINT) AS c7,
        |  CAST(CAST('-3.5' AS INTEGER) AS BIGINT) AS c8,
        |  CAST(CAST(CAST(2.5 AS DOUBLE) AS INTEGER) AS BIGINT) AS c9,
        |  CAST(CAST(CAST(3.5 AS DOUBLE) AS INTEGER) AS BIGINT) AS c10,
        |  CAST(CAST(CAST(3.99 AS DECIMAL(10,2)) AS INTEGER) AS BIGINT) AS c11,
        |  CAST(TRY_CAST('abc' AS INTEGER) AS BIGINT) AS c12,
        |  TRY_CAST('yes' AS BOOLEAN) AS c13,
        |  CAST(CAST(CAST(2.5 AS DECIMAL(3,1)) AS DECIMAL(3,0)) AS VARCHAR) AS c14,
        |  md5('héllo') AS h1,
        |  sha256('abc') AS h2,
        |  base64('abc'::BLOB) AS h3,
        |  CAST(encode('héllo') AS VARCHAR) AS h4,
        |  decode('abc'::BLOB) AS h5,
        |  CAST(xor(5, 3) AS BIGINT) AS h6,
        |  CAST(bit_count(7) AS BIGINT) AS h7,
        |  chr(9731) AS h8,
        |  CAST(unicode('') AS BIGINT) AS h9,
        |  CAST(ascii('☃x') AS BIGINT) AS h10""".stripMargin,
    "q_lake_tz_wave" ->
      """SELECT
        |  CAST(TIMESTAMPTZ '2024-03-10 12:00:00-05' AS VARCHAR) AS tz1,
        |  CAST(TIMESTAMPTZ '2024-03-10 12:00:00+05:30' AS VARCHAR) AS tz2,
        |  CAST(CAST(TIMESTAMPTZ '2024-07-01 00:00:00+02' AS TIMESTAMP) AS VARCHAR) AS tz3,
        |  CAST(TIMESTAMP '2024-03-10 02:30:00' AT TIME ZONE 'America/New_York' AS VARCHAR) AS tz4,
        |  CAST(TIMESTAMP '2024-11-03 01:30:00' AT TIME ZONE 'America/New_York' AS VARCHAR) AS tz5,
        |  CAST(TIMESTAMPTZ '2024-07-10 12:00:00+00' AT TIME ZONE 'Asia/Tokyo' AS VARCHAR) AS tz6,
        |  CAST(timezone('Europe/Paris', TIMESTAMP '2024-11-03 01:30:00') AS VARCHAR) AS tz7,
        |  CAST(TIMESTAMPTZ '2024-03-10 12:00:00+00' + INTERVAL 1 DAY AS VARCHAR) AS tz8,
        |  CAST(TIMESTAMPTZ '2024-06-01 10:00:00+00' - TIMESTAMPTZ '2024-05-31 08:00:00+00' AS VARCHAR) AS tz9,
        |  CAST(date_part('epoch', TIMESTAMPTZ '2024-03-10 17:00:00+00') AS BIGINT) AS tz10,
        |  CAST(TIME '13:45:30' AS VARCHAR) AS tm1,
        |  CAST(TIME '23:30:00' + INTERVAL 1 HOUR AS VARCHAR) AS tm2,
        |  CAST(TIME '00:30:00' - INTERVAL 1 HOUR AS VARCHAR) AS tm3,
        |  CAST(CAST(TIMESTAMP '2024-03-10 17:25:13' AS TIME) AS VARCHAR) AS tm4,
        |  CAST(make_time(7, 30, 12.5) AS VARCHAR) AS tm5,
        |  CAST(date_part('minute', TIME '13:45:30') AS BIGINT) AS tm6,
        |  (TIME '13:45:30' < TIME '14:00:00') AS tm7""".stripMargin,
    "q_lake_regexp_wave" ->
      """SELECT
        |  regexp_extract('abc123', '([a-z]+)(\d+)') AS re1,
        |  regexp_extract('abc123', '([a-z]+)(\d+)', 2) AS re2,
        |  regexp_extract('abc', '(\d+)') AS re3,
        |  CAST(regexp_extract('2024-05-06', '(\d+)-(\d+)-(\d+)', ['y','m','d']) AS VARCHAR) AS re4,
        |  array_to_string(regexp_extract_all('a1b2c3', '([a-z])(\d)', 2), ',') AS re5,
        |  regexp_matches('Hello', 'hello') AS rm1,
        |  regexp_matches('Hello', 'hello', 'i') AS rm2,
        |  regexp_matches('a' || chr(10) || 'b', 'a.b', 's') AS rm3,
        |  regexp_matches('ABC', '[[:upper:]]+') AS rm4,
        |  regexp_full_match('abcd', 'a.c') AS rf1,
        |  regexp_full_match('AbC', 'abc', 'i') AS rf2,
        |  regexp_replace('aaa', 'a', 'b') AS rr1,
        |  regexp_replace('aaa', 'a', 'b', 'g') AS rr2,
        |  regexp_replace('Hello World', '[aeiou]', '_', 'gi') AS rr3,
        |  regexp_replace('a1b2', '(\d)', '[\1]', 'g') AS rr4,
        |  regexp_replace('abc', 'b', '\0\0') AS rr5,
        |  array_to_string(regexp_split_to_array('a,b,,c', ','), '|') AS rs1,
        |  array_to_string(regexp_split_to_array('abc', ''), '|') AS rs2,
        |  ('abc' ~ 'a.c') AS bx1,
        |  ('abc' ~ 'b') AS bx2,
        |  ('abc' !~ 'b') AS bx3,
        |  ('a' || 'bc' ~ 'abc') AS bx4,
        |  CAST(~5 AS BIGINT) AS bx5""".stripMargin
  )
}

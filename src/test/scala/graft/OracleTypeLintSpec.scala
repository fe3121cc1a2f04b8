package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** Type-strict lint over every `SparkEntry.oracleSql` twin (round-9 lesson).
  *
  * The driver hashes *serialized* values, so a DuckDB twin whose result
  * schema contains HUGEINT (sum() over integers promotes to INT128) or
  * DECIMAL is red on the driver even when every value equals Spark's —
  * Python-level comparison fetches both sides as `int`/`Decimal` and masks
  * the mismatch (this exact class slipped through in rounds 8 AND 9).
  * This spec DESCRIBEs every twin in DuckDB and fails on any
  * HUGEINT/UHUGEINT/DECIMAL output column, so the defect is caught at
  * `sbt test` time, in the same commit that adds the operator.
  *
  * Uses the driver-side python3+duckdb when present; skipped (canceled)
  * on machines without it.
  */
class OracleTypeLintSpec extends AnyFunSuite {

  private def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  test("every query has an oracle twin except the documented no-oracle trio") {
    // the r9 verdict's broken invariant, now structural: an operator
    // landing WITHOUT its oracle row fails the suite, not the driver.
    // The three exceptions are no-oracle BY DESIGN (SURVEY §2.E/§2.I:
    // approximate results / multi-batch streaming semantics) and are
    // spec-proven instead (ApproxDistinctSpec, StreamingSpec).
    val noOracleByDesign = Set(
      "q_agg_approx_distinct", "q_agg_approx_percentile",
      "q_stream_watermark_late")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == noOracleByDesign,
      s"queries without an oracle twin: ${(missing -- noOracleByDesign).toSeq.sorted
        .mkString(", ")} — every new operator lands WITH its oracle row " +
      "in the same commit (r9 verdict item 8)")
    // and no twin points at a query that doesn't exist
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle twins without a query: ${orphans.toSeq.sorted.mkString(", ")}")
  }

  test("no oracle twin emits HUGEINT/UHUGEINT/DECIMAL/ARRAY/STRUCT/MAP output columns") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists(), "no testdata")
    val py = Seq("/root/.pyenv/shims/python3", "/usr/local/bin/python3", "/usr/bin/python3")
      .find { p =>
        new java.io.File(p).exists() && {
          val t = new ProcessBuilder(p, "-c", "import duckdb")
            .redirectErrorStream(true).start()
          t.waitFor() == 0
        }
      }
    assume(py.isDefined, "no python3 with duckdb module")

    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jsonQuote(k)}: ${jsonQuote(v)}" }
      .mkString("{", ",", "}")
    val sqlFile: Path = Files.createTempFile("oracle_sql_lint", ".json")
    Files.writeString(sqlFile, json)
    val script =
      s"""import json, sys, duckdb
         |from pathlib import Path
         |con = duckdb.connect()
         |sf = "$sfDir"
         |for t in ["region","nation","customer","supplier","part","orders",
         |          "lineitem","events","documents","embeddings"]:
         |    if Path(f"{sf}/{t}.parquet").exists():
         |        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
         |sqls = json.loads(Path("${sqlFile.toString}").read_text())
         |bad = []
         |for name, sql in sorted(sqls.items()):
         |    try:
         |        rel = con.sql(sql)
         |        # r11 lesson: the driver's pandas hasher cannot sort/hash nested
         |        # values (numpy arrays / dicts), so ARRAY/STRUCT/MAP outputs are
         |        # just as red as HUGEINT was in r8/r9 — refuse them all here.
         |        def nested(u):
         |            return "[]" in u or u.startswith(("STRUCT", "MAP", "LIST", "UNION"))
         |        hits = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
         |                if any(k in str(t).upper() for k in ("HUGEINT", "DECIMAL"))
         |                or nested(str(t).upper())]
         |        if hits:
         |            bad.append((name, hits))
         |    except Exception as e:
         |        bad.append((name, "ORACLE ERROR: " + str(e).splitlines()[0][:160]))
         |for b in bad:
         |    print("LINT", b)
         |sys.exit(1 if bad else 0)
         |""".stripMargin
    val p = new ProcessBuilder(py.get, "-c", script)
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    val rc = p.waitFor()
    Files.deleteIfExists(sqlFile)
    assert(rc == 0, s"oracle twin type lint failed:\n$out")
  }
}

package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** r13 (verdict #7): gamma()/lgamma() ship as DOCUMENTED-TOLERANCE
  * Lanczos twins instead of a refusal — the JVM has no libm
  * tgamma/lgamma, so bit-exactness is impossible and these stay out of
  * the oracle rows; this spec pins |rel err| <= 1e-12 against values
  * measured on REAL DuckDB 1.0 across the positive range, the
  * reflection range, and the large-argument range, plus the measured
  * edge semantics (gamma(0) loud error, gamma(-1) NaN).
  */
class GammaToleranceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // (x, DuckDB gamma(x), DuckDB lgamma(x)) — measured, duckdb 1.0.0
  private val fixtures: Seq[(Double, Double, Double)] = Seq(
    (0.5, 1.772453850905516, 0.5723649429247001),
    (1.0, 1.0, 0.0),
    (1.5, 0.886226925452758, -0.12078223763524522),
    (2.0, 1.0, 0.0),
    (2.5, 1.329340388179137, 0.2846828704729192),
    (3.0, 2.0, 0.6931471805599453),
    (4.0, 6.0, 1.791759469228055),
    (5.0, 24.0, 3.1780538303479458),
    (7.5, 1871.2543057977882, 7.534364236758734),
    (10.0, 362880.0, 12.80182748008147),
    (0.1, 9.51350769866873, 2.2527126517342055),
    (0.9, 1.0686287021193193, 0.06637623973474296),
    (12.3, 8.338536789996998e7, 18.238983407092245),
    (20.0, 1.2164510040883202e17, 39.339884187199495),
    (-0.5, -3.5449077018110318, 1.2655121234846454),
    (-1.5, 2.363271801207355, 0.8600470153764809),
    (-2.5, -0.9453087204829419, -0.05624371649767407),
    (0.001, 999.4237724845956, 6.907178885383853),
    (30.5, 4.822696933490909e31, 72.9534711841694),
    (50.0, 6.082818640342676e62, 144.56574394634487),
    (100.0, 9.332621544394415e155, 359.13420536957545),
    (170.0, 4.2690680090047056e304, 701.437263808737))

  test("gamma/lgamma within 1e-12 relative of measured DuckDB values") {
    val bad = fixtures.flatMap { case (x, g, lg) =>
      val gotG = graft.functions.GammaDuck.gamma(x)
      val gotL = graft.functions.GammaDuck.lgamma(x)
      val eG = math.abs(gotG - g) / math.abs(g)
      val eL = if (lg == 0.0) math.abs(gotL) else math.abs(gotL - lg) / math.abs(lg)
      (if (eG <= 1e-12) None else Some(f"gamma($x) rel err $eG%.3e")) ++
        (if (eL <= 1e-12) None else Some(f"lgamma($x) rel err $eL%.3e"))
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("edge semantics: gamma(0) loud, gamma(-1) NaN; SQL route works") {
    val dir = Files.createTempDirectory("graft_gamma").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    val row = lake.sql(
      "SELECT gamma(5) AS g5, lgamma(10.0) AS lg10, gamma(-1) AS gneg").head()
    assert(math.abs(row.getDouble(0) - 24.0) < 1e-10)
    assert(math.abs(row.getDouble(1) - 12.80182748008147) < 1e-10)
    assert(row.getDouble(2).isNaN)
    assertThrows[Exception] { lake.sql("SELECT gamma(0) AS v").collect() }
  }
}

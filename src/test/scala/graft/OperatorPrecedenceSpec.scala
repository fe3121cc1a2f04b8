package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.api.DuckLakeXLSpark

/** Differential operator-precedence barrage (r12 review follow-up):
  * 70 randomly generated arithmetic expressions over + - * / // % ** ^
  * with parens and mixed int/decimal literals, each evaluated by REAL
  * DuckDB 1.0 (seeded generator, expected values captured offline) and
  * replayed through the lake's dialect router. This pins the whole
  * operator-rewrite surface behaviorally — precedence, associativity,
  * `/` int-to-double promotion, `//` type dispatch, `%` fmod, power
  * chains — not just the hand-picked cases in R12EdgeSpec. Doubles
  * compare at 1e-9 relative (java Math.pow vs std::pow may differ in
  * the last ulp); everything else is effectively exact.
  */
class OperatorPrecedenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val fixtures: Seq[(String, Double)] = Seq(
      ("0.8 - 4", -3.2),
      ("7.8 ** (3.6) / (2)", 813.786674277683),
      ("11 ** 6.8 % 4 - 8 - 3.8 - 6.8 / 1.1", -15.242941650917583),
      ("6 + 10 - (11)", 5.0),
      ("12 ^ 4.4 // 3.8", 14743.951241454455),
      ("((3)) - (2)", 1.0),
      ("(11) - 2.3", 8.7),
      ("6 ^ ((1)) + 1.2", 7.2),
      ("9 * 6.0 - (4.4) ** 1.6 / 10", 52.92965377330505),
      ("6 / 11", 0.5454545454545454),
      ("3.7 / 9.4 + 7 ^ 8 - 8", 5764793.393617021),
      ("9 - 11", -2.0),
      ("4 / 1 + (8) - 7.1", 4.9),
      ("1 ^ 8 + 8.2 + (3)", 12.2),
      ("10 / 10", 1.0),
      ("5.6 ** 5", 5507.317759999998),
      ("7 % 11", 7.0),
      ("5.6 - 5.1", 0.5),
      ("(3) - 9", -6.0),
      ("(2) - (1.9) // 6 + 2.9", 4.583333333333333),
      ("(2.9) + 1.5 ** (1.8)", 4.974742800833887),
      ("1 * 1", 1.0),
      ("8.1 ** 1 // (5)", 1.6199999999999999),
      ("12 / 9 - 2 / ((6.5))", 1.0256410256410255),
      ("6.5 // 12", 0.5416666666666666),
      ("8.6 ** 3.2 / 4 + 10", 254.53163555315638),
      ("3.1 * 6.1 / (5) ^ 1", 3.782),
      ("4 ** 12 / ((7))", 2396745.1428571427),
      ("8 - 9.4", -1.4),
      ("(10) / (10) ^ (7) + ((12))", 12.000001),
      ("11 + 4.1 // 3 / 7 + 8 + 6", 25.195238095238096),
      ("(7) % 2", 1.0),
      ("1 / 2.6", 0.3846153846153846),
      ("(10) // (7.5) / 10", 0.13333333333333333),
      ("12 ** 10", 61917364224.0),
      ("((1.6)) / 1.1 ** 0.6 + 6 ^ 8.0", 1679617.5110692629),
      ("(8) / 8 // 8 ** (4)", 0.000244140625),
      ("8.4 % 12 / 9", 0.9333333333333333),
      ("1 ^ 4", 1.0),
      ("9 % 12 // 2.9 % 2", 1.103448275862069),
      ("6 / 1 // 1 * 6.8", 40.8),
      ("1 ^ 4.7", 1.0),
      ("(2) + 6.7 - 10", -1.3),
      ("8 ** 10 / 1.0 // (4)", 268435456.0),
      ("8 * 4.7", 37.6),
      ("(3) // (7.9) / 12 ^ 7 / (5.9) + 4 ^ (2.9) + 3", 58.71523605274822),
      ("(8) * (7) ^ (12) - 11", 110730297597.0),
      ("2 % (9) + 5.4 + 4", 11.4),
      ("8 // (9) // 10 ^ ((9)) // 1 * 10", 0.0),
      ("9 % 6 ^ 2.6 / (12) ^ 1 * 10 ** (9) - (3)", 749999997.0),
      ("(10) * (((6))) - 8.5", 51.5),
      ("8.8 / (4.4) + 8.4", 10.4),
      ("6 + 4", 10.0),
      ("7 * 11 * 5 / (1.9) ^ 6", 8.183500697967588),
      ("(6) // 4 ^ 8.6 * 3.3 + (7) - 3 % 8.7 % (8)", 4.000131507119394),
      ("(4) ^ (9.3) % 7 % 9", 2.0036113021778874),
      ("7.9 // (4)", 1.975),
      ("(7) ^ 1", 7.0),
      ("4 ^ (8)", 65536.0),
      ("(8.0) * 9.0 ** 2.5", 1944.0),
      ("5.4 % 5 % 2", 0.4),
      ("9 / 4 / 3 / (3.0) + 1 * 6 * 0.6 / 3", 1.45),
      ("1.5 % 9.0 ^ ((4.6)) - 2 ** 8 + 10", -244.5),
      ("12 ** 11 // 4 / 8 % 3.9 % 8 - (2)", 1.3000005287852567),
      ("11 ** (12) % 5 * 2 / 5 % 7.8", 0.4),
      ("5 // 3 % 4.1 + 0.8", 1.8),
      ("6 % (10) - 2 ** 4.9", -23.857055729177844),
      ("2 - 11 / 7 // (4)", 1.6071428571428572),
      ("1 // 7 * 12", 0.0),
      ("12 % 1", 0.0)
  )

  test("70 DuckDB-evaluated arithmetic expressions match through the router") {
    val dir = Files.createTempDirectory("graft_opprec").toString
    val lake = new DuckLakeXLSpark(spark, s"$dir/lake.xlsx", s"$dir/data")
    val bad = fixtures.flatMap { case (expr, expected) =>
      val gotOpt: Either[String, Double] =
        try lake.sql(s"SELECT $expr AS v").head().get(0) match {
          case n: java.lang.Number => Right(n.doubleValue())
          case d: java.math.BigDecimal => Right(d.doubleValue())
          case other => Left(s"$expr: unexpected result type $other")
        }
        catch { case e: Throwable =>
          Left(s"$expr failed: ${e.getMessage.linesIterator.take(1).mkString}") }
      gotOpt match {
        case Left(err) => Some(err)
        case Right(got) =>
          val tol = math.max(1e-9 * math.abs(expected), 1e-12)
          if (math.abs(got - expected) <= tol) None
          else Some(s"$expr: got $got, DuckDB says $expected")
      }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** driver t1 smoke equivalent: entry() on a fresh session returns rows */
class EntrySpec extends AnyFunSuite {
  test("SparkEntry.entry returns >0 rows (lake slice + multiway join)") {
    assume(new java.io.File("/root/testdata/sf0.001/lineitem.parquet").exists())
    assert(SparkEntry.entry(SparkTestSession.spark).count() > 0)
  }
}

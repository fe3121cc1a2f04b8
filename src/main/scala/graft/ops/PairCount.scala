package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TRUE-pair accounting for the sf10 scaling adjudication (r17, VERDICT
  * r16 tasks 1/7).
  *
  * The sf10 generator stamps 100 near-duplicate variants per original
  * document (tools/bench_sf10.py) where sf1 stamps 10 — per-cluster pair
  * output grows C(100,2)/C(10,2) = 110× for 10× the docs, so an
  * output-sized operator legitimately scales super-linearly in wall
  * time. This main MEASURES that: for a given SPARK_GRAFT_SF_DIR it
  * prints (one JSON line per metric, grep "PAIRCOUNT"):
  *
  *  - `contain_pairs`   — containPairs row count (the q_llm_dedup_contain
  *    work product) + the final query's row count
  *  - `minhash_pairs`   — the banded-MinHash verified pair count feeding
  *    q_llm_dedup_near / the CC cluster stage
  *  - `cluster_rows`    — q_llm_dedup_cluster output rows + the largest
  *    cluster size (bounds the CC superstep count: hash-min on a clique
  *    converges in one step; chains need diameter steps)
  *
  * Driver-side evidence tool, same pattern as [[LshAudit]]; results land
  * in SCALE.md §6.21 and bench_archive/PAIRCOUNT_r17_*.json.
  */
object PairCount {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .appName("pair-count").getOrCreate()
    try {
      val nDocs = Tables.t(spark, dir, "documents").count()
      val sh = QueriesLlm.shinglesDF(spark, dir)
      val contain = QueriesLlm.containPairs(sh, 100).count()
      val containQ = graft.SparkEntry.queries("q_llm_dedup_contain")(spark, dir).count()
      println(s"""PAIRCOUNT {"dir":"$dir","n_docs":$nDocs,""" +
        s""""contain_pairs":$contain,"q_contain_rows":$containQ}""")
      val mh = QueriesLlm.minhashPairs(sh, QueriesLlm.NumHashes,
        QueriesLlm.Bands, 0.8).count()
      println(s"""PAIRCOUNT {"dir":"$dir","minhash_pairs":$mh}""")
      val cl = graft.SparkEntry.queries("q_llm_dedup_cluster")(spark, dir)
      cl.cache()
      val clRows = cl.count()
      // the cluster column name is whatever the board row exposes —
      // size the largest cluster over the LAST column (cluster id)
      val cid = cl.columns.last
      val sizes = cl.groupBy(col(cid)).agg(count(lit(1)).as("k"))
        .agg(max(col("k")).as("mx"), count(lit(1)).as("n")).head()
      println(s"""PAIRCOUNT {"dir":"$dir","cluster_rows":$clRows,""" +
        s""""clusters":${sizes.getAs[Long]("n")},"max_cluster":${sizes.getAs[Long]("mx")}}""")
    } finally spark.stop()
  }
}

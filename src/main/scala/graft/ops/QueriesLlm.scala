package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.K: LLM-training-data pipeline operators over the
  * `documents` (doc_id, text, lang, source, n_chars) and `embeddings`
  * (vec_id, embedding FLOAT[64], label) tables.
  *
  * Scale design (the 100 TB contract):
  *  - near-dup is banded MinHash LSH: shingle -> 16 minhashes -> 8 bands
  *    of 2 -> bucket self-join on (band, key) -> exact-Jaccard verify on
  *    the candidates only. Work is proportional to bucket collisions,
  *    never all-pairs. The verify join shuffles only candidate pairs.
  *  - similarity search ships two paths: brute-force cosine top-k
  *    (TakeOrderedAndProject — partition-local top-k, no full sort) and a
  *    random-hyperplane LSH bucketed variant that prunes the scan to one
  *    bucket (~1/256 of the corpus for 8 planes) before scoring.
  *  - every hash is engine-portable (md5 / deterministic ±1 hyperplanes
  *    generated from a fixed LCG), so the SAME pipeline runs in DuckDB as
  *    the oracle and results hash-match exactly. At production scale one
  *    would swap md5 for xxhash64 — the pipeline shape is unchanged.
  */
object QueriesLlm {
  type QFn = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------- constants
  private val NumHashes = 16
  private val Bands = 8 // 2 minhash rows per band
  private val JacThreshold = 0.5
  private val ShingleWords = 5

  private val Dim = 64
  private val NumPlanes = 8

  /** Deterministic ±1 hyperplanes (fixed LCG — no runtime randomness),
    * shared verbatim by the Spark pipeline and the oracle SQL text.
    */
  private[ops] val planes: Seq[Seq[Int]] = {
    var x = 123456789L
    def next(): Long = {
      x = (x * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue
      x
    }
    Seq.fill(NumPlanes)(Seq.fill(Dim)(if (((next() >> 16) & 1L) == 1L) 1 else -1))
  }

  private val Stopwords = Seq("the", "a", "of", "and", "to", "join", "hash", "row")

  // ------------------------------------------------------- shared exprs
  /** whitespace-normalized lowercase text — the dedup key normalization */
  private def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** element-wise double dot product, sequential left fold (same fold the
    * oracle's list_sum/list_transform performs — bit-identical results)
    */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  private def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, ${Dim + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  /** LSH bucket = 8 sign bits of hyperplane dot products */
  private def bucketExpr(emb: Column): Column =
    concat(planes.map { p =>
      when(dot(emb, typedLit(p)) >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  private def sqlBucket(emb: String): String =
    planes.map { p =>
      val hp = p.mkString("list_value(", ",", ")")
      s"(CASE WHEN ${sqlDot(emb, hp)} >= 0 THEN '1' ELSE '0' END)"
    }.mkString("concat(", ", ", ")")

  /** distinct word-5-shingles of the normalized text (docs with <5 words
    * have no shingles and drop out — they cannot be near-dups)
    */
  private def shinglesDF(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.t(s, d, "documents")
      .select(col("doc_id"), split(normText(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= ShingleWords)
    docs.select(col("doc_id"),
      explode(array_distinct(transform(
        sequence(lit(1), size(col("ws")) - (ShingleWords - 1)),
        i => concat_ws(" ", slice(col("ws"), i, lit(ShingleWords)))))).as("shingle"))
  }

  private val sqlShingles =
    s"""SELECT DISTINCT doc_id,
       |  unnest(list_transform(range(1, len(ws) - ${ShingleWords - 2}),
       |         i -> array_to_string(list_slice(ws, i, i + ${ShingleWords - 1}), ' '))) AS shingle
       |FROM (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
       |      FROM documents)
       |WHERE len(ws) >= $ShingleWords""".stripMargin

  val queries: Map[String, QFn] = Map(
    // -------------------------------------------------------- exact dedup
    "q_llm_dedup_exact" -> { (s, d) =>
      Tables.t(s, d, "documents")
        .groupBy(normText(col("text")).as("norm"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_cnt"))
        .select("doc_id", "dup_cnt")
        .orderBy("doc_id")
    },

    // ------------------------------------------- near-dup: banded MinHash
    "q_llm_dedup_near" -> { (s, d) =>
      // the shingle table feeds SIX consumers (minhash, both sides of the
      // bucket join's lineage, both sides of the verify join, sizes); without
      // persist Catalyst re-derives it per consumer = 6 corpus scans. One
      // materialization, spill-safe, is the 100 TB shape.
      val sh = shinglesDF(s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // 16 portable minhashes: min over shingles of md5(i | shingle)
      val aggs = (1 to NumHashes).map(i =>
        min(md5(concat(lit(i.toString), lit("|"), col("shingle")))).as(s"m$i"))
      val mh = sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      // 8 bands of 2 rows -> (band, key) bucket stream
      val bandArr = array((0 until Bands).map { j =>
        struct(lit(j).as("band"),
          concat(col(s"m${2 * j + 1}"), col(s"m${2 * j + 2}")).as("bkey"))
      }: _*)
      val bands = mh.select(col("doc_id"), explode(bandArr).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"), col("bs.bkey").as("bkey"))
      // bucket self-join (THE LSH step: join key = bucket, never all-pairs)
      val cand = bands.as("x")
        .join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
      // exact-Jaccard verify restricted to candidates
      val shA = sh.toDF("a", "shg_a")
      val shB = sh.toDF("b2", "shg_b")
      val inter = cand.join(shA, "a")
        .join(shB, col("b") === col("b2") && col("shg_a") === col("shg_b"))
        .groupBy("a", "b").agg(count(lit(1)).as("inter"))
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val szA = sz.toDF("a", "sz_a")
      val szB = sz.toDF("b", "sz_b")
      val jac = col("inter").cast(DoubleType) /
        (col("sz_a") + col("sz_b") - col("inter"))
      inter.join(szA, "a").join(szB, "b")
        .withColumn("jac_raw", jac)
        .filter(col("jac_raw") >= JacThreshold)
        .select(col("a"), col("b"), round(col("jac_raw"), 4).as("jac"))
        .orderBy("a", "b")
    },

    // ------------------------------------- top-k similarity (brute force)
    "q_llm_simsearch_topk" -> { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"))
      val scored = emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          (dot(col("embedding"), col("qe")) /
            (sqrt(dot(col("embedding"), col("embedding"))) *
             sqrt(dot(col("qe"), col("qe"))))).as("cos"))
      // round-then-rank: selection depends only on the 4-decimal score, so
      // the top-k set is stable under last-ulp float jitter
      scored.select(col("vec_id"), round(col("cos"), 4).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(10)
    },

    // ------------------------- top-k similarity (LSH-bucketed scale path)
    "q_llm_simsearch_ann" -> { (s, d) =>
      val emb = Tables.t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"), bucketExpr(col("embedding")).as("bucket"))
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"), col("bucket").as("qbucket"))
      // bucket filter prunes the corpus ~256x before any scoring
      emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .filter(col("bucket") === col("qbucket"))
        .select(col("vec_id"),
          round(dot(col("embedding"), col("qe")) /
            (sqrt(dot(col("embedding"), col("embedding"))) *
             sqrt(dot(col("qe"), col("qe")))), 4).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(10)
    },

    // ----------------------------------------- text analysis: term freqs
    "q_llm_text_analysis" -> { (s, d) =>
      val stop = typedLit(Stopwords)
      Tables.t(s, d, "documents")
        .select(explode(split(normText(col("text")), " ")).as("word"))
        .filter(!array_contains(stop, col("word")) && length(col("word")) > 0)
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word").asc)
        .limit(20)
    },

    // ----------------- per-doc text stats: tokens/quality/lang/fingerprint
    "q_llm_text_stats" -> { (s, d) =>
      val doc = Tables.t(s, d, "documents")
      val norm = normText(col("text"))
      val ws = split(norm, " ")
      val stop = typedLit(Stopwords.take(5)) // english-only stopwords
      val nWords = size(ws)
      val totalLen = aggregate(ws, lit(0L), (acc, x) => acc + length(x))
      val stopCnt = size(filter(ws, x => array_contains(stop, x)))
      val alnum = regexp_replace(norm, "[^a-z0-9 ]", "")
      val punctRatio = (length(norm) - length(alnum)).cast(DoubleType) / length(norm)
      doc.select(
        col("doc_id"),
        nWords.as("n_words"),
        size(regexp_extract_all(norm, lit("[a-z0-9]+"), lit(0))).as("n_tokens"),
        round(totalLen.cast(DoubleType) / nWords, 4).as("avg_word_len"),
        round(stopCnt.cast(DoubleType) / nWords, 4).as("stop_ratio"),
        when(stopCnt.cast(DoubleType) / nWords > 0.02, "en").otherwise("unk").as("lang_guess"),
        round(least(lit(1.0), nWords.cast(DoubleType) / 100) * (lit(1.0) - punctRatio), 4)
          .as("quality"),
        substring(md5(norm), 1, 16).as("fingerprint")
      ).orderBy("doc_id")
    },

    // -------------------------- multimodal: opaque binary + typed metadata
    "q_llm_multimodal_cols" -> { (s, d) =>
      // text stands in for an image payload: the SCHEMA pattern (binary
      // blob + struct metadata) is the real artifact; see MultimodalOps
      // for the partition-wise decode stub.
      val doc = Tables.t(s, d, "documents")
        .select(col("doc_id"),
          col("text").cast(BinaryType).as("payload"),
          struct(lit("text/plain").as("mime"), col("n_chars").as("n_chars")).as("meta"))
      doc.select(
        col("doc_id"),
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("digest"),
        col("meta.mime").as("mime"),
        col("meta.n_chars").as("n_chars")
      ).orderBy("doc_id")
    }
  )

  val oracle: Map[String, String] = Map(
    "q_llm_dedup_exact" ->
      ("SELECT min(doc_id) AS doc_id, count(*) AS dup_cnt FROM documents " +
       "GROUP BY trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) ORDER BY doc_id"),

    "q_llm_dedup_near" -> {
      val minhashes = (1 to NumHashes)
        .map(i => s"min(md5(concat('$i','|',shingle))) AS m$i").mkString(", ")
      val bandCase = (0 until Bands)
        .map(j => s"WHEN ${j} THEN concat(m${2 * j + 1}, m${2 * j + 2})")
        .mkString("CASE band ", " ", " END")
      val bandVals = (0 until Bands).map(j => s"($j)").mkString(", ")
      s"""WITH sh AS ($sqlShingles),
         |mh AS (SELECT doc_id, $minhashes FROM sh GROUP BY doc_id),
         |bands AS (SELECT doc_id, band, $bandCase AS bkey
         |          FROM mh CROSS JOIN (VALUES $bandVals) bb(band)),
         |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |         FROM bands x JOIN bands y
         |           ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
         |inter AS (SELECT c.a, c.b, count(*) AS inter
         |          FROM cand c
         |          JOIN sh sa ON sa.doc_id = c.a
         |          JOIN sh sb ON sb.doc_id = c.b AND sb.shingle = sa.shingle
         |          GROUP BY c.a, c.b),
         |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id)
         |SELECT i.a, i.b,
         |       round(CAST(i.inter AS DOUBLE) / (za.sz + zb.sz - i.inter), 4) AS jac
         |FROM inter i JOIN sz za ON za.doc_id = i.a JOIN sz zb ON zb.doc_id = i.b
         |WHERE CAST(i.inter AS DOUBLE) / (za.sz + zb.sz - i.inter) >= $JacThreshold
         |ORDER BY a, b""".stripMargin
    },

    "q_llm_simsearch_topk" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id,
         |       round(${sqlDot("embedding", "qe")} /
         |             (sqrt(${sqlDot("embedding", "embedding")}) * sqrt(${sqlDot("qe", "qe")})), 4) AS score
         |FROM embeddings CROSS JOIN q
         |WHERE vec_id <> 0
         |ORDER BY score DESC, vec_id ASC
         |LIMIT 10""".stripMargin,

    "q_llm_simsearch_ann" ->
      s"""WITH b AS (SELECT vec_id, embedding, ${sqlBucket("embedding")} AS bucket FROM embeddings),
         |q AS (SELECT embedding AS qe, bucket AS qbucket FROM b WHERE vec_id = 0)
         |SELECT vec_id,
         |       round(${sqlDot("embedding", "qe")} /
         |             (sqrt(${sqlDot("embedding", "embedding")}) * sqrt(${sqlDot("qe", "qe")})), 4) AS score
         |FROM b CROSS JOIN q
         |WHERE b.bucket = q.qbucket AND vec_id <> 0
         |ORDER BY score DESC, vec_id ASC
         |LIMIT 10""".stripMargin,

    "q_llm_text_analysis" -> {
      val stopList = Stopwords.map(w => s"'$w'").mkString("[", ",", "]")
      s"""SELECT word, count(*) AS cnt
         |FROM (SELECT unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS word
         |      FROM documents)
         |WHERE NOT list_contains($stopList, word) AND length(word) > 0
         |GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 20""".stripMargin
    },

    "q_llm_text_stats" -> {
      val stopList = Stopwords.take(5).map(w => s"'$w'").mkString("[", ",", "]")
      s"""SELECT doc_id,
         |  len(ws) AS n_words,
         |  len(regexp_extract_all(norm, '[a-z0-9]+')) AS n_tokens,
         |  round(CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) / len(ws), 4) AS avg_word_len,
         |  round(CAST(len(list_filter(ws, x -> list_contains($stopList, x))) AS DOUBLE) / len(ws), 4) AS stop_ratio,
         |  CASE WHEN CAST(len(list_filter(ws, x -> list_contains($stopList, x))) AS DOUBLE) / len(ws) > 0.02
         |       THEN 'en' ELSE 'unk' END AS lang_guess,
         |  round(least(1.0, CAST(len(ws) AS DOUBLE) / 100) *
         |        (1.0 - CAST(length(norm) - length(regexp_replace(norm, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / length(norm)), 4) AS quality,
         |  substring(md5(norm), 1, 16) AS fingerprint
         |FROM (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm,
         |             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ws
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin
    },

    "q_llm_multimodal_cols" ->
      ("SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS digest, " +
       "'text/plain' AS mime, n_chars FROM documents ORDER BY doc_id")
  )
}

package graft.ops

import graft.{Decl, Pack, Tables}
import graft.Dsl.d4
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-data-pipeline operators (SURVEY.md §2.2 `ext`, BASELINE.json
  * north star): dedup, similarity search, text analysis, n-grams,
  * multimodal columns.
  *
  * Scale design (100 TB):
  *  - exact dedup = hash-groupBy (one shuffle on a 256-bit digest —
  *    uniform, skew-free by construction)
  *  - near-dup = MinHash + LSH banding: k=16 signatures, 4 bands × 4
  *    rows; candidate generation is an equi-join on (band, band_hash)
  *    so cost is Σ|bucket|², never O(n²) — the standard way to keep
  *    100 TB near-dup tractable
  *  - similarity = brute-force cosine against a small broadcast query
  *    set (the exact baseline); an LSH/IVF prune is the scale path for
  *    query sets that don't fit a broadcast
  */
object LlmOps extends Pack {

  /** Words of `text` (empty tokens dropped). */
  private def words(c: org.apache.spark.sql.Column) =
    filter(split(c, " "), w => w =!= "")

  def decls: Seq[Decl] = Seq(

    Decl("q_llm_exactdedup", (spark, dir) =>
      Tables(spark, dir, "documents")
        .withColumn("h", sha2(lower(trim(col("text"))).cast("binary"), 256))
        .groupBy(col("h"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1)
        .orderBy(col("h").asc_nulls_first, col("keeper").asc_nulls_first,
          col("n_copies").asc_nulls_first),
      Some(
        """SELECT sha256(lower(trim(text))) AS h,
          |  MIN(doc_id) AS keeper, COUNT(*) AS n_copies
          |FROM documents
          |GROUP BY h HAVING COUNT(*) > 1
          |ORDER BY h ASC NULLS FIRST, keeper ASC NULLS FIRST,
          |  n_copies ASC NULLS FIRST""".stripMargin)),

    // MinHash + LSH banding near-dup candidates, oracled via a
    // PLANTED-DUPLICATE recall invariant (the raw full-corpus pair
    // set is engine-specific — hash-derived, and the synthetic corpus
    // contains genuine near-dups whose detection depends on the hash
    // family — so it stays spec-territory in OpsSpec): plant exact
    // copies of docs 0..49 at id+20000 over the FULL corpus (the
    // bench keeps measuring corpus-scale shingling + banding) and
    // emit exactly the planted-pair relation. Exact copies share
    // every shingle, hence every minhash, hence every band bucket —
    // recall of exact duplicates is 1 BY CONSTRUCTION, a cross-engine
    // fact the oracle pins as an exact 50-row expectation: a broken
    // hash, shingler, or band join loses rows and fails the DuckDB
    // gate. The projection is FP-proof at any corpus size: a pair
    // lands in it only when doc_b is doc_a's OWN copy, and that pair
    // is always found.
    Decl("q_llm_minhash", (spark, dir) => {
      // the id guard makes the planted range disjoint BY CONSTRUCTION
      // at any fixture (a no-op for every shipped one: max doc_id 4999)
      val docs = Tables(spark, dir, "documents")
        .filter(col("doc_id") < 20000).select(col("doc_id"), col("text"))
      val planted = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 20000).as("doc_id"), col("text"))
      minhashPairsDf(docs.unionByName(planted))
        .filter(col("doc_a") < 50 && col("doc_b") === col("doc_a") + 20000)
    }, Some(
      """SELECT doc_id AS doc_a, doc_id + 20000 AS doc_b
        |FROM documents WHERE doc_id < 50
        |ORDER BY doc_a ASC NULLS FIRST, doc_b ASC NULLS FIRST""".stripMargin)),

    Decl("q_llm_simsearch", (spark, dir) => {
      val emb = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("e").as("qe"))
      val scored = emb.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim", round(graft.functions.VecMath.cosineSim(col("qe"), col("e")), 6))
      // two-phase top-k (TopK.perGroup): per-query candidates are
      // corpus-sized, so a single per-q_id window would shuffle the
      // whole scan into |queries| tasks
      TopK.perGroup(scored, Seq(col("q_id")),
          Seq(col("sim").desc, col("vec_id").asc), 5, "rk")
        .select(col("q_id"), col("rk"), col("vec_id"), col("sim"))
        .orderBy(col("q_id").asc_nulls_first, col("rk").asc_nulls_first,
          col("vec_id").asc_nulls_first, col("sim").asc_nulls_first)
    }, Some(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT vec_id AS q_id, e AS qe FROM e WHERE vec_id < 5),
        |sims AS (
        |  SELECT q.q_id, e.vec_id,
        |    ROUND(
        |      list_sum(list_transform(generate_series(1, len(qe)), i -> qe[i] * e[i]))
        |      / (sqrt(list_sum(list_transform(qe, x -> x * x)))
        |         * sqrt(list_sum(list_transform(e.e, x -> x * x)))), 6) AS sim
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        |ranked AS (
        |  SELECT q_id, vec_id, sim,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS rk
        |  FROM sims)
        |SELECT q_id, rk, vec_id, sim FROM ranked WHERE rk <= 5
        |ORDER BY q_id ASC NULLS FIRST, rk ASC NULLS FIRST,
        |  vec_id ASC NULLS FIRST, sim ASC NULLS FIRST""".stripMargin)),

    Decl("q_llm_textstats", (spark, dir) =>
      Tables(spark, dir, "documents")
        .withColumn("ws", words(col("text")))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(col("ws"))).as("n_words"),
          d4(sum(length(col("text")).cast("decimal(18,6)")) / count(lit(1))).as("avg_chars"),
          sum(size(filter(col("ws"), w => w === "the" || w === "a"))).as("n_stopwords"),
          sum(when(col("n_chars") === length(col("text")), 1).otherwise(0)).as("n_chars_ok"))
        .orderBy(col("lang").asc_nulls_first),
      Some(
        """SELECT lang,
          |  COUNT(*) AS n_docs,
          |  CAST(SUM(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS BIGINT) AS n_words,
          |  D4(SUM(CAST(length(text) AS DECIMAL(18,6))) / COUNT(*)) AS avg_chars,
          |  CAST(SUM(len(list_filter(string_split(text, ' '), w -> w = 'the' OR w = 'a'))) AS BIGINT) AS n_stopwords,
          |  CAST(SUM(CASE WHEN n_chars = length(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_ok
          |FROM documents
          |GROUP BY lang
          |ORDER BY lang ASC NULLS FIRST""".stripMargin)),

    Decl("q_llm_ngram", (spark, dir) =>
      Tables(spark, dir, "documents")
        .withColumn("ws", words(col("text")))
        .withColumn("bigram", explode(when(size(col("ws")) >= 2,
          transform(sequence(lit(1), size(col("ws")) - 1),
            i => concat(element_at(col("ws"), i), lit(" "), element_at(col("ws"), i + 1))))
          .otherwise(array())))
        .groupBy(col("lang"), col("bigram"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 20)
        .orderBy(col("lang").asc_nulls_first, col("bigram").asc_nulls_first,
          col("n").asc_nulls_first),
      Some(
        """SELECT lang, bigram, COUNT(*) AS n FROM (
          |  SELECT lang,
          |    unnest(list_transform(generate_series(1, len(ws) - 1),
          |      i -> ws[i] || ' ' || ws[i + 1])) AS bigram
          |  FROM (SELECT lang, list_filter(string_split(text, ' '), w -> w <> '') AS ws
          |        FROM documents))
          |GROUP BY lang, bigram HAVING COUNT(*) >= 20
          |ORDER BY lang ASC NULLS FIRST, bigram ASC NULLS FIRST, n ASC NULLS FIRST""".stripMargin)),

    // Multimodal column: opaque binary payload + typed metadata struct,
    // exercised through an encode→store→decode round trip. The decode
    // step for real image/audio bytes would be a mapInPandas/Arrow UDF
    // on a cluster with codec libs; here the payload is the utf-8 text
    // itself (deterministic stand-in), the plumbing is real.
    Decl("q_llm_multimodal", (spark, dir) =>
      Tables(spark, dir, "documents")
        .withColumn("payload", encode(col("text"), "UTF-8"))
        .withColumn("meta", map(
          lit("lang"), col("lang"), lit("source"), col("source")))
        .withColumn("asset", struct(col("doc_id"), col("payload"), col("meta")))
        .select(
          col("doc_id"),
          length(col("asset.payload")).as("payload_bytes"),
          (decode(col("asset.payload"), "UTF-8") === col("text")).as("roundtrip_ok"),
          element_at(col("asset.meta"), "lang").as("meta_lang"))
        .orderBy(col("doc_id").asc_nulls_first, col("payload_bytes").asc_nulls_first),
      // every projected column IS oracle-expressible (the fixture text
      // is ASCII, so UTF-8 payload bytes = text length; the oracle's
      // literal TRUE asserts the Spark-side decode really round-trips)
      Some(
        """SELECT doc_id, CAST(length(text) AS INTEGER) AS payload_bytes,
          |  TRUE AS roundtrip_ok, lang AS meta_lang
          |FROM documents
          |ORDER BY doc_id ASC NULLS FIRST, payload_bytes ASC NULLS FIRST""".stripMargin)),
  )

  /** MinHash/LSH candidate pairs: k=16 seeded xxhash64 min-signatures,
    * banded 4×4; equi-join on (band, band_hash).
    */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame =
    minhashPairsDf(Tables(spark, dir, "documents"))

  /** Same pipeline over any (doc_id, text) DataFrame.
    *
    * Bucket-size bound (the [[LlmOps2.simhashPairsDf]] /
    * [[LlmOps5.MaxGramDf]] lesson applied to the third LSH operator):
    * a (band, band-hash) bucket is a near-identical family — at web
    * scale an exact-duplicate family of n docs would otherwise
    * enumerate 4·n²/2 pairs in one task. Buckets over `maxBucket`
    * star-cap to the `maxBucket` smallest doc_ids: per-bucket pairs
    * are ≤ |bucket|·maxBucket, and because minhash pairs face no
    * downstream distance gate, every member's edge to the rank-1
    * (minimum-id) representative ALWAYS survives — connectivity, and
    * therefore connected-component dedup ([[LlmOps2.duplicateGroups]]),
    * is preserved EXACTLY, and keep-min-id survivor selection is
    * unchanged (the min id is rank 1 in every bucket it occupies).
    */
  def minhashPairsDf(input: DataFrame, maxBucket: Int = 64): DataFrame = {
    val docs = input
      .withColumn("ws", words(lower(col("text"))))
      .filter(size(col("ws")) >= 3)
    val shingled = docs.select(col("doc_id"),
      explode(array_distinct(transform(sequence(lit(1), size(col("ws")) - 2),
        i => concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1),
          element_at(col("ws"), i + 2))))).as("shingle"))
    val sigCols = (0 until 16).map(i => min(xxhash64(col("shingle"), lit(i))).as(s"mh$i"))
    val sigs = shingled.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    val bands = sigs.select(col("doc_id"), explode(array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until 4).map(r => col(s"mh${b * 4 + r}")): _*).as("bh"))
    }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val ranked = StarCap.rank(bands, Seq(col("band"), col("bh")), col("doc_id"))
    val pairCond = StarCap.cond(maxBucket, col("x.doc_id"), col("y.doc_id"),
      col("x.rk"), col("y.rk"), col("x.bsz"))
    ranked.alias("x").join(StarCap.ySide(ranked, maxBucket).alias("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") && pairCond)
      .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b")).distinct()
      .orderBy(col("doc_a").asc_nulls_first, col("doc_b").asc_nulls_first)
  }
}

package graft.ops

import graft.{Decl, Pack, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators, part 3: sequence packing,
  * deterministic stratified sampling, and PII scrubbing — the
  * prepare-for-training tail of a 100 TB corpus pipeline (after the
  * dedup/quality/language passes in [[LlmOps]]/[[LlmOps2]]).
  */
object LlmOps3 extends Pack {

  /** Deterministic per-doc sampling hash in [0, 100): modular
    * arithmetic only, so the ORACLE computes the identical value —
    * xxhash64/md5-bucket variants hash differently across engines.
    * Knuth multiplicative step over the id residue; every factor kept
    * small enough that the product stays far below 2^63 (DuckDB errors
    * on BIGINT overflow where Spark wraps).
    */
  private def samplingBucket(id: Column): Column =
    ((id % 100000L) * 2654435761L % 1000000007L) % 100L

  def decls: Seq[Decl] = Seq(

    // Sequence packing (concat-then-chunk, the standard pretraining
    // batching step): documents in id order are laid head-to-tail and
    // cut into fixed token-budget packs; a doc belongs to the pack its
    // FIRST token lands in. The prefix sum is two-level — partial sums
    // per id-bucket, a small window over bucket totals, then a
    // bucket-local window — so no stage ever runs a global
    // single-partition window over the full corpus (the naive
    // `Window.orderBy(id)` plan would serialize 100 TB through one
    // task; here the unpartitioned window only ever sees
    // n_docs / 1000 bucket rows).
    Decl("q_llm_pack", (spark, dir) => {
      val L = 512 // pack budget, tokens
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"), expr("(length(text) + 3) div 4").as("est"))
        .withColumn("bkt", expr("doc_id div 1000"))
      val bucketTotals = docs.groupBy(col("bkt")).agg(sum(col("est")).as("bkt_tok"))
        .withColumn("bkt_offset",
          coalesce(sum(col("bkt_tok")).over(
            Window.orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("bkt"), col("bkt_offset"))
      val within = Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      docs.join(broadcast(bucketTotals), "bkt")
        .withColumn("cum_before",
          col("bkt_offset") + coalesce(sum(col("est")).over(within), lit(0L)))
        .withColumn("pack_id", expr(s"cum_before div $L"))
        .groupBy(col("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("est")).as("pack_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("pack_id").asc_nulls_first)
    }, Some(
      """WITH t AS (SELECT doc_id, (length(text) + 3) // 4 AS est FROM documents),
        |c AS (SELECT doc_id, est,
        |        CAST(COALESCE(SUM(est) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |      FROM t)
        |SELECT cum_before // 512 AS pack_id, COUNT(*) AS n_docs,
        |  CAST(SUM(est) AS BIGINT) AS pack_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY pack_id
        |ORDER BY pack_id ASC NULLS FIRST""".stripMargin)),

    // Deterministic stratified sampling: per-language keep rates
    // driven by a shared arithmetic hash of the id — reproducible
    // across runs AND engines, no state, one narrow pass (the way a
    // corpus is downsampled per-source/language for a training mix).
    Decl("q_llm_sample", (spark, dir) => {
      val rate = when(col("lang") === "en", 10L).otherwise(30L)
      Tables(spark, dir, "documents")
        .filter(samplingBucket(col("doc_id")) < rate)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id").asc_nulls_first, col("lang").asc_nulls_first)
    }, Some(
      """SELECT doc_id, lang FROM documents
        |WHERE ((doc_id % 100000) * 2654435761 % 1000000007) % 100
        |      < CASE WHEN lang = 'en' THEN 10 ELSE 30 END
        |ORDER BY doc_id ASC NULLS FIRST, lang ASC NULLS FIRST""".stripMargin)),

    // PII scrubbing: regex masking of emails and IPv4 addresses with
    // per-doc match counts. The fixture corpus is synthetic, so the
    // PII is planted deterministically first (same expression in the
    // oracle); the scrub itself is the production shape — chained
    // regexp_replace in one narrow pass, counts from
    // regexp_extract_all BEFORE masking.
    Decl("q_llm_pii", (spark, dir) => {
      val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-z]{2,}"
      val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
      Tables(spark, dir, "documents")
        .withColumn("planted", concat(col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" contact user"), col("doc_id"), lit("@example.com"))).otherwise(lit("")),
          when(col("doc_id") % 4 === 0,
            concat(lit(" from 10.0."), expr("(doc_id div 256) % 256"), lit("."),
              col("doc_id") % 256)).otherwise(lit(""))))
        .select(col("doc_id"),
          size(regexp_extract_all(col("planted"), lit(emailRe), lit(0))).cast("long").as("n_emails"),
          size(regexp_extract_all(col("planted"), lit(ipRe), lit(0))).cast("long").as("n_ips"),
          regexp_replace(regexp_replace(col("planted"), emailRe, "<EMAIL>"),
            ipRe, "<IP>").as("scrubbed"))
        .orderBy(col("doc_id").asc_nulls_first, col("n_emails").asc_nulls_first)
    }, Some(
      """WITH p AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 3 = 0
        |            THEN ' contact user' || doc_id || '@example.com' ELSE '' END
        |    || CASE WHEN doc_id % 4 = 0
        |            THEN ' from 10.0.' || (doc_id // 256) % 256 || '.' || doc_id % 256
        |            ELSE '' END AS planted
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(planted, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(planted, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ips,
        |  regexp_replace(regexp_replace(planted,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS scrubbed
        |FROM p
        |ORDER BY doc_id ASC NULLS FIRST, n_emails ASC NULLS FIRST""".stripMargin)),
  )
}

package graft.ops

import graft.{Decl, Pack, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Training-data pipeline operators, part 4: text canonicalization,
  * vocabulary/document-frequency stats, lexical-diversity scoring,
  * dedup yield reporting, cross-source leakage audit, and int8
  * embedding quantization — the corpus-hygiene surface on top of the
  * dedup/quality passes in [[LlmOps]]–[[LlmOps3]].
  *
  * Every narrow map here is a single codegen'd projection; every
  * aggregation is doc- or token-keyed with map-side partials — the
  * shapes that stay one-shuffle at 100 TB.
  */
object LlmOps4 extends Pack {

  /** Aggressive text canonicalization for near-exact dedup: casefold,
    * strip every non-alphanumeric to a space, collapse runs, trim.
    * Catches the re-encoded/re-punctuated copies exact sha-dedup
    * misses, far cheaper than MinHash (no shingles, no signatures).
    */
  def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  def decls: Seq[Decl] = Seq(

    // Near-exact dup groups under canonicalization: everything exact
    // dedup finds, plus punctuation/case/whitespace variants. One
    // hash-keyed shuffle, like q_llm_exactdedup.
    Decl("q_llm_normalize", (spark, dir) =>
      Tables(spark, dir, "documents")
        .withColumn("h", sha2(normText(col("text")).cast("binary"), 256))
        .groupBy(col("h"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_variants"))
        .filter(col("n_variants") > 1)
        .orderBy(col("h").asc_nulls_first, col("keeper").asc_nulls_first,
          col("n_variants").asc_nulls_first),
      Some(
        """SELECT sha256(trim(regexp_replace(regexp_replace(lower(text),
          |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h,
          |  MIN(doc_id) AS keeper, COUNT(*) AS n_variants
          |FROM documents
          |GROUP BY h HAVING COUNT(*) > 1
          |ORDER BY h ASC NULLS FIRST, keeper ASC NULLS FIRST,
          |  n_variants ASC NULLS FIRST""".stripMargin)),

    // Vocabulary document-frequency: distinct tokens per doc exploded
    // once, then a token-keyed count — the tokenizer-vocab / stopword-
    // discovery pass. Two narrow shuffles (explode is map-side); at
    // 100 TB the token key space is Zipf but count-agg partials absorb
    // the head before the shuffle.
    Decl("q_llm_vocab_df", (spark, dir) =>
      Tables(spark, dir, "documents")
        .select(explode(array_distinct(filter(split(col("text"), " "),
          t => t =!= ""))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc_nulls_last, col("token").asc_nulls_first)
        .limit(40),
      Some(
        """SELECT token, COUNT(*) AS df FROM (
          |  SELECT unnest(list_distinct(list_filter(string_split(text, ' '),
          |    t -> t <> ''))) AS token
          |  FROM documents)
          |GROUP BY token
          |ORDER BY df DESC NULLS LAST, token ASC NULLS FIRST
          |LIMIT 40""".stripMargin)),

    // Type-token ratio (lexical diversity): low-TTR docs are
    // repetitive boilerplate — a standard quality gate next to
    // q_llm_repetition's n-gram view. Single codegen'd projection.
    Decl("q_llm_ttr", (spark, dir) => {
      val toks = filter(split(col("text"), " "), t => t =!= "")
      Tables(spark, dir, "documents")
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(array_distinct(toks)).cast("long").as("n_distinct"))
        .withColumn("ttr",
          round((col("n_distinct").cast("decimal(18,6)") /
            col("n_tokens").cast("decimal(9,3)")), 4)
            .cast("decimal(18,4)").cast("double"))
        .filter(col("doc_id") < 500)
        .orderBy(col("doc_id").asc_nulls_first)
    }, Some(
      """SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
        |  len(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS n_distinct,
        |  D4(CAST(len(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS DECIMAL(18,6))
        |    / CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS DECIMAL(9,3))) AS ttr
        |FROM documents WHERE doc_id < 500
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin)),

    // Dedup yield per source: docs in vs canonical docs out (under
    // normalization) — the "how much survives dedup" report every
    // corpus build wants per slice. COUNT(DISTINCT hash) per source =
    // one partial-agg shuffle.
    Decl("q_llm_dedupyield", (spark, dir) =>
      Tables(spark, dir, "documents")
        .withColumn("h", sha2(normText(col("text")).cast("binary"), 256))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("h")).as("n_kept"))
        .withColumn("keep_pct",
          round((col("n_kept").cast("decimal(18,6)") * lit(100)) /
            col("n_docs").cast("decimal(9,3)"), 2)
            .cast("decimal(18,2)").cast("double"))
        .orderBy(col("source").asc_nulls_first),
      Some(
        """SELECT source, COUNT(*) AS n_docs,
          |  COUNT(DISTINCT sha256(trim(regexp_replace(regexp_replace(lower(text),
          |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))) AS n_kept,
          |  D2(CAST(COUNT(DISTINCT sha256(trim(regexp_replace(regexp_replace(lower(text),
          |    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')))) AS DECIMAL(18,6)) * 100
          |    / CAST(COUNT(*) AS DECIMAL(9,3))) AS keep_pct
          |FROM documents
          |GROUP BY source
          |ORDER BY source ASC NULLS FIRST""".stripMargin)),

    // Cross-source duplicate audit: identical text in >1 source is
    // train/eval leakage waiting to happen (the same hygiene check as
    // q_llm_contamination, but corpus-internal). Hash-keyed groupBy;
    // the HAVING keeps output O(dupes), never O(corpus).
    Decl("q_llm_crossdedup", (spark, dir) =>
      Tables(spark, dir, "documents")
        .withColumn("h", sha2(lower(trim(col("text"))).cast("binary"), 256))
        .groupBy(col("h"))
        .agg(countDistinct(col("source")).as("n_sources"),
          count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("first_doc"))
        .filter(col("n_sources") > 1)
        .orderBy(col("h").asc_nulls_first),
      Some(
        """SELECT sha256(lower(trim(text))) AS h,
          |  COUNT(DISTINCT source) AS n_sources, COUNT(*) AS n_docs,
          |  MIN(doc_id) AS first_doc
          |FROM documents
          |GROUP BY h HAVING COUNT(DISTINCT source) > 1
          |ORDER BY h ASC NULLS FIRST""".stripMargin)),

    // Int8 scalar quantization of embeddings (the storage path for a
    // 100 TB vector corpus: 4× smaller than fp32, reconstruction error
    // bounded by half a quantization step). The declared output keeps
    // only scalar columns (the verifier sorts rows; an array<int>
    // column is unsortable there) — codes ship as their canonical
    // string form, which DuckDB's LIST→VARCHAR cast matches exactly.
    // All arithmetic is double-precision IEEE in an identical op
    // order in both engines, so values are bit-identical and
    // hash-comparable; Llm4Spec additionally bounds the error.
    Decl("q_llm_sq", (spark, dir) =>
      sqQuantize(spark, dir)
        .select(col("vec_id"), col("qmin"), col("scale"),
          col("codes").cast("string").as("codes_str"), col("max_err"))
        .orderBy(col("vec_id").asc_nulls_first),
      Some(
        """WITH q AS (
          |  SELECT vec_id, embedding,
          |    CAST(list_min(embedding) AS DOUBLE) AS qmin,
          |    CASE WHEN CAST(list_max(embedding) AS DOUBLE)
          |            - CAST(list_min(embedding) AS DOUBLE) > 0
          |      THEN (CAST(list_max(embedding) AS DOUBLE)
          |            - CAST(list_min(embedding) AS DOUBLE)) / 255.0
          |      ELSE 1.0 END AS scale
          |  FROM embeddings)
          |SELECT vec_id, qmin, scale,
          |  CAST(list_transform(embedding,
          |    x -> CAST(round((CAST(x AS DOUBLE) - qmin) / scale) AS INT))
          |    AS VARCHAR) AS codes_str,
          |  list_max(list_transform(embedding,
          |    x -> abs(CAST(x AS DOUBLE)
          |      - (qmin + CAST(round((CAST(x AS DOUBLE) - qmin) / scale) AS INT)
          |         * scale)))) AS max_err
          |FROM q ORDER BY vec_id ASC NULLS FIRST""".stripMargin)),
  )

  /** Per-vector min/max int8 quantize + dequantized max abs error. */
  def sqQuantize(spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val e = col("embedding")
    val mn = array_min(e).cast("double")
    val mx = array_max(e).cast("double")
    // degenerate (constant) vectors quantize to code 0 with scale 1;
    // double arithmetic throughout (Spark promotes the division anyway)
    val scale = when(mx - mn > 0d, (mx - mn) / lit(255d)).otherwise(lit(1d))
    Tables(spark, dir, "embeddings")
      .withColumn("qmin", mn)
      .withColumn("scale", scale)
      .withColumn("codes",
        transform(e, x => round((x.cast("double") - col("qmin")) / col("scale")).cast("int")))
      .withColumn("max_err",
        aggregate(
          zip_with(e, col("codes"),
            (x, q) => abs(x.cast("double") - (col("qmin") + q * col("scale")))),
          lit(0d), (a, x) => greatest(a, x)))
      .select(col("vec_id"), col("qmin"), col("scale"), col("codes"), col("max_err"))
      .orderBy(col("vec_id").asc_nulls_first)
  }
}

package graft.ops

import graft.{Decl, Pack, Tables}
import graft.Dsl.d4
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Training-data pipeline operators, part 8: mixture design and
  * distribution diagnostics. Temperature-weighted domain mixing (the
  * multilingual-pretraining upsampling rule: sample source i with
  * probability proportional to n_i^alpha), sign-bit Hamming search
  * (1-bit embedding quantization — 64x memory cut — with XOR+popcount
  * distance, the cheapest ANN there is), per-source KL divergence of
  * word distributions against the corpus (domain-drift / outlier-source
  * detection), and per-doc mean-IDF novelty (is this doc made of rare
  * or common vocabulary — the dual of the stopword-ratio quality gate).
  *
  * Scale shapes: keyed aggregations over one corpus scan throughout;
  * the only joins are vocabulary-keyed (data-bounded, shuffle-safe) or
  * against driver-bounded broadcast sides (source table, query set).
  */
object LlmOps8 extends Pack {

  private def words(c: Column) = filter(split(lower(c), " "), w => w =!= "")

  def decls: Seq[Decl] = Seq(

    // Temperature-weighted domain mixing: w_i = n_i^0.5 / sum_j n_j^0.5
    // (alpha = 0.5 flattens the source distribution toward uniform —
    // the mT5/XLM-R upsampling rule), then an integer doc budget per
    // source out of 1000. Scale shape: one per-source count (a 20-row
    // aggregate at any corpus size — sources are data-bounded), the
    // normalizer broadcast back. floor() keeps the budget integer-exact
    // in both engines; the 4dp weight rounding absorbs double-sum
    // last-bit order dependence (the entropy/zipf precedent).
    Decl("q_llm_tempmix", (spark, dir) => {
      val n = Tables(spark, dir, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val z = n.agg(sum(sqrt(col("n_docs"))).as("z"))
      n.crossJoin(broadcast(z))
        .select(col("source"), col("n_docs"),
          round(sqrt(col("n_docs")) / col("z"), 4).as("w"),
          floor(sqrt(col("n_docs")) / col("z") * 1000).as("docs_budget"))
        .orderBy(col("source").asc_nulls_first)
    }, Some(
      """WITH n AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
        |z AS (SELECT SUM(sqrt(n_docs)) AS z FROM n)
        |SELECT source, n_docs,
        |  ROUND(sqrt(n_docs) / z, 4) AS w,
        |  CAST(FLOOR(sqrt(n_docs) / z * 1000) AS BIGINT) AS docs_budget
        |FROM n, z ORDER BY source ASC NULLS FIRST""".stripMargin)),

    // Sign-bit Hamming search: binarize the first 32 embedding dims to
    // a sign bitmap packed in one BIGINT, rank candidates by XOR
    // popcount against a broadcast query set. 1-bit quantization is the
    // memory floor of the ANN family (vs q_llm_sq's int8 and
    // q_llm_pq's codebooks); Hamming distance on packed words is a
    // single XOR+POPCNT — whole-stage codegen, no doubles anywhere, so
    // results are bit-exact across engines. Scale shape: the corpus is
    // scanned once against <= 20 broadcast codes; top-5 per query runs
    // as a two-phase partial top-k ([[TopK.perGroup]]) so no task ever
    // holds one query's full corpus-sized candidate set; candidate
    // CODES travel as 8 bytes/row.
    Decl("q_llm_hamming", (spark, dir) => {
      val coded = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .withColumn("code", expr(
          """aggregate(sequence(0, 31), 0L,
            |  (acc, i) -> acc + IF(element_at(e, i + 1) > 0D,
            |    shiftleft(1L, i), 0L))""".stripMargin))
        .select(col("vec_id"), col("code"))
      val q = coded.filter(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("code").as("qcode"))
      val scored = coded.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("dist", bit_count(col("qcode").bitwiseXOR(col("code"))))
      TopK.perGroup(scored, Seq(col("q_id")),
          Seq(col("dist").asc, col("vec_id").asc), 5, "rk")
        .select(col("q_id"), col("rk"), col("vec_id"), col("dist"))
        .orderBy(col("q_id").asc_nulls_first, col("rk").asc_nulls_first)
    }, Some(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings),
        |coded AS (SELECT vec_id,
        |    CAST(list_sum(list_transform(generate_series(1, 32),
        |      i -> CASE WHEN e[i] > 0 THEN (1::BIGINT << (i - 1))
        |        ELSE 0 END)) AS BIGINT) AS code
        |  FROM e),
        |q AS (SELECT vec_id AS q_id, code AS qcode FROM coded WHERE vec_id < 20),
        |d AS (SELECT q.q_id, c.vec_id,
        |    CAST(bit_count(xor(q.qcode, c.code)) AS INT) AS dist
        |  FROM coded c CROSS JOIN q WHERE c.vec_id <> q.q_id),
        |ranked AS (SELECT q_id, vec_id, dist,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY dist ASC, vec_id ASC) AS rk
        |  FROM d)
        |SELECT q_id, rk, vec_id, dist FROM ranked WHERE rk <= 5
        |ORDER BY q_id ASC NULLS FIRST, rk ASC NULLS FIRST""".stripMargin)),

    // Per-source KL divergence vs the corpus word distribution:
    // KL(p_source || p_corpus) = sum_w p(w|s) ln(p(w|s)/p(w)) — the
    // standard domain-drift / outlier-source probe (a source whose
    // words diverge from the mix is a contamination or scrape-error
    // candidate). Scale shape: one explode feeding two keyed
    // aggregations; the (source,word)-to-word join is vocabulary-keyed
    // (data-bounded cardinality, hash-shuffle-safe at any corpus
    // size); only the two scalar totals broadcast. KL >= 0 by Gibbs'
    // inequality — the spec pins it.
    Decl("q_llm_kldiv", (spark, dir) => {
      val dw = Tables(spark, dir, "documents")
        .select(col("source"), explode(words(col("text"))).as("w"))
      val sw = dw.groupBy(col("source"), col("w")).agg(count(lit(1)).as("c_sw"))
      val sTot = sw.groupBy(col("source")).agg(sum(col("c_sw")).as("n_s"))
      val cw = dw.groupBy(col("w")).agg(count(lit(1)).as("c_w"))
      val cTot = cw.agg(sum(col("c_w")).as("n_tot"))
      sw.join(sTot, "source").join(cw, "w").crossJoin(broadcast(cTot))
        .withColumn("term",
          (col("c_sw") / col("n_s")) *
            log((col("c_sw").cast("double") * col("n_tot")) /
              (col("n_s").cast("double") * col("c_w"))))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_distinct_words"),
          round(sum(col("term")), 4).as("kl"))
        .orderBy(col("source").asc_nulls_first)
    }, Some(
      """WITH dw AS (SELECT source, unnest(list_filter(
        |    string_split(lower(text), ' '), x -> x <> '')) AS w
        |  FROM documents),
        |sw AS (SELECT source, w, COUNT(*) AS c_sw FROM dw GROUP BY 1, 2),
        |st AS (SELECT source, SUM(c_sw) AS n_s FROM sw GROUP BY 1),
        |cw AS (SELECT w, COUNT(*) AS c_w FROM dw GROUP BY 1),
        |ct AS (SELECT SUM(c_w) AS n_tot FROM cw)
        |SELECT sw.source, COUNT(*) AS n_distinct_words,
        |  ROUND(SUM((c_sw / n_s) *
        |    ln((CAST(c_sw AS DOUBLE) * n_tot) /
        |       (CAST(n_s AS DOUBLE) * c_w))), 4) AS kl
        |FROM sw JOIN st ON sw.source = st.source
        |  JOIN cw ON sw.w = cw.w CROSS JOIN ct
        |GROUP BY sw.source
        |ORDER BY sw.source ASC NULLS FIRST""".stripMargin)),

    // Per-doc mean-IDF novelty: average ln(N/df) over the doc's
    // distinct words — high = rare vocabulary (specialist or noise),
    // low = stopword soup; the dual of the common-word quality ratio
    // and the doc-level aggregate of TF-IDF's IDF half. Scale shape:
    // one distinct-word explode, a vocabulary-keyed join to the
    // document-frequency table (data-bounded, shuffles fine), one
    // doc-keyed aggregation — the corpus is read once.
    Decl("q_llm_idfnovelty", (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val dw = docs
        .select(col("doc_id"), explode(array_distinct(words(col("text")))).as("w"))
      val dfreq = dw.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      dw.join(dfreq, "w").crossJoin(broadcast(n))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_distinct"),
          round(avg(log(col("n_docs").cast("double") / col("df"))), 4)
            .as("novelty"))
        .orderBy(col("doc_id").asc_nulls_first)
    }, Some(
      """WITH dw AS (SELECT doc_id, unnest(list_distinct(list_filter(
        |    string_split(lower(text), ' '), x -> x <> ''))) AS w
        |  FROM documents),
        |dfreq AS (SELECT w, COUNT(*) AS df FROM dw GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT doc_id, COUNT(*) AS n_distinct,
        |  ROUND(AVG(ln(CAST(n_docs AS DOUBLE) / df)), 4) AS novelty
        |FROM dw JOIN dfreq ON dw.w = dfreq.w CROSS JOIN n
        |GROUP BY doc_id
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin)),

    // Filter-calibration curve: before committing to a min-length
    // cutoff, sweep candidate thresholds and report what each keeps —
    // doc survival AND token survival per (source, threshold), in
    // integer basis points. One corpus scan reduces to a per-doc
    // token count; the 5-way threshold explode happens on that
    // reduced frame (5× doc-count rows, already past the text), then
    // one (source, threshold) rollup. The curve every length/quality
    // filter decision should be read off, as a relation.
    Decl("q_llm_filtercurve", (spark, dir) => {
      val perDoc = Tables(spark, dir, "documents")
        .select(col("source"), size(words(col("text"))).cast("long").as("nt"))
      perDoc
        .select(col("source"), col("nt"),
          explode(expr("array(16L, 32L, 64L, 128L, 256L)")).as("thr"))
        .groupBy(col("source"), col("thr"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("nt") >= col("thr"), 1L).otherwise(0L)).as("n_kept"),
          sum(col("nt")).as("tok_total"),
          sum(when(col("nt") >= col("thr"), col("nt")).otherwise(0L)).as("tok_kept"))
        .select(col("source"), col("thr"), col("n_kept"),
          expr("n_kept * 10000 div n_docs").as("doc_share_bp"),
          expr("tok_kept * 10000 div tok_total").as("tok_share_bp"))
        .orderBy(col("source").asc_nulls_first, col("thr").asc_nulls_first)
    }, Some(
      """WITH d AS (SELECT source,
        |    CAST(len(list_filter(string_split(lower(text), ' '),
        |      x -> x <> '')) AS BIGINT) AS nt
        |  FROM documents),
        |e AS (SELECT source, nt, unnest([16, 32, 64, 128, 256]) AS thr FROM d)
        |SELECT source, CAST(thr AS BIGINT) AS thr,
        |  CAST(SUM(CASE WHEN nt >= thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(SUM(CASE WHEN nt >= thr THEN 1 ELSE 0 END) AS BIGINT) * 10000
        |    // COUNT(*) AS doc_share_bp,
        |  CAST(SUM(CASE WHEN nt >= thr THEN nt ELSE 0 END) AS BIGINT) * 10000
        |    // CAST(SUM(nt) AS BIGINT) AS tok_share_bp
        |FROM e GROUP BY source, thr
        |ORDER BY source ASC NULLS FIRST, thr ASC NULLS FIRST""".stripMargin)),

    // Per-source token-length percentiles: the distribution summary a
    // corpus card reports (and packing/chunking parameters are sized
    // from). Exact interpolated percentiles over per-doc token counts
    // — per-doc reduction first, so the percentile state is doc-count
    // not token-count; one keyed aggregation.
    Decl("q_llm_lenpct", (spark, dir) =>
      Tables(spark, dir, "documents")
        .select(col("source"), size(words(col("text"))).cast("double").as("nt"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          d4(round(expr("percentile(nt, 0.5)"), 4)).as("p50"),
          d4(round(expr("percentile(nt, 0.9)"), 4)).as("p90"),
          d4(round(expr("percentile(nt, 0.99)"), 4)).as("p99"),
          max(col("nt").cast("long")).as("nt_max"))
        .orderBy(col("source").asc_nulls_first),
      Some(
        """SELECT source, COUNT(*) AS n_docs,
          |  D4(QUANTILE_CONT(nt, 0.5)) AS p50,
          |  D4(QUANTILE_CONT(nt, 0.9)) AS p90,
          |  D4(QUANTILE_CONT(nt, 0.99)) AS p99,
          |  CAST(MAX(nt) AS BIGINT) AS nt_max
          |FROM (SELECT source,
          |    CAST(len(list_filter(string_split(lower(text), ' '),
          |      x -> x <> '')) AS DOUBLE) AS nt FROM documents)
          |GROUP BY source
          |ORDER BY source ASC NULLS FIRST""".stripMargin)))
}

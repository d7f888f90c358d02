package graft.ops

import graft.{Decl, Pack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators, part 6: information-theoretic
  * quality scoring (word entropy), lexical retrieval (BM25 — the
  * classic keyword-search scorer used to mine in-domain corpora and
  * build hard negatives), and winnowing fingerprints (Schleimer et
  * al., SIGMOD'03 — the MOSS local fingerprinting scheme whose
  * guarantee is that any shared run of >= w+k-1 tokens between two
  * docs shares at least one fingerprint). Complements the dedup
  * family in [[LlmOps]]/[[LlmOps2]] (exact/minhash/simhash) with the
  * span-overlap detector used for plagiarism/near-dup mining.
  */
object LlmOps6 extends Pack {

  def decls: Seq[Decl] = Seq(

    // Word-entropy quality score: Shannon entropy of each doc's word
    // distribution, the "is this text degenerate?" filter (spam and
    // keyword-stuffed pages score low, natural prose high). Identity
    // used: H = log2(n) - sum(c*log2(c))/n, so the aggregate needs
    // only per-(doc,word) counts — a two-level agg whose shuffles both
    // carry per-doc VOCABULARY rows, never the raw token stream
    // (map-side partial combine collapses within-doc repeats before
    // the first exchange), no window, no join. Scales to any corpus:
    // state per task is bounded by the doc's vocabulary, never the
    // corpus's. Rounded to 4dp so the double-sum order can't flake
    // the cross-engine hash.
    Decl("q_llm_entropy", (spark, dir) => {
      val ws = filter(split(lower(col("text")), " "), w => w =!= "")
      Tables(spark, dir, "documents")
        .select(col("doc_id"), explode(ws).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_words"),
          count(lit(1)).as("n_vocab"),
          round(
            log2(sum(col("c")).cast("double")) -
              sum(col("c").cast("double") * log2(col("c").cast("double"))) /
                sum(col("c")).cast("double"),
            4).as("entropy"))
        .orderBy(col("doc_id").asc_nulls_first)
    }, Some(
      """WITH w AS (SELECT doc_id,
        |            unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w
        |          FROM documents),
        |c AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w)
        |SELECT doc_id,
        |  CAST(SUM(c) AS BIGINT) AS n_words,
        |  CAST(COUNT(*) AS BIGINT) AS n_vocab,
        |  ROUND(log2(CAST(SUM(c) AS DOUBLE))
        |        - SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))
        |          / CAST(SUM(c) AS DOUBLE), 4) AS entropy
        |FROM c GROUP BY doc_id
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin)),

    // Conditional bigram entropy H(w₂|w₁) per source: how predictable
    // the next word is given the current one — degenerate/templated
    // text scores near zero, natural prose high; the
    // information-theoretic sibling of [[LlmOps3]]'s repetition gate.
    // Per-(w₁,w₂) counts are one corpus shuffle; the w₁ marginal is a
    // window over the already-reduced bigram-type frame (partitions
    // bounded by each word's successor vocabulary); per-type terms
    // are truncated to DECIMAL(18,6) BEFORE summing (the bm25
    // precedent) so the final sum is exact and partition-order-free.
    Decl("q_llm_condentropy", (spark, dir) => {
      val ws = filter(split(lower(col("text")), " "), w => w =!= "")
      val bi = Tables(spark, dir, "documents")
        .withColumn("ws", ws)
        .filter(size(col("ws")) >= 2)
        .select(col("source"), explode(expr(
          "transform(sequence(1, size(ws)-1), i -> struct(ws[i-1] AS w1, ws[i] AS w2))")).as("b"))
        .select(col("source"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val w1win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"), col("w1"))
      bi.groupBy(col("source"), col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
        .withColumn("c1", sum(col("c12")).over(w1win))
        .withColumn("term",
          (col("c12").cast("double") *
            log2(col("c1").cast("double") / col("c12").cast("double")))
            .cast("decimal(18,6)"))
        .groupBy(col("source"))
        .agg(sum(col("c12")).as("n_bigrams"),
          count(lit(1)).as("n_types"),
          round(sum(col("term")).cast("double") / sum(col("c12")).cast("double"), 4)
            .as("cond_entropy"))
        .orderBy(col("source").asc_nulls_first)
    }, Some(
      """WITH t AS (SELECT source,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
        |  FROM documents),
        |b AS (SELECT source,
        |    unnest(list_transform(range(2, len(ws) + 1),
        |      i -> struct_pack(w1 := ws[i-1], w2 := ws[i]))) AS b
        |  FROM t WHERE len(ws) >= 2),
        |c AS (SELECT source, b.w1 AS w1, b.w2 AS w2, COUNT(*) AS c12
        |      FROM b GROUP BY 1, 2, 3),
        |m AS (SELECT source, w1, w2, c12,
        |        SUM(c12) OVER (PARTITION BY source, w1) AS c1 FROM c)
        |SELECT source,
        |  CAST(SUM(c12) AS BIGINT) AS n_bigrams,
        |  COUNT(*) AS n_types,
        |  ROUND(CAST(SUM(CAST(CAST(c12 AS DOUBLE) *
        |      log2(CAST(c1 AS DOUBLE) / CAST(c12 AS DOUBLE)) AS DECIMAL(18,6)))
        |    AS DOUBLE) / CAST(SUM(c12) AS DOUBLE), 4) AS cond_entropy
        |FROM m GROUP BY source
        |ORDER BY source ASC NULLS FIRST""".stripMargin)),

    // BM25 retrieval: score every doc against a fixed keyword query
    // and return the top 20 — the lexical-search half of a hybrid
    // (BM25 + embedding) corpus-mining pipeline. Plan shape: one
    // corpus scan explodes tokens; per-(doc,term) tf is a doc-keyed
    // agg; df and avgdl are TINY aggregates (|query terms| rows and 1
    // row) broadcast back — so the only corpus-sized shuffle is the
    // doc-keyed tf agg. Per-term partials are cast to DECIMAL(18,6)
    // BEFORE the final sum so addition is exact and order-free in
    // both engines; ln() inputs are integer-derived, hence
    // bit-identical. k1=1.2, b=0.75 (the standard Robertson params).
    Decl("q_llm_bm25", (spark, dir) => {
      val terms = Seq("vector", "spark", "hash")
      val ws = filter(split(lower(col("text")), " "), w => w =!= "")
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"), explode(ws).as("w"))
      val dl = docs.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val n = dl.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
      val tf = docs.filter(col("w").isin(terms: _*))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val idf = log((lit(1.0) +
        (col("n").cast("double") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      val partial = (idf * (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        .cast("decimal(18,6)")
      tf.join(broadcast(df), "w")
        .join(dl, "doc_id")
        .crossJoin(broadcast(n))
        .groupBy(col("doc_id"))
        .agg(sum(partial).cast("double").as("score"),
          count(lit(1)).as("n_terms"))
        .orderBy(col("score").desc_nulls_last, col("doc_id").asc_nulls_first)
        .limit(20)
    }, Some(
      """WITH w AS (SELECT doc_id,
        |            unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w
        |          FROM documents),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM w GROUP BY doc_id),
        |n AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
        |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM w
        |       WHERE w IN ('vector', 'spark', 'hash') GROUP BY doc_id, w),
        |df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w)
        |SELECT doc_id,
        |  CAST(SUM(CAST(ln(1.0 + (CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5))
        |        * (tf * 2.2)
        |        / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |      AS DECIMAL(18,6))) AS DOUBLE) AS score,
        |  CAST(COUNT(*) AS BIGINT) AS n_terms
        |FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN n
        |GROUP BY doc_id
        |ORDER BY score DESC NULLS LAST, doc_id ASC NULLS FIRST
        |LIMIT 20""".stripMargin)),

    // TF-IDF document scoring: the vector-space sibling of q_llm_bm25
    // (same plan skeleton: corpus-sized work is ONE doc-keyed tf agg;
    // df is a |vocab∩query|-row aggregate broadcast back). Scores are
    // ln(1+tf) * ln(N/df) summed over the query terms, the classic
    // lnc.ltc-ish weighting; per-term partials go through
    // DECIMAL(18,6) so the cross-engine sum is exact and order-free.
    // With an embedding ANN (q_llm_simsearch*) and BM25 this completes
    // the hybrid-retrieval triad used to mine domain corpora.
    Decl("q_llm_tfidf", (spark, dir) => {
      val terms = Seq("vector", "stream", "merge")
      val ws = filter(split(lower(col("text")), " "), w => w =!= "")
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"), explode(ws).as("w"))
      val n = Tables(spark, dir, "documents").agg(count(lit(1)).as("n"))
      val tf = docs.filter(col("w").isin(terms: _*))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val partial = (log(lit(1.0) + col("tf").cast("double")) *
        log(col("n").cast("double") / col("df").cast("double")))
        .cast("decimal(18,6)")
      tf.join(broadcast(df), "w").crossJoin(broadcast(n))
        .groupBy(col("doc_id"))
        .agg(sum(partial).cast("double").as("score"),
          count(lit(1)).as("n_terms"))
        .orderBy(col("score").desc_nulls_last, col("doc_id").asc_nulls_first)
        .limit(20)
    }, Some(
      """WITH w AS (SELECT doc_id,
        |            unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w
        |          FROM documents),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM w
        |       WHERE w IN ('vector', 'stream', 'merge') GROUP BY doc_id, w),
        |df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w)
        |SELECT doc_id,
        |  CAST(SUM(CAST(ln(1.0 + CAST(tf AS DOUBLE))
        |        * ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE))
        |      AS DECIMAL(18,6))) AS DOUBLE) AS score,
        |  CAST(COUNT(*) AS BIGINT) AS n_terms
        |FROM tf JOIN df USING (w) CROSS JOIN n
        |GROUP BY doc_id
        |ORDER BY score DESC NULLS LAST, doc_id ASC NULLS FIRST
        |LIMIT 20""".stripMargin)),

    // Deterministic global corpus shuffle: the "shuffle your training
    // data" step, made reproducible across runs AND engines by sorting
    // on a salted cryptographic hash of the key instead of a RNG —
    // md5(seed || doc_id) gives a uniform pseudo-random permutation
    // any engine replays bit-identically. The sort is Spark's
    // range-partitioned global sort (sampled bounds → balanced
    // partitions at any scale); epoch reshuffles are just a new seed.
    // The declared result is the permutation's head: top-100 by
    // shuffle key plans as a distributed TakeOrderedAndProject (per-
    // partition heaps, no global sort materialized), and only the 100
    // surviving rows see the rank window — a global window over the
    // corpus would single-partition it, which is exactly what this
    // shape avoids.
    Decl("q_llm_shuffle", (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val key = md5(concat(lit("epoch0:"), col("doc_id").cast("string")))
      Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"), key.as("shuffle_key"))
        .orderBy(col("shuffle_key").asc_nulls_first, col("doc_id").asc_nulls_first)
        .limit(100)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("shuffle_key"), col("doc_id"))))
        .orderBy(col("rank").asc_nulls_first)
    }, Some(
      """SELECT doc_id, source, md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
        |  CAST(row_number() OVER (ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rank
        |FROM documents
        |QUALIFY rank <= 100
        |ORDER BY rank ASC NULLS FIRST""".stripMargin)),

    // Winnowing fingerprints (MOSS): hash every k=4-word gram, slide
    // a w=4 window over the hash sequence, keep each window's min —
    // any shared token run of >= w+k-1 = 7 words between two docs is
    // guaranteed to share a fingerprint, unlike minhash which only
    // bounds whole-doc similarity. Hash = first 16 hex chars of
    // md5(gram): identical STRING in both engines, compared
    // lexicographically, so no engine-specific hash leaks into the
    // oracle. Plan shape: per-doc projection + explode, then ONE
    // doc_id shuffle shared by the window and the DISTINCT (both
    // doc_id-keyed) — window state is w rows. Fingerprint volume is
    // ~|grams|/w per doc, independent of corpus size.
    Decl("q_llm_winnow", (spark, dir) => {
      val toks = filter(split(lower(col("text")), " "), w => w =!= "")
      val grams = Tables(spark, dir, "documents")
        .withColumn("toks", toks)
        .filter(size(col("toks")) >= 4)
        .select(col("doc_id"),
          posexplode(expr(
            "transform(sequence(0, size(toks)-4), i -> substring(md5(concat_ws(' ', slice(toks, i+1, 4))), 1, 16))"))
            .as(Seq("pos", "h")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.currentRow, 3)
      grams
        .select(col("doc_id"), min(col("h")).over(w).as("fp"))
        .distinct()
        .orderBy(col("doc_id").asc_nulls_first, col("fp").asc_nulls_first)
    }, Some(
      """WITH t AS (SELECT doc_id,
        |            list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |          FROM documents),
        |g AS (SELECT doc_id, i AS pos,
        |        substr(md5(array_to_string(toks[i+1:i+4], ' ')), 1, 16) AS h
        |      FROM t, unnest(range(0, len(toks) - 3)) AS u(i)
        |      WHERE len(toks) >= 4),
        |f AS (SELECT doc_id,
        |        MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
        |                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
        |      FROM g)
        |SELECT DISTINCT doc_id, fp FROM f
        |ORDER BY doc_id ASC NULLS FIRST, fp ASC NULLS FIRST""".stripMargin)),
  )
}

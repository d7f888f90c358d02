package graft.ops

import graft.{Decl, Pack, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators, part 7: corpus-safety and
  * embedding-space diagnostics. Lexicon blocklist scoring (the
  * toxicity/NSFW gate every pretraining pipeline runs before mixing),
  * co-occurrence PMI (collocation mining / template detection),
  * template-prefix duplication (the "same boilerplate header on a
  * million pages" detector that n-gram dedup misses when bodies
  * differ), kNN label agreement (the standard label-noise /
  * embedding-quality probe: does a vector's neighborhood vote its own
  * label?), and per-label centroid tightness (cluster drift
  * diagnostics for embedding spaces).
  *
  * Scale shapes: every op is either per-doc columnar work feeding one
  * keyed aggregation, or joins against a driver-bounded broadcast side
  * (vocabulary top-K, query set) — no unbounded self-join anywhere.
  */
object LlmOps7 extends Pack {

  private def words(c: Column) = filter(split(lower(c), " "), w => w =!= "")

  def decls: Seq[Decl] = Seq(

    // Lexicon blocklist scoring: count blocked-term hits per doc with
    // array HOFs (whole-stage codegen, zero shuffles until the final
    // per-source rollup), flag docs whose blocked share crosses 4%.
    // The placeholder 3-word lexicon stands in for a real blocklist —
    // the mechanism (HOF count + integer-exact threshold) is the op.
    // Determinism: the flag compares n_blocked*25 >= n_words in
    // integers, so no engine ever divides.
    Decl("q_llm_toxicity", (spark, dir) => {
      val toks = words(col("text"))
      val blocked = filter(toks,
        w => w === "slow" || w === "dup" || w === "big")
      Tables(spark, dir, "documents")
        .select(col("source"),
          size(toks).as("n_words"), size(blocked).as("n_blocked"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_blocked") * 25 >= col("n_words") &&
            col("n_words") > 0, 1L).otherwise(0L)).as("n_flagged"),
          sum(col("n_blocked").cast("long")).as("sum_blocked"),
          sum(col("n_words").cast("long")).as("sum_words"))
        .orderBy(col("source").asc_nulls_first)
    }, Some(
      """WITH w AS (SELECT source,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |  FROM documents),
        |c AS (SELECT source, len(toks) AS n_words,
        |    len(list_filter(toks,
        |      x -> list_contains(['slow', 'dup', 'big'], x))) AS n_blocked
        |  FROM w)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN n_blocked * 25 >= n_words AND n_words > 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |  CAST(SUM(n_blocked) AS BIGINT) AS sum_blocked,
        |  CAST(SUM(n_words) AS BIGINT) AS sum_words
        |FROM c GROUP BY source
        |ORDER BY source ASC NULLS FIRST""".stripMargin)),

    // Co-occurrence PMI over a df-bounded vocabulary: collocation
    // mining, the classic "which word pairs travel together" corpus
    // probe. Scale shape: vocabulary is capped at the top-100 words by
    // document frequency (driver-bounded, broadcast), so per-doc pair
    // generation is <= |V|^2/2 regardless of corpus size and the pair
    // aggregation shuffles at most |V|^2/2 keys. PMI's log runs on
    // identically-shaped double expressions in both engines and is
    // rounded to 4dp (the [[LlmOps6]] entropy/zipf precedent).
    Decl("q_llm_cooccur", (spark, dir) => {
      val docs = Tables(spark, dir, "documents")
      val dw = docs
        .select(col("doc_id"), explode(array_distinct(words(col("text")))).as("w"))
      val dfreq = dw.groupBy(col("w")).agg(count(lit(1)).as("df"))
      val vocab = dfreq.orderBy(col("df").desc, col("w").asc).limit(100)
      val dv = dw.join(broadcast(vocab), "w")
      val n = docs.agg(count(lit(1)).as("n_total"))
      val pairs = dv.as("x").join(dv.as("y"),
          col("x.doc_id") === col("y.doc_id") && col("x.w") < col("y.w"))
        .groupBy(col("x.w").as("w1"), col("y.w").as("w2"))
        .agg(count(lit(1)).as("n_ab"),
          first(col("x.df")).as("df1"), first(col("y.df")).as("df2"))
      pairs.crossJoin(broadcast(n))
        .withColumn("pmi", round(
          log(col("n_ab").cast("double") * col("n_total") /
            (col("df1").cast("double") * col("df2"))), 4))
        .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
        .limit(20)
        .select(col("w1"), col("w2"), col("n_ab"), col("pmi"))
    }, Some(
      """WITH d AS (SELECT doc_id,
        |    list_distinct(list_filter(string_split(lower(text), ' '),
        |      x -> x <> '')) AS ws
        |  FROM documents),
        |dw AS (SELECT doc_id, unnest(ws) AS w FROM d),
        |dfreq AS (SELECT w, COUNT(*) AS df FROM dw GROUP BY w),
        |vocab AS (SELECT w, df FROM dfreq ORDER BY df DESC, w ASC LIMIT 100),
        |dv AS (SELECT dw.doc_id, dw.w, vocab.df
        |  FROM dw JOIN vocab USING (w)),
        |n AS (SELECT COUNT(*) AS n_total FROM documents),
        |p AS (SELECT x.w AS w1, y.w AS w2, COUNT(*) AS n_ab,
        |    MIN(x.df) AS df1, MIN(y.df) AS df2
        |  FROM dv x JOIN dv y ON x.doc_id = y.doc_id AND x.w < y.w
        |  GROUP BY 1, 2)
        |SELECT w1, w2, n_ab,
        |  ROUND(ln(CAST(n_ab AS DOUBLE) * n.n_total /
        |    (CAST(df1 AS DOUBLE) * df2)), 4) AS pmi
        |FROM p, n
        |ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 20""".stripMargin)),

    // Template-prefix duplication: group docs by their first 16 chars
    // — catches boilerplate headers/templated pages whose BODIES all
    // differ (so content dedup keeps them all). One hash-partitioned
    // groupBy on (source, prefix), then a per-source rollup —
    // integer-exact throughout, skew-free (prefix cardinality is
    // data-bounded, and a pathological single-prefix corpus is
    // exactly what the op exists to surface).
    Decl("q_llm_prefixdup", (spark, dir) =>
      Tables(spark, dir, "documents")
        .select(col("source"), substring(col("text"), 1, 16).as("pfx"))
        .groupBy(col("source"), col("pfx"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("source"))
        .agg(sum(col("c")).as("n_docs"),
          count(lit(1)).as("n_prefixes"),
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as("n_dup_docs"))
        .orderBy(col("source").asc_nulls_first),
      Some(
        """WITH p AS (SELECT source, substr(text, 1, 16) AS pfx, COUNT(*) AS c
          |  FROM documents GROUP BY 1, 2)
          |SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
          |  COUNT(*) AS n_prefixes,
          |  CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_docs
          |FROM p GROUP BY source
          |ORDER BY source ASC NULLS FIRST""".stripMargin)),

    // kNN label agreement: for each query vector, do its 10 nearest
    // cosine neighbors vote its own label? The standard embedding-
    // quality / label-noise probe run before trusting labels or
    // distillation targets. Scale shape: the query set is bounded and
    // broadcast (the [[LlmOps]] simsearch pattern) so the corpus is
    // scanned once with no shuffle on the big side; votes and the
    // argmax are per-query windows over <= k rows. Ties in both the
    // neighbor ranking (sim, vec_id) and the vote (count desc, label
    // asc) break deterministically.
    Decl("q_llm_knnlabel", (spark, dir) => {
      val emb = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("e"))
      val q = emb.filter(col("vec_id") < 50)
        .select(col("vec_id").as("q_id"), col("label").as("true_label"),
          col("e").as("qe"))
      val scored = emb.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim",
          round(graft.functions.VecMath.cosineSim(col("qe"), col("e")), 6))
      // neighbor candidates are corpus-sized per query → two-phase
      // top-k (TopK.perGroup), not one per-q_id window
      val nbrs = TopK.perGroup(scored, Seq(col("q_id")),
        Seq(col("sim").desc, col("vec_id").asc), 10, "rk")
      val wVote = Window.partitionBy(col("q_id"))
        .orderBy(col("n_votes").desc, col("label").asc)
      nbrs.groupBy(col("q_id"), col("true_label"), col("label"))
        .agg(count(lit(1)).as("n_votes"))
        .withColumn("vr", row_number().over(wVote))
        .filter(col("vr") === 1)
        .select(col("q_id"), col("true_label"),
          col("label").as("pred_label"), col("n_votes"),
          (col("true_label") === col("label")).cast("int").as("correct"))
        .orderBy(col("q_id").asc_nulls_first)
    }, Some(
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, label AS true_label, e AS qe
        |  FROM e WHERE vec_id < 50),
        |sims AS (
        |  SELECT q.q_id, q.true_label, e.vec_id, e.label,
        |    ROUND(
        |      list_sum(list_transform(generate_series(1, len(qe)), i -> qe[i] * e.e[i]))
        |      / (sqrt(list_sum(list_transform(qe, x -> x * x)))
        |         * sqrt(list_sum(list_transform(e.e, x -> x * x)))), 6) AS sim
        |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
        |nbrs AS (
        |  SELECT q_id, true_label, label,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY sim DESC, vec_id ASC) AS rk
        |  FROM sims),
        |votes AS (
        |  SELECT q_id, true_label, label, COUNT(*) AS n_votes
        |  FROM nbrs WHERE rk <= 10 GROUP BY 1, 2, 3),
        |pred AS (
        |  SELECT q_id, true_label, label AS pred_label, n_votes,
        |    ROW_NUMBER() OVER (PARTITION BY q_id
        |      ORDER BY n_votes DESC, label ASC) AS vr
        |  FROM votes)
        |SELECT q_id, true_label, pred_label, n_votes,
        |  CAST(true_label = pred_label AS INT) AS correct
        |FROM pred WHERE vr = 1
        |ORDER BY q_id ASC NULLS FIRST""".stripMargin)),

    // Per-label centroid tightness: centroid norm + mean cosine of
    // members to their centroid — the cluster-quality / drift signal
    // for embedding spaces (a label whose members don't face their
    // centroid is noisy or multi-modal). Scale shape: posexplode to
    // (label, dim) rows → one keyed aggregation for centroids (64*L
    // keys), broadcast-join the tiny centroid table back, one keyed
    // aggregation per (vec, label) for dots — the corpus is read once
    // and nothing unbounded sits on the driver. Double sums are
    // order-dependent in the last bits; rounding to 4dp absorbs it
    // (the [[LlmOps6]] entropy precedent).
    Decl("q_llm_centroid", (spark, dir) => {
      val d = Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("i", "v")))
      val cent = d.groupBy(col("label"), col("i")).agg(avg(col("v")).as("c"))
      val cnorm = cent.groupBy(col("label"))
        .agg(sqrt(sum(col("c") * col("c"))).as("cnorm"))
      val dots = d.join(broadcast(cent), Seq("label", "i"))
        .groupBy(col("vec_id"), col("label"))
        .agg(sum(col("v") * col("c")).as("dot"),
          sqrt(sum(col("v") * col("v"))).as("vnorm"))
      dots.join(broadcast(cnorm), "label")
        .withColumn("cos", col("dot") / (col("vnorm") * col("cnorm")))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          round(first(col("cnorm")), 4).as("centroid_norm"),
          round(avg(col("cos")), 4).as("avg_cos"))
        .orderBy(col("label").asc_nulls_first)
    }, Some(
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
        |  FROM embeddings),
        |d AS (SELECT vec_id, label,
        |    unnest(generate_series(1, len(e))) AS i, unnest(e) AS v
        |  FROM e),
        |cent AS (SELECT label, i, AVG(v) AS c FROM d GROUP BY 1, 2),
        |cn AS (SELECT label, sqrt(SUM(c * c)) AS cnorm FROM cent GROUP BY 1),
        |dots AS (SELECT d.vec_id, d.label, SUM(d.v * cent.c) AS dot,
        |    sqrt(SUM(d.v * d.v)) AS vnorm
        |  FROM d JOIN cent ON d.label = cent.label AND d.i = cent.i
        |  GROUP BY 1, 2)
        |SELECT dots.label, COUNT(*) AS n_vecs,
        |  ROUND(MIN(cn.cnorm), 4) AS centroid_norm,
        |  ROUND(AVG(dots.dot / (dots.vnorm * cn.cnorm)), 4) AS avg_cos
        |FROM dots JOIN cn ON dots.label = cn.label
        |GROUP BY dots.label
        |ORDER BY dots.label ASC NULLS FIRST""".stripMargin)),

    // Embedding-space drift between label groups (dataset versions,
    // sources, shards): pairwise L1/L2 distance of per-group mean
    // vectors — the monitor that catches an encoder change or a
    // contaminated shard before training does. Scale shape: ONE keyed
    // aggregation over the corpus (label x dim keys), then the tiny
    // means table pairs with itself — the corpus is read once and
    // nothing grows with n. round(…,4) absorbs double-sum order
    // variance (the [[q_llm_centroid]] precedent).
    Decl("q_llm_embdrift", (spark, dir) => {
      val d = Tables(spark, dir, "embeddings")
        .select(col("label"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("i", "v")))
      val m = d.groupBy(col("label"), col("i")).agg(avg(col("v")).as("m"))
      val a = m.select(col("label").as("la"), col("i"), col("m").as("ma"))
      val b = m.select(col("label").as("lb"), col("i"), col("m").as("mb"))
      a.join(b, Seq("i")).filter(col("la") < col("lb"))
        .groupBy(col("la"), col("lb"))
        .agg(
          round(sum(abs(col("ma") - col("mb"))), 4).as("l1_drift"),
          round(sqrt(sum((col("ma") - col("mb")) * (col("ma") - col("mb")))), 4)
            .as("l2_drift"))
        .orderBy(col("la").asc_nulls_first, col("lb").asc_nulls_first)
    }, Some(
      """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |d AS (SELECT label, unnest(generate_series(1, len(e))) AS i, unnest(e) AS v
        |      FROM e),
        |m AS (SELECT label, i, AVG(v) AS m FROM d GROUP BY 1, 2)
        |SELECT a.label AS la, b.label AS lb,
        |  ROUND(SUM(ABS(a.m - b.m)), 4) AS l1_drift,
        |  ROUND(sqrt(SUM((a.m - b.m) * (a.m - b.m))), 4) AS l2_drift
        |FROM m a JOIN m b USING (i)
        |WHERE a.label < b.label
        |GROUP BY 1, 2
        |ORDER BY la ASC NULLS FIRST, lb ASC NULLS FIRST""".stripMargin)))
}

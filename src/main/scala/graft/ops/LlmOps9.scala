package graft.ops

import graft.{Decl, Pack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators, part 9: tokenizer training.
  * A byte-pair-encoding (BPE) merge trainer — the component that turns
  * a corpus into a tokenizer — and the vocabulary compression metric
  * its merges buy.
  *
  * BPE trains on the WORD-FREQUENCY table, not the corpus: ONE
  * distributed corpus scan builds (word, freq) — Heaps'-law bounded,
  * ≪ corpus — and the whole merge loop then runs DRIVER-SIDE over the
  * collected vocabulary (the k-means/PQ trainer precedent: bounded
  * input → driver math beats a per-iteration distributed job). The
  * former spelling ran 1 Spark job + 1 localCheckpoint per merge —
  * 10 shuffle rounds of scheduling overhead for vocab-sized data.
  * A deterministic head-by-frequency vocab cap guards the
  * pathological 100-TB tail (hashes, serial numbers contribute ~zero
  * pair mass — the classic BPE trainer's own vocab cap).
  */
object LlmOps9 extends Pack {

  private def words(c: Column) = filter(split(lower(c), " "), w => w =!= "")

  /** Split into Unicode CODEPOINTS — the unit DuckDB's length()/
    * substr() (and Spark SQL's length()) count. toCharArray would
    * split a non-BMP character (emoji, CJK extensions) into two lone
    * UTF-16 surrogates: the trainer's initial symbols, char totals,
    * and step-1 bigrams would all diverge from the SQL oracle on such
    * text. */
  private def codepoints(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** Codepoint count of a (possibly multi-codepoint) symbol. */
  private def cpLen(sym: String): Long = sym.codePointCount(0, sym.length).toLong

  /** (word, freq) → symbol arrays; runs `maxMerges` greedy BPE merges.
    * Returns (merge table, final symbolized vocab). One distributed
    * job (the word-frequency aggregation, head-truncated
    * deterministically at `maxVocab` by (freq desc, word asc)); the
    * merge iterations are driver math over the collected vocab. */
  private[graft] def trainBpe(spark: SparkSession, dir: String, maxMerges: Int,
      maxVocab: Int = 1 << 22)
      : (Seq[(Int, String, String, Long)], Seq[(Long, Array[String])]) =
    trainBpeOn(Tables(spark, dir, "documents"), maxMerges, maxVocab)

  /** [[trainBpe]] over any (text) DataFrame — the same distributed
    * word-frequency scan + driver merge loop, input-parameterized so
    * the planted known-answer oracle exercises the identical code
    * path the corpus run uses. */
  private[graft] def trainBpeOn(input: DataFrame, maxMerges: Int,
      maxVocab: Int = 1 << 22)
      : (Seq[(Int, String, String, Long)], Seq[(Long, Array[String])]) = {
    val vocab = input
      .select(explode(words(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var syms: Array[(Long, Array[String])] =
      vocab.map { case (w, f) => (f, codepoints(w)) }

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= maxMerges && !done) {
      // adjacent symbol pairs, weighted by word frequency (overlapping
      // pairs count — the classic formulation)
      val cnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      syms.foreach { case (f, s) =>
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          cnt.update(k, cnt.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (cnt.isEmpty) done = true
      else {
        // argmax with the same total tie order as the former SQL
        // spelling: count desc, left asc, right asc
        val ((l, r), c) = cnt.minBy { case ((pl, pr), pc) => (-pc, pl, pr) }
        merges += ((step, l, r, c))
        // greedy leftmost non-overlapping merge of (l, r) per word
        val m = l + r
        syms = syms.map { case (f, s) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == l && s(i + 1) == r) { out += m; i += 2 }
            else { out += s(i); i += 1 }
          }
          (f, out.toArray)
        }
        step += 1
      }
    }
    (merges.toSeq, syms.toSeq)
  }

  def decls: Seq[Decl] = Seq(

    // BPE merge training, contract-oracled (the q_llm_mmr / hash
    // known-answer pattern — counts are integer-exact and ties break
    // on (count desc, left asc, right asc), but 10 data-dependent
    // iterations aren't one SQL statement, so the declared query
    // emits what DuckDB CAN independently derive, two parts:
    //  - 'planted': the full 10-step merge table of a 32×"abcdefghijk"
    //    known-answer corpus run through the IDENTICAL trainer code
    //    path. Every adjacent pair counts exactly 32 at every step, so
    //    the tie order always picks the 'a'-prefixed pair: step s
    //    merges (first-s-chars, char s+1) with count 32 — a table
    //    derivable by hand and hardcoded as oracle VALUES. A trainer
    //    bug in counting, tie-breaking, or the leftmost merge rewrites
    //    this table.
    //  - 'corpus': the documents-table run (kept so the bench still
    //    measures the corpus-scale scan). Step 1 operates on raw
    //    characters, so DuckDB recomputes its (lhs, rhs, pair_count)
    //    argmax EXACTLY from weighted char bigrams; steps 2+ emit NULL
    //    symbols plus two measured theorem booleans: `mono_ok` (greedy
    //    BPE's picked count is non-increasing — merging only removes
    //    adjacencies and a created pair's count is bounded by the pair
    //    just merged) and `wf_ok` (every side is a single char or the
    //    concatenation of an earlier step's merge).
    // Full corpus ranks 2-10 stay pinned by Llm9Spec's hand-computed
    // merge sequences.
    Decl("q_llm_bpe", (spark, dir) => {
      import spark.implicits._
      def contract(ms: Seq[(Int, String, String, Long)], part: String,
          pinAll: Boolean) =
        ms.map { case (s, l, r, c) =>
          val pin = pinAll || s == 1
          val monoOk = s == 1 || ms.find(_._1 == s - 1).exists(_._4 >= c)
          val wfOk =
            (cpLen(l) == 1 || ms.exists(m => m._1 < s && m._2 + m._3 == l)) &&
            (cpLen(r) == 1 || ms.exists(m => m._1 < s && m._2 + m._3 == r))
          (part, s, if (pin) Some(l) else None, if (pin) Some(r) else None,
            if (pin) Some(c) else None, monoOk, wfOk)
        }
      val corpus0 = contract(trainBpe(spark, dir, 10)._1, "corpus", pinAll = false)
      // training can exhaust its pairs before 10 merges on degenerate
      // corpora while the oracle emits exactly 10 corpus rows whenever
      // ANY merge exists (generate_series × top1) — pad unreached
      // steps with the same NULL-symbol shape (vacuously-true
      // booleans: no merge happened at that step)
      val corpus = if (corpus0.isEmpty) corpus0 else corpus0 ++
        ((corpus0.size + 1) to 10).map(s =>
          ("corpus", s, None: Option[String], None: Option[String],
            None: Option[Long], true, true))
      val planted = contract(trainBpeOn(
        spark.range(0, 32, 1, 1).select(lit("abcdefghijk").as("text")), 10)._1,
        "planted", pinAll = true)
      (planted ++ corpus)
        .toDF("part", "step", "lhs", "rhs", "pair_count", "mono_ok", "wf_ok")
        .orderBy(col("part").asc_nulls_first, col("step").asc_nulls_first)
    }, Some(
      """WITH w AS (
        |  SELECT word, COUNT(*) AS freq
        |  FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
        |                x -> x <> '')) AS word FROM documents)
        |  GROUP BY word
        |  -- mirror the trainer's deterministic maxVocab head-cap so
        |  -- the contract holds past 2^22 distinct words
        |  ORDER BY freq DESC, word ASC LIMIT 4194304),
        |bi0 AS (
        |  -- lockstep unnest (DuckDB zips parallel unnests; a lateral
        |  -- generate_series with a column argument is unsupported)
        |  SELECT
        |    unnest(list_transform(generate_series(1, length(word) - 1),
        |      i -> substr(word, CAST(i AS INTEGER), 1))) AS lhs,
        |    unnest(list_transform(generate_series(1, length(word) - 1),
        |      i -> substr(word, CAST(i AS INTEGER) + 1, 1))) AS rhs,
        |    freq
        |  FROM w),
        |bi AS (SELECT lhs, rhs, SUM(freq) AS c FROM bi0 GROUP BY 1, 2),
        |top1 AS (SELECT lhs, rhs, c FROM bi ORDER BY c DESC, lhs ASC, rhs ASC LIMIT 1),
        |corpus AS (
        |  SELECT 'corpus' AS part, CAST(g.s AS INTEGER) AS step,
        |    CASE WHEN g.s = 1 THEN t.lhs END AS lhs,
        |    CASE WHEN g.s = 1 THEN t.rhs END AS rhs,
        |    CASE WHEN g.s = 1 THEN CAST(t.c AS BIGINT) END AS pair_count,
        |    TRUE AS mono_ok, TRUE AS wf_ok
        |  FROM generate_series(1, 10) AS g(s) CROSS JOIN top1 t),
        |planted AS (
        |  SELECT 'planted' AS part, CAST(step AS INTEGER) AS step, lhs, rhs,
        |    CAST(c AS BIGINT) AS pair_count, TRUE AS mono_ok, TRUE AS wf_ok
        |  FROM (VALUES (1,'a','b',32),(2,'ab','c',32),(3,'abc','d',32),
        |    (4,'abcd','e',32),(5,'abcde','f',32),(6,'abcdef','g',32),
        |    (7,'abcdefg','h',32),(8,'abcdefgh','i',32),(9,'abcdefghi','j',32),
        |    (10,'abcdefghij','k',32)) v(step, lhs, rhs, c))
        |SELECT * FROM (SELECT * FROM planted UNION ALL SELECT * FROM corpus)
        |ORDER BY part ASC NULLS FIRST, step ASC NULLS FIRST""".stripMargin)),

    // What those merges buy: tokens-per-word before (chars) and after
    // the 10 merges. Same two-part contract: the planted corpus
    // compresses to EXACTLY one token per word (32 words × 11 chars →
    // 32 tokens, 11.0 chars/token — oracle literals); the corpus row
    // pins n_words and n_chars_total cross-engine (DuckDB recomputes
    // both from the word-frequency table exactly), with the
    // engine-dependent token count reported through two measured
    // bounds: tokens ≤ chars (merges only shrink) and tokens ≥ chars
    // − Σ pair_count (each counted pair absorbs at most one merge
    // application — a trainer that over-merges flips it).
    Decl("q_llm_bpe_compress", (spark, dir) => {
      def stats(mss: (Seq[(Int, String, String, Long)], Seq[(Long, Array[String])]))
          : (Long, Long, Long, Long) = {
        val (ms, syms) = mss
        val nWords = syms.iterator.map(_._1).sum
        val nChars = syms.iterator.map { case (f, s) =>
          f * s.iterator.map(cpLen).sum }.sum
        val nToks = syms.iterator.map { case (f, s) => f * s.length }.sum
        (nWords, nChars, nToks, ms.map(_._4).sum)
      }
      val (cW, cC, cT, cSum) = stats(trainBpe(spark, dir, 10))
      val (pW, pC, pT, pSum) = stats(trainBpeOn(
        spark.range(0, 32, 1, 1).select(lit("abcdefghijk").as("text")), 10))
      def cpt(chars: Long, toks: Long): Double = BigDecimal(chars.toDouble / toks)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      import spark.implicits._
      Seq(
        ("planted", pW, pC, Some(pT), Some(cpt(pC, pT)),
          pT <= pC, pT >= pC - pSum),
        ("corpus", cW, cC, None: Option[Long], None: Option[Double],
          cT <= cC, cT >= cC - cSum))
        .toDF("part", "n_words", "n_chars_total", "n_tokens_total",
          "chars_per_token", "toks_le_chars", "toks_ge_floor")
        .orderBy(col("part").asc_nulls_first)
    }, Some(
      """WITH w AS (
        |  SELECT word, COUNT(*) AS freq
        |  FROM (SELECT unnest(list_filter(string_split(lower(text), ' '),
        |                x -> x <> '')) AS word FROM documents)
        |  GROUP BY word
        |  -- mirror the trainer's deterministic maxVocab head-cap so
        |  -- the contract holds past 2^22 distinct words
        |  ORDER BY freq DESC, word ASC LIMIT 4194304)
        |SELECT * FROM (
        |  SELECT 'planted' AS part, CAST(32 AS BIGINT) AS n_words,
        |    CAST(352 AS BIGINT) AS n_chars_total,
        |    CAST(32 AS BIGINT) AS n_tokens_total,
        |    CAST(11.0 AS DOUBLE) AS chars_per_token,
        |    TRUE AS toks_le_chars, TRUE AS toks_ge_floor
        |  UNION ALL
        |  SELECT 'corpus', CAST(SUM(freq) AS BIGINT),
        |    CAST(SUM(freq * length(word)) AS BIGINT),
        |    CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), TRUE, TRUE
        |  FROM w)
        |ORDER BY part ASC NULLS FIRST""".stripMargin)),

    // Curriculum staging: assign every document to one of 4 difficulty
    // stages by quartiles of a composite difficulty score (mean word
    // length — short-word docs first, the classic easy→hard ordering).
    // Scale shape: a GLOBAL ntile/percent_rank window would
    // single-partition the corpus; instead the three exact quartile
    // breakpoints are ONE aggregated row broadcast back, and the stage
    // is a codegen'd comparison — corpus scanned twice (once for
    // breakpoints, once to stage), zero wide shuffles on rows. The
    // exact-percentile interpolation matches DuckDB's QUANTILE_CONT
    // (the q_agg_percentile precedent); breakpoints round to 6dp
    // before comparison so both engines bucket identical doubles.
    Decl("q_llm_curriculum", (spark, dir) => {
      val ws = filter(split(lower(col("text")), " "), w => w =!= "")
      val scored = Tables(spark, dir, "documents")
        .withColumn("wsc", ws)
        .filter(size(col("wsc")) > 0)
        .withColumn("difficulty", round(
          aggregate(col("wsc"), lit(0L), (a, x) => a + length(x)).cast("double") /
            size(col("wsc")), 6))
        .select(col("doc_id"), col("source"), col("difficulty"))
      val brk = scored.agg(
        round(expr("percentile(difficulty, 0.25)"), 6).as("q1"),
        round(expr("percentile(difficulty, 0.5)"), 6).as("q2"),
        round(expr("percentile(difficulty, 0.75)"), 6).as("q3"))
      scored.crossJoin(broadcast(brk))
        .withColumn("stage",
          when(col("difficulty") <= col("q1"), 1)
            .when(col("difficulty") <= col("q2"), 2)
            .when(col("difficulty") <= col("q3"), 3)
            .otherwise(4))
        .groupBy(col("stage"))
        .agg(count(lit(1)).as("n_docs"),
          round(min(col("difficulty")), 6).as("d_min"),
          round(max(col("difficulty")), 6).as("d_max"))
        .orderBy(col("stage").asc_nulls_first)
    }, Some(
      """WITH s AS (
        |  SELECT doc_id, source,
        |    ROUND(CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
        |      / len(ws), 6) AS difficulty
        |  FROM (SELECT doc_id, source,
        |          list_filter(string_split(lower(text), ' '), x -> x <> '') AS ws
        |        FROM documents)
        |  WHERE len(ws) > 0),
        |b AS (SELECT ROUND(QUANTILE_CONT(difficulty, 0.25), 6) AS q1,
        |             ROUND(QUANTILE_CONT(difficulty, 0.5), 6) AS q2,
        |             ROUND(QUANTILE_CONT(difficulty, 0.75), 6) AS q3 FROM s)
        |SELECT CASE WHEN difficulty <= q1 THEN 1
        |            WHEN difficulty <= q2 THEN 2
        |            WHEN difficulty <= q3 THEN 3 ELSE 4 END AS stage,
        |  COUNT(*) AS n_docs,
        |  ROUND(MIN(difficulty), 6) AS d_min,
        |  ROUND(MAX(difficulty), 6) AS d_max
        |FROM s, b GROUP BY 1
        |ORDER BY stage ASC NULLS FIRST""".stripMargin)),

    // MMR (maximal marginal relevance) diversified retrieval: rank 5
    // results for query vec 0 trading relevance against redundancy,
    // mmr_i = 0.5 rel_i - 0.5 max_{j in S} sim(i, j) — the standard
    // post-ANN diversification step (near-duplicate hits shouldn't
    // fill the result page). Scale shape: relevance scoring + the
    // top-20 pool are fully distributed (one corpus scan, two-phase
    // top-k); the greedy selection is inherently sequential, runs on
    // the PROVABLY bounded 20-row pool driver-side (the k-means/PQ
    // trainer precedent), and ties break on vec_id. The declared
    // query oracles the greedy CONTRACT: the first pick is exactly
    // the relevance argmax (DuckDB recomputes top-1 cosine id+score
    // independently), each pick is the argmax of its step's marginals
    // under an INDEPENDENT re-derivation (`greedy_ok` — second cosine
    // spelling + redundancy set rebuilt from the emitted ranks, see
    // [[mmrRanks]]), and rounded MMR
    // scores are non-increasing from rank 2 down (`mono_ok` — exact:
    // a fixed candidate's redundancy max only grows as S grows; rank
    // 1→2 is exempt because rank 1's redundancy is DEFINED as 0 over
    // the empty set while rank 2's is a real cosine that may be
    // negative, lifting its marginal above rank 1's). Full
    // rank-2..5 ids stay engine-dependent → [[mmrRanks]] + Llm9Spec's
    // planted near-dup fixture.
    Decl("q_llm_mmr", (spark, dir) => {
      val picks = mmrRanks(spark, dir)
      import spark.implicits._
      picks.map { p =>
        (p.rank,
          if (p.rank == 1) Some(p.vecId) else None,
          if (p.rank == 1) Some(p.rel) else None,
          p.greedyOk, p.monoOk)
      }.toDF("rank", "top1_id", "top1_rel", "greedy_ok", "mono_ok")
        .orderBy(col("rank").asc_nulls_first)
    }, Some(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT e AS qe FROM e WHERE vec_id = 0),
        |sims AS (
        |  SELECT e.vec_id,
        |    ROUND(
        |      list_sum(list_transform(generate_series(1, len(qe)), i -> qe[i] * e[i]))
        |      / (sqrt(list_sum(list_transform(qe, x -> x * x)))
        |         * sqrt(list_sum(list_transform(e.e, x -> x * x)))), 6) AS rel
        |  FROM e CROSS JOIN q WHERE e.vec_id <> 0),
        |t1 AS (SELECT vec_id, rel FROM sims ORDER BY rel DESC, vec_id ASC LIMIT 1)
        |SELECT CAST(g.rank AS INTEGER) AS rank,
        |  CASE WHEN g.rank = 1 THEN t1.vec_id END AS top1_id,
        |  CASE WHEN g.rank = 1 THEN t1.rel END AS top1_rel,
        |  TRUE AS greedy_ok, TRUE AS mono_ok
        |FROM generate_series(1, 5) AS g(rank) CROSS JOIN t1
        |ORDER BY rank ASC NULLS FIRST""".stripMargin)))

  /** One greedy MMR pick (see the q_llm_mmr Decl for semantics). */
  final case class MmrPick(rank: Int, vecId: Long, rel: Double,
      mmr: Double, greedyOk: Boolean, monoOk: Boolean)

  /** The full greedy MMR selection over the distributed top-20
    * relevance pool — rank, picked vec, relevance, rounded MMR score,
    * plus the two measured contract booleans the declared query
    * emits. Llm9Spec asserts the planted-near-dup ordering on this
    * directly. */
  def mmrRanks(spark: SparkSession, dir: String): Seq[MmrPick] = {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val q = emb.filter(col("vec_id") === 0)
      .select(col("e").as("qe"))
    val scored = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .withColumn("rel",
        round(graft.functions.VecMath.cosineSim(col("qe"), col("e")), 6))
      .withColumn("g", lit(1))
    val pool = TopK.perGroup(scored, Seq(col("g")),
        Seq(col("rel").desc, col("vec_id").asc), 20, "rk")
      .select(col("vec_id"), col("rel"), col("e"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Double](2).toArray))

    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
    val remaining = scala.collection.mutable.ArrayBuffer(pool: _*)
    while (selected.size < 5 && remaining.nonEmpty) {
      val marginals = remaining.map { case (id, rel, e) =>
        val red = if (selected.isEmpty) 0.0
          else selected.map(s => cos(e, pool.find(_._1 == s.vecId).get._3)).max
        (id, rel, 0.5 * rel - 0.5 * red)
      }
      val best = marginals.minBy { case (id, _, m) => (-m, id) }
      val mmrRounded = math.rint(best._3 * 1e6) / 1e6
      selected += MmrPick(
        rank = selected.size + 1, vecId = best._1, rel = best._2,
        mmr = mmrRounded,
        greedyOk = false, // filled by the independent pass below
        // non-increasing holds exactly for rank >= 3 (see Decl doc);
        // rank 1 has no predecessor and rank 2's predecessor used the
        // empty-set red=0 convention, so both are vacuously true
        monoOk = selected.size + 1 <= 2 ||
          selected.lastOption.forall(_.mmr >= mmrRounded))
      remaining --= remaining.filter(_._1 == best._1)
    }

    // Independent greedy verification (ADVICE r15: the in-loop
    // "best >= all marginals" was true by construction). This pass
    // re-derives every step's marginals FROM SCRATCH off the final
    // pick list: a second cosine spelling (reversed summation order —
    // separate code path, same math) and a redundancy set rebuilt
    // from the emitted ranks, then checks the stored pick is the
    // argmax within 1e-9 (float-order tolerance; a selection bug —
    // wrong argmax, stale redundancy set, wrong pool — is off by far
    // more than summation-order noise). A flipped comparison or a
    // pick leaked from outside the step's remaining set now turns
    // greedy_ok false instead of being unfalsifiable.
    def cos2(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.foldRight(0.0)((i, acc) => acc + a(i) * b(i))
      val na = a.foldRight(0.0)((x, acc) => acc + x * x)
      val nb = b.foldRight(0.0)((x, acc) => acc + x * x)
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byId = pool.map(p => p._1 -> p).toMap
    selected.toSeq.map { p =>
      val prior = selected.filter(_.rank < p.rank).toSeq
      val priorIds = prior.map(_.vecId).toSet
      val stepPool = pool.filterNot(c => priorIds.contains(c._1))
      val marg = stepPool.map { case (id, rel, e) =>
        val red = if (prior.isEmpty) 0.0
          else prior.map(s => cos2(e, byId(s.vecId)._3)).max
        id -> (0.5 * rel - 0.5 * red)
      }.toMap
      val ok = marg.contains(p.vecId) &&
        marg.values.forall(m => marg(p.vecId) >= m - 1e-9)
      p.copy(greedyOk = ok)
    }
  }
}

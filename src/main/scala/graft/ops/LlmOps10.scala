package graft.ops

import graft.{Decl, Pack, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus curation diagnostics, block 10: tokenizer fertility,
  * cross-document repeated-span (substring-level) duplication, and the
  * one-pass per-source data card.
  *
  * Scale shapes: every aggregation is keyed on its natural analysis
  * key (lang / hash / source) with map-side partials; the span-dedup
  * corpus shuffle is keyed on the span's 8-byte xxhash64 (64-bit keys
  * shuffle far cheaper than 64-char strings; a collision only ever
  * ADDs a candidate, and candidates are re-confirmed on the raw span),
  * exactly as the exact-dedup family does.
  */
object LlmOps10 extends Pack {

  /** Words of `text` (empty tokens dropped). */
  private def words(c: Column) = filter(split(c, " "), w => w =!= "")

  def decls: Seq[Decl] = Seq(

    // Tokenizer fertility by language: characters per whitespace token
    // and per 4-chars-≈-1-BPE-token estimate. The per-language ratio is
    // what decides whether a tokenizer under-serves a language (high
    // fertility = more tokens per char of content). Ratios divide in
    // DOUBLE on both engines (the q_tpch_q1 AVG idiom) — they are
    // outputs, not filter boundaries.
    Decl("q_llm_fertility", (spark, dir) =>
      Tables(spark, dir, "documents")
        .select(col("lang"), length(col("text")).as("nc"),
          size(words(col("text"))).as("nw"),
          expr("(length(text) + 3) div 4").as("est"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("nw")).as("total_tokens"),
          sum(col("nc")).as("total_chars"),
          round(sum(col("nc")).cast("double") / sum(col("nw")).cast("double"), 4)
            .as("chars_per_token"),
          round(sum(col("nc")).cast("double") / sum(col("est")).cast("double"), 4)
            .as("chars_per_bpe"))
        .orderBy(col("lang").asc_nulls_first),
      Some(
        """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
          |  CAST(SUM(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS BIGINT) AS total_tokens,
          |  CAST(SUM(length(text)) AS BIGINT) AS total_chars,
          |  ROUND(CAST(SUM(length(text)) AS DOUBLE) /
          |    CAST(SUM(len(list_filter(string_split(text, ' '), w -> w <> ''))) AS DOUBLE), 4) AS chars_per_token,
          |  ROUND(CAST(SUM(length(text)) AS DOUBLE) /
          |    CAST(SUM((length(text) + 3) // 4) AS DOUBLE), 4) AS chars_per_bpe
          |FROM documents
          |GROUP BY lang
          |ORDER BY lang ASC NULLS FIRST""".stripMargin)),

    // Substring-level duplication (the Lee et al. "deduplicating
    // training data" failure mode exact-doc dedup misses): 64-char
    // spans at stride 32 — any ≥95-char shared region is guaranteed to
    // contain at least one aligned span — grouped cross-doc; a span in
    // 2+ distinct docs marks every carrying doc. Per source: affected
    // docs and duplicated-span instances. Shorter-than-64-char docs
    // contribute their whole text as one span (degenerates to exact
    // dedup, which is the right semantics there).
    Decl("q_llm_substrdedup", (spark, dir) => {
      val sp = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(1),
            greatest(length(col("text")) - 63, lit(1)), lit(32))).as("s"),
          col("text"))
        .select(col("doc_id"), col("source"),
          expr("substring(text, s, 64)").as("span"))
        .withColumn("h", xxhash64(col("span")))
      // the corpus-wide shuffle folds each span to its 8-byte xxhash64
      // (column pruning keeps raw spans out of this exchange); a hash
      // collision can only ADD a candidate, never drop one, so exact
      // semantics are restored by re-grouping the (small) candidate
      // subset on the raw span before counting
      val candHash = sp.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") > 1)
        .select(col("h"))
      val cand = sp.join(candHash, "h")
      val dupSpan = cand.groupBy(col("span"))
        .agg(countDistinct(col("doc_id")).as("nd2"))
        .filter(col("nd2") > 1)
        .select(col("span"))
      cand.join(dupSpan, "span")
        .groupBy(col("source"))
        .agg(countDistinct(col("doc_id")).as("n_docs_affected"),
          count(lit(1)).as("n_dup_instances"))
        .orderBy(col("source").asc_nulls_first)
    }, Some(
      """WITH sp AS (
        |  SELECT doc_id, source,
        |    substr(text, CAST(unnest(generate_series(1,
        |      greatest(length(text) - 63, 1), 32)) AS INTEGER), 64) AS span
        |  FROM documents),
        |dup AS (SELECT span FROM sp GROUP BY span
        |        HAVING COUNT(DISTINCT doc_id) > 1)
        |SELECT source,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_affected,
        |  CAST(COUNT(*) AS BIGINT) AS n_dup_instances
        |FROM sp JOIN dup USING (span)
        |GROUP BY source
        |ORDER BY source ASC NULLS FIRST""".stripMargin)),

    // Per-source data card: the one-table summary a dataset release
    // ships — doc/token volume, language spread, mean length, and
    // exact-duplicate redundancy — in two keyed aggregations (the
    // dedup rate needs its own (source, hash) reduction; everything
    // else rides one source-keyed pass; the 20-row join broadcasts).
    Decl("q_llm_datacard", (spark, dir) => {
      val base = Tables(spark, dir, "documents")
        .select(col("source"), col("lang"),
          length(col("text")).as("nc"), size(words(col("text"))).as("nw"),
          sha2(lower(trim(col("text"))).cast("binary"), 256).as("h"))
      val stats = base.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nw")).as("total_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          round(sum(col("nc")).cast("double") / count(lit(1)).cast("double"), 4)
            .as("avg_chars"))
      val dup = base.groupBy(col("source"), col("h"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("source"))
        .agg(sum(col("n") - 1).as("n_redundant"))
      stats.join(broadcast(dup), "source")
        .orderBy(col("source").asc_nulls_first)
    }, Some(
      """WITH base AS (
        |  SELECT source, lang, length(text) AS nc,
        |    len(list_filter(string_split(text, ' '), w -> w <> '')) AS nw,
        |    sha256(lower(trim(text))) AS h
        |  FROM documents),
        |stats AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(nw) AS BIGINT) AS total_tokens,
        |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |    ROUND(CAST(SUM(nc) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4) AS avg_chars
        |  FROM base GROUP BY source),
        |dup AS (
        |  SELECT source, CAST(SUM(n - 1) AS BIGINT) AS n_redundant
        |  FROM (SELECT source, h, COUNT(*) AS n FROM base GROUP BY source, h)
        |  GROUP BY source)
        |SELECT source, n_docs, total_tokens, n_langs, avg_chars, n_redundant
        |FROM stats JOIN dup USING (source)
        |ORDER BY source ASC NULLS FIRST""".stripMargin)),

    // Context-length planning: documents histogrammed by
    // floor(log2(est_tokens)) — the power-of-two buckets that decide
    // sequence-length tiers. The bucket is the binary-string length
    // (exact at boundaries in both engines, the q_evt_powerlaw trick).
    Decl("q_llm_contextlen", (spark, dir) =>
      Tables(spark, dir, "documents")
        .select(expr("(length(text) + 3) div 4").as("tok"))
        .select((length(bin(greatest(col("tok"), lit(1)))) - 1).cast("long").as("bucket"),
          col("tok"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("tok")).as("min_tokens"), max(col("tok")).as("max_tokens"),
          sum(col("tok")).as("total_tokens"))
        .orderBy(col("bucket").asc_nulls_first),
      Some(
        """SELECT CAST(length(bin(greatest(tok, 1))) - 1 AS BIGINT) AS bucket,
          |  COUNT(*) AS n_docs, MIN(tok) AS min_tokens, MAX(tok) AS max_tokens,
          |  CAST(SUM(tok) AS BIGINT) AS total_tokens
          |FROM (SELECT (length(text) + 3) // 4 AS tok FROM documents)
          |GROUP BY 1
          |ORDER BY bucket ASC NULLS FIRST""".stripMargin)),

    // Dataset version diff — the release-to-release audit: v2 drops
    // every 17th doc, rewrites every 13th, adds new ids for every
    // 29th. A full outer join on doc_id with content-hash comparison
    // classifies added / removed / changed / unchanged. One doc-keyed
    // shuffle per side; at 100 TB this is the standard
    // two-snapshot reconciliation (and the $changes changelog gives
    // the same answer without re-reading v1 when both live in the
    // catalog).
    Decl("q_llm_datasetdiff", (spark, dir) => {
      val v1 = Tables(spark, dir, "documents")
        .select(col("doc_id"), sha2(col("text"), 256).as("h1"))
      val base = Tables(spark, dir, "documents")
      val v2 = base.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          sha2(when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")), 256).as("h2"))
        .unionByName(base.filter(col("doc_id") % 29 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), sha2(col("text"), 256).as("h2")))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .select(when(col("h1").isNull, "added")
          .when(col("h2").isNull, "removed")
          .when(col("h1") === col("h2"), "unchanged")
          .otherwise("changed").as("status"))
        .groupBy(col("status")).agg(count(lit(1)).as("n"))
        .orderBy(col("status").asc_nulls_first)
    }, Some(
      """WITH v1 AS (SELECT doc_id, sha256(text) AS h1 FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |    sha256(CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END) AS h2
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, sha256(text) FROM documents WHERE doc_id % 29 = 0)
        |SELECT CASE WHEN h1 IS NULL THEN 'added'
        |            WHEN h2 IS NULL THEN 'removed'
        |            WHEN h1 = h2 THEN 'unchanged'
        |            ELSE 'changed' END AS status,
        |  COUNT(*) AS n
        |FROM v1 FULL OUTER JOIN v2 USING (doc_id)
        |GROUP BY 1
        |ORDER BY status ASC NULLS FIRST""".stripMargin)),

    // Multimodal RESIZE plumbing: binary payloads through the typed
    // mapPartitions batch shape a real image decoder plugs into (this
    // container has no image libs — the "resize" is a deterministic
    // 16-point grid subsample of the byte stream, so the oracle can
    // recompute it). What's real and under test: the schema, the
    // executor-side batch iteration, and the byte indexing arithmetic.
    Decl("q_llm_mmresize", (spark, dir) => {
      import spark.implicits._
      Tables(spark, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, p) =>
            val n = p.length
            val out = if (n == 0) Array.empty[Byte]
              else Array.tabulate(16)(i => p((i.toLong * n / 16).toInt))
            val sum = out.foldLeft(0L)((a, b) => a + (b.toInt & 0xff))
            (id, n.toLong, out.length.toLong, sum)
          }
        }
        .toDF("doc_id", "orig_bytes", "resized_px", "resized_sum")
        .orderBy(col("doc_id").asc_nulls_first)
    }, Some(
      """SELECT doc_id, length(text) AS orig_bytes,
        |  CASE WHEN length(text) = 0 THEN 0 ELSE 16 END AS resized_px,
        |  CASE WHEN length(text) = 0 THEN 0 ELSE
        |    CAST(list_sum(list_transform(range(0, 16),
        |      i -> unicode(substr(text, 1 + (i * length(text)) // 16, 1)))) AS BIGINT)
        |  END AS resized_sum
        |FROM documents
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin)),

    // Multimodal FRAME-SAMPLE plumbing: the payload read as 8-byte
    // "frames", keeping every 4th — the video-ingest batch shape
    // (decode → stride-sample → featurize downstream). The stub keeps
    // each sampled frame's first byte; the checksum proves the stride
    // arithmetic frame-exactly on both engines.
    Decl("q_llm_mmframes", (spark, dir) => {
      import spark.implicits._
      Tables(spark, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions { it =>
          it.map { case (id, p) =>
            val nFrames = p.length / 8
            val nSampled = (nFrames + 3) / 4
            var sum = 0L
            var j = 0
            while (j < nSampled) { sum += (p(j * 32).toInt & 0xff); j += 1 }
            (id, nFrames.toLong, nSampled.toLong, sum)
          }
        }
        .toDF("doc_id", "n_frames", "n_sampled", "sampled_sum")
        .orderBy(col("doc_id").asc_nulls_first)
    }, Some(
      """SELECT doc_id, length(text) // 8 AS n_frames,
        |  (length(text) // 8 + 3) // 4 AS n_sampled,
        |  CASE WHEN length(text) // 8 = 0 THEN 0 ELSE
        |    CAST(list_sum(list_transform(range(0, (length(text) // 8 + 3) // 4),
        |      j -> unicode(substr(text, 1 + j * 32, 1)))) AS BIGINT)
        |  END AS sampled_sum
        |FROM documents
        |ORDER BY doc_id ASC NULLS FIRST""".stripMargin)),

    // INCREMENTAL corpus dedup — the O(increment) shape a daily
    // 100 TB ingest needs: only the NEW commit's documents are read
    // (the `$changes` incremental scan touches just the files that
    // commit added), hashed, and joined against the historical
    // corpus's distinct-hash set (the snapshot-pinned state read).
    // Re-crawls are counted per language without ever re-reading the
    // old corpus's text twice or re-deduping the whole table. The
    // old-hash side is a hash-keyed shuffle join (NOT broadcast — at
    // corpus scale the history's hash set is itself huge).
    Decl("q_llm_incdedup", (spark, dir) => {
      val cname = s"graftinc${Integer.toHexString(dir.hashCode).takeRight(6)}"
      spark.conf.set(s"spark.sql.catalog.$cname", "graft.catalog.RelativeCatalog")
      spark.conf.set(s"spark.sql.catalog.$cname.warehouse", s"/tmp/graft_wh_$cname")
      spark.sql(s"DROP NAMESPACE IF EXISTS $cname.inc CASCADE")
      spark.sql(s"CREATE NAMESPACE $cname.inc")
      spark.sql(s"CREATE TABLE $cname.inc.docs (doc_id BIGINT, text STRING, lang STRING)")
      Tables(spark, dir, "documents").createOrReplaceTempView("docs_src_inc")
      spark.sql(s"INSERT INTO $cname.inc.docs " +
        "SELECT doc_id, text, lang FROM docs_src_inc WHERE doc_id % 3 = 0")
      val cata = spark.sessionState.catalogManager.catalog(cname)
        .asInstanceOf[graft.catalog.RelativeCatalog]
      val s1 = cata.loadTable(org.apache.spark.sql.connector.catalog.Identifier
          .of(Array("inc"), "docs"))
        .asInstanceOf[graft.catalog.GraftTable].meta.currentSnapshotId.get
      spark.sql(s"INSERT INTO $cname.inc.docs " +
        "SELECT doc_id, text, lang FROM docs_src_inc WHERE doc_id % 3 <> 0")
      val newDocs = spark.read.option("start-snapshot-id", s1.toString)
        .table(s"$cname.inc.`docs$$changes`")
        .filter(col("_change_type") === "insert")
        .select(col("lang"), sha2(lower(trim(col("text"))), 256).as("h"))
      val oldHashes = spark.sql(
          s"SELECT DISTINCT sha2(lower(trim(text)), 256) AS h " +
            s"FROM $cname.inc.docs VERSION AS OF $s1")
        .withColumn("is_old", lit(1))
      newDocs.join(oldHashes, Seq("h"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_new"),
          count(col("is_old")).as("n_dup_of_old"),
          countDistinct(when(col("is_old").isNull, col("h"))).as("n_unique_added"))
        .orderBy(col("lang").asc_nulls_first)
    }, Some(
      """WITH oldh AS (SELECT DISTINCT sha256(lower(trim(text))) AS h
        |              FROM documents WHERE doc_id % 3 = 0),
        |newd AS (SELECT lang, sha256(lower(trim(text))) AS h
        |         FROM documents WHERE doc_id % 3 <> 0)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_new,
        |  CAST(COUNT(o.h) AS BIGINT) AS n_dup_of_old,
        |  CAST(COUNT(DISTINCT CASE WHEN o.h IS NULL THEN n.h END) AS BIGINT)
        |    AS n_unique_added
        |FROM newd n LEFT JOIN oldh o ON n.h = o.h
        |GROUP BY lang
        |ORDER BY lang ASC NULLS FIRST""".stripMargin)))
}

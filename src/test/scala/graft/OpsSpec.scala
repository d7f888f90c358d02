package graft

import graft.ops.LlmOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-self-checked operators (the SURVEY §2 rows without a DuckDB
  * oracle): approx distinct error, MinHash recall on planted dups,
  * multimodal round-trip, file pruning effectiveness.
  */
class OpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("approx_count_distinct within 5% of exact (q_agg_hll)") {
    val approxRows = SparkEntry.queries("q_agg_hll")(spark, TestSpark.sf).collect()
    assert(approxRows.nonEmpty)
    val exact = Tables(spark, TestSpark.sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    approxRows.foreach { r =>
      val e = exact(r.getString(0)).toDouble
      val a = r.getAs[Long]("approx_orders").toDouble
      assert(math.abs(a - e) / e < 0.05, s"approx=$a exact=$e")
    }
  }

  test("sketch-union rollup within 5% of exact (q_agg_hll_merge)") {
    // the declared query now oracles the 5% bound as booleans; this
    // spec keeps the raw merged-estimate check against exact
    val inv = SparkEntry.queries("q_agg_hll_merge")(spark, TestSpark.sf).collect()
    assert(inv.nonEmpty && inv.forall(_.getBoolean(2)),
      "merged-sketch invariant rows not all true")
    val cells = Tables(spark, TestSpark.sf, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(hll_sketch_agg(col("l_orderkey")).as("sk"))
    val approxRows = cells.groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_orders"))
      .collect()
    assert(approxRows.nonEmpty)
    val exact = Tables(spark, TestSpark.sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    approxRows.foreach { r =>
      val e = exact(r.getString(0)).toDouble
      val a = r.getAs[Long]("approx_orders").toDouble
      assert(math.abs(a - e) / e < 0.05,
        s"merged-sketch estimate=$a exact=$e — union must not lose registers")
    }
  }

  test("approx_percentile within GK rank-error bound of exact (q_agg_approxpct)") {
    // the declared query now oracles the rank bound (booleans); this
    // spec keeps the sharper raw-value check against the exact sort
    val inv = SparkEntry.queries("q_agg_approxpct")(spark, TestSpark.sf).collect()
    assert(inv.nonEmpty && inv.forall(r =>
      r.getBoolean(2) && r.getBoolean(3)), "rank-bound invariant rows not all true")
    val approx = Tables(spark, TestSpark.sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("p50"),
        expr("approx_percentile(l_extendedprice, 0.99, 1000)").as("p99"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.nonEmpty)
    // accuracy=1000 → rank error <= 1/1000; verify the approx value's
    // true rank lands within 1% of the requested percentile (+ slop
    // for ties at the boundary value)
    val li = Tables(spark, TestSpark.sf, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    for ((flag, (p50, p99)) <- approx; vals = li(flag); n = vals.length.toDouble;
         (q, v) <- Seq(0.5 -> p50, 0.99 -> p99)) {
      val rankLo = vals.count(_ < v) / n
      val rankHi = vals.count(_ <= v) / n
      assert(rankLo - 0.011 <= q && q <= rankHi + 0.011,
        s"$flag q=$q value=$v true-rank=[$rankLo,$rankHi]")
    }
  }

  test("minhash candidates find planted exact and near duplicates") {
    // plant duplicates: copy 10 docs verbatim (ids +10000) and 10 docs
    // with one word altered (ids +20000); exact copies share every band
    // bucket by construction, near-copies should be caught by ≥1 band
    val base = Tables(spark, TestSpark.sf, "documents")
      .filter(col("doc_id") < 10).select(col("doc_id"), col("text"))
    val exactCopies = base.select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val nearCopies = base.select((col("doc_id") + 20000).as("doc_id"),
      regexp_replace(col("text"), "^\\S+", "changedword").as("text"))
    val corpus = base.unionByName(exactCopies).unionByName(nearCopies)
    val candidates = LlmOps.minhashPairsDf(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val missedExact = (0L until 10L).map(i => (i, i + 10000)).toSet -- candidates
    assert(missedExact.isEmpty, s"minhash missed exact dups: $missedExact")
    val nearFound = (0L until 10L).count(i => candidates.contains((i, i + 20000)))
    assert(nearFound >= 8, s"minhash found only $nearFound/10 near dups")
  }

  test("multimodal payload round-trips byte-exactly") {
    val rows = SparkEntry.queries("q_llm_multimodal")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("roundtrip_ok")))
  }

  test("partition-bounded scan prunes data files (SURVEY §4 file skipping)") {
    import org.apache.spark.sql.connector.catalog.Identifier
    // build the partitioned demo table (AQE off so the 150-row insert
    // isn't coalesced into a single file), then compare pruned counts
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries("q_scan_prune")(spark, TestSpark.sf).collect()
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val catName = s"graft${Integer.toHexString(TestSpark.sf.hashCode).takeRight(6)}"
    val cat = spark.sessionState.catalogManager.catalog(catName)
      .asInstanceOf[graft.catalog.RelativeCatalog]
    val tbl = cat.loadTable(Identifier.of(Array("demo_pr"), "cust"))
      .asInstanceOf[graft.catalog.GraftTable]
    val total = tbl.readSnapshot.get.files.size
    assert(total > 1, s"expected multiple files, got $total")

    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val builder = tbl.newScanBuilder(CaseInsensitiveStringMap.empty())
      .asInstanceOf[graft.catalog.GraftScanBuilder]
    val df = spark.table(s"$catName.demo_pr.cust").filter(col("c_nationkey") === 3)
    val exprs = df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case e: org.apache.spark.sql.catalyst.expressions.EqualTo => e })
    // drive the builder directly with the catalyst predicate
    builder.pushFilters(exprs.toSeq)
    val scan = builder.build()
    val scanned = scan.asInstanceOf[graft.catalog.GraftStreamableScan].batchDelegate
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
      .fileIndex.inputFiles.length
    assert(scanned < total, s"pruning did not reduce files: $scanned of $total")
    // and the pruned scan still returns exactly the right rows
    val expected = Tables(spark, TestSpark.sf, "customer")
      .filter(col("c_nationkey") === 3).count()
    assert(df.count() == expected)
  }

  test("engine hash functions are deterministic across runs") {
    // the declared query now oracles known-answer vectors + corpus
    // relations; raw per-row hash determinism is checked here directly
    def raw() = Tables(spark, TestSpark.sf, "part")
      .select(col("p_partkey"), xxhash64(col("p_name")),
        crc32(col("p_name").cast("binary")), hash(col("p_name"), col("p_brand")))
      .orderBy(col("p_partkey").asc_nulls_first)
      .collect().map(_.toString)
    val a = raw(); val b = raw()
    assert(a.nonEmpty && a.toSeq == b.toSeq)
    val decl = SparkEntry.queries("q_fn_hash_engine")(spark, TestSpark.sf).collect()
    assert(decl.length == 6 && decl.forall(r =>
      r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3)),
      "hash known-answer / corpus relations not all true")
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

package graft.ops

import graft.{Decl, Pack, Tables}
import org.apache.spark.sql.SparkSession

/** Catalog lifecycle procedures beyond the core DML/maintenance set —
  * the rest of the `CALL system.*` surface an Iceberg-style catalog
  * user expects (history navigation by time, lineage inspection,
  * zero-copy file import, disaster-recovery registration, CDC views).
  * Every flow here drives the SQL `CALL` path end-to-end (DSv2
  * ProcedureCatalog), not the Scala API, so the user-facing spelling
  * is what's verified.
  */
object CatalogOps2 extends Pack {

  private def cat(spark: SparkSession, dir: String): String = {
    val name = s"graft${Integer.toHexString(dir.hashCode).takeRight(6)}"
    spark.conf.set(s"spark.sql.catalog.$name", "graft.catalog.RelativeCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", s"/tmp/graft_wh_$name")
    name
  }

  private def freshNs(spark: SparkSession, c: String, ns: String): Unit = {
    spark.sql(s"DROP NAMESPACE IF EXISTS $c.$ns CASCADE")
    spark.sql(s"CREATE NAMESPACE $c.$ns")
  }

  private val runN = new java.util.concurrent.atomic.AtomicInteger(0)

  private def rmTree(p: String): Unit = {
    val root = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(root))
      java.nio.file.Files.walk(root)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.delete(f))
  }

  def decls: Seq[Decl] = Seq(

    // rollback_to_timestamp: "make the table read as it did at 9am" —
    // resolved through the snapshot LOG (what `main` pointed at), the
    // recovery spelling when all you know is when things were still
    // good, not which snapshot id that was.
    Decl("q_cat_rollback_ts", (spark, dir) => {
      val c = cat(spark, dir)
      freshNs(spark, c, "demo_rts")
      spark.sql(s"CREATE TABLE $c.demo_rts.o (o_orderkey BIGINT, o_totalprice DOUBLE)")
      Tables(spark, dir, "orders").createOrReplaceTempView("orders_src")
      spark.sql(s"INSERT INTO $c.demo_rts.o SELECT o_orderkey, o_totalprice FROM orders_src WHERE o_orderkey % 2 = 0")
      val cata = spark.sessionState.catalogManager.catalog(c)
        .asInstanceOf[graft.catalog.RelativeCatalog]
      val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("demo_rts"), "o")
      val t1 = cata.loadTable(ident).asInstanceOf[graft.catalog.GraftTable]
        .meta.currentSnapshot.get.timestampMs
      // the second commit must land in a LATER millisecond than t1 or
      // "current at t1" is ambiguous
      while (System.currentTimeMillis() <= t1) Thread.sleep(1)
      spark.sql(s"INSERT INTO $c.demo_rts.o SELECT o_orderkey + 1000000000, 0.0 FROM orders_src")
      spark.sql(s"CALL $c.system.rollback_to_timestamp(tbl => 'demo_rts.o', timestamp_ms => $t1)")
      spark.sql(graft.Dsl.expandOracle(
        s"""SELECT COUNT(*) AS n, D4SUM(o_totalprice) AS total
           |FROM $c.demo_rts.o""".stripMargin))
    }, Some(
      """SELECT COUNT(*) AS n, D4SUM(o_totalprice) AS total
        |FROM orders WHERE o_orderkey % 2 = 0""".stripMargin)),

    // ancestors_of: the lineage chain as a queryable result set. The
    // invariants are order-free (the compare sorts rows): 3 appends →
    // 3 ancestors, exactly one root (no parent), and every non-root's
    // parent_id resolves to another chain member (2 links in a
    // 3-chain) — a broken or cyclic walk can't fake all three.
    Decl("q_cat_ancestors", (spark, dir) => {
      val c = cat(spark, dir)
      freshNs(spark, c, "demo_anc")
      spark.sql(s"CREATE TABLE $c.demo_anc.n (n_nationkey INT, n_name STRING)")
      Tables(spark, dir, "nation").createOrReplaceTempView("nation_src")
      spark.sql(s"INSERT INTO $c.demo_anc.n SELECT n_nationkey, n_name FROM nation_src WHERE n_nationkey % 3 = 0")
      spark.sql(s"INSERT INTO $c.demo_anc.n SELECT n_nationkey, n_name FROM nation_src WHERE n_nationkey % 3 = 1")
      spark.sql(s"INSERT INTO $c.demo_anc.n SELECT n_nationkey, n_name FROM nation_src WHERE n_nationkey % 3 = 2")
      // the chain is metadata-scale (retained-snapshot count) — compute
      // the invariants driver-side like the other catalog queries; a
      // self-join of the CALL's CommandResult view trips Spark's
      // attribute dedup inside a scalar subquery
      val rows = spark.sql(s"CALL $c.system.ancestors_of(tbl => 'demo_anc.n')").collect()
      val ids = rows.map(_.getLong(0)).toSet
      val nLinked = rows.count(r => !r.isNullAt(1) && ids(r.getLong(1)))
      val nAppends = rows.count(_.getString(3) == "append")
      val nRoots = rows.count(_.isNullAt(1))
      spark.sql(
        s"""SELECT CAST(${rows.length} AS BIGINT) AS n_ancestors,
           |  CAST($nAppends AS BIGINT) AS n_appends,
           |  CAST($nRoots AS BIGINT) AS n_roots,
           |  CAST($nLinked AS BIGINT) AS n_linked""".stripMargin)
    }, Some(
      """SELECT CAST(3 AS BIGINT) AS n_ancestors, CAST(3 AS BIGINT) AS n_appends,
        |  CAST(1 AS BIGINT) AS n_roots, CAST(2 AS BIGINT) AS n_linked""".stripMargin)),

    // add_files: zero-copy import of externally produced parquet into
    // a partitioned table — one metadata commit, row counts and
    // partition values from parquet FOOTERS (the data is never
    // scanned, so onboarding 100 TB costs O(files) footer reads, not a
    // rewrite). The oracle then reads the table: import must be
    // exact-once and partition metadata correct (a wrong partition
    // stamp would mis-prune the grouped read).
    Decl("q_cat_addfiles", (spark, dir) => {
      import org.apache.spark.sql.functions.col
      val c = cat(spark, dir)
      freshNs(spark, c, "demo_addf")
      spark.sql(s"CREATE TABLE $c.demo_addf.cust (c_custkey BIGINT, c_nationkey INT, c_acctbal DOUBLE) " +
        "PARTITIONED BY (c_nationkey)")
      val staging = s"staging_addf_${runN.incrementAndGet()}"
      val stagingAbs = s"/tmp/graft_wh_$c/$staging"
      rmTree(stagingAbs)
      val src = Tables(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      // partition-clustered files, full schema in every file (hive-style
      // column-dropping layouts are rejected by design — the scan reads
      // files by schema, and a footer can't bound a missing column)
      for (nk <- 0 until 5)
        src.filter(col("c_nationkey") === nk).coalesce(1)
          .write.mode("append").parquet(stagingAbs)
      spark.sql(s"CALL $c.system.add_files(tbl => 'demo_addf.cust', source_dir => '$staging')")
      spark.sql(graft.Dsl.expandOracle(
        s"""SELECT c_nationkey, COUNT(*) AS n, D4SUM(c_acctbal) AS total
           |FROM $c.demo_addf.cust
           |WHERE c_nationkey BETWEEN 1 AND 3
           |GROUP BY c_nationkey
           |ORDER BY c_nationkey ASC NULLS FIRST""".stripMargin))
    }, Some(
      """SELECT c_nationkey, COUNT(*) AS n, D4SUM(c_acctbal) AS total
        |FROM customer WHERE c_nationkey BETWEEN 1 AND 3
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey ASC NULLS FIRST""".stripMargin)),

    // migrate: one-call adoption of a raw parquet directory — schema
    // inferred from footers, table created, files imported zero-copy.
    // The oracle reads the same fixture directly: migrate must be a
    // pure re-housing, never a rewrite.
    Decl("q_cat_migrate", (spark, dir) => {
      import org.apache.spark.sql.functions.col
      val c = cat(spark, dir)
      freshNs(spark, c, "demo_mig")
      val staging = s"landing_mig_${runN.incrementAndGet()}"
      val stagingAbs = s"/tmp/graft_wh_$c/$staging"
      rmTree(stagingAbs)
      Tables(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
        .coalesce(2).write.parquet(stagingAbs)
      spark.sql(s"CALL $c.system.migrate(source_dir => '$staging', tbl => 'demo_mig.supp')")
      spark.sql(graft.Dsl.expandOracle(
        s"""SELECT s_nationkey, COUNT(*) AS n, D4SUM(s_acctbal) AS total
           |FROM $c.demo_mig.supp
           |GROUP BY s_nationkey
           |ORDER BY s_nationkey ASC NULLS FIRST""".stripMargin))
    }, Some(
      """SELECT s_nationkey, COUNT(*) AS n, D4SUM(s_acctbal) AS total
        |FROM supplier
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey ASC NULLS FIRST""".stripMargin)),

    // register_table: the catalog DATABASE is lost, the warehouse
    // directory survived — a fresh JDBC catalog over the same files
    // re-adopts the table from its latest metadata file with one
    // pointer INSERT (nothing on disk is rewritten), and reads resume.
    Decl("q_cat_register", (spark, dir) => {
      val run = s"${Integer.toHexString(dir.hashCode).takeRight(6)}r${runN.incrementAndGet()}"
      val wh = s"/tmp/graft_wh_reg_$run"
      val dbA = s"/tmp/graft_db_rega_$run"
      val dbB = s"/tmp/graft_db_regb_$run"
      Seq(wh, dbA, dbB).foreach(rmTree)
      val ca = s"grega$run"
      spark.conf.set(s"spark.sql.catalog.$ca", "graft.catalog.JdbcRelativeCatalog")
      spark.conf.set(s"spark.sql.catalog.$ca.warehouse", wh)
      spark.conf.set(s"spark.sql.catalog.$ca.uri", s"jdbc:derby:$dbA;create=true")
      spark.sql(s"CREATE NAMESPACE $ca.reg")
      spark.sql(s"CREATE TABLE $ca.reg.s (s_suppkey BIGINT, s_nationkey INT, s_acctbal DOUBLE)")
      Tables(spark, dir, "supplier").createOrReplaceTempView("supplier_src")
      spark.sql(s"INSERT INTO $ca.reg.s SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier_src")
      // catalog-db loss: the NEW catalog knows nothing; the latest
      // metadata file is found by its version-counter filename
      val latest = new java.io.File(s"$wh/reg/s/metadata").listFiles()
        .map(_.getName).filter(_.endsWith(".metadata.json"))
        .maxBy(n => n.stripPrefix("v").takeWhile(_.isDigit).toInt)
      val cb = s"gregb$run"
      spark.conf.set(s"spark.sql.catalog.$cb", "graft.catalog.JdbcRelativeCatalog")
      spark.conf.set(s"spark.sql.catalog.$cb.warehouse", wh)
      spark.conf.set(s"spark.sql.catalog.$cb.uri", s"jdbc:derby:$dbB;create=true")
      spark.sql(s"CREATE NAMESPACE $cb.reg")
      spark.sql(s"CALL $cb.system.register_table(tbl => 'reg.s', " +
        s"metadata_location => 'reg/s/metadata/$latest')")
      spark.sql(graft.Dsl.expandOracle(
        s"""SELECT s_nationkey, COUNT(*) AS n, D4SUM(s_acctbal) AS total
           |FROM $cb.reg.s
           |GROUP BY s_nationkey
           |ORDER BY s_nationkey ASC NULLS FIRST""".stripMargin))
    }, Some(
      """SELECT s_nationkey, COUNT(*) AS n, D4SUM(s_acctbal) AS total
        |FROM supplier
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey ASC NULLS FIRST""".stripMargin)),

    // snapshot: the zero-copy dev copy. The copy diverges (an extra
    // insert lands only in it) and the SOURCE must read back
    // byte-identical — the isolation contract a team cloning a 100 TB
    // table for experiments actually depends on (no bytes copied:
    // the copy's initial snapshot references the source's files).
    Decl("q_cat_snapshot", (spark, dir) => {
      val c = cat(spark, dir)
      freshNs(spark, c, "demo_snp")
      spark.sql(s"CREATE TABLE $c.demo_snp.src (p_partkey BIGINT, p_retailprice DOUBLE)")
      Tables(spark, dir, "part").createOrReplaceTempView("part_src")
      spark.sql(s"INSERT INTO $c.demo_snp.src SELECT p_partkey, p_retailprice FROM part_src")
      spark.sql(s"CALL $c.system.snapshot(source_tbl => 'demo_snp.src', tbl => 'demo_snp.dev')")
      // the copy diverges; the source must not see it
      spark.sql(s"INSERT INTO $c.demo_snp.dev SELECT p_partkey + 5000000, 1.0 FROM part_src WHERE p_partkey % 100 = 0")
      spark.sql(graft.Dsl.expandOracle(
        s"""SELECT
           |  (SELECT COUNT(*) FROM $c.demo_snp.src) AS src_n,
           |  (SELECT D4SUM(p_retailprice) FROM $c.demo_snp.src) AS src_total,
           |  (SELECT COUNT(*) FROM $c.demo_snp.dev) AS dev_n""".stripMargin))
    }, Some(
      """SELECT
        |  (SELECT COUNT(*) FROM part) AS src_n,
        |  (SELECT D4SUM(p_retailprice) FROM part) AS src_total,
        |  (SELECT COUNT(*) + COUNT(*) FILTER (WHERE p_partkey % 100 = 0) FROM part) AS dev_n""".stripMargin)),

    // write-audit-publish by id: the odd half of orders is written
    // STAGED under spark.wap.id (invisible — the count the auditor's
    // gate sees is still the even half), audited via VERSION AS OF,
    // then published exactly-once by CALL publish_changes. The oracle
    // pins all three states cross-engine: visible-while-staged count,
    // audited staged count, and the published total.
    Decl("q_cat_wap", (spark, dir) => {
      val c = cat(spark, dir)
      freshNs(spark, c, "demo_wap")
      spark.sql(s"CREATE TABLE $c.demo_wap.t (o_orderkey BIGINT, o_totalprice DOUBLE) " +
        "TBLPROPERTIES ('write.wap.enabled'='true')")
      Tables(spark, dir, "orders").createOrReplaceTempView("orders_wap")
      spark.sql(s"INSERT INTO $c.demo_wap.t " +
        "SELECT o_orderkey, o_totalprice FROM orders_wap WHERE o_orderkey % 2 = 0")
      spark.conf.set("spark.wap.id", "w-load")
      val (stagedVisible, auditN) = try {
        spark.sql(s"INSERT INTO $c.demo_wap.t " +
          "SELECT o_orderkey, o_totalprice FROM orders_wap WHERE o_orderkey % 2 = 1")
        val vis = spark.sql(s"SELECT COUNT(*) FROM $c.demo_wap.t")
          .collect()(0).getLong(0)
        val sid = spark.sql(s"CALL $c.system.publish_changes(" +
          "tbl => 'demo_wap.t', wap_id => 'w-load')").collect()(0).getLong(0)
        // the auditor's read of the staged snapshot, pre-publish shape
        // (VERSION AS OF the staged id still resolves after publish)
        val audit = spark.sql(
          s"SELECT COUNT(*) FROM $c.demo_wap.t VERSION AS OF $sid")
          .collect()(0).getLong(0)
        (vis, audit)
      } finally spark.conf.unset("spark.wap.id")
      spark.sql(graft.Dsl.expandOracle(
        s"""SELECT
           |  CAST($stagedVisible AS BIGINT) AS staged_visible,
           |  CAST($auditN AS BIGINT) AS audited_n,
           |  (SELECT COUNT(*) FROM $c.demo_wap.t) AS published_n,
           |  (SELECT D4SUM(o_totalprice) FROM $c.demo_wap.t) AS total""".stripMargin))
    }, Some(
      """SELECT
        |  (SELECT COUNT(*) FROM orders WHERE o_orderkey % 2 = 0) AS staged_visible,
        |  (SELECT COUNT(*) FROM orders) AS audited_n,
        |  (SELECT COUNT(*) FROM orders) AS published_n,
        |  (SELECT D4SUM(o_totalprice) FROM orders) AS total""".stripMargin)),

    // create_changelog_view: the CDC read packaged as a named view so
    // downstream SQL (audits, incremental syncs) can query per-commit
    // insert/delete rows without knowing the `t$changes` spelling.
    // Same ground truth as q_scan_changelog, driven through the view.
    Decl("q_cat_changelog_view", (spark, dir) => {
      import org.apache.spark.sql.functions.col
      val c = cat(spark, dir)
      freshNs(spark, c, "demo_clv")
      spark.sql(s"CREATE TABLE $c.demo_clv.reg (r_regionkey INT, r_name STRING)")
      Tables(spark, dir, "region").createOrReplaceTempView("region_src")
      spark.sql(s"INSERT INTO $c.demo_clv.reg SELECT * FROM region_src")           // seq 1
      spark.sql(s"DELETE FROM $c.demo_clv.reg WHERE r_regionkey >= 3")             // seq 2
      spark.sql(s"INSERT INTO $c.demo_clv.reg SELECT * FROM region_src WHERE r_regionkey = 4") // seq 3
      val view = s"clv_changes_${runN.incrementAndGet()}"
      spark.sql(s"CALL $c.system.create_changelog_view(tbl => 'demo_clv.reg', " +
        s"view_name => '$view', start_snapshot_id => 1)")
      spark.table(view)
        .orderBy(col("_change_ordinal").asc_nulls_first, col("_change_type").asc_nulls_first,
          col("r_regionkey").asc_nulls_first, col("r_name").asc_nulls_first)
    }, Some(
      """SELECT r_regionkey, r_name, 'delete' AS _change_type, 1 AS _change_ordinal
        |FROM region WHERE r_regionkey >= 3
        |UNION ALL
        |SELECT r_regionkey, r_name, 'insert', 2 FROM region WHERE r_regionkey = 4
        |ORDER BY _change_ordinal ASC NULLS FIRST, _change_type ASC NULLS FIRST,
        |  r_regionkey ASC NULLS FIRST, r_name ASC NULLS FIRST""".stripMargin)),

    // merge-schema ingest: an evolving pipeline appends a frame with a
    // column the table has never seen; the table follows metadata-only
    // (fresh field id, nullable) and pre-existing rows read NULL. The
    // oracle pins row counts and the new column's population/sum.
    Decl("q_cat_mergeschema", (spark, dir) => {
      import org.apache.spark.sql.functions.col
      val c = cat(spark, dir)
      freshNs(spark, c, "demo_ms")
      spark.sql(s"CREATE TABLE $c.demo_ms.o (o_orderkey BIGINT) " +
        "TBLPROPERTIES ('write.merge-schema'='true')")
      val src = Tables(spark, dir, "orders")
      src.filter(col("o_orderkey") % 2 === 0).select(col("o_orderkey"))
        .writeTo(s"$c.demo_ms.o").append()
      src.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_totalprice"))
        .writeTo(s"$c.demo_ms.o").option("merge-schema", "true").append()
      spark.sql(graft.Dsl.expandOracle(
        s"""SELECT COUNT(*) AS n_all, COUNT(o_totalprice) AS n_priced,
           |  D4SUM(o_totalprice) AS total
           |FROM $c.demo_ms.o""".stripMargin))
    }, Some(
      """SELECT COUNT(*) AS n_all,
        |  COUNT(*) FILTER (WHERE o_orderkey % 2 = 1) AS n_priced,
        |  D4SUM(CASE WHEN o_orderkey % 2 = 1 THEN o_totalprice END) AS total
        |FROM orders""".stripMargin)),

    // create_changelog_view(compute_updates): the per-commit
    // delete+insert pairs of an UPDATE refined into
    // update_preimage/update_postimage rows keyed by the identifier
    // column, with copy-on-write carry-over pairs cancelled first.
    // The oracle pins count AND value per image side: preimages carry
    // the OLD price, postimages the price after +1.
    Decl("q_cat_changelog_updates", (spark, dir) => {
      val c = cat(spark, dir)
      freshNs(spark, c, "demo_upd")
      spark.sql(s"CREATE TABLE $c.demo_upd.p (p_partkey BIGINT, p_retailprice DOUBLE)")
      Tables(spark, dir, "part").createOrReplaceTempView("part_upd")
      spark.sql(s"INSERT INTO $c.demo_upd.p SELECT p_partkey, p_retailprice FROM part_upd")
      spark.sql(s"UPDATE $c.demo_upd.p SET p_retailprice = p_retailprice + 1 " +
        "WHERE p_partkey % 10 = 0")
      val view = s"upd_changes_${runN.incrementAndGet()}"
      spark.sql(s"CALL $c.system.create_changelog_view(tbl => 'demo_upd.p', " +
        s"view_name => '$view', start_snapshot_id => 1, identifier_columns => 'p_partkey')")
      spark.sql(graft.Dsl.expandOracle(
        s"""SELECT _change_type, COUNT(*) AS n, D4SUM(p_retailprice) AS total
           |FROM $view
           |GROUP BY _change_type
           |ORDER BY _change_type ASC NULLS FIRST""".stripMargin))
    }, Some(
      """SELECT 'update_postimage' AS _change_type, COUNT(*) AS n,
        |  D4SUM(p_retailprice + 1) AS total
        |FROM part WHERE p_partkey % 10 = 0
        |UNION ALL
        |SELECT 'update_preimage', COUNT(*), D4SUM(p_retailprice)
        |FROM part WHERE p_partkey % 10 = 0
        |ORDER BY _change_type ASC NULLS FIRST""".stripMargin)),
  )
}

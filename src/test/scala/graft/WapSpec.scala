package graft

import graft.catalog.Maintenance
import org.apache.spark.sql.connector.catalog.Identifier
import org.scalatest.funsuite.AnyFunSuite

/** Write-audit-publish by id (Iceberg's `spark.wap.id` +
  * `publish_changes`) and the streaming-lineage guarantee it depends
  * on: snapshots outside main lineage (branch writes, WAP stages)
  * share the table's sequence space but must never reach a main-table
  * reader — batch, stream, or `$changes` — until published.
  */
class WapSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshWh(name: String): String = {
    val wh = s"/tmp/graft_test_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    spark.conf.set(s"spark.sql.catalog.$name", "graft.catalog.RelativeCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    wh
  }

  private def gt(cat: String, ns: String, t: String): graft.catalog.GraftTable =
    spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.catalog.RelativeCatalog]
      .loadTable(Identifier.of(Array(ns), t))
      .asInstanceOf[graft.catalog.GraftTable]

  private def count(t: String): Long =
    spark.sql(s"SELECT COUNT(*) FROM $t").collect()(0).getLong(0)

  test("wap.id staging: invisible until publish; auditable by VERSION AS OF; publish exactly-once") {
    freshWh("tcWapA")
    spark.sql("CREATE NAMESPACE tcWapA.w")
    spark.sql("CREATE TABLE tcWapA.w.t (id BIGINT) " +
      "TBLPROPERTIES ('write.wap.enabled'='true')")
    spark.sql("INSERT INTO tcWapA.w.t SELECT id FROM range(50)")

    spark.conf.set("spark.wap.id", "audit-1")
    try {
      spark.sql("INSERT INTO tcWapA.w.t SELECT id FROM range(50, 80)")
    } finally spark.conf.unset("spark.wap.id")

    // staged: the table (and its history log) did not move
    assert(count("tcWapA.w.t") == 50, "staged write leaked into the table")
    val meta = gt("tcWapA", "w", "t").meta
    val staged = meta.snapshots.filter(_.summary.get("wap.id").contains("audit-1"))
    assert(staged.size == 1 && meta.currentSnapshotId != Some(staged.head.snapshotId))
    assert(meta.snapshotLog.size == 1, "staging must not enter the snapshot log")
    // ...but the auditor can read it by id
    assert(spark.sql(
      s"SELECT COUNT(*) FROM tcWapA.w.t VERSION AS OF ${staged.head.snapshotId}")
      .collect()(0).getLong(0) == 80)
    // and CDC (changes strictly after the first commit) sees only
    // main history: nothing until the publish
    val firstSnap = meta.snapshots.minBy(_.sequenceNumber).snapshotId
    def changes(): Long = spark.read.option("start-snapshot-id", firstSnap)
      .table("tcWapA.w.`t$changes`").count()
    assert(changes() == 0, "a staged snapshot leaked into $changes")

    // fast publish: main unmoved -> metadata-only set-current
    val out = spark.sql(
      "CALL tcWapA.system.publish_changes(tbl => 'w.t', wap_id => 'audit-1')")
      .collect()(0)
    assert(out.getLong(0) == staged.head.snapshotId &&
      out.getLong(1) == staged.head.snapshotId)
    assert(count("tcWapA.w.t") == 80)
    assert(changes() == 30)

    // exactly-once: a second publish of the same id is refused
    val e = intercept[Exception] {
      spark.sql("CALL tcWapA.system.publish_changes(tbl => 'w.t', wap_id => 'audit-1')")
        .collect()
    }
    assert(e.getMessage.contains("already published"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("CALL tcWapA.system.publish_changes(tbl => 'w.t', wap_id => 'nope')")
        .collect()
    }
    assert(e2.getMessage.contains("no snapshot staged"), e2.getMessage)

    // without write.wap.enabled the session wap id is inert
    spark.sql("CREATE TABLE tcWapA.w.plain (id BIGINT)")
    spark.conf.set("spark.wap.id", "audit-2")
    try spark.sql("INSERT INTO tcWapA.w.plain SELECT id FROM range(7)")
    finally spark.conf.unset("spark.wap.id")
    assert(count("tcWapA.w.plain") == 7)
  }

  test("publish onto a moved main: appends cherry-pick, row-level stages are refused") {
    freshWh("tcWapB")
    spark.sql("CREATE NAMESPACE tcWapB.w")
    spark.sql("CREATE TABLE tcWapB.w.t (id BIGINT) " +
      "TBLPROPERTIES ('write.wap.enabled'='true')")
    spark.sql("INSERT INTO tcWapB.w.t SELECT id FROM range(50)")

    // stage an append AND a row-level delete under two wap ids
    spark.conf.set("spark.wap.id", "addA")
    try spark.sql("INSERT INTO tcWapB.w.t SELECT id FROM range(100, 110)")
    finally spark.conf.unset("spark.wap.id")
    spark.conf.set("spark.wap.id", "delB")
    try spark.sql("DELETE FROM tcWapB.w.t WHERE id < 10")
    finally spark.conf.unset("spark.wap.id")
    assert(count("tcWapB.w.t") == 50)

    // main moves past both stages
    spark.sql("INSERT INTO tcWapB.w.t SELECT id FROM range(50, 60)")
    assert(count("tcWapB.w.t") == 60)

    // the staged APPEND publishes via cherry-pick re-append
    spark.sql("CALL tcWapB.system.publish_changes(tbl => 'w.t', wap_id => 'addA')")
      .collect()
    assert(count("tcWapB.w.t") == 70)
    val head = gt("tcWapB", "w", "t").readSnapshot.get
    assert(head.summary.get("published-wap-id").contains("addA"))
    assert(head.summary.contains("cherry-picked-snapshot-id"))
    // exactly-once holds across the cherry-pick spelling too
    val e0 = intercept[Exception] {
      spark.sql("CALL tcWapB.system.publish_changes(tbl => 'w.t', wap_id => 'addA')")
        .collect()
    }
    assert(e0.getMessage.contains("already published"), e0.getMessage)

    // the staged DELETE has no position-independent meaning on the
    // moved base: refused loudly, never silently misapplied
    val e = intercept[Exception] {
      spark.sql("CALL tcWapB.system.publish_changes(tbl => 'w.t', wap_id => 'delB')")
        .collect()
    }
    assert(e.getMessage.contains("only append snapshots"), e.getMessage)
    assert(count("tcWapB.w.t") == 70)
  }

  test("concurrent stagers, publishers, and writers: every publish lands exactly once") {
    freshWh("tcWapE")
    spark.sql("CREATE NAMESPACE tcWapE.w")
    spark.sql("CREATE TABLE tcWapE.w.t (id BIGINT) " +
      "TBLPROPERTIES ('write.wap.enabled'='true')")
    spark.sql("INSERT INTO tcWapE.w.t SELECT id FROM range(50)")

    // 4 stage+publish pipelines (each in its OWN session — spark.wap.id
    // is session state) racing 4 plain writers; some publishes will hit
    // an unmoved base (set-current), some a moved one (cherry-pick).
    // newSession() starts from the shared initial conf, so each session
    // re-registers the catalog (same class + warehouse = same tables).
    def sess() = {
      val s = spark.newSession()
      s.conf.set("spark.sql.catalog.tcWapE", "graft.catalog.RelativeCatalog")
      s.conf.set("spark.sql.catalog.tcWapE.warehouse", "/tmp/graft_test_tcWapE")
      s
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads =
      (0 until 4).map { i =>
        new Thread(() => {
          try {
            val s = sess()
            s.conf.set("spark.wap.id", s"wap-$i")
            try s.sql(s"INSERT INTO tcWapE.w.t SELECT id FROM range(${1000 + i * 10}, ${1010 + i * 10})")
            finally s.conf.unset("spark.wap.id")
            s.sql(s"CALL tcWapE.system.publish_changes(tbl => 'w.t', wap_id => 'wap-$i')")
              .collect()
          } catch { case t: Throwable => errs.add(t) }
        })
      } ++ (0 until 4).map { i =>
        new Thread(() => {
          try {
            sess().sql(s"INSERT INTO tcWapE.w.t SELECT id FROM range(${2000 + i * 5}, ${2005 + i * 5})")
          } catch { case t: Throwable => errs.add(t) }
        })
      }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"${errs.size} failures, first: ${Option(errs.peek())}")

    // exact final state: base + 4 staged-and-published + 4 plain
    assert(count("tcWapE.w.t") == 50 + 40 + 20)
    // each wap id on main lineage EXACTLY once (either spelling)
    val lineage = gt("tcWapE", "w", "t").meta.mainLineage
    for (i <- 0 until 4) {
      val hits = lineage.count(s =>
        s.summary.get("wap.id").contains(s"wap-$i") ||
          s.summary.get("published-wap-id").contains(s"wap-$i"))
      assert(hits == 1, s"wap-$i appears $hits times on main lineage")
    }
  }

  test("streaming a BRANCH tails audit commits only; main commits stay out of it") {
    freshWh("tcWapF")
    import spark.implicits._
    spark.sql("CREATE NAMESPACE tcWapF.w")
    spark.sql("CREATE TABLE tcWapF.w.t (id BIGINT)")
    spark.sql("INSERT INTO tcWapF.w.t SELECT id FROM range(10)")
    Maintenance.appendToBranch(gt("tcWapF", "w", "t"),
      (100L until 130L).toDF("id"), "audit")

    val q = spark.readStream.option("branch", "audit").table("tcWapF.w.t")
      .writeStream.format("memory").queryName("audit_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // the branch tail = shared prefix (10) + the audit batch (30)
      assert(spark.table("audit_tail").count() == 40)

      // a MAIN commit must not show up in the branch tail...
      spark.sql("INSERT INTO tcWapF.w.t SELECT id FROM range(10, 20)")
      q.processAllAvailable()
      assert(spark.table("audit_tail").count() == 40,
        "a main commit leaked into the branch tail")
      // ...but a new audit batch does
      Maintenance.appendToBranch(gt("tcWapF", "w", "t"),
        (130L until 140L).toDF("id"), "audit")
      q.processAllAvailable()
      assert(spark.table("audit_tail").count() == 50)
    } finally {
      q.stop()
      spark.catalog.dropTempView("audit_tail")
    }

    // tags and unknown refs are refused loudly
    spark.sql("CALL tcWapF.system.create_ref(tbl => 'w.t', ref => 'v1', ref_type => 'tag')")
    val qt = spark.readStream.option("branch", "v1").table("tcWapF.w.t")
      .writeStream.format("memory").queryName("tag_tail")
      .outputMode("append").start()
    try {
      val e = intercept[Exception] { qt.processAllAvailable() }
      assert(e.getMessage.contains("tag"), e.getMessage)
    } finally {
      qt.stop()
      spark.catalog.dropTempView("tag_tail")
    }
  }

  test("resuming a stream across an expiry gap fails loudly instead of dropping rows") {
    val wh = freshWh("tcWapD")
    spark.sql("CREATE NAMESPACE tcWapD.w")
    spark.sql("CREATE TABLE tcWapD.w.t (id BIGINT)")
    spark.sql("INSERT INTO tcWapD.w.t SELECT id FROM range(10)")
    val ckpt = s"$wh/_ckpt"
    val seen = new java.util.concurrent.atomic.AtomicLong
    def start() = spark.readStream.table("tcWapD.w.t")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => {
        seen.addAndGet(df.count()); ()
      }).start()
    val q = start()
    q.processAllAvailable()
    q.stop()
    assert(seen.get() == 10)

    // while the stream is down: three more commits, then expiry drops
    // the middle of the lineage the checkpointed offset still owes
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO tcWapD.w.t SELECT id FROM range(${i * 10}, ${i * 10 + 10})"))
    Maintenance.expireSnapshots(gt("tcWapD", "w", "t").ops, keepLast = 1)

    // resuming must FAIL (sequence gap below the retained head proves
    // expired history in the owed window), never silently skip seq 2-3
    val q2 = start()
    val e = intercept[Exception] { q2.processAllAvailable() }
    assert(e.getMessage.contains("retention must cover streaming lag"),
      s"unexpected: ${e.getMessage}")
    q2.stop()
    assert(seen.get() == 10, "rows were delivered across the expiry gap")

    // ...but a FRESH stream (new checkpoint, offset 0) on the same
    // aged table must start fine: it owes nothing before the retained
    // lineage. Refusing here would make every long-lived table
    // permanently unstreamable after its first expiry.
    val freshSeen = new java.util.concurrent.atomic.AtomicLong
    val q3 = spark.readStream.table("tcWapD.w.t")
      .writeStream.option("checkpointLocation", s"$wh/_ckpt_fresh")
      .foreachBatch((df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => {
        freshSeen.addAndGet(df.count()); ()
      }).start()
    q3.processAllAvailable()
    q3.stop()
    assert(freshSeen.get() == 40, s"fresh start read ${freshSeen.get()} of 40 retained rows")
  }

  test("streaming tail never delivers branch or WAP-staged snapshots until published") {
    freshWh("tcWapC")
    import spark.implicits._
    spark.sql("CREATE NAMESPACE tcWapC.w")
    spark.sql("CREATE TABLE tcWapC.w.t (id BIGINT) " +
      "TBLPROPERTIES ('write.wap.enabled'='true')")
    spark.sql("INSERT INTO tcWapC.w.t SELECT id FROM range(50)")

    val q = spark.readStream.table("tcWapC.w.t")
      .writeStream.format("memory").queryName("wap_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("wap_tail").count() == 50)

      // off-lineage commits: an audit branch and a WAP stage — both
      // consume sequence numbers without touching main
      Maintenance.appendToBranch(gt("tcWapC", "w", "t"),
        (1000L until 1050L).toDF("id"), "audit")
      spark.conf.set("spark.wap.id", "w1")
      try spark.sql("INSERT INTO tcWapC.w.t SELECT id FROM range(2000, 2010)")
      finally spark.conf.unset("spark.wap.id")
      // ...then main itself moves
      spark.sql("INSERT INTO tcWapC.w.t SELECT id FROM range(50, 80)")
      q.processAllAvailable()
      assert(spark.table("wap_tail").count() == 80,
        "branch/staged snapshots leaked into the main-table stream")

      // publishing makes each visible as a NEW main commit, exactly once
      spark.sql("CALL tcWapC.system.publish_changes(tbl => 'w.t', wap_id => 'w1')")
        .collect() // main moved since the stage -> cherry-pick path
      q.processAllAvailable()
      assert(spark.table("wap_tail").count() == 90)
      val branchHead = gt("tcWapC", "w", "t").meta.refs("audit").snapshotId
      Maintenance.cherryPick(gt("tcWapC", "w", "t"), branchHead)
      q.processAllAvailable()
      assert(spark.table("wap_tail").count() == 140)
      assert(count("tcWapC.w.t") == 140)
    } finally {
      q.stop()
      spark.catalog.dropTempView("wap_tail")
    }
  }
}

package graft

import graft.catalog.{ChunkCache, Io, ManifestListCache, TableOps}
import graft.meta._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata growth under a long append history at chunked-table scale
  * — the claim the manifest-LIST indirection exists for. Before it,
  * every retained snapshot repeated all chunk stamps inline:
  * metadata.json grew O(snapshots × chunks) (measured r16: 3.26 MB at
  * 30 snapshots × 400 chunks, ~109 KB per commit re-serialized).
  * With content-addressed lists, snapshots sharing a chunk set share
  * ONE side file, so metadata.json is O(snapshots × inline-tail) and
  * a plain append writes zero new stamp bytes.
  */
class MetaGrowthSpec extends AnyFunSuite {

  private val Chunks = 400
  private val PerChunk = 50

  private def synthesize(chunks: Int = Chunks, suffix: String = ""): String = {
    val wh = s"/tmp/graft_test_metagrowth$suffix"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    val loc = "p/bigt"
    val mdDir = s"$wh/$loc/metadata"
    Io.mkdirs(mdDir)
    val manifests = (0 until chunks).toList.map { c =>
      val files = (0 until PerChunk).toList.map { i =>
        DataFile(s"$loc/data/k=$c/f$i.parquet", 1000L, 1L << 20,
          partition = Map("k" -> c.toString),
          minBound = Map("k" -> c.toString), maxBound = Map("k" -> c.toString),
          seq = Some(c + 1L))
      }
      val fname = s"manifest-synth-$c.json"
      Io.writeString(s"$mdDir/$fname", TableMeta.manifestToJson(files))
      Manifest(s"$loc/metadata/$fname", PerChunk,
        minBound = Map("k" -> c.toString), maxBound = Map("k" -> c.toString),
        minSeq = Some(c + 1L), maxSeq = Some(c + 1L), bytes = PerChunk.toLong << 20)
    }
    val intJson = org.apache.spark.sql.types.IntegerType.json
    val meta0 = TableMeta(1, java.util.UUID.randomUUID().toString, loc, chunks.toLong,
      1723600000000L, 2, 0,
      List(SchemaDef(0, List(FieldDef(1, "k", intJson, required = false)))),
      0, List(PartSpec(0, List(PartField(1, 1000, "k", "identity")))),
      1000, 0, Nil,
      Map("write.metadata.manifest-chunk-size" -> PerChunk.toString),
      Some(1L),
      List(Snapshot(1L, None, chunks.toLong, 1723600000000L, "append",
        Map.empty, files = Nil, manifests = manifests)),
      List(SnapshotLogEntry(1723600000000L, 1L)), Nil,
      Map("main" -> Ref(1L, "branch")))
    Io.writeString(s"$mdDir/v1.metadata.json", TableMeta.toJson(meta0))
    Io.writeString(s"$mdDir/version-hint.text", "1")
    wh
  }

  test("30 appends at 400 chunks: metadata stays O(snapshots), lists shared") {
    val wh = synthesize()
    ChunkCache.invalidateAll()
    ManifestListCache.invalidateAll()
    val ops = new TableOps(wh, "p/bigt")
    var (v, meta) = ops.refresh().get
    val inlineStampBytes = new java.io.File(s"$wh/p/bigt/metadata/v1.metadata.json").length

    var lastCommitMs = 0.0
    for (k <- 2 to 31) {
      val snap = meta.currentSnapshot.get
      val nf = (0 until 10).toList.map(i =>
        DataFile(s"p/bigt/data/k=999/a$k-$i.parquet", 100L, 1L << 18,
          partition = Map("k" -> "999"), minBound = Map("k" -> "999"),
          maxBound = Map("k" -> "999"), seq = Some(Chunks + k.toLong)))
      val s2 = snap.copy(snapshotId = k.toLong, parentId = Some(snap.snapshotId),
        sequenceNumber = Chunks + k.toLong, files = snap.files ++ nf,
        manifests = snap.manifests)
      val m2 = meta.copy(lastSequenceNumber = Chunks + k.toLong,
        currentSnapshotId = Some(k.toLong), snapshots = meta.snapshots :+ s2,
        snapshotLog = meta.snapshotLog :+ SnapshotLogEntry(1723600000000L + k, k.toLong),
        refs = Map("main" -> Ref(k.toLong, "branch")))
      val t0 = System.nanoTime()
      v = ops.commit(v, m2)
      lastCommitMs = (System.nanoTime() - t0) / 1e6
      meta = ops.refresh().get._2
    }
    val names = new java.io.File(s"$wh/p/bigt/metadata").listFiles().map(_.getName)
    val listFiles = names.count(_.startsWith("manifest-list-"))
    val finalSize = new java.io.File(ops.existingMetadataFile(v).get).length
    info(f"31 snapshots: metadata ${finalSize / 1024} KB (inline-stamps v1 was " +
      f"${inlineStampBytes / 1024} KB for ONE snapshot), $listFiles list files, " +
      f"last commit $lastCommitMs%.0f ms")
    // pre-list behavior repeated the ~100 KB stamp block once per
    // snapshot (31 × inlineStampBytes ≈ 3.1 MB, measured 3.26 MB in
    // r16 before the change); with lists the stamps live once per
    // DISTINCT chunk set and metadata carries only snapshot rows +
    // inline tails (measured ~276 KB — an 11× reduction)
    assert(finalSize < inlineStampBytes * 31L / 4,
      s"metadata $finalSize bytes: stamps are repeating per snapshot again " +
        s"(single-snapshot stamp block is $inlineStampBytes bytes)")
    assert(finalSize < 500L * 1024, s"metadata $finalSize bytes not O(snapshots)")
    // inline tails spill a new chunk every 5 appends → stamps change 6
    // times; every other append REUSES its parent's content-addressed
    // list byte-for-byte
    assert(listFiles <= 7, s"expected <= 7 distinct stamp lists, got $listFiles")
    assert(lastCommitMs < 1000, f"append commit took $lastCommitMs%.0f ms")

    // cold re-read: everything materializes through the list cache
    ChunkCache.invalidateAll()
    ManifestListCache.invalidateAll()
    val ops2 = new TableOps(wh, "p/bigt")
    val snap = ops2.refresh().get._2.currentSnapshot.get
    assert(snap.dataFileCount == Chunks * PerChunk + 300,
      s"expected ${Chunks * PerChunk + 300} files, got ${snap.dataFileCount}")
    // historic snapshots materialize too (time travel floor)
    assert(ops2.refresh().get._2.snapshots.forall(_.manifests.nonEmpty))

    // expiry reclaims the lists only expired snapshots referenced
    graft.catalog.Maintenance.expireSnapshots(ops2, keepLast = 2)
    val names2 = new java.io.File(s"$wh/p/bigt/metadata").listFiles().map(_.getName)
    assert(names2.count(_.startsWith("manifest-list-")) == 1,
      "the two kept snapshots share one list; expired-only lists must be GC'd")
    val snap2 = ops2.refresh().get._2.currentSnapshot.get
    assert(snap2.dataFileCount == Chunks * PerChunk + 300)

    // integrity reports a deleted list file even while the process
    // cache still serves its stamps (the synthesized table has no
    // parquet files, so filter to the list-specific problem)
    def listProblems = graft.catalog.Maintenance.verifyIntegrity(ops2)
      .filter(_.startsWith("missing manifest list"))
    assert(listProblems.isEmpty, s"healthy table reported: $listProblems")
    val listName = new java.io.File(s"$wh/p/bigt/metadata").listFiles()
      .map(_.getName).find(_.startsWith("manifest-list-")).get
    assert(new java.io.File(s"$wh/p/bigt/metadata/$listName").delete())
    assert(listProblems.nonEmpty,
      "a deleted manifest-list file must fail integrity despite the warm cache")
  }

  test("pre-list readers fail LOUDLY on a list-spilled snapshot (poison-pill sentinel)") {
    val wh = synthesize()
    ChunkCache.invalidateAll()
    ManifestListCache.invalidateAll()
    val ops = new TableOps(wh, "p/bigt")
    var (v, meta) = ops.refresh().get
    // one commit so the metadata on disk goes through spillStampList
    val snap = meta.currentSnapshot.get
    val s2 = snap.copy(snapshotId = 2L, parentId = Some(1L),
      sequenceNumber = Chunks + 1L,
      files = List(DataFile("p/bigt/data/k=999/x.parquet", 1L, 1L,
        partition = Map("k" -> "999"), seq = Some(Chunks + 1L))))
    v = ops.commit(v, meta.copy(lastSequenceNumber = Chunks + 1L,
      currentSnapshotId = Some(2L), snapshots = meta.snapshots :+ s2,
      refs = Map("main" -> Ref(2L, "branch"))))

    // the RAW serialized form (what a pre-list reader deserializes,
    // ignoring the unknown manifestList field): exactly one inline
    // manifest entry per spilled snapshot, whose path IS the list file
    // and whose count/bytes equal the real chunked totals
    val raw = TableMeta.fromJson(ops.readMetadataString(ops.existingMetadataFile(v).get))
    raw.snapshots.foreach { s =>
      assert(s.manifestList.isDefined, "both snapshots exceed the spill threshold")
      assert(s.manifests.size == 1 && s.manifests.head.path == s.manifestList.get,
        s"sentinel shape wrong: ${s.manifests.map(_.path)} vs ${s.manifestList}")
      assert(s.manifests.head.count == Chunks * PerChunk,
        s"sentinel count ${s.manifests.head.count}")
      assert(s.manifests.head.minBound.isEmpty && s.manifests.head.minSeq.isEmpty,
        "sentinel must carry NO pruning keys (an old reader must always load it)")
    }
    // and the old reader's load path — parsing the list file as a
    // CHUNK (DataFile records) — throws instead of returning rows
    val sentinelAbs = RelPaths_abs(wh, raw.snapshots.head.manifests.head.path)
    intercept[Throwable] {
      TableMeta.manifestFromJson(Io.readString(sentinelAbs))
    }
    // while the NEW reader materializes the stamps and sees every file
    ChunkCache.invalidateAll()
    ManifestListCache.invalidateAll()
    val parsed = ops.refresh().get._2
    assert(parsed.snapshots.forall(s =>
      s.manifests.size == Chunks && s.manifests.forall(_.minBound.nonEmpty)))
  }

  private def RelPaths_abs(wh: String, p: String): String =
    graft.meta.RelPaths.absolutize(wh, p)

  test("100-TB shape: 100 appends at 2000 chunks stay O(snapshots x inline-tail), commits bounded") {
    // the extrapolated claim, measured: at ~2000 chunks a single
    // inline stamp block is ~0.5 MB, so pre-list behavior would pay
    // ~0.5 MB x 100 snapshots ≈ 50 MB of metadata.json and re-serialize
    // the whole block on EVERY commit. With content-addressed lists the
    // stamps live once per distinct chunk set and an ordinary append
    // re-serializes only snapshot rows + inline tails.
    val BigChunks = 2000
    val wh = synthesize(BigChunks, suffix = "_2k")
    ChunkCache.invalidateAll()
    ManifestListCache.invalidateAll()
    val ops = new TableOps(wh, "p/bigt")
    var (v, meta) = ops.refresh().get
    val inlineStampBytes = new java.io.File(s"$wh/p/bigt/metadata/v1.metadata.json").length

    var noSpillCommitMs = List.empty[Double]
    for (k <- 2 to 101) {
      val snap = meta.currentSnapshot.get
      val nf = (0 until 10).toList.map(i =>
        DataFile(s"p/bigt/data/k=999/a$k-$i.parquet", 100L, 1L << 18,
          partition = Map("k" -> "999"), minBound = Map("k" -> "999"),
          maxBound = Map("k" -> "999"), seq = Some(BigChunks + k.toLong)))
      val s2 = snap.copy(snapshotId = k.toLong, parentId = Some(snap.snapshotId),
        sequenceNumber = BigChunks + k.toLong, files = snap.files ++ nf,
        manifests = snap.manifests)
      val m2 = meta.copy(lastSequenceNumber = BigChunks + k.toLong,
        currentSnapshotId = Some(k.toLong), snapshots = meta.snapshots :+ s2,
        snapshotLog = meta.snapshotLog :+ SnapshotLogEntry(1723600000000L + k, k.toLong),
        refs = Map("main" -> Ref(k.toLong, "branch")))
      val t0 = System.nanoTime()
      v = ops.commit(v, m2)
      val ms = (System.nanoTime() - t0) / 1e6
      // the inline tail spills every 5 appends (chunk size 50, 10
      // files/append) — those commits legitimately rewrite one stamp
      // list; measure the ORDINARY append separately
      if (s2.files.size <= PerChunk) noSpillCommitMs :+= ms
      meta = ops.refresh().get._2
    }
    val finalSize = new java.io.File(ops.existingMetadataFile(v).get).length
    val listFiles = new java.io.File(s"$wh/p/bigt/metadata").listFiles()
      .count(_.getName.startsWith("manifest-list-"))
    info(f"101 snapshots x $BigChunks chunks: metadata ${finalSize / 1024} KB " +
      f"(one inline stamp block = ${inlineStampBytes / 1024} KB; pre-list " +
      f"would be ~${inlineStampBytes * 101L / (1024 * 1024)} MB), " +
      f"$listFiles list files, median no-spill commit " +
      f"${noSpillCommitMs.sorted.apply(noSpillCommitMs.size / 2)}%.0f ms")
    // O(snapshots x inline-tail), NOT O(snapshots x chunks): at least
    // 20x below the pre-list extrapolation (measured ~53x: 942 KB vs
    // ~50 MB — the inline tails, ~25 files x 101 snapshots, dominate)
    assert(finalSize < inlineStampBytes * 101L / 20,
      s"metadata $finalSize bytes: stamps are repeating per snapshot again " +
        s"(single-snapshot stamp block is $inlineStampBytes bytes)")
    assert(finalSize < (2L << 20), s"metadata $finalSize bytes not O(snapshots x inline-tail)")
    // distinct stamp sets: one per spill (~every 5 appends), not one per commit
    assert(listFiles <= 22, s"expected ~21 distinct stamp lists, got $listFiles")
    // commit serialization stays bounded at 2000 chunks: an ordinary
    // append never re-serializes the stamp block
    val medianMs = noSpillCommitMs.sorted.apply(noSpillCommitMs.size / 2)
    assert(medianMs < 500, f"ordinary append commit median $medianMs%.0f ms at 2000 chunks")
    // the whole table still materializes
    ChunkCache.invalidateAll()
    ManifestListCache.invalidateAll()
    val snap = new TableOps(wh, "p/bigt").refresh().get._2.currentSnapshot.get
    assert(snap.dataFileCount == BigChunks * PerChunk + 1000)
  }

  test("orphan vacuum reclaims never-referenced manifest-list files, keeps live ones") {
    val wh = synthesize()
    ChunkCache.invalidateAll()
    ManifestListCache.invalidateAll()
    val ops = new TableOps(wh, "p/bigt")
    val (v, meta) = ops.refresh().get
    // commit once → the live, referenced list file exists
    ops.commit(v, meta.copy(lastSequenceNumber = Chunks + 1L,
      currentSnapshotId = Some(2L),
      snapshots = meta.snapshots :+ meta.currentSnapshot.get.copy(
        snapshotId = 2L, parentId = Some(1L), sequenceNumber = Chunks + 1L),
      refs = Map("main" -> Ref(2L, "branch"))))
    val mdDir = new java.io.File(s"$wh/p/bigt/metadata")
    val live = mdDir.listFiles().map(_.getName).filter(_.startsWith("manifest-list-"))
    assert(live.length == 1)
    // plant a lost-commit leftover: a list file nothing references
    val stale = new java.io.File(mdDir, "manifest-list-deadbeef00.json")
    Io.writeString(stale.getPath, TableMeta.stampsToJson(Nil))
    assert(stale.setLastModified(System.currentTimeMillis() - 86400000L))
    val removed = graft.catalog.Maintenance.removeOrphanFiles(ops,
      olderThanMs = System.currentTimeMillis() - 3600000L)
    assert(removed >= 1 && !stale.exists(), "stale unreferenced list must be vacuumed")
    assert(mdDir.listFiles().map(_.getName).count(_.startsWith("manifest-list-")) == 1,
      "the referenced list must survive the vacuum")
    // the table still reads whole
    ChunkCache.invalidateAll()
    ManifestListCache.invalidateAll()
    assert(ops.refresh().get._2.currentSnapshot.get.dataFileCount == Chunks * PerChunk)
  }
}

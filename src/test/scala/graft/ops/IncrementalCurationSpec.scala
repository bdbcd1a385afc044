package graft.ops

import graft.SparkSpec
import graft.tables.VersionedTable
import org.apache.spark.sql.functions._

/** Incrementally-maintained curation chain ([[IncrementalCuration]]):
  * CDF-driven filter → exact dedup → MinHash near-dup at O(changed
  * docs), with monotone-keep semantics and crash-replay stability. */
class IncrementalCurationSpec extends SparkSpec {
  import spark.implicits._

  // stopword-rich English prose: quality ≈ 0.71 ≥ 0.5, langId = en;
  // the uppercase variant lowercases to IDENTICAL token shingles
  // (j = 1.0 near-dup) while its sha2 differs (survives exact dedup)
  private def doc(i: Int): String =
    s"the cat number $i is on the mat and the dog is in the house " +
      "with the bird"

  private val cfg = IncrementalCuration.Config(
    jaccardThreshold = 1.0, maxBucketSize = Int.MaxValue,
    numHashes = 16, bands = 4, numBuckets = 2)

  private def freshSource(): (VersionedTable, String) = {
    val base = tmpDir("cur-")
    val t = VersionedTable(spark, s"$base/docs")
    t.enableChangeFeed()
    (t, s"$base/ws")
  }

  private def keptIds(root: String): Set[Long] =
    IncrementalCuration.keptTable(spark, root).read
      .select("doc_id").as[Long].collect().toSet

  test("bootstrap == the batch chain: filters, exact and near dups die, " +
       "min-id winners keep") {
    val (src, ws) = freshSource()
    val rows = (0 to 9).map(i => (i.toLong, doc(i))) ++ Seq(
      (100L, doc(3)),             // exact dup of 3
      (101L, doc(4).toUpperCase), // shingle-identical near dup of 4
      (102L, "zzz qqq xxx zzz qqq xxx zzz qqq"),    // not English
      (103L, "!!! ??? ### $$$ !!! ??? ### $$$"))    // junk quality
    src.append(rows.toDF("doc_id", "text"))
    assert(IncrementalCuration.sync(src, ws, cfg).isDefined)
    assert(keptIds(ws) === (0L to 9L).toSet)
    // derived columns ride along
    val row = IncrementalCuration.keptTable(spark, ws).read
      .filter(col("doc_id") === 3L).select("toks", "q4i")
      .as[(Long, Long)].head()
    assert(row._1 > 10L && row._2 >= 5000L)
  }

  test("incremental admission: state suppresses cross-batch exact and " +
       "near dups, fresh docs land") {
    val (src, ws) = freshSource()
    src.append((0 to 4).map(i => (i.toLong, doc(i))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    src.append(Seq(
      (200L, doc(0)),             // exact dup of KEPT 0
      (201L, doc(1).toUpperCase), // near dup of KEPT 1
      (202L, doc(50))             // fresh
    ).toDF("doc_id", "text"))
    assert(IncrementalCuration.sync(src, ws, cfg).isDefined)
    assert(keptIds(ws) === Set(0L, 1L, 2L, 3L, 4L, 202L))
  }

  test("delete purges the winner; suppressed dups never resurrect; " +
       "re-delivery through the feed re-admits the content") {
    val (src, ws) = freshSource()
    src.append(Seq((0L, doc(0)), (1L, doc(1)), (100L, doc(0)))
      .toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    assert(keptIds(ws) === Set(0L, 1L))
    src.delete(col("doc_id") === 0L)
    IncrementalCuration.sync(src, ws, cfg)
    // 100 was suppressed at admission and is not re-considered
    assert(keptIds(ws) === Set(1L))
    // the content class is free again: a NEW delivery admits
    src.append(Seq((300L, doc(0))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    assert(keptIds(ws) === Set(1L, 300L))
  }

  test("update re-runs admission: updating a kept doc into a dup of " +
       "another kept doc evicts it; the ownership guard keeps the other " +
       "winner's hash row intact") {
    val (src, ws) = freshSource()
    src.append(Seq((0L, doc(0)), (1L, doc(1))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    src.update(Map("text" -> lit(doc(0))), col("doc_id") === 1L)
    IncrementalCuration.sync(src, ws, cfg)
    assert(keptIds(ws) === Set(0L), "1 became a dup of 0 and must evict")
    // doc 0's hash row must have survived 1's purge (pre-image text was
    // doc(1) — but after the NEXT update 1's pre-image is doc(0), whose
    // class 0 owns; the conditional delete must not take 0's row)
    src.update(Map("text" -> lit(doc(7))), col("doc_id") === 1L)
    IncrementalCuration.sync(src, ws, cfg)
    assert(keptIds(ws) === Set(0L, 1L), "1 re-admits with fresh content")
    // and 0's content class is still owned: a new dup of doc(0) dies
    src.append(Seq((400L, doc(0))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    assert(keptIds(ws) === Set(0L, 1L))
  }

  test("one batch deletes the winner AND a suppressed duplicate: the " +
       "hash row dies exactly once and the content class frees up") {
    val (src, ws) = freshSource()
    src.append(Seq((0L, doc(0)), (1L, doc(1)), (100L, doc(0)))
      .toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    assert(keptIds(ws) === Set(0L, 1L))
    // ONE commit purges the content class's owner (0) together with its
    // suppressed duplicate (100): the purge slice carries TWO rows of
    // one content_hash; a merge keyed on the hash alone would pair the
    // target row with both and the non-owner pairing would re-emit it
    src.delete(col("doc_id").isin(0L, 100L))
    IncrementalCuration.sync(src, ws, cfg)
    assert(keptIds(ws) === Set(1L))
    val hashes = IncrementalCuration.hashTable(spark, ws).read
    assert(hashes.groupBy("content_hash").count()
      .filter(col("count") > 1).isEmpty, "hash rows must stay unique")
    assert(hashes.filter(col("doc_id") === 0L).isEmpty,
      "the purged winner's hash row must not survive its own purge")
    // the class is free again: a NEW delivery admits
    src.append(Seq((300L, doc(0))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    assert(keptIds(ws) === Set(1L, 300L))
  }

  test("deleting only suppressed duplicates leaves the winner's hash row " +
       "intact and unduplicated") {
    val (src, ws) = freshSource()
    src.append(Seq((0L, doc(0)), (100L, doc(0)), (101L, doc(0)))
      .toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    assert(keptIds(ws) === Set(0L))
    // two non-owner rows of one content class purge in one commit:
    // neither owns the hash row, so the row must survive exactly once
    src.delete(col("doc_id").isin(100L, 101L))
    IncrementalCuration.sync(src, ws, cfg)
    assert(keptIds(ws) === Set(0L))
    val hashes = IncrementalCuration.hashTable(spark, ws).read
    assert(hashes.filter(col("doc_id") === 0L).count() === 1L,
      "the winner's hash row must survive non-owner purges, once")
    // ownership still enforced: a new dup of doc(0) dies
    src.append(Seq((400L, doc(0))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    assert(keptIds(ws) === Set(0L))
  }

  test("crash-replayed range is a no-op: state counts and content stable") {
    val (src, ws) = freshSource()
    src.append((0 to 5).map(i => (i.toLong, doc(i))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    src.append(Seq((200L, doc(0)), (201L, doc(60))).toDF("doc_id", "text"))
    src.delete(col("doc_id") === 5L)
    assert(IncrementalCuration.sync(src, ws, cfg).isDefined)
    val kept = IncrementalCuration.keptTable(spark, ws)
    val vAfter = kept.latestVersion.get
    val want = keptIds(ws)
    assert(want === Set(0L, 1L, 2L, 3L, 4L, 201L))
    // crash between the merges and the position commit: rewind
    val pos = java.nio.file.Paths.get(ws, "_sync", "position")
    java.nio.file.Files.writeString(pos, "0")
    assert(IncrementalCuration.sync(src, ws, cfg).isDefined)
    assert(keptIds(ws) === want)
    assert(kept.latestVersion.get === vAfter,
      "replayed merges must be metadata no-ops")
    assert(IncrementalCuration.sync(src, ws, cfg).isEmpty) // caught up
  }

  test("parallel-merge crash states replay stably: a pre-committed " +
       "hashes merge must not suppress its own batch docs on replay") {
    val (src, ws) = freshSource()
    src.append((0 to 4).map(i => (i.toLong, doc(i))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    src.append(Seq((200L, doc(0)), (201L, doc(7))).toDF("doc_id", "text"))
    val hi = src.latestVersion.get
    // the CONCURRENT state merges allow any SUBSET to land before a
    // crash — simulate "hashes committed, kept/bands not, position not
    // advanced": the survivor's hash row lands with the real txn marker
    val surv = Seq((201L, doc(7))).toDF("doc_id", "text")
      .select(sha2(col("text"), 256).as("content_hash"), col("doc_id"))
    IncrementalCuration.hashTable(spark, ws).merge(surv,
      Seq("content_hash"), numBuckets = cfg.numBuckets,
      txn = Some((s"curation-sync:$ws:h", hi)))
    // replay: the hashes merge no-ops on its marker; kept/bands apply.
    // 201's OWN hash already sitting in state must not classify 201 as
    // a duplicate (self-match exclusion = the replay-stability claim),
    // and 200 stays suppressed against doc 0's state hash.
    assert(IncrementalCuration.sync(src, ws, cfg).isDefined)
    assert(keptIds(ws) === Set(0L, 1L, 2L, 3L, 4L, 201L))
    val h = IncrementalCuration.hashTable(spark, ws).read
    assert(h.count() === h.select("content_hash").distinct().count(),
      "one owner row per content class — no duplicate from the replay")
  }

  test("slice intent is atomic visibility: prepared merges stay invisible " +
       "without an intent; with one, sync rolls every table forward first") {
    val (src, ws) = freshSource()
    src.append((0 to 4).map(i => (i.toLong, doc(i))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    val kept = IncrementalCuration.keptTable(spark, ws)
    val hashes = IncrementalCuration.hashTable(spark, ws)
    // PREPARE merges into two state tables (staged, COW-joined, files
    // renamed into place) — and assert NOTHING is visible: no log
    // entry, no rows. This is the crash-before-intent half of the
    // protocol: a slice that dies mid-prepare changes no table.
    val keptV0 = kept.latestVersion.get
    val hashV0 = hashes.latestVersion.get
    val pk = kept.mergePrepared(
      Seq((999L, "synthetic", 1L, 9999L))
        .toDF("doc_id", "text", "toks", "q4i"),
      Seq("doc_id"), numBuckets = cfg.numBuckets,
      txn = Some(("test-intent:k", 1L))).get
    val ph = hashes.mergePrepared(
      Seq(("deadbeef", 999L)).toDF("content_hash", "doc_id"),
      Seq("content_hash"), numBuckets = cfg.numBuckets,
      txn = Some(("test-intent:h", 1L))).get
    assert(kept.latestVersion.get === keptV0 &&
      hashes.latestVersion.get === hashV0,
      "a prepared merge must not append a log entry")
    assert(!keptIds(ws).contains(999L), "prepared data must be invisible")
    // JSON round-trip — the intent record must survive a crash
    assert(VersionedTable.PreparedCommit.fromJson(pk.toJson) === pk)
    // crash-after-intent half: record the intent, then sync — recovery
    // commits BOTH tables before the slice reads any state
    val intent = java.nio.file.Paths.get(ws, "_slice_intent.json")
    java.nio.file.Files.createDirectories(intent.getParent)
    java.nio.file.Files.writeString(intent,
      s"${kept.root}\t${pk.toJson}\n${hashes.root}\t${ph.toJson}\n")
    src.append(Seq((50L, doc(9))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    assert(keptIds(ws).contains(999L),
      "roll-forward must commit the prepared kept merge")
    assert(hashes.read.filter(col("content_hash") === "deadbeef")
      .count() === 1L, "roll-forward must commit the prepared hashes merge")
    assert(keptIds(ws).contains(50L), "the slice itself still applies")
    assert(java.nio.file.Files.notExists(intent), "intent drops after commit")
    // replayed roll-forward is a no-op (txn markers short-circuit)
    val keptV1 = kept.latestVersion.get
    kept.commitPrepared(pk)
    assert(kept.latestVersion.get === keptV1)
  }

  test("an intent whose prepared files were vacuumed away is abandoned " +
       "whole — no table commits, the slice replays") {
    val (src, ws) = freshSource()
    src.append((0 to 3).map(i => (i.toLong, doc(i))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    val kept = IncrementalCuration.keptTable(spark, ws)
    val pk = kept.mergePrepared(
      Seq((999L, "synthetic", 1L, 9999L))
        .toDF("doc_id", "text", "toks", "q4i"),
      Seq("doc_id"), numBuckets = cfg.numBuckets,
      txn = Some(("test-intent:k", 1L))).get
    // simulate VACUUM during a long outage: the orphaned prepared
    // file-sets age out and are reclaimed before recovery runs
    pk.produced.foreach { fs =>
      val p = java.nio.file.Paths.get(kept.root, "data", fs)
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.walk(p)
        try s.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
        finally s.close()
      } else java.nio.file.Files.deleteIfExists(p)
      ()
    }
    val intent = java.nio.file.Paths.get(ws, "_slice_intent.json")
    java.nio.file.Files.writeString(intent, s"${kept.root}\t${pk.toJson}\n")
    val keptV = kept.latestVersion.get
    src.append(Seq((60L, doc(8))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    assert(!keptIds(ws).contains(999L),
      "an intent with vanished files must not commit any entry")
    assert(keptIds(ws).contains(60L), "the live slice still applies")
    assert(java.nio.file.Files.notExists(intent), "the dead intent drops")
    assert(kept.history.forall(e => e.version <= keptV ||
      !e.txn.exists(_._1 == "test-intent:k")),
      "no log entry may reference the vacuumed file-sets")
  }

  test("intact means EVERYTHING the entry would reference: a vacuumed " +
       "cdf change set abandons the intent even when data sets survive") {
    val (src, ws) = freshSource()
    src.append((0 to 3).map(i => (i.toLong, doc(i))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    val kept = IncrementalCuration.keptTable(spark, ws)
    kept.enableChangeFeed()
    val pk = kept.mergePrepared(
      Seq((999L, "synthetic", 1L, 9999L))
        .toDF("doc_id", "text", "toks", "q4i"),
      Seq("doc_id"), numBuckets = cfg.numBuckets,
      txn = Some(("test-intent:k", 1L))).get
    assert(pk.cdf.isDefined, "CDF-enabled merge must stage a change set")
    // vacuum reclaimed ONLY the orphaned change set (untracked and
    // age-gated, like the data sets — but a different directory)
    VersionedTable.deleteRecursively(
      java.nio.file.Paths.get(kept.root, "_changes", pk.cdf.get))
    val intent = java.nio.file.Paths.get(ws, "_slice_intent.json")
    java.nio.file.Files.writeString(intent, s"${kept.root}\t${pk.toJson}\n")
    src.append(Seq((70L, doc(8))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    assert(!keptIds(ws).contains(999L),
      "committing would point the log at a deleted change set")
    assert(keptIds(ws).contains(70L), "the live slice still applies")
    assert(java.nio.file.Files.notExists(intent))
  }

  test("prepared-commit JSON survives hostile txn appIds, and an " +
       "unparseable intent is abandoned instead of wedging sync") {
    // quotes, commas, backslashes, newlines, brackets (']' would end a
    // regex-captured array body early) — mergePrepared is public API;
    // the intent line must round-trip whatever the caller names
    val hostile = "app\"with,comma\\and\nnewline\tandctl"
    val pc = VersionedTable.PreparedCommit(
      action = "merge", consumed = Seq("a,b", "c\"d", "br[ack]ets"),
      produced = Seq("e\\f", "end]"), basedOn = Some(3L),
      txn = Some((hostile, 7L)), dvs = Seq("x,y\"z", "]lead"),
      cdf = Some("c-1,\"2]"), cellRebase = false, autoCompact = true)
    assert(VersionedTable.PreparedCommit.fromJson(pc.toJson) === pc)
    assert(!pc.toJson.contains('\n'), "intent lines are newline-framed")
    // a torn/garbage intent from any source must not wedge every sync
    val (src, ws) = freshSource()
    src.append((0 to 2).map(i => (i.toLong, doc(i))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    val intent = java.nio.file.Paths.get(ws, "_slice_intent.json")
    java.nio.file.Files.writeString(intent,
      "/no/such/table\t{this is not json\n")
    src.append(Seq((80L, doc(9))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    assert(keptIds(ws).contains(80L),
      "sync must proceed past an unparseable intent")
    assert(java.nio.file.Files.notExists(intent), "the garbage intent drops")
    // abandon = quarantine, not delete: the torn file survives under a
    // quarantine name as operator evidence
    val quarantined = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(intent.getParent)
      try s.iterator().asScala.toSeq.map(_.getFileName.toString)
        .filter(_.startsWith("_slice_intent.quarantined-"))
      finally s.close()
    }
    assert(quarantined.nonEmpty,
      "the unparseable intent must be quarantined, not silently deleted")
    // and a LATER sync is untouched by the quarantined sibling
    src.append(Seq((81L, doc(3))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    assert(keptIds(ws).contains(81L))
  }

  test("crash-point matrix: a kill at EVERY slice-protocol phase " +
       "boundary replays to the control state; vacuum reclaims all " +
       "orphans without touching the converged snapshot") {
    // the FULL boundary set of the protocol: three concurrent prepares,
    // intent tmp write, intent atomic move, each per-table log append,
    // intent drop (the last = crash before the consumer position
    // commits). Seeded shuffle so the iteration order can't encode a
    // hidden dependency between boundaries.
    val boundaries = new scala.util.Random(20250816L).shuffle(Seq(
      "prepare:kept", "prepare:hashes", "prepare:bands",
      "intent:tmp", "intent:moved",
      "commit:0", "commit:1", "commit:2", "intent:dropped"))
    // batch B exercises every state shape in ONE slice: a cross-batch
    // exact dup, a near dup, fresh docs, and a deleted source doc
    // (purge tombstones riding the same prepared merges)
    val batchA = (0 to 5).map(i => (i.toLong, doc(i)))
    val batchB = Seq((200L, doc(0)), (201L, doc(8)),
      (202L, doc(4).toUpperCase), (203L, doc(9)))
    def drive(src: VersionedTable, ws: String)(mid: => Unit): Unit = {
      src.append(batchA.toDF("doc_id", "text"))
      IncrementalCuration.sync(src, ws, cfg)
      src.delete(col("doc_id") === 5L)
      src.append(batchB.toDF("doc_id", "text"))
      mid
    }
    def tables(ws: String) = Seq(
      IncrementalCuration.keptTable(spark, ws),
      IncrementalCuration.hashTable(spark, ws),
      IncrementalCuration.bandTable(spark, ws))
    def contents(ws: String): Seq[Set[String]] =
      tables(ws).map(_.read.collect().map(_.toString).toSet)
    // control: the same two batches with no crash anywhere
    val (csrc, cws) = freshSource()
    drive(csrc, cws)(IncrementalCuration.sync(csrc, cws, cfg))
    val want = contents(cws)
    assert(want.head.nonEmpty && want(1).nonEmpty && want(2).nonEmpty)
    boundaries.foreach { b =>
      val (src, ws) = freshSource()
      drive(src, ws) {
        IncrementalCuration.crashHook = Some(name =>
          if (name == b) throw new RuntimeException(s"crash-injected:$b"))
        try {
          val e = intercept[Exception](IncrementalCuration.sync(src, ws, cfg))
          assert(e.getMessage != null && e.getMessage.contains("crash-injected"),
            s"boundary $b: expected the injected crash, got $e")
        } finally IncrementalCuration.crashHook = None
        // recovery = just running the next sync: roll-forward for
        // post-intent crashes, whole-slice replay for pre-intent ones
        IncrementalCuration.sync(src, ws, cfg)
      }
      assert(contents(ws) === want, s"boundary $b: state diverged")
      assert(java.nio.file.Files.notExists(
        java.nio.file.Paths.get(ws, "_slice_intent.json")),
        s"boundary $b: intent must not survive recovery")
      // orphan reclamation: age every file past the staging grace, then
      // vacuum — afterwards NOTHING is reclaimable and the converged
      // snapshot still reads identically (pre-intent crashes leave
      // staged-but-never-committed file-sets; vacuum owns them)
      tables(ws).foreach { t =>
        val old = java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - VersionedTable.StagingGraceMillis - 60000)
        java.nio.file.Files.walk(java.nio.file.Paths.get(t.root)).forEach {
          p => java.nio.file.Files.setLastModifiedTime(p, old); () }
        t.vacuum(retainVersions = 1)
        assert(t.vacuumDryRun(retainVersions = 1).isEmpty,
          s"boundary $b: vacuum must reclaim every orphan at ${t.root}")
      }
      assert(contents(ws) === want,
        s"boundary $b: vacuum touched the live snapshot")
    }
  }

  test("multi-batch append history converges to the batch chain over " +
       "the final corpus") {
    val (src, ws) = freshSource()
    src.append((0 to 7).map(i => (i.toLong, doc(i))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    src.append(Seq(
      (20L, doc(8)), (21L, doc(2)), (22L, doc(3).toUpperCase),
      (23L, "zzz qqq xxx zzz qqq xxx")).toDF("doc_id", "text"))
    src.append(Seq((30L, doc(9)), (31L, doc(8))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    // batch replay over the final corpus (ids ascend across batches, so
    // min-id winners == arrival-order winners)
    val txt = col("text")
    val filtered = src.read.filter(
      TextAnalysis.langId(txt) === "en" &&
        floor(TextAnalysis.qualityScore(txt) * 10000 + lit(0.5))
          .cast("long") >= 5000L)
    val afterExact = Dedup.exact(filtered)
    val losers = Dedup.minhashNearDupPairs(afterExact,
        numHashes = 16, bands = 4, jaccardThreshold = 1.0,
        maxBucketSize = Int.MaxValue)
      .select(col("doc_id_b").as("doc_id")).distinct()
    val batchKept = afterExact.join(losers, Seq("doc_id"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(keptIds(ws) === batchKept)
    assert(keptIds(ws) === (0L to 7L).toSet ++ Set(20L, 30L))
  }

  test("replace_where re-admits the replaced doc with its NEW text — the " +
       "same-commit delete/insert version tie must not read as departed") {
    val (src, ws) = freshSource()
    src.append((0 to 4).map(i => (i.toLong, doc(i))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    // ONE commit deletes doc 2 and re-inserts it with different text
    // (plus a net-new doc 5 in the same slice)
    src.replaceWhere(col("doc_id") === 2L || col("doc_id") === 5L,
      Seq((2L, doc(200)), (5L, doc(5))).toDF("doc_id", "text"))
    IncrementalCuration.sync(src, ws, cfg)
    assert(keptIds(ws) === Set(0L, 1L, 2L, 3L, 4L, 5L))
    val kept2 = IncrementalCuration.keptTable(spark, ws).read
      .filter(col("doc_id") === 2L).select("text").as[String].head()
    assert(kept2 === doc(200),
      "the replaced doc must carry its post-replace text")
  }
}

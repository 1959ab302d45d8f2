package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{KeyIndex, StreamingJobs}

/** The rebuildable key-index sidecar (round-16 VERDICT #1): hash keys have
  * no useful batch envelope, so the idempotent-append probe reads a
  * bucket-pruned compacted key index instead of O(target) keyCols — and
  * because the index is a pure cache of the target (probe = index ∪ scan
  * of uncovered files), a crash between target append and index refresh
  * can never re-admit a duplicate.
  */
class KeyIndexSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  private lazy val spark = {
    val s = SparkTestSession.spark
    // the amortization gate would skip index bootstrap on these tiny
    // fixture targets — this suite exists to exercise the index itself.
    // Restored in afterAll: leaking the override to later suites would
    // make OTHER suites' sink behavior depend on execution order.
    s.conf.set("spark.graft.keyIndex.minTargetBytes", "0")
    s
  }

  override def afterAll(): Unit = {
    SparkTestSession.spark.conf.unset("spark.graft.keyIndex.minTargetBytes")
    super.afterAll()
  }

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def hfs(path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** Drain `rows` through the sink once (fresh checkpoint = a replay when
    * the rows repeat). Keys are md5 digests — the hash-key shape. */
  private def drain(rows: DataFrame, target: String): Unit =
    StreamingJobs.withDrainParallelism(spark) {
      val in = tmp("graft_kidx_in")
      rows.write.mode("overwrite").parquet(in)
      val q = StreamingJobs.idempotentAppendSink(
        spark.readStream.schema(rows.schema).parquet(in),
        target, keyCols = Seq("k"), checkpoint = tmp("graft_kidx_ck"))
      q.awaitTermination(); q.stop()
    }

  private def digestRows(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (s"k$i", i)).toDF("raw", "v")
      .select(md5(col("raw")).as("k"), col("v"))
  }

  test("hash keys: replay inserts 0; manifest covers every data file") {
    val target = tmp("graft_kidx_tgt") + "/t"
    drain(digestRows(0 until 200), target)
    assert(spark.read.parquet(target).count() == 200)
    // replay the exact same batch through a FRESH checkpoint
    drain(digestRows(0 until 200), target)
    assert(spark.read.parquet(target).count() == 200)
    // second real batch overlapping the first half
    drain(digestRows(100 until 300), target)
    val got = spark.read.parquet(target)
    assert(got.count() == 300)
    assert(got.select("k").distinct().count() == 300)
    // the sidecar is invisible to the data read above, and its manifest
    // covers exactly the target's data files
    val fs = hfs(target)
    val m = KeyIndex.readManifest(fs, new Path(target, KeyIndex.DirName))
    assert(m.isDefined)
    val dataFiles = fs.listStatus(new Path(target)).filter(_.isFile)
      .map(_.getPath.getName).filterNot(n => n.startsWith("_") || n.startsWith("."))
    assert(m.get.covered.keySet == dataFiles.toSet)
    assert(m.get.keyCols == Seq("k"))
  }

  test("plan audit: the probe scans the _keyidx sidecar with a pushed " +
    "bucket IN-filter, not the target's data files") {
    val target = tmp("graft_kidx_plan") + "/t"
    drain(digestRows(0 until 500), target)
    val batch = digestRows(498 until 503) // 3 new, 2 dup keys
    val pr = KeyIndex.probe(spark, target, Seq("k"), batch)
    assert(pr.manifest.isDefined)
    val plan = pr.frame.queryExecution.executedPlan.toString
    assert(plan.contains(KeyIndex.DirName),
      s"probe does not read the sidecar:\n$plan")
    // covered is complete → no target data-file scan branch at all
    assert(!plan.contains("part-0"),
      s"probe still scans target data files:\n$plan")
    assert(("PushedFilters: \\[.*In\\(" + KeyIndex.BucketCol).r
      .findFirstIn(plan).isDefined,
      s"bucket IN-filter not pushed to the index scan:\n$plan")
    // pruned slice, not the whole index: 5 buckets of 1024 over 500 keys
    val probed = pr.frame.count()
    assert(probed < 100, s"probe read $probed of 500 index keys — not pruned")
    // and it still proves the duplicates: both dup keys are in the probe
    val hit = batch.join(pr.frame, Seq("k"), "left_semi").count()
    assert(hit == 2)
  }

  test("crash between target append and index refresh: uncovered delta is " +
    "scanned, replay inserts 0, and the index heals forward") {
    val target = tmp("graft_kidx_crash") + "/t"
    drain(digestRows(0 until 100), target)
    // simulate the crash: rows reach the TARGET but the refresh never ran
    // (a direct append leaves the manifest stale — exactly the crash gap)
    digestRows(100 until 150).write.mode("append").parquet(target)
    val fs = hfs(target)
    val before = KeyIndex.readManifest(fs, new Path(target, KeyIndex.DirName)).get
    // probe against a batch replaying the crashed rows: every key must be
    // proven duplicate even though the index doesn't cover its file
    val pr = KeyIndex.probe(spark, target, Seq("k"), digestRows(100 until 150))
    assert(pr.frame.join(digestRows(100 until 150), Seq("k"), "left_semi")
      .count() == 50)
    // end-to-end: the replayed batch inserts 0
    drain(digestRows(100 until 150), target)
    assert(spark.read.parquet(target).count() == 150)
    // and the refresh healed the manifest to cover the orphaned files
    val after = KeyIndex.readManifest(fs, new Path(target, KeyIndex.DirName)).get
    assert(after.covered.size > before.covered.size)
    assert(spark.read.parquet(target).count() ==
      spark.read.parquet(after.keyDirs.map(d =>
        new Path(target, KeyIndex.DirName + "/" + d).toString): _*).count())
  }

  test("compaction: key files collapse past compactAt, superseded " +
    "generations are GC'd, dedup still exact") {
    val target = tmp("graft_kidx_compact") + "/t"
    spark.conf.set("spark.graft.keyIndex.compactAt", "3")
    try {
      for (b <- 0 until 5)
        drain(digestRows(b * 50 until (b + 1) * 50), target)
      val fs = hfs(target)
      val idx = new Path(target, KeyIndex.DirName)
      val m = KeyIndex.readManifest(fs, idx).get
      assert(m.keyDirs.size <= 3, s"never compacted: ${m.keyDirs}")
      // everything under _keyidx is either the manifest or a live key dir
      val children = fs.listStatus(idx).map(_.getPath.getName).toSet
      assert(children == m.keyDirs.toSet + "manifest.json", children.toString)
      // replay a mid-history batch: still inserts 0 through the compacted index
      drain(digestRows(60 until 110), target)
      assert(spark.read.parquet(target).count() == 250)
    } finally spark.conf.unset("spark.graft.keyIndex.compactAt")
  }

  test("corrupt manifest: probe falls back to the full target scan and the " +
    "next refresh rebuilds a valid index") {
    val target = tmp("graft_kidx_corrupt") + "/t"
    drain(digestRows(0 until 80), target)
    val fs = hfs(target)
    val mf = new Path(target, KeyIndex.DirName + "/manifest.json")
    val out = fs.create(mf, true)
    try out.write("{not json".getBytes("UTF-8")) finally out.close()
    assert(KeyIndex.readManifest(fs, new Path(target, KeyIndex.DirName)).isEmpty)
    // replay with the index unusable: full-scan fallback still blocks all
    drain(digestRows(0 until 80), target)
    assert(spark.read.parquet(target).count() == 80)
    // and the refresh rebuilt a manifest covering everything
    val m = KeyIndex.readManifest(fs, new Path(target, KeyIndex.DirName))
    assert(m.isDefined && m.get.covered.nonEmpty)
  }

  test("amortization gate: under minTargetBytes no sidecar is built (the " +
    "full scan is cheaper), dedup still exact; an existing index is " +
    "always maintained") {
    val target = tmp("graft_kidx_amort") + "/t"
    spark.conf.set("spark.graft.keyIndex.minTargetBytes",
      (64L * 1024 * 1024).toString) // the default: far above this fixture
    try {
      drain(digestRows(0 until 50), target)
      drain(digestRows(25 until 75), target)
      assert(spark.read.parquet(target).count() == 75)
      val fs = hfs(target)
      assert(!fs.exists(new Path(target, KeyIndex.DirName)),
        "sidecar built below the amortization threshold")
      // once an index EXISTS (threshold dropped / target grew), it is
      // used and maintained even if the target is small again
      spark.conf.set("spark.graft.keyIndex.minTargetBytes", "0")
      drain(digestRows(50 until 100), target)
      assert(fs.exists(new Path(target, KeyIndex.DirName)))
      val m = KeyIndex.readManifest(fs, new Path(target, KeyIndex.DirName))
      assert(m.isDefined && m.get.covered.nonEmpty)
      spark.conf.set("spark.graft.keyIndex.minTargetBytes",
        (64L * 1024 * 1024).toString)
      drain(digestRows(75 until 125), target) // maintained despite threshold
      assert(spark.read.parquet(target).count() == 125)
      val m2 = KeyIndex.readManifest(fs, new Path(target, KeyIndex.DirName))
      assert(m2.get.covered.size > m.get.covered.size)
    } finally spark.conf.set("spark.graft.keyIndex.minTargetBytes", "0")
  }

  test("refresh revalidates against ITS OWN listing: a covered file " +
    "removed after the probe cannot bake stale keys into the index") {
    import org.apache.spark.sql.functions.col
    val target = tmp("graft_kidx_stale") + "/t"
    drain(digestRows(0 until 60), target)
    val fs = hfs(target)
    val idx = new Path(target, KeyIndex.DirName)
    val prior = KeyIndex.readManifest(fs, idx).get
    // external retention removes a covered data file AFTER the probe
    // validated `prior` (simulated by deleting now and calling refresh
    // with the stale prior directly)
    val victim = prior.covered.keys.min
    fs.delete(new Path(target, victim), false)
    val goneKeys = 60 - spark.read.parquet(target).count()
    assert(goneKeys > 0)
    KeyIndex.refresh(spark, target, Seq("k"), Some(prior))
    // the rebuilt index holds EXACTLY the surviving target keys — the
    // removed file's keys must not linger and block re-inserts
    val m = KeyIndex.readManifest(fs, idx).get
    val idxKeys = spark.read.parquet(m.keyDirs.map(d =>
      new Path(idx, d).toString): _*).select("k")
    assert(idxKeys.count() == 60 - goneKeys)
    assert(idxKeys.join(spark.read.parquet(target).select("k"), Seq("k"),
      "left_anti").count() == 0)
    // and a batch replaying the deleted rows now INSERTS them
    val all = digestRows(0 until 60)
    drain(all, target)
    assert(spark.read.parquet(target).select(col("k")).distinct().count() == 60)
  }

  test("key-column type change invalidates the manifest (xxhash64 buckets " +
    "are type-dependent) — probe falls back instead of mispruning") {
    import spark.implicits._
    val target = tmp("graft_kidx_type") + "/t"
    // long keys in the target + index
    StreamingJobs.withDrainParallelism(spark) {
      val in = tmp("graft_kidx_type_in")
      (0L until 40L).map(i => (i, i)).toDF("k", "v")
        .write.mode("overwrite").parquet(in)
      val q = StreamingJobs.idempotentAppendSink(
        spark.readStream.schema((0L until 1L).map(i => (i, i)).toDF("k", "v").schema)
          .parquet(in), target, Seq("k"), tmp("graft_kidx_type_ck"))
      q.awaitTermination(); q.stop()
    }
    // an int-keyed batch: same logical values, different xxhash64 widths
    val intBatch = (0 until 40).map(i => (i, i)).toDF("k", "v")
    val pr = KeyIndex.probe(spark, target, Seq("k"), intBatch)
    assert(pr.manifest.isEmpty,
      "type-mismatched batch must invalidate the index, not bucket-prune with it")
    // the fallback still proves every duplicate (equality coerces types)
    assert(intBatch.join(pr.frame,
      intBatch("k") === pr.frame("k"), "left_semi").count() == 40)
  }

  test("complex-typed keys (ADVICE r16): array key neither breaks the " +
    "envelope aggregate nor the index; null-safe dedup holds") {
    import spark.implicits._
    val target = tmp("graft_kidx_complex") + "/t"
    def rows(ids: Seq[Option[Int]]): DataFrame =
      ids.map(i => (i.map(v => Seq(s"a$v", s"b$v")), i.getOrElse(-1)))
        .toDF("k", "v")
    drain(rows(Seq(Some(1), Some(2), None)), target)
    // replay + one new key; the all-null key must not re-append (null-safe)
    drain(rows(Seq(Some(2), None, Some(3))), target)
    assert(spark.read.parquet(target).count() == 4)
    // the envelope path (index off) analyzes too: no min/max on arrays
    spark.conf.set("spark.graft.keyIndex.enabled", "false")
    try {
      drain(rows(Seq(Some(3), Some(4), None)), target)
      assert(spark.read.parquet(target).count() == 5)
    } finally spark.conf.unset("spark.graft.keyIndex.enabled")
  }
}

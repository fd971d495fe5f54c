package graft.sources

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** `_head` hint head-discovery (round 18): `currentVersion` is O(1)
  * steady-state — read the hint, probe forward — instead of a full
  * directory listing, which at 10⁵–10⁶ commits is the driver-side
  * cost of every uncached read and every CAS loop. The hint is an
  * ACCELERATOR, never a correctness input: this spec corrupts,
  * back-dates, forward-dates, and deletes it, and head discovery must
  * answer identically every time.
  */
class SinkHeadHintSpec extends SparkSpec {

  private def writeHint(root: String, body: String): Unit = {
    val f = SinkSource.fs(root)
    val out = f.create(new Path(root, "_head"), true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  test("hint accelerates; every corruption falls back to the listing") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_head").toString
    import spark.implicits._
    val f = SinkSource.fs(root)
    (1 to 4).foreach { i =>
      SinkSource.write(Seq((i.toLong, i.toLong)).toDF("k", "v"), root,
        overwrite = i == 1)
    }
    assert(f.exists(new Path(root, "_head")),
      "publish must refresh the head hint")
    assert(SinkSource.currentVersion(root) == 4)

    // STALE hint (a racing writer's older value): probe-forward heals
    writeHint(root, "1")
    assert(SinkSource.currentVersion(root) == 4, "stale hint must heal")

    // BOGUS-AHEAD hint (no such version): falls back to the listing
    writeHint(root, "9")
    assert(SinkSource.currentVersion(root) == 4, "ahead hint must fall back")

    // TORN/garbage hint: falls back
    writeHint(root, "not-a-number")
    assert(SinkSource.currentVersion(root) == 4, "torn hint must fall back")

    // MISSING hint: falls back
    f.delete(new Path(root, "_head"), false)
    assert(SinkSource.currentVersion(root) == 4, "missing hint must fall back")

    // the next publish repairs the hint
    SinkSource.write(Seq((9L, 9L)).toDF("k", "v"), root, overwrite = false)
    assert(SinkSource.currentVersion(root) == 5)
    assert(f.exists(new Path(root, "_head")), "publish must rewrite the hint")

    // hint below an expired horizon: simulate expire GC'ing v1-v4
    // with the hint still pointing into the hole
    (1 to 4).foreach(v =>
      f.delete(new Path(root, s"manifest.v$v.psv"), false))
    writeHint(root, "2")
    assert(SinkSource.currentVersion(root) == 5,
      "hint below the kept window must fall back to the listing")
  }
}

package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.SparkSpec

/** q310 — bloom filter indexes. The oracle proves the skipped read;
  * this spec locks the semantics underneath: no false negatives (a
  * file containing the needle is NEVER skipped — swept over every
  * value), the scan actually consults blooms (kill-shot), rewritten
  * files lose coverage soundly, orphan cleanup keeps cited bitsets
  * and sweeps dead ones, and the refusal matrix holds.
  */
class SinkBloomSpec extends SparkSpec {

  test("no false negatives; the scan consults blooms; rewrites lose coverage soundly") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bloom").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    // two files per key, values interleaved
    (0 until 2).foreach(i =>
      SinkSource.write((0L until 200L).filter(_ % 2 == i.toLong)
        .map(v => (v % 2, v)).toDF("k", "v").repartition(2, col("k")),
        root, overwrite = i == 0))
    s.conf.set("spark.sql.catalog.graft_blm", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_blm.root",
      new Path(root).getParent.toString)
    val table = new Path(root).getName
    val res = s.sql(
      s"CALL graft_blm.build_bloom('$table', 'v', 12)").collect()(0)
    assert(res.getLong(0) == SinkSource.manifest(root).map(_._2).distinct.size,
      s"every file must be indexed: $res")
    // NO FALSE NEGATIVES, swept over every present value: a point
    // read of v=x must always return x's row
    val blooms = SinkSource.manifestBlooms(root)
    val cache = scala.collection.mutable.Map.empty[String, Array[Byte]]
    (0L until 200L).foreach { x =>
      val hit = SinkSource.manifest(root).map(_._2).distinct.exists { fl =>
        blooms(fl).exists { case (fid, m, k, bf) =>
          fid == 2 && SinkSource.SinkBloom.mightContain(
            cache.getOrElseUpdate(bf, SinkSource.readBloom(root, bf)),
            m, k, x)
        }
      }
      assert(hit, s"bloom false negative for value $x")
    }
    // kill-shot: files whose blooms reject v=13 are deleted; the
    // point read still answers exactly
    val ruled = SinkSource.manifest(root).map(_._2).distinct.filter { fl =>
      blooms(fl).exists { case (fid, m, k, bf) =>
        fid == 2 && !SinkSource.SinkBloom.mightContain(
          cache.getOrElseUpdate(bf, SinkSource.readBloom(root, bf)),
          m, k, 13L)
      }
    }
    assert(ruled.nonEmpty, "some file must provably lack v=13")
    val f = SinkSource.fs(root)
    ruled.foreach(fl => f.delete(new Path(root, s"data/$fl"), false))
    val got = SinkSource.load(s, root).filter(col("v") === 13)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 13L)), s"bloom-skipped point read: $got")
    // a rewrite drops coverage (new files, no headers) — on an intact
    // twin table: reads still work, just without the skip
    val root2 = java.nio.file.Files
      .createTempDirectory("graft_bloom_rw").toString
    SinkSource.write((0L until 40L).map(v => (v % 2, v)).toDF("k", "v"),
      root2, overwrite = true)
    s.conf.set("spark.sql.catalog.graft_blw", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_blw.root",
      new Path(root2).getParent.toString)
    val t2 = new Path(root2).getName
    s.sql(s"CALL graft_blw.build_bloom('$t2', 'v', 12)").collect()
    assert(SinkSource.manifestBlooms(root2).nonEmpty)
    s.sql(s"CALL graft_blw.rewrite_clustered('$t2', 'v', 4)").collect()
    assert(SinkSource.manifestBlooms(root2).isEmpty,
      "rewritten files must not inherit stale blooms")
    assert(SinkSource.load(s, root2).filter(col("v") === 14)
      .count() == 1L)
  }

  test("orphan cleanup keeps cited bitsets and sweeps dead ones; refusals hold") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bloom_gc").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    SinkSource.write(Seq((0L, 1L), (1L, 2L)).toDF("k", "v"), root,
      overwrite = true)
    s.conf.set("spark.sql.catalog.graft_blg", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_blg.root",
      new Path(root).getParent.toString)
    val table = new Path(root).getName
    s.sql(s"CALL graft_blg.build_bloom('$table', 'v', 10)").collect()
    val cited = SinkSource.manifestBlooms(root).values.flatten
      .map(_._4).toSet
    // plant a dead bitset; zero-grace orphan sweep removes it and
    // keeps the cited ones
    val dead = SinkSource.fs(root)
      .create(new Path(root, "blooms/bl_dead_0.bin"), true)
    dead.write(Array[Byte](0)); dead.close()
    s.sql(s"CALL graft_blg.remove_orphans('$table', 0)").collect()
    val left = SinkSource.fs(root).listStatus(new Path(root, "blooms"))
      .map(_.getPath.getName).toSet
    assert(left == cited, s"sweep must keep exactly the cited bitsets: $left")
    // refusals: unknown column, non-BIGINT column, silly sizing
    s.sql(s"ALTER TABLE graft_blg.`$table` ADD COLUMN tag STRING")
    intercept[Exception] {
      s.sql(s"CALL graft_blg.build_bloom('$table', 'nope', 10)").collect() }
    intercept[Exception] {
      s.sql(s"CALL graft_blg.build_bloom('$table', 'tag', 10)").collect() }
    intercept[Exception] {
      s.sql(s"CALL graft_blg.build_bloom('$table', 'v', 0)").collect() }
  }

  test("appends maintain bloom coverage; the build is incremental; fields merge") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_bloom_wp").toString
    val s = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(s.conf.set(k, v)) }
    import s.implicits._
    SinkSource.write((0L until 100L).map(v => (v % 2, v)).toDF("k", "v")
      .repartition(2, col("k")), root, overwrite = true)             // v1
    s.conf.set("spark.sql.catalog.graft_blw", classOf[SinkCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_blw.root",
      new Path(root).getParent.toString)
    val table = new Path(root).getName
    s.sql(s"CALL graft_blw.build_bloom('$table', 'v', 12)").collect() // v2
    // WRITE-PATH MAINTENANCE: the head's headers ARE the policy — an
    // append computes its own bitsets inline, so coverage does not
    // silently decay as the table grows
    SinkSource.write((100L until 200L).map(v => (v % 2, v)).toDF("k", "v")
      .repartition(2, col("k")), root, overwrite = false)            // v3
    val blooms = SinkSource.manifestBlooms(root)
    val allFiles = SinkSource.manifest(root).map(_._2).distinct
    assert(allFiles.forall(fl => blooms.get(fl).exists(_.exists(_._1 == 2))),
      s"appended files must carry write-maintained blooms: " +
        s"${allFiles.filterNot(fl => blooms.contains(fl))}")
    // no false negatives across build-covered AND append-born files
    val cache = scala.collection.mutable.Map.empty[String, Array[Byte]]
    (0L until 200L).foreach { x =>
      val hit = allFiles.exists { fl =>
        blooms(fl).exists { case (fid, m, k, bf) =>
          fid == 2 && SinkSource.SinkBloom.mightContain(
            cache.getOrElseUpdate(bf, SinkSource.readBloom(root, bf)),
            m, k, x)
        }
      }
      assert(hit, s"write-maintained bloom false negative for $x")
    }
    // probe quality is uniform: an absent needle is rejected by the
    // append-born files too (not just the built ones)
    assert(allFiles.forall { fl =>
      blooms(fl).exists { case (fid, m, k, bf) =>
        fid == 2 && !SinkSource.SinkBloom.mightContain(
          cache.getOrElseUpdate(bf, SinkSource.readBloom(root, bf)),
          m, k, 987654321L)
      }
    }, "append-born bitsets must reject an absent needle")
    // INCREMENTAL: a repeated build has nothing to do — zero files
    // indexed, no version burned
    val vBefore = SinkSource.currentVersion(root)
    val again = s.sql(
      s"CALL graft_blw.build_bloom('$table', 'v', 12)").collect()(0)
    assert(again.getLong(0) == 0L, s"full coverage → nothing to index: $again")
    assert(SinkSource.currentVersion(root) == vBefore,
      "a no-op build must not publish a version")
    // MULTI-FIELD MERGE: building a second column's blooms must not
    // drop the first's headers (and vice versa)
    s.sql(s"ALTER TABLE graft_blw.`$table` ADD COLUMN w BIGINT")
    s.sql(s"INSERT INTO graft_blw.`$table` VALUES (0, 500, 7), (1, 501, 8)")
    val afterInsert = SinkSource.manifestBlooms(root)
    val newFiles = SinkSource.manifest(root).map(_._2).distinct
      .filterNot(allFiles.contains)
    assert(newFiles.nonEmpty)
    assert(newFiles.forall(fl =>
      afterInsert.get(fl).exists(_.exists(_._1 == 2))),
      "evolved-schema appends still ride the v policy")
    s.sql(s"CALL graft_blw.build_bloom('$table', 'w', 10)").collect()
    val merged = SinkSource.manifestBlooms(root)
    newFiles.foreach { fl =>
      val fids = merged(fl).map(_._1).toSet
      assert(fids.contains(2) && fids.size == 2,
        s"second-column build must merge, not replace: $fl -> $fids")
    }
    // pre-evolution files have no w values to index — soundly skipped
    assert(allFiles.forall(fl => !merged(fl).exists(_._1 == 3) ||
      merged(fl).exists(_._1 == 2)))
  }
}

package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Model-based randomized test of the merge-on-read DML lifecycle:
  * a seeded random interleaving of APPEND / DELETE / UPDATE / VACUUM /
  * MERGE / OVERWRITE-BY-FILTER / EXPIRE against an in-memory multiset
  * model — after every operation the table's read-back must equal the
  * model exactly. This is the property the per-mechanism specs can't
  * give: the OPERATIONS COMPOSE (vectors over appended files, updates
  * of updated rows, a merge over vectored history, a key backfill
  * under live tombstones, snapshot expiry mid-stream — which must
  * NEVER change current reads) in orders nobody hand-picked.
  */
class SinkLifecyclePropertySpec extends SparkSpec {

  private def readBack(s: org.apache.spark.sql.SparkSession): Map[(Long, Long), Int] =
    s.sql("SELECT k, v FROM graft_mor.t").collect()
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .view.mapValues(_.length).toMap

  test("random DML interleavings match the multiset model") {
    for (seed <- Seq(14, 271, 828)) {
      val rnd = new scala.util.Random(seed)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_life_$seed").toString
      val s = spark.newSession()
      spark.conf.getAll.foreach { case (k, v) =>
        scala.util.Try(s.conf.set(k, v)) }
      import s.implicits._
      s.conf.set("spark.sql.catalog.graft_mor", classOf[SinkCatalog].getName)
      s.conf.set("spark.sql.catalog.graft_mor.root", root)
      s.conf.set("spark.sql.catalog.graft_mor.mor", "true")

      // model: multiset of (k, v)
      var model = Map.empty[(Long, Long), Int]
      var nextV = 0L
      def append(n: Int, overwrite: Boolean = false): Unit = {
        val rows = (0 until n).map { _ =>
          val r = (rnd.nextInt(4).toLong, nextV); nextV += 1; r
        }
        SinkSource.write(rows.toDF("k", "v").repartition(2, col("k")),
          s"$root/t", overwrite = overwrite)
        if (overwrite) model = Map.empty
        rows.foreach(r => model = model.updated(r, model.getOrElse(r, 0) + 1))
      }

      append(30, overwrite = true)
      val ops = 9
      for (step <- 1 to ops) {
        rnd.nextInt(8) match {
          case 0 => append(5 + rnd.nextInt(10))
          case 1 => // fine-grained delete
            val (m, r) = (2 + rnd.nextInt(4), rnd.nextInt(2))
            s.sql(s"DELETE FROM graft_mor.t WHERE v % $m = $r")
            model = model.filter { case ((_, v), _) => v % m != r }
          case 2 => // update: shift a slice into fresh value space
            val (m, r) = (2 + rnd.nextInt(4), rnd.nextInt(2))
            val delta = 1000000L * step
            s.sql(s"UPDATE graft_mor.t SET v = v + $delta WHERE v % $m = $r")
            model = model.toSeq.map {
              case ((k, v), c) if v % m == r => ((k, v + delta), c)
              case e => e
            }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
          case 3 =>
            s.sql("CALL graft_mor.compact('t')").collect()
          case 4 => // MoR MERGE: matched slice re-keys, plus inserts
            // (v is unique table-wide by construction, so ON v is
            // well-defined)
            val (m, r) = (2 + rnd.nextInt(4), rnd.nextInt(2))
            val shift = 100L * step
            val matched = model.keys.filter(_._2 % m == r)
              .map { case (k, v) => (k + shift, v) }.toSeq
            val inserts = (0 until 3).map { _ =>
              val row = (rnd.nextInt(4).toLong, nextV); nextV += 1; row
            }
            (matched ++ inserts).toDF("k", "v")
              .createOrReplaceTempView("life_src")
            s.sql(
              """MERGE INTO graft_mor.t t USING life_src s ON t.v = s.v
                |WHEN MATCHED THEN UPDATE SET k = s.k, v = t.v
                |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)
                |""".stripMargin)
            model = model.toSeq.map {
              case ((k, v), c) if v % m == r => ((k + shift, v), c)
              case e => e
            }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
            inserts.foreach(row =>
              model = model.updated(row, model.getOrElse(row, 0) + 1))
          case 5 => // overwrite-by-filter: backfill one key wholesale
            val kk = rnd.nextInt(4).toLong
            val rows = (0 until 3).map { _ =>
              val row = (kk, nextV); nextV += 1; row
            }
            rows.toDF("k", "v").writeTo("graft_mor.t")
              .overwrite(col("k") === kk)
            model = model.filter { case ((k, _), _) => k != kk }
            rows.foreach(row =>
              model = model.updated(row, model.getOrElse(row, 0) + 1))
          case 6 => // snapshot expiry must NEVER change current reads
            s.sql(s"CALL graft_mor.expire('t', ${1 + rnd.nextInt(3)})")
              .collect()
          case 7 => // orphan sweep must NEVER change current reads
            s.sql("CALL graft_mor.remove_orphans('t', 0)").collect()
        }
        val got = readBack(s)
        assert(got == model,
          s"seed=$seed step=$step diverged: " +
            s"extra=${(got.toSet -- model.toSet).take(5)} " +
            s"missing=${(model.toSet -- got.toSet).take(5)}")
        // ZONE-MAP invariants under every composition (CoW swaps,
        // compaction remaps, MoR vectors, truncates): stats never
        // outlive their files, and a random range read — the skipping
        // path — equals the model's slice
        val cited = SinkSource.manifest(s"$root/t").map(_._2).toSet
        val statKeys = SinkSource.manifestStats(s"$root/t").keySet
        assert(statKeys.subsetOf(cited),
          s"seed=$seed step=$step stats outlived files: ${statKeys -- cited}")
        if (model.nonEmpty) {
          val vs = model.keys.map(_._2)
          val (lo, hi) = {
            val a = vs.toSeq(rnd.nextInt(vs.size))
            val b = vs.toSeq(rnd.nextInt(vs.size))
            (math.min(a, b), math.max(a, b))
          }
          val ranged = s.sql(
            s"SELECT k, v FROM graft_mor.t WHERE v BETWEEN $lo AND $hi")
            .collect().groupBy(r => (r.getLong(0), r.getLong(1)))
            .view.mapValues(_.length).toMap
          val sliced = model.filter { case ((_, v), _) => v >= lo && v <= hi }
          assert(ranged == sliced,
            s"seed=$seed step=$step ranged read [$lo,$hi] diverged")
        }
      }
      // end state: vacuum everything and re-check once more
      s.sql("CALL graft_mor.compact('t')").collect()
      assert(readBack(s) == model, s"seed=$seed diverged after final vacuum")
    }
  }

  /** The INCREMENTAL-CONSUMPTION dual: over random append/delete/
    * update histories (the feed-expressible op set — no compaction,
    * truncate or CoW), two replay properties must hold at EVERY
    * step:
    *   - folding the change feed from version 0 with signed counts
    *     reconstructs the table's exact multiset (no change row lost,
    *     duplicated, or mis-signed, whatever the interleaving);
    *   - a materialized view refreshed through the feed equals the
    *     full recompute of the model (incremental ≡ batch — the
    *     textbook IVM equivalence, machine-checked).
    */
  test("change-feed folds and MV refreshes replay random DML histories") {
    for (seed <- Seq(7, 5040)) {
      val rnd = new scala.util.Random(seed)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_cdfp_$seed").toString
      val s = spark.newSession()
      spark.conf.getAll.foreach { case (k, v) =>
        scala.util.Try(s.conf.set(k, v)) }
      import s.implicits._
      s.conf.set("spark.sql.catalog.graft_cdfp", classOf[SinkCatalog].getName)
      s.conf.set("spark.sql.catalog.graft_cdfp.root", root)
      s.conf.set("spark.sql.catalog.graft_cdfp.mor", "true")

      var model = Map.empty[(Long, Long), Int]
      var nextV = 0L
      def append(n: Int, overwrite: Boolean): Unit = {
        val rows = (0 until n).map { _ =>
          val r = (rnd.nextInt(4).toLong, nextV); nextV += 1; r
        }
        SinkSource.write(rows.toDF("k", "v").repartition(2, col("k")),
          s"$root/t", overwrite = overwrite)
        rows.foreach(r => model = model.updated(r, model.getOrElse(r, 0) + 1))
      }
      append(25, overwrite = true)
      SinkMv.create(s, s"$root/mv", s"$root/t")

      for (step <- 1 to 7) {
        rnd.nextInt(3) match {
          case 0 => append(4 + rnd.nextInt(8), overwrite = false)
          case 1 =>
            val (m, r) = (2 + rnd.nextInt(4), rnd.nextInt(2))
            s.sql(s"DELETE FROM graft_cdfp.t WHERE v % $m = $r")
            model = model.filter { case ((_, v), _) => v % m != r }
          case 2 =>
            val (m, r) = (2 + rnd.nextInt(4), rnd.nextInt(2))
            val delta = 1000000L * step
            s.sql(s"UPDATE graft_cdfp.t SET v = v + $delta WHERE v % $m = $r")
            model = model.toSeq.map {
              case ((k, v), c) if v % m == r => ((k, v + delta), c)
              case e => e
            }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        }
        // fold the WHOLE feed: signed counts reconstruct the multiset
        val head = SinkSource.currentVersion(s"$root/t")
        val sign = when(col("_change_type") === "insert", lit(1))
          .otherwise(lit(-1))
        val folded = SinkChanges.load(s, s"$root/t", 0, head)
          .groupBy(col("k"), col("v")).agg(sum(sign).as("n"))
          .filter(col("n") =!= 0)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2).toInt)
          .toMap
        assert(folded == model,
          s"seed=$seed step=$step feed fold diverged: " +
            s"extra=${(folded.toSet -- model.toSet).take(5)} " +
            s"missing=${(model.toSet -- folded.toSet).take(5)}")
        // incremental MV ≡ batch recompute of the model
        SinkMv.refresh(s, s"$root/mv")
        val mv = SinkSource.load(s, s"$root/mv").collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        val expect = model.toSeq
          .flatMap { case ((k, v), c) => Seq.fill(c)((k, v)) }
          .groupBy(_._1).map { case (k, rs) =>
            k -> ((rs.size.toLong, rs.map(_._2).sum)) }
        assert(mv == expect, s"seed=$seed step=$step MV diverged: $mv")
      }
    }
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("contamination pairs meet the shingle threshold and never flag benchmark docs") {
    val rows = Curation.q67Contamination(spark, dir).collect()
    assert(rows.forall(_.getAs[Long]("n_shared") >= Curation.ContaminationMinShingles))
    assert(rows.forall(_.getAs[Long]("train_id") % 97 != 0))
    assert(rows.forall(_.getAs[Long]("bench_id") % 97 == 0))
  }

  test("tf-idf ranks exactly top-3 per doc with ties broken by term") {
    val byDoc = Curation.q68TfidfTopterms(spark, dir).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    // tfidf itself is no longer emitted (integer-exact contract);
    // recover it from the emitted model counts and check the ranking
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    byDoc.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rk")).sorted.sameElements(1 to rs.length))
      assert(rs.length <= 3)
      val scores = rs.sortBy(_.getAs[Int]("rk")).map { r =>
        round6(r.getAs[Long]("tf") *
          math.log(r.getAs[Long]("n_docs").toDouble / r.getAs[Long]("df")))
      }
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("repetition score is max-token share in (0, 1]") {
    val rows = Curation.q69Repetition(spark, dir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val rep = r.getAs[Double]("repetition")
      assert(rep > 0.0 && rep <= 1.0)
      assert(r.getAs[Long]("max_tok") <= r.getAs[Long]("n_toks"))
    }
  }

  test("pii scrub leaves no email or long digit run behind") {
    val rows = Curation.q70PiiScrub(spark, dir).collect()
    assert(rows.forall(_.getAs[Long]("n_redacted") >= 1)) // the appended email, at least
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}".r
    val idRun = "[0-9]{6,}".r
    rows.foreach { r =>
      val s = r.getAs[String]("scrubbed")
      assert(email.findFirstIn(s).isEmpty, s"email residue in doc ${r.getLong(0)}")
      assert(idRun.findFirstIn(s).isEmpty, s"digit-run residue in doc ${r.getLong(0)}")
      assert(s.contains("<EMAIL>"))
    }
  }

  test("sequence packing conserves every token and orders docs within shards") {
    val wins = Curation.q74SequencePacking(spark, dir).collect()
    val totalTokens = graft.sources.Tables.documents(spark, dir)
      .select(sum(size(split(col("text"), " ")).cast("bigint"))).collect()(0).getLong(0)
    assert(wins.map(_.getAs[Long]("win_tokens")).sum == totalTokens,
      "packing must conserve the total token count")
    assert(wins.forall(r => r.getAs[Long]("n_docs") >= 1))
    assert(wins.forall(r => r.getAs[Long]("first_doc") <= r.getAs[Long]("last_doc")))
    // within a shard, later windows hold later docs (concat order)
    wins.groupBy(_.getAs[Int]("shard")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("win"))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
      }
    }
  }

  test("training pipeline conserves exactly the kept documents' tokens") {
    val manifest = Curation.q81TrainingPipeline(spark, dir).collect()
    val keptTokens = Dedup.q56DedupKeepers(spark, dir)
      .select(col("doc_id"))
      .join(graft.sources.Tables.documents(spark, dir), Seq("doc_id"))
      .select(sum(size(split(col("text"), " ")).cast("bigint")))
      .collect()(0).getLong(0)
    assert(manifest.nonEmpty)
    assert(manifest.map(_.getAs[Long]("n_tokens")).sum == keptTokens,
      "end-to-end pipeline must conserve the kept documents' token count")
    assert(manifest.forall { r =>
      val s = r.getAs[Int]("out_shard"); s >= 0 && s < Curation.OutShards
    })
  }

  test("source mixture keeps a deterministic subset at roughly the configured rates") {
    val a = Curation.q71SourceMixture(spark, dir).collect().map(_.getLong(0)).toSeq
    val b = Curation.q71SourceMixture(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(a == b) // same rows every run — no rand()
    val kept = Curation.q71SourceMixture(spark, dir)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = graft.sources.Tables.documents(spark, dir)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // src0 keeps ~50%: allow wide slack on 500 rows, but the ORDER of
    // rates must hold: src0 rate > others' pooled rate
    val src0Rate = kept.getOrElse("src0", 0L).toDouble / total("src0")
    val restKept = (kept - "src0").values.sum.toDouble
    val restTotal = (total - "src0").values.sum.toDouble
    assert(src0Rate > restKept / restTotal)
  }
}

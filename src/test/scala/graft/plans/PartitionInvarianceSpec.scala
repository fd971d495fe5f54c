package graft.plans

import graft.SparkSpec

/** The driver gate hashes query outputs, so results must be
  * bit-identical regardless of physical parallelism: partition count
  * must not leak through double-sum orders, top-k partial-aggregate
  * merges, or decimal accumulation. This spec runs the most
  * order-sensitive queries (exact-decimal LM sums, TopKByLong
  * rankings, pair-local dedup verdicts) under two different
  * shuffle-partition settings and requires identical rows.
  */
class PartitionInvarianceSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  // the tie/order-sensitive tier: LM scoring (decimal sums), retrieval
  // rankings (TopKByLong merges), semantic dedup (pair-local verdict),
  // and the composed pipeline over all three
  val sensitive = Seq("q94_unigram_lm_score", "q158_bigram_lm_score",
    "q173_decayed_value", "q187_bm25_retrieval", "q188_hybrid_rrf",
    "q189_dsir_weights", "q190_semantic_dedup", "q191_retrieval_eval",
    "q192_selection_pipeline", "q193_stream_dsir_gate",
    "q194_stream_admission_stack",
    // round 11: global sort-limit merge adoption + greedy fold (q204),
    // decimal neighbourhood sums + margin rerank (q206), prefix-filter
    // verify (q195), quantile thresholds + contingency (q205)
    "q204_bpe_train", "q206_bitext_margin", "q195_prefix_filter_join",
    "q205_quality_calibration",
    // round 12: interpolated-percentile thresholds feeding phase/bin
    // membership (q229, q231), renormalized power iterates (q227 —
    // double divide+round per iteration), probe-rank min_by mining
    // (q223), recall sweep over the ranked probe (q213), and the
    // sketch-agreement cross-tab whose inputs ride partial-agg merges
    // (q217)
    "q229_curriculum_phases", "q231_robust_scaling",
    "q227_power_iteration", "q223_hard_negatives", "q213_recall_at_k",
    "q217_sketch_fidelity",
    // round 13: merge-table pivot + nested greedy fold over the
    // trained-merges boundary (q232), L1 rerank window over the
    // probe's double-cos pool ranking (q233)
    "q232_tokenizer_apply", "q233_cross_rerank",
    // round 13 (cont.): bitmap-state cube build + OR-merge rollup
    // (q234 — partial bitmap merges across partitions must commute)
    "q234_bitmap_cube",
    // round 14: queries whose hash-gated result encodes FILE LAYOUT
    // (n_files per key) — the one-file-per-key bound must hold at any
    // writing parallelism: sink-demanded clustering (q269), the
    // compaction procedure (q276), and the vector-purging vacuum
    // (q280)
    "q269_clustered_write", "q276_compact_procedure", "q280_mor_vacuum")

  test("results are bit-identical across shuffle-partition settings") {
    def run(parts: Int): Map[String, Seq[String]] = {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", parts.toString)
      // fresh boundary root per setting: StageBoundary-backed queries
      // must REBUILD their boundaries under each partition count, or
      // the second run would just read the first run's parquet and the
      // build path's order-sensitivity would go untested (the driver
      // builds boundaries fresh at its own parallelism, so build
      // invariance is what the hash gate actually needs)
      s.conf.set("graft.shards.dir", java.nio.file.Files
        .createTempDirectory(s"graft_pinv_$parts").toString)
      sensitive.map { q =>
        val rows = graft.SparkEntry.queries(q)(s, dir).collect()
          .map(_.toSeq.map(v => String.valueOf(v)).mkString("|"))
          .toSeq.sorted
        s.catalog.clearCache()
        q -> rows
      }.toMap
    }
    val at3 = run(3)
    val at13 = run(13)
    sensitive.foreach { q =>
      assert(at3(q).nonEmpty, s"$q returned no rows")
      assert(at3(q) == at13(q),
        s"$q output depends on shuffle partition count")
    }
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** IVF-style approximate nearest neighbour over the embeddings table.
  *
  * The coarse quantizer is DETERMINISTIC: the k pivot vectors are the
  * rows with `vec_id % ceil(N/k) == 0` (evenly spread over the id
  * space), and every vector is assigned to the pivot minimizing the
  * EXACT integer-scaled squared L2 distance
  * `‖a‖² + ‖p‖² − 2·a·p` — all three terms exact int64 sums over the
  * round(x·10⁶) scaled components (same scheme as [[Similarity]]), so
  * the assignment is reproducible bit-for-bit in SQL and the whole
  * operator carries a DuckDB oracle (the k-means quantizer it replaces
  * did not). Accuracy vs brute force is asserted in IvfAnnSpec. Cell
  * ids are positional over the seed set, so sparse/offset id spaces
  * work; a seed predicate that matches NOTHING fails loud in
  * [[buildIndex]] rather than returning empty probe results.
  *
  * Scale notes (100 TB): the pivots are k driver-side rows turned into
  * literal expressions — cell assignment and query routing are pure
  * per-row codegen projections (DotProductLong), no shuffle; only the
  * probe equi-join shuffles, keyed on cell id, scanning corpus/k·nprobe
  * vectors per query. Hot cells would be salted like any hot join key.
  */
object IvfAnn {

  /** cells: (vec_id, cell, sv, nrm); pivots: (cell, sv, nrm). */
  case class Index(cells: DataFrame, pivots: Array[(Int, Array[Long], Long)])

  private def scaled: Column =
    transform(col("embedding"), x => round(x.cast("double") * 1000000).cast("bigint"))

  private def dot(a: Column, b: Column): Column =
    graft.functions.DotProductLong.dot_product_long(a, b)

  private def withScaledNorm(df: DataFrame): DataFrame =
    df.withColumn("sv", scaled).withColumn("nrm", dot(col("sv"), col("sv")))

  /** Exact squared L2 distance of row vector `sv`/`nrm` to one pivot,
    * as a literal-folded codegen expression.
    */
  private def pivotDist(p: (Int, Array[Long], Long)): Column = {
    val lits = array(p._2.map(lit): _*)
    col("nrm") + lit(p._3) - lit(2L) * dot(col("sv"), lits)
  }

  /** Distances to every pivot, in cell order. */
  private def distArray(pivots: Array[(Int, Array[Long], Long)]): Column =
    array(pivots.sortBy(_._1).map(pivotDist): _*)

  def buildIndex(spark: SparkSession, dir: String, k: Int): Index =
    buildIndexFrom(Tables.embeddingsSharded(spark, dir), k)

  /** The SHARED seed index for (dir, k), through persisted stage
    * boundaries (StageBoundary): cells and codebook are built once per
    * DATASET and reloaded by every consumer — q49's probe, q190's
    * semantic dedup, q198's filtered ANN, the bitext miners and q207's
    * sweep all use the same (dir, k=8) index, and before this boundary
    * each invocation re-ran the corpus count + codebook collect + cell
    * assignment per SESSION (the q82 rule). Reload is value-neutral by
    * the same parquet type-mapping contract q185's persistence
    * round-trip pins (exact int64 components); assignment against a
    * fixed codebook is per-vector deterministic, so reloaded-index
    * serving is bit-identical to a fresh build (IvfDeltaSpec's
    * equivalence). A 100 TB serving tier stores exactly this layout
    * and never rebuilds per query.
    */
  def sharedIndex(spark: SparkSession, dir: String, k: Int): Index = {
    import spark.implicits._
    // at most one real build feeds both boundaries (same fingerprint);
    // on a double hit the build never runs — only the k-row codebook
    // collect from parquet remains
    lazy val built = buildIndex(spark, dir, k)
    val cells = graft.sources.StageBoundary(spark, s"ivf${k}cells", dir)(
      built.cells)
    val cb = graft.sources.StageBoundary(spark, s"ivf${k}cb", dir)(
      built.pivots.toSeq.map { case (c, sv, n) => (c, sv.toSeq, n) }
        .toDF("cell", "sv", "nrm").coalesce(1))
    val pivots = cb.collect()
      .map(r => (r.getAs[Int]("cell"), r.getAs[Seq[Long]]("sv").toArray,
        r.getAs[Long]("nrm")))
      .sortBy(_._1)
    Index(cells.select(col("vec_id"), col("cell").cast("int").as("cell"),
      col("sv"), col("nrm")), pivots)
  }

  /** Index an arbitrary `(vec_id, embedding)` frame — the id space need
    * not be dense or zero-based.
    */
  def buildIndexFrom(vectors: DataFrame, k: Int): Index = {
    val base = withScaledNorm(vectors)
    val n = base.count()
    val m = math.max(1L, (n + k - 1) / k)
    // ~k rows to the driver — the IVF "codebook"; broadcast as literals.
    // Seeds are the `vec_id % m == 0` rows; cell ids are POSITIONAL
    // (rank of the seed by vec_id), so sparse or offset id spaces still
    // yield a contiguous 0..len-1 cell space (for dense-from-0 ids this
    // equals the `vec_id DIV m` labelling the oracle uses — both are
    // monotone relabelings of the same seed set, and cells only ever
    // join on equality, never appear in output).
    val pivots = base.filter(col("vec_id") % m === 0)
      .select(col("vec_id").cast("long"), col("sv"), col("nrm"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
      .sortBy(_._1)
      .zipWithIndex
      .map { case ((_, sv, nrm), cell) => (cell, sv, nrm) }
    // an empty codebook would make every distance array empty and cell
    // assignment silently produce nulls downstream — fail loud instead
    // (possible only if NO id is ≡ 0 (mod m), e.g. an all-odd sparse
    // id space; pick a different seed predicate for such corpora)
    require(pivots.nonEmpty,
      s"IVF codebook is empty: no vec_id ≡ 0 (mod $m) among $n rows — " +
        "the seed predicate assumes ids spread over [0, N); re-key or " +
        "re-seed the quantizer for this id space")
    // argmin by (distance, cell): array_position finds the FIRST index
    // holding the min, so ties break toward the smaller cell id
    val d = distArray(pivots)
    val cells = base.select(col("vec_id"),
      (array_position(d, array_min(d)) - 1).cast("int").as("cell"),
      col("sv"), col("nrm"))
    Index(cells, pivots)
  }

  /** Lloyd-REFINED codebook: `iters` k-means iterations from the q49
    * seed pivots — the "replace the random/seed pivots with k-means
    * centroids" upgrade the base index's scaladoc names. Exactness is
    * preserved through training: after each mean the centroid is
    * rounded back to scaled-integer components (round-half-away, the
    * shared engine semantics), so every assignment — including the
    * final one — is the same exact int64 distance the seed index uses
    * and the WHOLE training loop replays in DuckDB. A cell that loses
    * all members keeps its previous centroid (the standard Lloyd
    * convention).
    * Scale notes (100 TB): each iteration is one per-row codegen
    * assignment (no shuffle) plus one (cell, pos) aggregation whose
    * result is k·dim rows — the codebook-sized collect the base index
    * already makes; the corpus never moves. Iteration count is a small
    * constant (2 here), as in any production IVF build.
    */
  def buildTrainedIndex(spark: SparkSession, dir: String, k: Int, iters: Int): Index =
    buildTrainedIndexFrom(Tables.embeddingsSharded(spark, dir), k, iters)

  def buildTrainedIndexFrom(vectors: DataFrame, k: Int, iters: Int): Index = {
    val base = withScaledNorm(vectors)
    var idx = buildIndexFrom(vectors, k)
    for (_ <- 0 until iters) {
      // element-wise member means: posexplode to (cell, pos, v), one
      // two-key aggregation, k·dim rows back to the driver
      val sums = idx.cells
        .select(col("cell"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
        .collect()
        .groupBy(_.getInt(0))
      val pivots = idx.pivots.map { case (cell, oldSv, oldNrm) =>
        sums.get(cell) match {
          case Some(rows) =>
            // round half-AWAY-from-zero (BigDecimal HALF_UP on the IEEE
            // quotient) — Math.round would round -0.5 toward +inf and
            // diverge from both engines' round()
            val sv = rows.sortBy(_.getInt(1)).map { r =>
              BigDecimal(r.getLong(2).toDouble / r.getLong(3))
                .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
            }
            (cell, sv, sv.map(x => x * x).sum)
          case None => (cell, oldSv, oldNrm)
        }
      }
      val d = distArray(pivots)
      idx = Index(base.select(col("vec_id"),
        (array_position(d, array_min(d)) - 1).cast("int").as("cell"),
        col("sv"), col("nrm")), pivots)
    }
    idx
  }

  /** Total exact squared-L2 distortion of an index's assignment — the
    * quantity Lloyd iterations monotonically improve (up to centroid
    * rounding); spec-asserted, not part of any query result.
    */
  def distortion(index: Index): Long = {
    val d = distArray(index.pivots)
    index.cells
      .select(element_at(d, col("cell") + 1).as("dist"))
      .agg(sum(col("dist"))).collect()(0).getLong(0)
  }

  /** Assign an arbitrary `(vec_id, embedding)` frame to an EXISTING
    * index's cells — the filtered-ANN building block (q198): the
    * candidate set is restricted scan-side (metadata predicate pushed
    * to the source), then re-labelled against the shared codebook with
    * the same exact integer-scaled distance as [[buildIndexFrom]] — a
    * pure per-row codegen projection, no shuffle and no index rebuild.
    */
  def assignTo(index: Index, vectors: DataFrame): DataFrame = {
    val d = distArray(index.pivots)
    withScaledNorm(vectors)
      .withColumn("cell", (array_position(d, array_min(d)) - 1).cast("int"))
      .select(col("vec_id"), col("cell"), col("sv"), col("nrm"))
  }

  /** Probe the `nprobe` nearest cells per query; exact cosine top-k
    * within the probed set, ranked by (cos desc, cand_id).
    */
  def probe(spark: SparkSession, index: Index, queries: DataFrame,
      nprobe: Int, topK: Int): DataFrame = {
    // more probes than cells would make element_at return null for the
    // excess indices and silently drop those probe rows
    require(nprobe >= 1 && nprobe <= index.pivots.length,
      s"nprobe=$nprobe must be in [1, ${index.pivots.length}]")
    // rank cells by encoding (distance, cell) into one sortable bigint:
    // d·k + cell keeps integer exactness (d ≤ 4·64·10¹² ≪ 2⁶³/k) and
    // breaks distance ties toward the smaller cell id — a pure
    // projection, no shuffle
    val k = index.pivots.length
    val ranked = array_sort(zip_with(
      distArray(index.pivots),
      sequence(lit(0L), lit(k - 1L)),
      (dist, cellId) => dist * k + cellId))
    // explode a FOLDABLE sequence and index into the materialized cell
    // list: exploding the computed array directly makes
    // InferFiltersFromGenerate inline the whole 8-pivot distance
    // pipeline into a pushed-down `size(...) > 0` filter (same trap as
    // the q32 band explode — see Dedup.q32MinhashNeardup)
    val q = withScaledNorm(queries)
      .select(col("vec_id").as("query_id"), col("sv").as("qsv"), col("nrm").as("qnrm"),
        transform(slice(ranked, 1, nprobe), v => (v % k).cast("int")).as("cells"),
        explode(sequence(lit(0), lit(nprobe - 1))).as("i"))
      .select(col("query_id"), col("qsv"), col("qnrm"),
        element_at(col("cells"), col("i") + 1).as("cell"))
    val cos = round(dot(col("qsv"), col("sv")).cast("double") /
      sqrt(col("qnrm").cast("double")) / sqrt(col("nrm").cast("double")), 6)
    val scored = q.join(index.cells, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"), cos.as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= topK)
      .select(col("query_id"), col("rk"), col("cand_id"), col("cos"))
  }
}

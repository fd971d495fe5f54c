package graft.sources

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DataSource V2 source with a KEY-GROUPED physical layout — the
  * connector contract behind storage-partitioned joins (SPJ). The
  * table is a directory of `k=<key>` subdirectories, one pipe-separated
  * data file each; the scan reports
  * [[org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning]]
  * over the key column and every input partition exposes its key via
  * [[HasPartitionKey]], which is exactly what Iceberg/Delta-style
  * tables report so Catalyst can plan a join between two such tables
  * WITHOUT any shuffle exchange (`spark.sql.sources.v2.bucketing
  * .enabled`; SpjSpec pins the exchange-free join). q129 pins the V1
  * (Hive bucketing) form of co-located joins; this source pins the V2
  * form — partition VALUES are first-class, so the planner can also
  * pad mismatched key sets (`pushPartValues`) instead of falling back
  * to a full shuffle when one side is missing keys.
  *
  * The layout is deliberately minimal (fixed `(k BIGINT, v BIGINT)`
  * schema, text payload): the mechanism under test is the
  * partitioning METADATA contract between connector and planner, not
  * a storage format.
  */
class SpjSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SpjSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SpjTable(properties.get("path"),
      "true".equalsIgnoreCase(properties.get("columnar")),
      "true".equalsIgnoreCase(properties.get("ordered")))
}

object SpjSource {
  val schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))

  def load(spark: SparkSession, path: String,
      columnar: Boolean = false, ordered: Boolean = false): DataFrame =
    spark.read.format("graft.sources.SpjSource").option("path", path)
      .option("columnar", columnar.toString)
      .option("ordered", ordered.toString).load()

  /** Stage a bounded (key, value) frame into the key-grouped layout:
    * one `k=<key>` directory per key. Bounded-by-construction callers
    * only (per-nation aggregates, codebooks) — the collect is the
    * staging step, not the query path.
    */
  def stage(rows: Seq[(Long, Long)], root: String): Unit = {
    val dir = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.StreamConverters._
      java.nio.file.Files.walk(dir).toScala(Seq).reverse
        .foreach(java.nio.file.Files.delete)
    }
    rows.groupBy(_._1).foreach { case (k, kv) =>
      val d = dir.resolve(s"k=$k")
      java.nio.file.Files.createDirectories(d)
      val body = kv.map { case (key, v) => s"$key|$v" }.mkString("\n")
      java.nio.file.Files.write(d.resolve("data.psv"),
        (body + "\n").getBytes("UTF-8"))
    }
  }
}

class SpjTable(path: String, columnar: Boolean = false,
    ordered: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"spj($path)"
  override def schema(): StructType = SpjSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def partitioning(): Array[Transform] =
    Array(Expressions.identity("k"))
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SpjScanBuilder(path, columnar, ordered)
}

/** Filter pushdown as MANIFEST PRUNING: key-column predicates are
  * evaluated against the partition VALUES at planning time, so whole
  * `k=<key>` directories are never listed into the scan — the
  * connector-side analogue of what Iceberg/Delta do with partition
  * stats manifests (q63 pins Spark's OWN directory pruning; here the
  * SOURCE prunes, which is where the decision lives for V2 tables).
  * Every filter is also returned as a residual, so Spark re-evaluates
  * on rows and correctness NEVER depends on the pruning being right —
  * pruning is purely an I/O reduction, exactly the production
  * contract.
  */
class SpjScanBuilder(path: String, columnar: Boolean = false,
    ordered: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._
  private var pushed: Array[Filter] = Array.empty

  private def prunable(f: Filter): Boolean = f match {
    case EqualTo("k", _) | GreaterThan("k", _) | GreaterThanOrEqual("k", _)
       | LessThan("k", _) | LessThanOrEqual("k", _) | In("k", _) => true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(prunable)
    filters // all residual: pruning reduces I/O, rows are still verified
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan =
    if (ordered) new SpjOrderedScan(path, pushed, columnar)
    else new SpjScan(path, pushed, columnar)
}

/** CONNECTOR-reported ordering (`ordered=true`,
  * [[SupportsReportOrdering]]): each input partition is a single
  * `k=<key>` directory, so rows within a partition are trivially
  * sorted by `k` — reporting that ordering lets the planner drop the
  * Sort it would otherwise insert under a sort-merge join, turning
  * the storage-partitioned join into a pure streaming merge: zero
  * exchanges (SPJ) AND zero sorts (this). Opt-in so every existing
  * SPJ plan keeps its pinned shape.
  * Scale notes (100 TB): sort-free SMJ is the end state of a
  * well-laid-out fact-fact join — the layout already paid for the
  * sort at write time (q269's sink-demanded ordering is the write
  * half of this contract); re-sorting petabytes at read time because
  * the scan didn't REPORT the layout is pure waste.
  */
class SpjOrderedScan(path: String,
    pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
    columnar: Boolean = false)
    extends SpjScan(path, pushed, columnar) with SupportsReportOrdering {
  import org.apache.spark.sql.connector.expressions.{SortDirection, SortOrder}

  override def outputOrdering(): Array[SortOrder] = Array(
    Expressions.sort(Expressions.column("k"), SortDirection.ASCENDING))
  override def description(): String =
    super.description().stripSuffix(")") + ", reportedOrdering=[k ASC])"
}

/** One input partition per key directory; [[partitionKey]] is what lets
  * the planner group splits by key value and align the two join sides.
  */
case class SpjInputPartition(key: Long, file: String)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](key))
}

/** RUNTIME filtering (the V2 form of dynamic partition pruning): after
  * the join's build side materializes, Spark hands the scan the set of
  * join-key values that can possibly match ([[filter]]), and the scan
  * drops whole `k=` partitions before planning splits — the connector
  * analogue of q145's V1 DPP, with the pruning decision inside the
  * source where V2 tables keep it. Like the planning-time pruning
  * above, it is purely an I/O reduction: the join itself still
  * verifies every row, so a filtering bug cannot corrupt results.
  */
class SpjScan(path: String,
    pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
    columnar: Boolean = false)
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsRuntimeFiltering {
  import org.apache.spark.sql.sources._
  import org.apache.spark.sql.connector.expressions.NamedReference

  override def readSchema(): StructType = SpjSource.schema
  override def toBatch: Batch = this

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("k"))

  @volatile private var runtime: Array[Filter] = Array.empty
  override def filter(filters: Array[Filter]): Unit = { runtime = filters }

  private def keep(k: Long): Boolean = (pushed ++ runtime).forall {
    case EqualTo("k", v)            => k == v.asInstanceOf[Number].longValue
    case GreaterThan("k", v)        => k > v.asInstanceOf[Number].longValue
    case GreaterThanOrEqual("k", v) => k >= v.asInstanceOf[Number].longValue
    case LessThan("k", v)           => k < v.asInstanceOf[Number].longValue
    case LessThanOrEqual("k", v)    => k <= v.asInstanceOf[Number].longValue
    case In("k", vs) => vs.exists(_.asInstanceOf[Number].longValue == k)
    case _ => true
  }

  private lazy val allKeys: Seq[Long] = {
    val root = java.nio.file.Paths.get(path)
    import scala.jdk.StreamConverters._
    java.nio.file.Files.list(root).toScala(Seq)
      .map(_.getFileName.toString)
      .filter(_.startsWith("k="))
      .map(_.stripPrefix("k=").toLong).sorted
  }

  // def, not lazy val: the runtime filter may arrive after planning
  // first touched the partition list, and the post-filter plan must
  // see the pruned set
  private def parts: Array[SpjInputPartition] =
    allKeys.filter(keep).map { k =>
      SpjInputPartition(k,
        java.nio.file.Paths.get(path, s"k=$k", "data.psv").toString)
    }.toArray

  /** Printed inside the plan's BatchScan line — carries the pruning
    * evidence (`keys=<kept>/<total>`) the way production connectors
    * surface their pushed state. */
  override def description(): String =
    s"SpjScan(keys=${parts.length}/${allKeys.length}, " +
      s"pushed=[${pushed.mkString(", ")}])"

  override def planInputPartitions(): Array[InputPartition] =
    parts.toArray[InputPartition]

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("k")), parts.length)

  override def createReaderFactory(): PartitionReaderFactory =
    if (columnar) new SpjColumnarReaderFactory
    else new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new SpjReader(p.asInstanceOf[SpjInputPartition].file)
    }
}

/** VECTORIZED connector reads (`columnar=true`): the factory declares
  * [[PartitionReaderFactory.supportColumnarReads]] and hands Spark
  * [[org.apache.spark.sql.vectorized.ColumnarBatch]]es built on
  * on-heap column vectors — the engine consumes them through a
  * ColumnarToRow boundary that whole-stage codegen reads with direct
  * column accessors (no per-row InternalRow materialization in the
  * source). This is the V2 contract parquet/ORC readers and Arrow-
  * native connectors run on; the row [[SpjReader]] remains the
  * default so every existing SPJ plan is unchanged. Batches are
  * bounded (BatchRows rows), never one file = one batch — at scale a
  * partition does not fit a single vector allocation.
  */
class SpjColumnarReaderFactory extends PartitionReaderFactory {
  override def supportColumnarReads(p: InputPartition): Boolean = true
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    throw new UnsupportedOperationException("columnar-only factory")
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new SpjColumnarReader(p.asInstanceOf[SpjInputPartition].file)
}

class SpjColumnarReader(file: String)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.ColumnarBatch

  private val BatchRows = 4096
  private val lines = java.nio.file.Files
    .readAllLines(java.nio.file.Paths.get(file)).iterator()
  private var batch: ColumnarBatch = _

  override def next(): Boolean = {
    if (!lines.hasNext) return false
    if (batch != null) batch.close()
    val ks = new OnHeapColumnVector(BatchRows, LongType)
    val vs = new OnHeapColumnVector(BatchRows, LongType)
    var n = 0
    while (n < BatchRows && lines.hasNext) {
      val cols = lines.next().split('|')
      ks.putLong(n, cols(0).toLong)
      vs.putLong(n, cols(1).toLong)
      n += 1
    }
    batch = new ColumnarBatch(Array(ks, vs), n)
    true
  }
  override def get(): ColumnarBatch = batch
  override def close(): Unit = if (batch != null) batch.close()
}

class SpjReader(file: String) extends PartitionReader[InternalRow] {
  private val lines = java.nio.file.Files
    .readAllLines(java.nio.file.Paths.get(file)).iterator()
  private var row: InternalRow = _
  override def next(): Boolean = {
    if (!lines.hasNext) return false
    val cols = lines.next().split('|')
    row = new GenericInternalRow(Array[Any](cols(0).toLong, cols(1).toLong))
    true
  }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}

package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 provider for the municipality→department→region
  * snapshot — the scale mapping of the reference's Socrata REST fetch
  * (`/root/reference/dimension.py:121-133`, SURVEY §2.1 S6): instead of
  * a driver-side HTTP pull lifted via createDataFrame, the snapshot is
  * a first-class table (`spark.read.format("graft.sources.RegionSource")
  * .load()`) with schema, column pruning, and partition planning. A
  * production variant would page the REST dataset across input
  * partitions; the static snapshot keeps this hermetic.
  */
class RegionSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RegionSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new RegionTable
}

object RegionSource {
  val schema: StructType = StructType(Seq(
    StructField("municipio", StringType, nullable = false),
    StructField("departamento", StringType, nullable = false),
    StructField("region", StringType, nullable = false)))

  /** Deterministic snapshot rows (already-repaired spellings, matching
    * Mojibake output so dim joins resolve). */
  val rows: Seq[(String, String, String)] = Seq(
    ("Bogotá D.C.", "Cundinamarca", "Andina"),
    ("Medellín", "Antioquia", "Andina"),
    ("Bagadó", "Chocó", "Pacífica"),
    ("Facatativá", "Cundinamarca", "Andina"),
    ("Jamundí", "Valle del Cauca", "Pacífica"),
    ("Montería", "Córdoba", "Caribe"),
    ("Nuquí", "Chocó", "Pacífica"),
    ("Quibdó", "Chocó", "Pacífica"),
    ("Valparaíso", "Antioquia", "Andina"),
    ("Cali", "Valle del Cauca", "Pacífica"),
    ("Barranquilla", "Atlántico", "Caribe"),
    ("Cartagena", "Bolívar", "Caribe"),
    ("Bucaramanga", "Santander", "Andina"),
    ("Pereira", "Risaralda", "Andina"),
    ("Manizales", "Caldas", "Andina"),
    ("Ibagué", "Tolima", "Andina"),
    ("Villavicencio", "Meta", "Orinoquía"),
    ("Leticia", "Amazonas", "Amazonía"),
    ("Santa Marta", "Magdalena", "Caribe"),
    ("Cúcuta", "Norte de Santander", "Andina"))
}

class RegionTable extends Table with SupportsRead {
  override def name(): String = "region_snapshot"
  override def schema(): StructType = RegionSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RegionScanBuilder(RegionSource.schema)
}

/** Scan builder with column pruning (SupportsPushDownRequiredColumns):
  * a `select(municipio)` reads one column, not three. */
class RegionScanBuilder(var prunedSchema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  override def pruneColumns(requiredSchema: StructType): Unit =
    prunedSchema = requiredSchema
  override def build(): Scan = new RegionScan(prunedSchema)
}

class RegionScan(schema: StructType) extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(RegionPartition(0))
  override def createReaderFactory(): PartitionReaderFactory =
    new RegionReaderFactory(schema)
}

case class RegionPartition(idx: Int) extends InputPartition

class RegionReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val fieldIdx = schema.fieldNames.map(RegionSource.schema.fieldIndex)
      private val it = RegionSource.rows.iterator
      private var current: (String, String, String) = _
      override def next(): Boolean = { if (it.hasNext) { current = it.next(); true } else false }
      override def get(): InternalRow = {
        val all = Array(current._1, current._2, current._3)
        InternalRow.fromSeq(fieldIdx.map(i => UTF8String.fromString(all(i))).toIndexedSeq)
      }
      override def close(): Unit = ()
    }
}

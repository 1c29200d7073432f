package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 shapefile source:
  * `spark.read.format("shapefile").load(path)` — path may be one .shp,
  * a directory of shards, or a final-segment glob (as the KML source).
  *
  * Schema is inferred from the FIRST file's .dbf at planning time
  * (path + WKB geometry + attribute columns); one InputPartition per
  * .shp file, since the format is not splittable — a sharded directory
  * is the parallel layout (see [[Shapefile]]).
  */
class ShapefileDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "shapefile"

  override def inferSchema(
      options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "shapefile source requires a path"))
    val files = ShapefileDataSource.listShp(path)
    require(files.nonEmpty, s"no .shp files at $path")
    Shapefile.schemaFor(files.head)
  }

  override def getTable(schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ShapefileTable(properties.asScala.getOrElse("path",
      throw new IllegalArgumentException(
        "shapefile source requires a path")), schema)
}

object ShapefileDataSource {
  /** .shp file listing — same final-segment-glob contract as
    * [[KmlDataSource.listFiles]].
    */
  def listShp(pathSpec: String): Seq[String] = {
    def listDir(dir: java.nio.file.Path,
        keep: java.nio.file.Path => Boolean): Seq[String] = {
      val s = java.nio.file.Files.list(dir)
      try s.iterator().asScala.filter(keep).map(_.toString).toSeq.sorted
      finally s.close()
    }
    val p = java.nio.file.Paths.get(pathSpec)
    if (java.nio.file.Files.isDirectory(p))
      listDir(p, _.toString.toLowerCase.endsWith(".shp"))
    else if (pathSpec.contains("*")) {
      val fileName = p.getFileName.toString
      val dir = Option(p.getParent)
        .getOrElse(java.nio.file.Paths.get("."))
      require(!dir.toString.contains("*"),
        s"glob only supported in the final path segment: $pathSpec")
      val matcher = java.nio.file.FileSystems.getDefault
        .getPathMatcher(s"glob:$fileName")
      listDir(dir, f => matcher.matches(f.getFileName))
    } else Seq(pathSpec)
  }
}

class ShapefileTable(path: String, tschema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"shapefile:$path"
  override def schema(): StructType = tschema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ShapefileScanBuilder(path, tschema)
}

/** Column pruning reaches the FILE level: a projection without
  * `geometry` never opens the .shp, one without attributes never opens
  * the .dbf (see [[Shapefile.readFileProjected]]) — the V2 equivalent
  * of parquet column pruning for a row-oriented sidecar format.
  */
class ShapefileScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve our column order; requiredSchema arrives in ours anyway
    required = StructType(
      full.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new ShapefileScan(path, required)
}

class ShapefileScan(path: String, tschema: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = tschema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    ShapefileDataSource.listShp(path)
      .map(ShapefileInputPartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ShapefileReaderFactory(tschema)
}

case class ShapefileInputPartition(file: String) extends InputPartition

class ShapefileReaderFactory(tschema: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[ShapefileInputPartition].file
    new PartitionReader[InternalRow] {
      private val rows = Shapefile.readFileProjected(
        file, tschema.fieldNames.toIndexedSeq)
      override def next(): Boolean = rows.hasNext
      override def get(): InternalRow =
        InternalRow.fromSeq(rows.next().toIndexedSeq.map {
          case s: String => UTF8String.fromString(s)
          case other => other
        })
      override def close(): Unit = ()
    }
  }
}

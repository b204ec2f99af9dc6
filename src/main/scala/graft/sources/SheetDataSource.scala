package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table,
  TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition,
  PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{DataType, DoubleType, LongType,
  StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.read.format("graft.sheet")` — positional-header sheet CSV as
  * a first-class DataSourceV2 (the reference's sheet ingestion,
  * etl/extract.py:172-279, as a *source* rather than a library call):
  *
  *   spark.read.format("graft.sheet")
  *     .option("headerRow", 3)            // 1-based; default 1
  *     .load("/path/export.csv")
  *
  * Semantics match `Extract.readSheet`: schema sized and named from
  * the HEADER row (trim, empty → col_{i}, duplicates suffixed), all
  * columns string, empty cells null, ragged rows null-padded, fully
  * empty rows dropped.
  *
  * Scale design: one InputPartition per sheet — sheets are small,
  * human-edited inputs by contract (the positional header only exists
  * in file order), so a split would be wrong, not just unnecessary;
  * big data enters via parquet. Column pruning IS pushed down
  * (`SupportsPushDownRequiredColumns`): `select(two cols)` parses but
  * never materializes the other cells.
  */
class SheetDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft.sheet"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SheetDataSource.schemaFor(options)

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new SheetTable(schema, new CaseInsensitiveStringMap(properties))
}

object SheetDataSource {

  private[sources] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty,
      "graft.sheet needs a single .load(path) — sheets are one file")
    p
  }

  private[sources] def headerRowOf(options: CaseInsensitiveStringMap): Int = {
    val h = options.getInt("headerRow", 1)
    require(h >= 1, s"headerRow is 1-based, got $h")
    h
  }

  /** Driver-side: read the header line for names/width; with
    * `inferNumeric` (F13, reference etl/extract.py:82-93) also scan the
    * data rows — sheets are small by contract — and type columns whose
    * non-null cells all match `-?\d+` as LONG, all int-or-decimal as
    * DOUBLE (same rules as `Extract.inferNumericColumns`).
    */
  private[sources] def schemaFor(options: CaseInsensitiveStringMap): StructType = {
    val path = new Path(pathOf(options))
    val headerRow = headerRowOf(options)
    val infer = options.getBoolean("inferNumeric", false)
    val fs = path.getFileSystem(new Configuration())
    val in = new BufferedReader(
      new InputStreamReader(fs.open(path), StandardCharsets.UTF_8))
    try {
      var line: String = null
      var i = 0
      while (i < headerRow) {
        line = in.readLine()
        require(line != null,
          s"$path has fewer than $headerRow rows — no header row")
        i += 1
      }
      val names = SheetCsv.uniqueNames(SheetCsv.splitLine(line))
      val types: Seq[org.apache.spark.sql.types.DataType] =
        if (!infer) names.map(_ => StringType)
        else {
          val n = names.length
          val intRe = "^-?\\d+$".r
          val decRe = "^-?\\d+\\.\\d+$".r
          val nn = new Array[Long](n)
          val ni = new Array[Long](n)
          val nd = new Array[Long](n)
          var data = in.readLine()
          while (data != null) {
            val cells = SheetCsv.splitLine(data)
            var c = 0
            while (c < n) {
              if (c < cells.length && cells(c).nonEmpty) {
                nn(c) += 1
                if (intRe.matches(cells(c))) ni(c) += 1
                else if (decRe.matches(cells(c))) nd(c) += 1
              }
              c += 1
            }
            data = in.readLine()
          }
          (0 until n).map { c =>
            if (nn(c) > 0 && ni(c) == nn(c)) LongType
            else if (nn(c) > 0 && ni(c) + nd(c) == nn(c)) DoubleType
            else StringType
          }
        }
      StructType(names.zip(types).map { case (nm, t) =>
        StructField(nm, t, nullable = true) })
    } finally in.close()
  }
}

private class SheetTable(tableSchema: StructType,
                         options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"sheet(${SheetDataSource.pathOf(options)})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap)
      : ScanBuilder =
    new SheetScanBuilder(tableSchema, options)
}

private class SheetScanBuilder(fullSchema: StructType,
                               options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve file column order; requiredSchema may reorder
    required = StructType(fullSchema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new SheetScan(fullSchema, required,
    SheetDataSource.pathOf(options), SheetDataSource.headerRowOf(options))
}

private class SheetScan(fullSchema: StructType, required: StructType,
                        path: String, headerRow: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft.sheet $path headerRow=$headerRow cols=${required.size}/${fullSchema.size}"

  override def planInputPartitions(): Array[InputPartition] =
    Array(SheetPartition(path, headerRow,
      // indices into the file row for each required column
      required.fieldNames.map(n => fullSchema.fieldIndex(n)),
      required.fields.map(_.dataType),
      fullSchema.size))

  override def createReaderFactory(): PartitionReaderFactory =
    new SheetReaderFactory
}

private case class SheetPartition(path: String, headerRow: Int,
                                  keep: Array[Int], types: Array[DataType],
                                  width: Int)
    extends InputPartition

private class SheetReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    new SheetReader(partition.asInstanceOf[SheetPartition])
}

private class SheetReader(p: SheetPartition)
    extends PartitionReader[InternalRow] {
  private val fsPath = new Path(p.path)
  private val in = new BufferedReader(new InputStreamReader(
    fsPath.getFileSystem(new Configuration()).open(fsPath),
    StandardCharsets.UTF_8))
  // consume pre-header + header lines
  (0 until p.headerRow).foreach { _ =>
    if (in.readLine() == null)
      throw new IllegalArgumentException(
        s"${p.path} has fewer than ${p.headerRow} rows — no header row")
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    var line = in.readLine()
    while (line != null) {
      val cells = SheetCsv.splitLine(line)
      // empty cell → null (F14); rows narrower than the header are
      // null-padded, wider are truncated to the header width
      def rawAt(i: Int): String =
        if (i >= cells.length || cells(i).isEmpty) null else cells(i)
      // W4: fully empty row (every cell of the FULL row null) dropped
      if ((0 until p.width).exists(rawAt(_) != null)) {
        current = InternalRow.fromSeq(p.keep.indices.map { j =>
          val raw = rawAt(p.keep(j))
          if (raw == null) null
          else p.types(j) match {
            case LongType => java.lang.Long.valueOf(raw.toLong)
            case DoubleType => java.lang.Double.valueOf(raw.toDouble)
            case _ => UTF8String.fromString(raw)
          }
        })
        return true
      }
      line = in.readLine()
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SRC1-SRC3: a proper DataSourceV2 for CDX page files.
  *
  * The reference streams one URL's CDX index over HTTP as numbered pages
  * (main.py:112-126): `showNumPages` then GET page 0..N, with
  * `fl=timestamp,statuscode,digest` projection (main.py:118) and the
  * `url=` predicate (main.py:115) applied server-side. This source maps
  * that contract onto Spark's connector API:
  *
  *   - one [[InputPartition]] per page file (pagination == partitioned
  *     scan; a 2000-page URL fans out across the cluster),
  *   - [[SupportsPushDownRequiredColumns]] == the `fl=` projection
  *     (unrequested fields are never materialized),
  *   - [[SupportsPushDownFilters]] on `url` == the `url=` param (pushed
  *     equality skips rows at the reader, reported in `PushedFilters`),
  *   - `seq` = (page << 32) | line-offset: globally ordered stream
  *     position, deterministic under any partitioning — the
  *     order-sensitive operators (A4/W1/W2/A2) key on it.
  *
  * Page files contain lines `<url> <ts> <status> <digest>`, named so
  * lexicographic order == page order. An HTTP-backed variant only swaps
  * the reader's line iterator; the planning surface stays identical.
  */
class CdxSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = CdxSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val maxPages = Option(properties.get("maxPages")).map(_.toInt)
      .getOrElse(CdxSource.MaxPages)
    new CdxTable(properties.get("path"), maxPages)
  }
  override def supportsExternalMetadata(): Boolean = false
}

object CdxSource {
  val Schema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("ts", StringType),
    StructField("status", StringType),
    StructField("digest", StringType),
    StructField("seq", LongType)))

  val Name: String = classOf[CdxSource].getName

  /** Reference page cap (MAXCDXPAGES, main.py:23): pages beyond the cap
    * are never planned, the limit-like pushdown the reference applies
    * at the HTTP layer.
    */
  val MaxPages = 2000
}

class CdxTable(path: String, maxPages: Int) extends Table with SupportsRead {
  override def name(): String = s"cdx(`$path`)"
  override def schema(): StructType = CdxSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CdxScanBuilder(path, maxPages)
}

class CdxScanBuilder(path: String, maxPages: Int)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = CdxSource.Schema
  private var urlFilter: Option[String] = None
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("url", _: String) => true
      case IsNotNull(_)              => true // schema is non-null by construction
      case _                         => false
    }
    pushed = accepted
    urlFilter = accepted.collectFirst { case EqualTo("url", v: String) => v }
    rejected
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    // Capture the session's Hadoop configuration (driver side) so the
    // source honors spark.hadoop.* / fs.* settings like every built-in
    // source — a bare `new Configuration()` cannot reach s3a
    // credentials, custom fs impls, or HDFS nameservices.
    // Only filesystem-relevant keys: the full configuration (~1000
    // entries incl. core-defaults) would ride inside every serialized
    // task for every partition.
    val hadoopProps = {
      val conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
      val it = conf.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey
        if (k.startsWith("fs.") || k.startsWith("dfs.") || k.startsWith("hadoop.security.") ||
          k.startsWith("io.compression.")) b += k -> e.getValue
      }
      b.result()
    }
    new CdxScan(path, required, urlFilter, maxPages, hadoopProps)
  }
}

object CdxConf {
  def build(props: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    props.foreach { case (k, v) => conf.set(k, v) }
    conf
  }
}

/** One page file = one partition. */
case class CdxPagePartition(file: String, page: Int) extends InputPartition

class CdxScan(
    path: String,
    required: StructType,
    urlFilter: Option[String],
    maxPages: Int,
    hadoopProps: Map[String, String])
    extends Scan
    with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"CdxScan(path=$path, columns=${required.fieldNames.mkString(",")}, urlFilter=$urlFilter)"

  override def planInputPartitions(): Array[InputPartition] = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(CdxConf.build(hadoopProps))
    val pages = fs.listStatus(hPath)
      .filter(_.isFile)
      .map(_.getPath.toString)
      .sorted // lexicographic file order == page order
      .take(maxPages)
    pages.zipWithIndex.map { case (f, i) => CdxPagePartition(f, i): InputPartition }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdxReaderFactory(required.fieldNames, urlFilter, hadoopProps)
}

class CdxReaderFactory(
    columns: Array[String],
    urlFilter: Option[String],
    hadoopProps: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdxPagePartition]
    new CdxPartitionReader(p.file, p.page, columns, urlFilter, hadoopProps)
  }
}

class CdxPartitionReader(
    file: String,
    page: Int,
    columns: Array[String],
    urlFilter: Option[String],
    hadoopProps: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val hPath = new Path(file)
  private val in = hPath.getFileSystem(CdxConf.build(hadoopProps)).open(hPath)
  private val reader = new java.io.BufferedReader(new java.io.InputStreamReader(in, "UTF-8"))
  private var offset = -1L
  private var row: InternalRow = _

  override def next(): Boolean = {
    var line = reader.readLine()
    offset += 1
    while (line != null) {
      val parts = line.split(" ")
      if (parts.length == 4 && urlFilter.forall(_ == parts(0))) {
        val seq = (page.toLong << 32) | offset
        row = InternalRow.fromSeq(columns.toSeq.map {
          case "url"    => UTF8String.fromString(parts(0))
          case "ts"     => UTF8String.fromString(parts(1))
          case "status" => UTF8String.fromString(parts(2))
          case "digest" => UTF8String.fromString(parts(3))
          case "seq"    => seq
        })
        return true
      }
      line = reader.readLine()
      offset += 1
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}

package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Splittable ingest of `pages-articles-multistream.xml.bz2` dumps
  * (SURVEY.md §0.2, VERDICT_r11 #3) — the public Wikimedia layout that
  * exists precisely so importers can parallelize what a plain `.bz2`
  * forbids:
  *
  *  - the DUMP is a concatenation of independent bz2 streams: stream 0
  *    holds the `<mediawiki>` header + `<siteinfo>`, every following
  *    stream holds ~100 raw `<page>` elements (no root), and the final
  *    stream holds the closing `</mediawiki>`;
  *  - the INDEX (`…-multistream-index.txt[.bz2]`) is one
  *    `offset:page_id:title` line per page, `offset` = the byte offset
  *    of the bz2 stream containing that page.
  *
  * The reader turns the index's distinct offsets into (start, end)
  * byte ranges — one range per 100-page stream — and decodes ranges in
  * parallel: N streams = N independent tasks, so a 20 GB dump ingests
  * at cluster width instead of one task. Per-stream decode is genuine
  * per-partition imperative work (the documented mapPartitions
  * exception); everything after — schema application, flatten,
  * classify — is the same declarative chain as [[MediaWikiXml]], via
  * `from_xml` with the SAME declared [[MediaWikiXml.pageSchema]], so
  * the multistream path produces the identical flattened frame as the
  * single-stream `spark.read.format("xml")` path (IngestSpec proves
  * frame equality on a 3-stream fixture).
  *
  * 100 TB notes: the index is ~1% of the dump and is read once; the
  * range list is a skinny driver-side array (offsets only, ~60k
  * entries for full enwiki) parallelized across the cluster; each task
  * opens the dump file at its own offset (HDFS/S3 positioned read) and
  * never touches another task's range, so ingest scales with stream
  * count. The trailing data range deliberately runs to EOF and decodes
  * the concatenated footer stream too (`</mediawiki>` carries no
  * `<page>`, so it contributes nothing).
  */
object Multistream {

  /** Parse the multistream index into (stream_offset, page_id, title).
    * Reads via the text source, so a `.bz2` index decodes transparently
    * (it is small — one stream — and read once). Title may itself
    * contain ':', so only the first two fields split. */
  def readIndex(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.textFile(indexPath)
      .toDF("line")
      .filter(length(trim(col("line"))) > 0)
      .select(
        regexp_extract(col("line"), "^(\\d+):(\\d+):(.*)$", 1)
          .cast("long").as("stream_offset"),
        regexp_extract(col("line"), "^(\\d+):(\\d+):(.*)$", 2)
          .cast("long").as("page_id"),
        regexp_extract(col("line"), "^(\\d+):(\\d+):(.*)$", 3).as("title"))

  /** The distinct stream byte ranges [start, end) the index implies:
    * consecutive distinct offsets bound each stream; the last data
    * stream runs to file length (decoding the footer stream with it is
    * harmless — no `<page>` inside). Driver-side: the offset list is
    * the index's distinct grain (~1 per 100 pages), skinny by
    * construction. */
  def streamRanges(spark: SparkSession, dumpPath: String,
      indexPath: String): Seq[(Long, Long)] = {
    val offsets = readIndex(spark, indexPath)
      .select(col("stream_offset")).distinct()
      .orderBy(col("stream_offset"))
      .collect().map(_.getLong(0))
    val fs = new org.apache.hadoop.fs.Path(dumpPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fileLen = fs.getFileStatus(new org.apache.hadoop.fs.Path(dumpPath)).getLen
    offsets.zip(offsets.drop(1) :+ fileLen).toSeq
  }

  /** Decode one bz2 stream range into its raw XML text. Concatenated
    * streams inside the range (the EOF-trailing footer) decode too —
    * BZip2CompressorInputStream's `decompressConcatenated` flag. */
  private def decodeRange(dumpPath: String, start: Long, end: Long): String = {
    val path = new org.apache.hadoop.fs.Path(dumpPath)
    // executor-side FS handle; default conf resolves file:// and the
    // cluster's fs.defaultFS — the fixture and HDFS cases
    val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(path)
    try {
      in.seek(start)
      val raw = new Array[Byte]((end - start).toInt)
      in.readFully(raw)
      val bz = new org.apache.commons.compress.compressors.bzip2
        .BZip2CompressorInputStream(
          new java.io.ByteArrayInputStream(raw), true)
      try new String(bz.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally bz.close()
    } finally in.close()
  }

  /** Split a decoded stream into its top-level `<page>…</page>`
    * elements. Literal "</page>" cannot occur inside a well-formed
    * dump's text nodes (XML escapes `<` as `&lt;`), so a linear scan
    * is exact. */
  private[graft] def splitPages(xml: String): Iterator[String] =
    new Iterator[String] {
      private var pos = xml.indexOf("<page")
      def hasNext: Boolean = pos >= 0
      def next(): String = {
        val close = xml.indexOf("</page>", pos)
        require(close >= 0, "unterminated <page> element in stream")
        val out = xml.substring(pos, close + "</page>".length)
        pos = xml.indexOf("<page", close)
        out
      }
    }

  /** A2-multistream: the `<siteinfo>` namespace map from the HEADER
    * stream only — byte range [0, first index offset), one tiny
    * decode, never the whole dump (the XML source on a multistream
    * file would decode every stream just to find the header's
    * namespace tags). Output matches [[MediaWikiXml.readNamespaces]]
    * column-for-column. */
  def readNamespaces(spark: SparkSession, dumpPath: String,
      indexPath: String): DataFrame = {
    import spark.implicits._
    val firstOffset = streamRanges(spark, dumpPath, indexPath).head._1
    val header = decodeRange(dumpPath, 0L, firstOffset)
    // namespace elements are self-closing or text-bearing
    val elems = "<namespace\\b[^>]*(?:/>|>[^<]*</namespace>)".r
      .findAllIn(header).toSeq
    spark.createDataset(elems).toDF("xml")
      .select(from_xml(col("xml"), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_VALUE",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_case",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_key",
          org.apache.spark.sql.types.LongType)))).as("n"))
      .select(col("n._key").cast("int").as("ns_key"),
        coalesce(col("n._VALUE"), lit("")).as("ns_name"),
        col("n._case").as("ns_case"))
  }

  /** A1-multistream: page-grain scan of a multistream dump — the
    * parallel twin of [[MediaWikiXml.readPages]], one task per bz2
    * stream, identical output schema and rows. */
  def readPages(spark: SparkSession, dumpPath: String,
      indexPath: String): DataFrame = {
    import spark.implicits._
    val ranges = streamRanges(spark, dumpPath, indexPath)
    val slices = math.min(math.max(ranges.size, 1),
      spark.sparkContext.defaultParallelism * 4)
    val pageXml: Dataset[String] = spark.sparkContext
      .parallelize(ranges, slices)
      .flatMap { case (s, e) => splitPages(decodeRange(dumpPath, s, e)) }
      .toDS()
    pageXml.toDF("xml")
      .select(from_xml(col("xml"), MediaWikiXml.pageSchema).as("p"))
      .select(col("p.*"))
  }
}

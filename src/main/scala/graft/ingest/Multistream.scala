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
      // a corrupt line would regexp_extract to '' → cast to null →
      // NPE deep in streamRanges' collect; drop it here instead so a
      // single bad index line can't abort the whole ingest opaquely
      .filter(col("line").rlike("^\\d+:\\d+:"))
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

  /** Open one bz2 stream range as a decoding Reader — nothing is
    * buffered beyond the decompressor's block: the compressed bytes
    * stream straight off the positioned FS read (bounded to the
    * range), and concatenated streams inside the range (the
    * EOF-trailing footer) decode too via the
    * `decompressConcatenated` flag. Takes the job's Hadoop conf
    * explicitly so executor-side opens see the driver's filesystem
    * settings (S3/ABFS credentials, fs.defaultFS) instead of an
    * empty `new Configuration()`. */
  private def openRange(conf: org.apache.hadoop.conf.Configuration,
      dumpPath: String, start: Long, end: Long): java.io.Reader = {
    val path = new org.apache.hadoop.fs.Path(dumpPath)
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    in.seek(start)
    val bounded = new java.io.FilterInputStream(in) {
      private var left = end - start
      override def read(): Int =
        if (left <= 0) -1
        else { val b = super.read(); if (b >= 0) left -= 1; b }
      override def read(buf: Array[Byte], off: Int, len: Int): Int = {
        if (left <= 0) return -1
        val n = super.read(buf, off, math.min(len.toLong, left).toInt)
        if (n > 0) left -= n
        n
      }
    }
    val bz = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorInputStream(bounded, true)
    new java.io.InputStreamReader(bz, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Decode one bz2 stream range into a String — header-stream use
    * only (the siteinfo stream is one small bz2 block by format). The
    * page path never materializes a stream: see [[streamPagesRange]]. */
  private def decodeRange(conf: org.apache.hadoop.conf.Configuration,
      dumpPath: String, start: Long, end: Long): String = {
    val r = openRange(conf, dumpPath, start, end)
    try {
      val sb = new java.lang.StringBuilder
      val chunk = new Array[Char](64 * 1024)
      var n = r.read(chunk)
      while (n >= 0) { sb.append(chunk, 0, n); n = r.read(chunk) }
      sb.toString
    } finally r.close()
  }

  /** Bounded-memory page iterator over one bz2 stream range: decode
    * and scan in one pass, emitting each `<page>…</page>` as found and
    * compacting the scan buffer behind it. Peak allocation is one page
    * plus a 64 KiB read chunk — a pathological million-page stream
    * costs the same memory as a 100-page one (VERDICT r12 #7). Closes
    * the underlying FS stream on exhaustion or failure. */
  private[graft] def streamPagesRange(
      conf: org.apache.hadoop.conf.Configuration,
      dumpPath: String, start: Long, end: Long): Iterator[String] = {
    val reader = openRange(conf, dumpPath, start, end)
    var closed = false
    def closeNow(): Unit = if (!closed) { closed = true; reader.close() }
    val it = splitPagesStream(reader)
    new Iterator[String] {
      def hasNext: Boolean = {
        val h = try it.hasNext catch { case e: Throwable => closeNow(); throw e }
        if (!h) closeNow()
        h
      }
      def next(): String =
        try it.next() catch { case e: Throwable => closeNow(); throw e }
    }
  }

  /** Split a decoded stream into its top-level `<page>…</page>`
    * elements. Literal "</page>" cannot occur inside a well-formed
    * dump's text nodes (XML escapes `<` as `&lt;`), so a linear scan
    * is exact. */
  private[graft] def splitPages(xml: String): Iterator[String] =
    splitPagesStream(new java.io.StringReader(xml))

  /** Streaming page splitter: scans an incrementally-filled buffer for
    * `<page` / `</page>` pairs, emits each page, then DELETES the
    * consumed prefix so the buffer never holds more than one page (+
    * one read chunk, + a small tail that could hold a split `<page`
    * prefix between chunks). Literal "</page>" cannot occur inside a
    * well-formed dump's text nodes (XML escapes `<` as `&lt;`), so the
    * linear scan is exact — same contract as the String form. */
  private[graft] def splitPagesStream(reader: java.io.Reader): Iterator[String] =
    new Iterator[String] {
      private val buf = new java.lang.StringBuilder
      private val chunk = new Array[Char](64 * 1024)
      private var eof = false
      private var pending: String = null

      private def fill(): Boolean = {
        if (eof) return false
        val n = reader.read(chunk)
        if (n < 0) { eof = true; false }
        else { buf.append(chunk, 0, n); true }
      }

      private def advance(): Unit = {
        while (pending == null) {
          val open = buf.indexOf("<page")
          if (open < 0) {
            // nothing openable yet: keep only a tail big enough to
            // hold a "<page" split across the chunk boundary
            if (buf.length > 8) buf.delete(0, buf.length - 8)
            if (!fill()) return
          } else {
            val close = buf.indexOf("</page>", open)
            if (close >= 0) {
              pending = buf.substring(open, close + "</page>".length)
              buf.delete(0, close + "</page>".length)
            } else {
              if (open > 0) buf.delete(0, open) // compact the pre-page junk
              require(fill(), "unterminated <page> element in stream")
            }
          }
        }
      }

      def hasNext: Boolean = { advance(); pending != null }
      def next(): String = {
        advance()
        if (pending == null) throw new NoSuchElementException("no more pages")
        val out = pending
        pending = null
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
    val header = decodeRange(spark.sparkContext.hadoopConfiguration,
      dumpPath, 0L, firstOffset)
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
    // ship the DRIVER's Hadoop conf to the range tasks — an
    // executor-side `new Configuration()` would drop object-store
    // credentials/endpoints set on the session and fail after a
    // successful driver-side range listing
    val bcConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val confBc = spark.sparkContext.broadcast(bcConf)
    val pageXml: Dataset[String] = spark.sparkContext
      .parallelize(ranges, slices)
      .flatMap { case (s, e) =>
        streamPagesRange(confBc.value.value, dumpPath, s, e)
      }
      .toDS()
    pageXml.toDF("xml")
      .select(from_xml(col("xml"), MediaWikiXml.pageSchema).as("p"))
      .select(col("p.*"))
  }
}

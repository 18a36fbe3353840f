package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.MediaWikiXml
import graft.ops.XmlOps

/** q206's transfer argument: the oracle grades the from_xml path, and
  * this spec pins that path ≡ the real dump-file reader on the same
  * generated pages — so the oracle's verdict covers A1–A8 as users run
  * them ([[MediaWikiXml.readPages]] + [[MediaWikiXml.flattenRevisions]]).
  */
class XmlOpsSpec extends AnyFunSuite with LocalSparkSuite {

  test("q206 graded from_xml path == real dump-file reader path") {
    val gen = XmlOps.generatedPages(spark, sfDir).orderBy(col("pid"))
    // serialize the generated pages as one well-formed dump file
    val pagesXml = gen.select(col("x")).collect().map(_.getString(0))
    val dir = Files.createTempDirectory("q206dump")
    val dump =
      "<mediawiki xml:lang=\"en\" version=\"0.10\">\n" +
        pagesXml.mkString("\n") + "\n</mediawiki>"
    Files.writeString(dir.resolve("d.xml"), dump)
    val viaFile = MediaWikiXml.flattenRevisions(
      MediaWikiXml.readPages(spark, dir.resolve("d.xml").toString))
      .orderBy(col("page_id"), col("rev_id"))
    val viaExpr = XmlOps.xmlIngest(spark, sfDir)
    assert(viaFile.schema == viaExpr.schema)
    val a = viaFile.collect()
    val b = viaExpr.collect()
    assert(a.length == b.length && a.length > 900)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("q214 graded namespace parse == real siteinfo file-reader path") {
    val gen = XmlOps.generatedNamespaces(spark).orderBy(col("ns_key"))
    // serialize the SAME elements as a dump header and read them back
    // through the rowTag reader the multistream/file ingest uses
    val elems = spark.range(0, 4).selectExpr(
      """CASE WHEN id = 0
        |  THEN '<namespace key="0" case="first-letter" />'
        |  ELSE concat('<namespace key="', id,
        |              '" case="first-letter">NS ', id, '</namespace>')
        |END AS x""".stripMargin)
      .collect().map(_.getString(0))
    val dir = Files.createTempDirectory("q214siteinfo")
    Files.writeString(dir.resolve("h.xml"),
      "<mediawiki><siteinfo><namespaces>\n" + elems.mkString("\n") +
        "\n</namespaces></siteinfo></mediawiki>")
    val viaFile = MediaWikiXml
      .readNamespaces(spark, dir.resolve("h.xml").toString)
      .orderBy(col("ns_key"))
    assert(viaFile.schema == gen.schema)
    val a = viaFile.collect(); val b = gen.collect()
    assert(a.length == 4 && b.length == 4)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
    // the key-0 self-closing element decodes to the EMPTY name
    assert(b.head.getString(1) == "")
  }

  test("q206 generator hits every declared variation axis") {
    val f = XmlOps.xmlIngest(spark, sfDir)
    val row = f.agg(
      sum(when(col("is_redirect"), 1L).otherwise(0L)),
      sum(when(col("is_anon"), 1L).otherwise(0L)),
      sum(when(col("is_minor"), 1L).otherwise(0L)),
      sum(when(col("text").isNull, 1L).otherwise(0L)),
      sum(when(col("parent_id").isNotNull, 1L).otherwise(0L)),
      sum(when(col("comment").isNull, 1L).otherwise(0L)),
      sum(when(col("restrictions").isNotNull, 1L).otherwise(0L))).collect()(0)
    (0 until 7).foreach(i => assert(row.getLong(i) > 0, s"axis $i unused"))
    // bytes attribute is the true byte length of the surviving body
    assert(f.filter(col("text").isNotNull &&
      col("text_bytes") =!= length(col("text"))).count() == 0)
    // contributor is a tagged union: exactly one arm per revision
    assert(f.filter(col("contributor_ip").isNotNull &&
      col("contributor_name").isNotNull).count() == 0)
    assert(f.filter(col("contributor_ip").isNull &&
      col("contributor_name").isNull).count() == 0)
  }
}

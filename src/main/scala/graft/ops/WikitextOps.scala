package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Wikitext STRUCTURE extraction beyond A14's `[[links]]` (VERDICT_r11
  * #4): `[[Category:…]]` membership and `{{template}}` transclusion —
  * the public syntax behind MediaWiki's categorylinks/templatelinks
  * tables, the two joins every wiki-ETL consumer runs after the link
  * graph.
  *
  * The extractors are single codegen'd `regexp_extract_all` passes +
  * array transforms (no UDFs), shared verbatim by two surfaces:
  *
  *  - the WIKI surface: [[graft.ingest.MediaWikiXml.categoryLinks]] /
  *    [[graft.ingest.MediaWikiXml.templateLinks]] over flattened
  *    revisions (IngestSpec parity next to linkGraph);
  *  - the GRADED surface: q171/q172 run the same expressions over
  *    wikitext synthesized deterministically from the `documents`
  *    table (both engines build the identical string, so the
  *    extraction + normalization chain — not the fixture — is what
  *    the cross-engine hash pins).
  *
  * Normalization follows the public title rules the A14 extractor
  * already applies: sortkey/args stripped, underscores to spaces,
  * trimmed, first letter uppercased (`<siteinfo case="first-letter">`).
  * The namespace prefix matches case-insensitively (`(?i)category`),
  * MediaWiki's namespace-resolution rule. Templates: every `{{name`
  * opener is reported (a regex cannot see nesting depth; the flat
  * scan is the documented semantics — transclusion COUNTS, not a
  * parse tree), parser functions (`{{#if:…}}`) excluded by the
  * leading `#`.
  *
  * Scale shape: both queries are scan → codegen string pass → explode
  * → hash agg on a low-cardinality key — the q36/q38 family; nothing
  * shuffles except (name, count) pairs.
  */
object WikitextOps {

  /** Raw `[[Category:…]]` target+sortkey captures. Group 1 = target. */
  private val catRe =
    """(?i)\[\[\s*category\s*:([^\[\]|]+)(?:\|[^\[\]]*)?\]\]"""

  /** Raw `{{name` captures: group 1 = everything up to `|` or `}}`.
    * `[^{}|]` keeps the match inside one opener — `{{a|{{b}}}}`
    * yields `a` and `b`, never a brace-crossing name. */
  private val tplRe = """\{\{\s*([^{}|]+?)\s*(?:\||\}\})"""

  /** MediaWiki first-letter title normalization: strip underscores,
    * trim, uppercase the first letter. */
  private def normTitle(c: Column): Column = {
    val t = trim(regexp_replace(c, "_", " "))
    concat(upper(substring(t, 1, 1)), substring(t, 2, Int.MaxValue))
  }

  /** Array of normalized category memberships of a wikitext column
    * named `colName` (SQL-name-based: regexp_extract_all is
    * expr-only). Empty targets drop. */
  private[graft] def categoriesOf(colName: String): Column =
    filter(
      transform(
        expr(s"regexp_extract_all($colName, '${catRe.replace("\\", "\\\\")}', 1)"),
        raw => normTitle(raw)),
      x => length(x) > 0)

  /** Array of normalized template names of a wikitext column; parser
    * functions (leading '#') and empty names drop. */
  private[graft] def templatesOf(colName: String): Column =
    filter(
      transform(
        expr(s"regexp_extract_all($colName, '${tplRe.replace("\\", "\\\\")}', 1)"),
        raw => normTitle(raw)),
      x => length(x) > 0 && !x.startsWith("#"))

  /** The deterministic wikitext both engines synthesize from a
    * documents row for q171 — every category form the extractor must
    * handle: underscore target, lowercase prefix + sortkey, padded
    * spacing, a non-category link, an unterminated opener. */
  private val catWikitext =
    """text || ' [[Category:Lang_' || lang || ']]'
      | || ' [[category:' || source || '|' || CAST(doc_id AS STRING) || ']]'
      | || CASE WHEN doc_id % 5 = 0 THEN ' [[Category: spaced  name ]]' ELSE '' END
      | || ' [[NotACategory|x]] [[Category:broken'"""
      .stripMargin.replace("\n", "")

  /** q171: category membership extraction + rollup — per normalized
    * category, how many membership links and how many distinct member
    * docs. */
  def wikitextCategories(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), expr(catWikitext).as("wt"))
      .select(col("doc_id"), explode(categoriesOf("wt")).as("category"))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("category"))

  private val wikitextCategoriesSql =
    s"""WITH wt AS (SELECT doc_id,
       |    text || ' [[Category:Lang_' || lang || ']]'
       |         || ' [[category:' || source || '|' || CAST(doc_id AS VARCHAR) || ']]'
       |         || CASE WHEN doc_id % 5 = 0 THEN ' [[Category: spaced  name ]]' ELSE '' END
       |         || ' [[NotACategory|x]] [[Category:broken' AS wt
       |  FROM documents),
       |raw AS (SELECT doc_id,
       |    unnest(regexp_extract_all(wt, '$catRe', 1)) AS target FROM wt),
       |norm AS (SELECT doc_id,
       |    upper(substring(trim(replace(target, '_', ' ')), 1, 1))
       |      || substring(trim(replace(target, '_', ' ')), 2) AS category
       |  FROM raw)
       |SELECT category, count(*) AS n_links,
       |       count(DISTINCT doc_id) AS n_docs
       |FROM norm WHERE length(category) > 0
       |GROUP BY category ORDER BY category""".stripMargin

  /** q172's synthesized transclusions: plain, underscore+args, parser
    * function (must drop), padded lowercase, nested-in-arg pair. */
  private val tplWikitext =
    """text || ' {{cite ' || lang || '|url=http://e}}'
      | || CASE CAST(doc_id % 4 AS INT)
      |      WHEN 0 THEN ' {{Infobox_person|name=x}}'
      |      WHEN 1 THEN ' {{#if:x|y}}'
      |      WHEN 2 THEN ' {{ lowercase }}'
      |      ELSE ' {{outer|{{Inner_one}}}}' END"""
      .stripMargin.replace("\n", "")

  /** q172: template transclusion extraction + rollup — per normalized
    * template name, transclusion count and distinct transcluding docs. */
  def wikitextTemplates(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), expr(tplWikitext).as("wt"))
      .select(col("doc_id"), explode(templatesOf("wt")).as("template"))
      .groupBy(col("template"))
      .agg(count(lit(1)).as("n_transclusions"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("template"))

  private val wikitextTemplatesSql =
    s"""WITH wt AS (SELECT doc_id,
       |    text || ' {{cite ' || lang || '|url=http://e}}'
       |         || CASE CAST(doc_id % 4 AS INT)
       |              WHEN 0 THEN ' {{Infobox_person|name=x}}'
       |              WHEN 1 THEN ' {{#if:x|y}}'
       |              WHEN 2 THEN ' {{ lowercase }}'
       |              ELSE ' {{outer|{{Inner_one}}}}' END AS wt
       |  FROM documents),
       |raw AS (SELECT doc_id,
       |    unnest(regexp_extract_all(wt, '$tplRe', 1)) AS name FROM wt),
       |norm AS (SELECT doc_id,
       |    upper(substring(trim(replace(name, '_', ' ')), 1, 1))
       |      || substring(trim(replace(name, '_', ' ')), 2) AS template
       |  FROM raw)
       |SELECT template, count(*) AS n_transclusions,
       |       count(DISTINCT doc_id) AS n_docs
       |FROM norm WHERE length(template) > 0 AND template NOT LIKE '#%'
       |GROUP BY template ORDER BY template""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q171_wikitext_categories", wikitextCategories,
      Some(wikitextCategoriesSql),
      "[[Category:...]] membership extraction + per-category rollup (categorylinks)"),
    QueryDef("q172_wikitext_templates", wikitextTemplates,
      Some(wikitextTemplatesSql),
      "{{template}} transclusion extraction + per-name rollup (templatelinks)"))
}

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

  /** Raw `http(s)://…` URL matches — MediaWiki's externallinks
    * surface. Both bracketed external links (`[http://url label]`)
    * and bare URLs count; the match runs to the first character a URL
    * cannot contain in wikitext (whitespace, brackets, angle quotes,
    * double quote). URLs are NOT case-normalized (paths are
    * case-sensitive); the host rollup lowercases separately. */
  private val urlRe = """https?://[^\s\]\[<>"]+"""

  /** `[[xx:Title]]` interwiki language links — the langlinks table.
    * The prefix is a lowercase 2–3 letter code with an optional
    * lowercase variant suffix (`pt-br`); MediaWiki validates against
    * its interwiki map, which a regex cannot see — the documented
    * semantics here is the SYNTACTIC rule, exactly like q172's flat
    * transclusion scan. Group 1 = code, group 2 = target title
    * (display text after `|` consumed by the optional tail). */
  private val langRe =
    """\[\[\s*([a-z]{2,3}(?:-[a-z]+)?)\s*:\s*([^\[\]|]+?)\s*(?:\|[^\[\]]*)?\]\]"""

  /** Array of raw URL matches of a wikitext column. */
  private[graft] def urlsOf(colName: String): Column =
    expr(s"regexp_extract_all($colName, '${urlRe.replace("\\", "\\\\")}', 0)")

  /** Lowercased host of a URL column (authority up to the first
    * `/ : ? #`). */
  private[graft] def hostOf(url: Column): Column =
    lower(regexp_extract(url, """https?://([^/:?#\s]+)""", 1))

  /** Array of full `[[xx:Title]]` matches of a wikitext column; the
    * per-row (lang, title) split happens post-explode with group
    * extracts — regexp_extract_all pulls one group per pass, and both
    * engines re-match cheaply on the exploded row. */
  private[graft] def langLinksOf(colName: String): Column =
    expr(s"regexp_extract_all($colName, '${langRe.replace("\\", "\\\\")}', 0)")

  private[graft] def langCodeOf(m: Column): Column =
    regexp_extract(m, langRe, 1)

  private[graft] def langTitleOf(m: Column): Column =
    normTitle(regexp_extract(m, langRe, 2))

  /** `#REDIRECT [[Target]]` at CONTENT START — the rule behind
    * MediaWiki's redirect table: the magic word is only recognized as
    * the first non-whitespace content of the page (a mid-text
    * `#REDIRECT` is prose), case-insensitive, optional colon, target
    * label/anchor stripped like any wikilink. Group 1 = raw target. */
  private val redirRe =
    """(?is)^\s*#redirect\s*:?\s*\[\[([^\[\]|#]+)(?:[#|][^\[\]]*)?\]\]"""

  /** Normalized redirect target of a wikitext column, '' when the
    * page is not a redirect (regexp_extract's no-match value in both
    * engines — filter on length at the use site). */
  private[graft] def redirectTargetOf(c: Column): Column =
    normTitle(regexp_extract(c, redirRe, 1))

  /** `== Heading ==` section markers, line-anchored — MediaWiki
    * recognizes 2..6 balanced `=` runs at line start/end (trailing
    * blanks allowed). RE2 has no backreferences, so balance is not
    * expressed in the pattern; the documented semantics takes
    * level = min(opener, closer) post-match, MediaWiki's own rule for
    * uneven runs. `[^=\n]+?` keeps the heading text free of `=` so an
    * uneven run leaves its surplus on the longer side. */
  private val headRe = """(?m)^(={2,6})([^=\n]+?)(={2,6})[ \t]*$"""

  /** Array of full heading-line matches of a wikitext column. */
  private[graft] def headingsOf(colName: String): Column =
    expr("regexp_extract_all(" + colName + ", '" +
      headRe.replace("\\", "\\\\") + "', 0)")

  private[graft] def headingLevelOf(m: Column): Column =
    least(length(regexp_extract(m, headRe, 1)),
      length(regexp_extract(m, headRe, 3)))

  private[graft] def headingTextOf(m: Column): Column =
    trim(regexp_extract(m, headRe, 2))

  /** `{{Infobox <type>|k=v|…}}` body (group 1 = everything inside the
    * braces) — the flat single-level form; `[^{}]*` stops the match
    * at the first nested brace, the same flat-scan posture as q172's
    * transclusion rule. */
  private val infoboxRe = """\{\{Infobox ([^{}]*)\}\}"""

  private[graft] def infoboxBodyOf(c: Column): Column =
    regexp_extract(c, infoboxRe, 1)

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

  /** q173's synthesized URLs: bracketed link with mixed-case host
    * (proves the host rollup lowercases), bare https URL, query-string
    * URL, a non-http scheme and a bare `http://` stub (both must
    * drop). */
  private val extWikitext =
    """text || ' [http://Example.org/' || lang || '/a label]'
      | || ' see https://' || source || '.example.com/page/' || CAST(doc_id AS STRING)
      | || CASE WHEN doc_id % 3 = 0 THEN ' [https://cdn.example.net/x?a=1&b=2]' ELSE '' END
      | || ' ftp://old-scheme http://'"""
      .stripMargin.replace("\n", "")

  /** q173: external-URL extraction + per-host rollup — MediaWiki's
    * externallinks table as an analytic: per lowercased host, link
    * count, distinct linking docs, and how many links are https. */
  def wikitextExtlinks(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), expr(extWikitext).as("wt"))
      .select(col("doc_id"), explode(urlsOf("wt")).as("url"))
      .groupBy(hostOf(col("url")).as("host"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(when(col("url").startsWith("https://"), 1L).otherwise(0L))
          .as("n_https"))
      .orderBy(col("host"))

  private val wikitextExtlinksSql =
    s"""WITH wt AS (SELECT doc_id,
       |    text || ' [http://Example.org/' || lang || '/a label]'
       |         || ' see https://' || source || '.example.com/page/' || CAST(doc_id AS VARCHAR)
       |         || CASE WHEN doc_id % 3 = 0 THEN ' [https://cdn.example.net/x?a=1&b=2]' ELSE '' END
       |         || ' ftp://old-scheme http://' AS wt
       |  FROM documents),
       |raw AS (SELECT doc_id,
       |    unnest(regexp_extract_all(wt, '$urlRe', 0)) AS url FROM wt)
       |SELECT lower(regexp_extract(url, 'https?://([^/:?#\\s]+)', 1)) AS host,
       |       count(*) AS n_links,
       |       count(DISTINCT doc_id) AS n_docs,
       |       CAST(SUM(CASE WHEN url LIKE 'https://%' THEN 1 ELSE 0 END) AS BIGINT) AS n_https
       |FROM raw GROUP BY 1 ORDER BY host""".stripMargin

  /** q174's synthesized interwiki links: plain code, code + display
    * text, hyphenated variant code, an uppercase code / long code /
    * Category prefix / empty title (all four must drop). */
  private val langWikitext =
    """text || ' [[fr:Titre_' || CAST(doc_id % 7 AS STRING) || ']]'
      | || ' [[de:Seite ' || lang || '|shown]]'
      | || CASE CAST(doc_id % 4 AS INT)
      |      WHEN 0 THEN ' [[pt-br:Pagina principal]]'
      |      WHEN 1 THEN ' [[EN:Wrong case]]'
      |      WHEN 2 THEN ' [[simple:too_long]]'
      |      ELSE ' [[es: padded_title ]]' END
      | || ' [[Category:NotLang]] [[fr:]]'"""
      .stripMargin.replace("\n", "")

  /** q174: interwiki language-link extraction + per-code rollup — the
    * langlinks table: per language code, link count, distinct linking
    * docs, distinct normalized target titles. */
  def wikitextLanglinks(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), expr(langWikitext).as("wt"))
      .select(col("doc_id"), explode(langLinksOf("wt")).as("m"))
      .select(col("doc_id"), langCodeOf(col("m")).as("lang_code"),
        langTitleOf(col("m")).as("title"))
      .groupBy(col("lang_code"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(col("title")).as("n_titles"))
      .orderBy(col("lang_code"))

  private val wikitextLanglinksSql =
    s"""WITH wt AS (SELECT doc_id,
       |    text || ' [[fr:Titre_' || CAST(doc_id % 7 AS VARCHAR) || ']]'
       |         || ' [[de:Seite ' || lang || '|shown]]'
       |         || CASE CAST(doc_id % 4 AS INT)
       |              WHEN 0 THEN ' [[pt-br:Pagina principal]]'
       |              WHEN 1 THEN ' [[EN:Wrong case]]'
       |              WHEN 2 THEN ' [[simple:too_long]]'
       |              ELSE ' [[es: padded_title ]]' END
       |         || ' [[Category:NotLang]] [[fr:]]' AS wt
       |  FROM documents),
       |raw AS (SELECT doc_id,
       |    unnest(regexp_extract_all(wt, '$langRe', 0)) AS m FROM wt),
       |split AS (SELECT doc_id,
       |    regexp_extract(m, '$langRe', 1) AS lang_code,
       |    upper(substring(trim(replace(regexp_extract(m, '$langRe', 2), '_', ' ')), 1, 1))
       |      || substring(trim(replace(regexp_extract(m, '$langRe', 2), '_', ' ')), 2) AS title
       |  FROM raw)
       |SELECT lang_code, count(*) AS n_links,
       |       count(DISTINCT doc_id) AS n_docs,
       |       count(DISTINCT title) AS n_titles
       |FROM split GROUP BY lang_code ORDER BY lang_code""".stripMargin

  /** q178's synthesized corpus: every page is titled `Doc <id>`;
    * ids ≡3 (mod 10) are redirects in three syntactic forms (plain,
    * indented lowercase + label + trailing prose, colon form with a
    * padded underscore target and a tracking template after). Target
    * classes: ids ≡13 (mod 100) point at the NEXT redirect (a double
    * redirect), ids ≡93 (mod 100) at a page that does not exist, the
    * rest at the id≡0 (mod 10) page three below (always exists). The
    * `'p '` prefix on prose pages pins the content-start rule: their
    * decoy mid-text `#REDIRECT` must not extract. */
  private val redirTarget =
    """CASE WHEN doc_id % 100 = 13 THEN 'Doc_' || CAST(doc_id + 10 AS STRING)
      |     WHEN doc_id % 100 = 93 THEN 'Ghost_' || CAST(doc_id AS STRING)
      |     ELSE 'Doc_' || CAST(doc_id - 3 AS STRING) END"""
      .stripMargin.replace("\n", "")

  private val redirWikitext =
    s"""CASE WHEN doc_id % 10 = 3 THEN
       |  CASE CAST(doc_id % 3 AS INT)
       |    WHEN 0 THEN '#REDIRECT [[' || ($redirTarget) || ']]'
       |    WHEN 1 THEN '  #redirect [[' || ($redirTarget) || '|shown]] trailing prose'
       |    ELSE '#Redirect :[[ ' || ($redirTarget) || ' ]] {{R from move}}'
       |  END
       |ELSE 'p ' || text || CASE WHEN doc_id % 7 = 0
       |  THEN ' not one: #REDIRECT [[Doc_1]]' ELSE '' END END"""
      .stripMargin.replace("\n", " ")

  /** q178: redirect extraction + resolution — MediaWiki's redirect
    * table plus the classic double-redirect maintenance query: per
    * redirect, its normalized target, the one-hop resolved final
    * title, and a status (`ok` / `double` / `missing`).
    *
    * Scale shape: the redirect side is a ~10% slice of the corpus, so
    * both resolution joins (against the page-title dim and against
    * the redirect table itself) are broadcast-able at any corpus size
    * where titles fit one executor — and plain shuffle-hash on the
    * title key beyond that; no window, no cartesian. */
  def wikitextRedirects(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val titleCol = concat(lit("Doc "), col("doc_id").cast("string"))
    val pages = docs.select(titleCol.as("p_title"))
    val red = docs
      .select(col("doc_id").as("src_doc_id"), titleCol.as("src_title"),
        redirectTargetOf(expr(redirWikitext)).as("target_title"))
      .filter(length(col("target_title")) > 0)
    val second = red.select(col("src_title").as("r2_src"),
      col("target_title").as("r2_target"))
    red
      .join(pages, col("target_title") === col("p_title"), "left")
      .join(second, col("target_title") === col("r2_src"), "left")
      .select(col("src_doc_id"), col("src_title"), col("target_title"),
        coalesce(col("r2_target"), col("target_title")).as("final_title"),
        when(col("p_title").isNull, "missing")
          .when(col("r2_src").isNotNull, "double")
          .otherwise("ok").as("status"))
      .orderBy(col("src_doc_id"))
  }

  private val wikitextRedirectsSql = {
    val tgt = redirTarget.replace("AS STRING", "AS VARCHAR")
    val wt = s"""CASE WHEN doc_id % 10 = 3 THEN
       |  CASE CAST(doc_id % 3 AS INT)
       |    WHEN 0 THEN '#REDIRECT [[' || ($tgt) || ']]'
       |    WHEN 1 THEN '  #redirect [[' || ($tgt) || '|shown]] trailing prose'
       |    ELSE '#Redirect :[[ ' || ($tgt) || ' ]] {{R from move}}'
       |  END
       |ELSE 'p ' || text || CASE WHEN doc_id % 7 = 0
       |  THEN ' not one: #REDIRECT [[Doc_1]]' ELSE '' END END"""
      .stripMargin.replace("\n", " ")
    s"""WITH pages AS (
       |  SELECT 'Doc ' || CAST(doc_id AS VARCHAR) AS p_title FROM documents),
       |raw AS (SELECT doc_id,
       |    regexp_extract($wt, '$redirRe', 1) AS raw FROM documents),
       |red AS (SELECT doc_id AS src_doc_id,
       |    'Doc ' || CAST(doc_id AS VARCHAR) AS src_title,
       |    upper(substring(trim(replace(raw, '_', ' ')), 1, 1))
       |      || substring(trim(replace(raw, '_', ' ')), 2) AS target_title
       |  FROM raw WHERE length(trim(raw)) > 0)
       |SELECT r.src_doc_id, r.src_title, r.target_title,
       |       COALESCE(r2.target_title, r.target_title) AS final_title,
       |       CASE WHEN p.p_title IS NULL THEN 'missing'
       |            WHEN r2.src_doc_id IS NOT NULL THEN 'double'
       |            ELSE 'ok' END AS status
       |FROM red r
       |LEFT JOIN pages p ON r.target_title = p.p_title
       |LEFT JOIN red r2 ON r.target_title = r2.src_title
       |ORDER BY r.src_doc_id""".stripMargin
  }

  /** q179's synthesized sections: a level-2 heading on every page
    * plus one rotating variant (level 3, unspaced markers, trailing
    * blanks after the closer, level 6 with a lang-varying title), a
    * leading-space decoy (not line-start — must not match) and an
    * unterminated opener (no closer — must not match). */
  private val secWikitext =
    """'p ' || text || chr(10) || '== History ==' || chr(10) || 'body ' || lang
      | || CASE CAST(doc_id % 4 AS INT)
      |      WHEN 0 THEN chr(10) || '=== Early life ==='
      |      WHEN 1 THEN chr(10) || '==Works=='
      |      WHEN 2 THEN chr(10) || '== References ==  '
      |      ELSE chr(10) || '====== Notes ' || lang || ' ======' END
      | || chr(10) || ' == not a heading ==' || chr(10) || '== unterminated'"""
      .stripMargin.replace("\n", "")

  /** q179: section-outline extraction + rollup — per (level, heading),
    * occurrence and distinct-page counts; the structure pass every
    * wiki TOC/outline consumer runs. Same scan → codegen regex →
    * explode → hash-agg shape as q171. */
  def wikitextSections(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), expr(secWikitext).as("wt"))
      .select(col("doc_id"), explode(headingsOf("wt")).as("m"))
      .select(col("doc_id"), headingLevelOf(col("m")).as("level"),
        headingTextOf(col("m")).as("heading"))
      .groupBy(col("level"), col("heading"))
      .agg(count(lit(1)).as("n_heads"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("level"), col("heading"))

  private val wikitextSectionsSql =
    s"""WITH wt AS (SELECT doc_id,
       |    'p ' || text || chr(10) || '== History ==' || chr(10) || 'body ' || lang
       |      || CASE CAST(doc_id % 4 AS INT)
       |           WHEN 0 THEN chr(10) || '=== Early life ==='
       |           WHEN 1 THEN chr(10) || '==Works=='
       |           WHEN 2 THEN chr(10) || '== References ==  '
       |           ELSE chr(10) || '====== Notes ' || lang || ' ======' END
       |      || chr(10) || ' == not a heading ==' || chr(10) || '== unterminated' AS wt
       |  FROM documents),
       |raw AS (SELECT doc_id,
       |    unnest(regexp_extract_all(wt, '$headRe', 0)) AS m FROM wt),
       |split AS (SELECT doc_id,
       |    CAST(least(length(regexp_extract(m, '$headRe', 1)),
       |               length(regexp_extract(m, '$headRe', 3))) AS INT) AS level,
       |    trim(regexp_extract(m, '$headRe', 2)) AS heading
       |  FROM raw)
       |SELECT level, heading, count(*) AS n_heads,
       |       count(DISTINCT doc_id) AS n_docs
       |FROM split GROUP BY level, heading ORDER BY level, heading""".stripMargin

  /** q180's synthesized infobox: rotating type, two always-present
    * parameters (one with spaced `=`), an even-id extra, an `≡0 (mod
    * 5)` EMPTY value (must count as a distinct value, not drop), and
    * the page text outside the braces. */
  private val infoWikitext =
    """'{{Infobox ' || CASE CAST(doc_id % 3 AS INT)
      |      WHEN 0 THEN 'person' WHEN 1 THEN 'place' ELSE 'book' END
      | || '|name=Name ' || CAST(doc_id AS STRING)
      | || '|lang = ' || lang
      | || CASE WHEN doc_id % 2 = 0 THEN '| occupation =writer' ELSE '' END
      | || CASE WHEN doc_id % 5 = 0 THEN '|empty=' ELSE '' END
      | || '}} ' || text"""
      .stripMargin.replace("\n", "")

  /** q180: infobox parameter extraction + per-(type, key) rollup —
    * the structured-data surface wiki ETL mines (`name=`, `lang=`, …):
    * usage count, distinct pages, distinct values. The parameter
    * split is pure codegen string work (split + explode +
    * substring_index); the type segment never carries `=` so the
    * LIKE filter drops it without positional bookkeeping. */
  def wikitextInfobox(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), infoboxBodyOf(expr(infoWikitext)).as("body"))
      .filter(length(col("body")) > 0)
      .select(col("doc_id"),
        substring_index(col("body"), "|", 1).as("infobox"),
        explode(split(col("body"), "\\|")).as("p"))
      .filter(col("p").contains("="))
      .select(col("doc_id"), col("infobox"),
        trim(substring_index(col("p"), "=", 1)).as("param"),
        // value = everything after the FIRST '=' (MediaWiki semantics:
        // a parameter value may itself contain '=' — URLs, nested
        // key=value — and all of it belongs to the value); the oracle
        // spells the identical rest-after-first-'=' with substr/strpos
        trim(expr("substring(p, instr(p, '=') + 1)")).as("v"))
      .groupBy(col("infobox"), col("param"))
      .agg(count(lit(1)).as("n_uses"),
        countDistinct(col("doc_id")).as("n_docs"),
        countDistinct(col("v")).as("n_values"))
      .orderBy(col("infobox"), col("param"))

  private val wikitextInfoboxSql =
    s"""WITH wt AS (SELECT doc_id,
       |    '{{Infobox ' || CASE CAST(doc_id % 3 AS INT)
       |           WHEN 0 THEN 'person' WHEN 1 THEN 'place' ELSE 'book' END
       |      || '|name=Name ' || CAST(doc_id AS VARCHAR)
       |      || '|lang = ' || lang
       |      || CASE WHEN doc_id % 2 = 0 THEN '| occupation =writer' ELSE '' END
       |      || CASE WHEN doc_id % 5 = 0 THEN '|empty=' ELSE '' END
       |      || '}} ' || text AS wt
       |  FROM documents),
       |body AS (SELECT doc_id,
       |    regexp_extract(wt, '$infoboxRe', 1) AS body FROM wt
       |  ),
       |params AS (SELECT doc_id,
       |    split_part(body, '|', 1) AS infobox,
       |    unnest(string_split(body, '|')) AS p
       |  FROM body WHERE length(body) > 0)
       |SELECT infobox, trim(split_part(p, '=', 1)) AS param,
       |       count(*) AS n_uses,
       |       count(DISTINCT doc_id) AS n_docs,
       |       count(DISTINCT trim(substr(p, strpos(p, '=') + 1))) AS n_values
       |FROM params WHERE p LIKE '%=%'
       |GROUP BY infobox, param ORDER BY infobox, param""".stripMargin

  /** q191: WORD-LEVEL REVISION DIFF (VERDICT_r13 #5) — the graded
    * proxy of [[graft.ingest.MediaWikiXml.revisionWordDiff]]'s
    * relational core (no XML rides the graded testdata, so the
    * history is SYNTHESIZED the q171/q180 way: both engines build the
    * identical three-revision sequence per document — first half of
    * the tokens, the full text, the text minus its first quarter —
    * and what the cross-engine hash pins is the diff machinery).
    * Per (doc, revision): the MULTISET token difference vs the
    * previous revision — n_added = occurrences present now and absent
    * then, n_removed the reverse; revision 1 diffs against empty.
    *
    * Scale shape: one token explode → (doc, rev, token) hash counts →
    * a self-join shifted by one revision on (doc, token) → rollup.
    * Everything keys on (doc_id[, token]); no cross-document traffic,
    * text never shuffles past the explode. */
  def revisionWordDiff(s: SparkSession, d: String): DataFrame = {
    val t = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("n", size(col("t")))
    val revs = t.select(col("doc_id"), explode(array(
        struct(lit(1).as("rev"),
          expr("slice(t, 1, CAST(n / 2 AS INT))").as("tk")),
        struct(lit(2).as("rev"), col("t").as("tk")),
        struct(lit(3).as("rev"),
          expr("slice(t, CAST(n / 4 AS INT) + 1, n - CAST(n / 4 AS INT))")
            .as("tk")))).as("r"))
      .select(col("doc_id"), col("r.rev").as("rev"), col("r.tk").as("tk"))
    val cnt = revs
      .select(col("doc_id"), col("rev"), explode(col("tk")).as("w"))
      .groupBy(col("doc_id"), col("rev"), col("w"))
      .agg(count(lit(1)).as("c"))
    val prev = cnt.select(col("doc_id"), (col("rev") + 1).as("rev"),
      col("w"), col("c").as("pc"))
    // full outer cannot broadcast; unhinted it falls to sort-merge — a
    // corpus-grain token sort. Shuffled hash runs the same key'd full
    // outer without the sort (both sides are (doc, token) fact grain)
    val diff = cnt.join(prev.hint("shuffle_hash"), Seq("doc_id", "rev", "w"),
        "full_outer")
      .select(col("doc_id"), col("rev"),
        greatest(coalesce(col("c"), lit(0L)) - coalesce(col("pc"), lit(0L)),
          lit(0L)).as("a"),
        greatest(coalesce(col("pc"), lit(0L)) - coalesce(col("c"), lit(0L)),
          lit(0L)).as("r"))
      .groupBy(col("doc_id"), col("rev"))
      .agg(sum(col("a")).as("n_added"), sum(col("r")).as("n_removed"))
    // the (doc, rev) grain comes from revs, NOT the diff: an empty
    // synthetic revision (a one-token doc halves to zero) must still
    // emit its 0/0 row in both engines
    revs.select(col("doc_id"), col("rev"))
      .join(diff, Seq("doc_id", "rev"), "left")
      .select(col("doc_id"), col("rev"),
        coalesce(col("n_added"), lit(0L)).as("n_added"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
      .orderBy(col("doc_id"), col("rev"))
  }

  private val revisionWordDiffSql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t,
      |                  len(string_split(text, ' ')) AS n FROM documents),
      |revs AS (
      |  SELECT doc_id, 1 AS rev, t[1 : n // 2] AS tk FROM t
      |  UNION ALL SELECT doc_id, 2 AS rev, t AS tk FROM t
      |  UNION ALL SELECT doc_id, 3 AS rev, t[n // 4 + 1 : n] AS tk FROM t),
      |cnt AS (SELECT doc_id, rev, w, count(*) AS c
      |        FROM (SELECT doc_id, rev, unnest(tk) AS w FROM revs)
      |        GROUP BY doc_id, rev, w),
      |diff AS (SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
      |                COALESCE(a.rev, b.rev + 1) AS rev,
      |                greatest(COALESCE(a.c, 0) - COALESCE(b.c, 0), 0) AS ad,
      |                greatest(COALESCE(b.c, 0) - COALESCE(a.c, 0), 0) AS rm
      |         FROM cnt a FULL OUTER JOIN cnt b
      |           ON a.doc_id = b.doc_id AND a.rev = b.rev + 1 AND a.w = b.w),
      |agg AS (SELECT doc_id, rev, CAST(sum(ad) AS BIGINT) AS n_added,
      |               CAST(sum(rm) AS BIGINT) AS n_removed
      |        FROM diff WHERE rev <= 3 GROUP BY doc_id, rev)
      |SELECT r.doc_id, r.rev,
      |       COALESCE(g.n_added, 0) AS n_added,
      |       COALESCE(g.n_removed, 0) AS n_removed
      |FROM (SELECT DISTINCT doc_id, rev FROM revs) r
      |LEFT JOIN agg g ON r.doc_id = g.doc_id AND r.rev = g.rev
      |ORDER BY r.doc_id, r.rev""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q171_wikitext_categories", wikitextCategories,
      Some(wikitextCategoriesSql),
      "[[Category:...]] membership extraction + per-category rollup (categorylinks)"),
    QueryDef("q172_wikitext_templates", wikitextTemplates,
      Some(wikitextTemplatesSql),
      "{{template}} transclusion extraction + per-name rollup (templatelinks)"),
    QueryDef("q173_wikitext_extlinks", wikitextExtlinks,
      Some(wikitextExtlinksSql),
      "http(s) URL extraction + per-host rollup (externallinks)"),
    QueryDef("q174_wikitext_langlinks", wikitextLanglinks,
      Some(wikitextLanglinksSql),
      "[[xx:Title]] interwiki extraction + per-code rollup (langlinks)"),
    QueryDef("q178_wikitext_redirects", wikitextRedirects,
      Some(wikitextRedirectsSql),
      "#REDIRECT extraction + double-redirect resolution (redirect table)"),
    QueryDef("q179_wikitext_sections", wikitextSections,
      Some(wikitextSectionsSql),
      "== Heading == outline extraction + per-(level, heading) rollup"),
    QueryDef("q191_revision_word_diff", revisionWordDiff,
      Some(revisionWordDiffSql),
      "word-level revision diff: multiset token add/remove per synthesized revision"),
    QueryDef("q180_wikitext_infobox", wikitextInfobox,
      Some(wikitextInfoboxSql),
      "{{Infobox}} parameter extraction + per-(type, key) rollup"))
}

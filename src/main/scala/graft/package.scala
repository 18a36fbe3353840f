/** graft — a Spark-native analytics engine with the query and
  * data-processing surface of `kodekrash/wikipedia.org-xmldump-importer`,
  * re-architected for Apache Spark 4 and extended with the
  * LLM-training-data pipeline operators (SURVEY.md; operator-by-operator
  * map in COVERAGE.md; scale posture in SCALING.md).
  *
  * Layout:
  *  - [[graft.SparkEntry]] — the driver contract: every graded operator
  *    as a named `(SparkSession, sfDir) => DataFrame` plus its DuckDB
  *    oracle twin; [[graft.Verify]] dumps results for the differential
  *    gate, [[graft.Bench]] times the suite.
  *  - `graft.ingest` — the reference's own identity: MediaWiki XML dump
  *    → declared-schema scan → flatten/decode → JDBC/parquet sinks,
  *    plus the `ImportDump` CLI.
  *  - `graft.ops` — operator families: `Relational` (joins, aggregates,
  *    windows, set ops, subqueries), `TextOps` (dedup: exact/minhash-
  *    LSH/simhash/jaccard + clustering, TF-IDF, language-ID, quality),
  *    `CurationOps` (sampling, repetition filters, masking, vocab),
  *    `VectorOps` (cosine, top-k, LSH/IVF ANN, centroids),
  *    `WindowedOps` (time windows, funnel, retention), `UdfOps`,
  *    `MultimodalOps` (binary payload pipeline).
  *  - `graft.functions` — cross-engine-deterministic helpers
  *    ([[graft.functions.GraftFunctions]]) and native codegen
  *    expressions ([[graft.functions.DotProduct]]).
  *  - `graft.plans` — opt-in Catalyst rewrites
  *    ([[graft.plans.RewriteDotProduct]] via `GraftRewriteExtensions`).
  *  - `graft.streaming` — the same operators under Structured Streaming
  *    with watermarks and keyed state.
  */
package object graft

package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round evidence tool: dump `explain("formatted")` for a
  * named set of queries to one file per query (plans/r16/<q>_before.txt
  * / _after.txt). Unlike [[PlanDump]] (curated PLANS.md picks), this
  * takes the query list and output suffix from the command line so a
  * measurement loop can capture the exact plan it timed.
  *
  * Usage: runMain graft.PlanDumpTo <outDir> <suffix> <q1,q2,...>
  * (suffix = "before" | "after"; sfDir from SPARK_GRAFT_SF_DIR, default
  * sf0.001 — plan SHAPE is SF-independent, only stats differ).
  */
object PlanDumpTo {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: PlanDumpTo <outDir> <suffix> <q1,q2,...|all>")
    val Array(outDir, suffix, list) = args
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.min(cpus.toInt, 8).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (list == "all") SparkEntry.queries.keys.toSeq.sorted
      else list.split(',').toSeq
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n"))
      val plan = fn(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), plan)
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
    }
    CheckpointMemo.clear()
    spark.stop()
  }
}

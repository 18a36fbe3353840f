package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.{BeforeAndAfterAll, Suite}

/** One shared local session for all suites (build forks one test JVM).
  * Each suite's teardown clears [[CheckpointMemo]] so memoized
  * localCheckpoint frames don't pin shuffle/checkpoint blocks for the
  * whole test-JVM lifetime (the ContextCleaner-leak class Bench drains
  * with periodic GC); a later suite that needs a memoized frame simply
  * rebuilds it — cheap at sf0.001.
  *
  * ASSUMES suites run sequentially in the forked JVM (the sbt default;
  * `testForkedParallel` stays false). The memo is process-global, so a
  * parallel suite schedule would let one suite's afterAll unpersist a
  * frame another suite is actively using. */
trait LocalSparkSuite extends BeforeAndAfterAll { this: Suite =>
  override def afterAll(): Unit =
    try CheckpointMemo.clear() finally super.afterAll()

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config(Tables.NanosConf, "true")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"
}

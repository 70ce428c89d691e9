package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Subprocess entry for [[DerivedCrossJvmRaceSpec]]: one INDEPENDENT JVM
  * building one derived artifact on a shared root. The in-JVM race test
  * (DerivedSpec's testPrePublishHook plant) forces the rename race
  * deterministically but cannot exercise true cross-process
  * interleavings — marker reads racing GC, two gcSuperseded passes, two
  * full ensure() protocols with no shared memo or locks. This main is
  * that missing half: the spec launches two of these concurrently.
  *
  * Protocol: args = (derivedRoot, inputParquet, goFile, buildDelayMs).
  * Prints READY once the session is up, then blocks until `goFile`
  * exists (the spec's start barrier — JVM startup jitter would otherwise
  * serialize the race), builds/adopts the artifact whose build sleeps
  * `buildDelayMs` to hold the race window open, and prints one
  * `RESULT k=v,...` line computed from the artifact scan.
  */
object DerivedRaceMain {
  def main(args: Array[String]): Unit = {
    val Array(root, input, goFile, delayMs) = args.take(4)
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.graft.derived.root", root)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("READY")
    Console.out.flush()
    val deadline = System.currentTimeMillis() + 60000
    while (!java.nio.file.Files.exists(java.nio.file.Paths.get(goFile))) {
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException("race barrier never opened")
      Thread.sleep(25)
    }
    val df = spark.read.parquet(input)
    val out = Derived.materialized(spark, "race_probe", Seq(df)) {
      // hold the window: both JVMs must be mid-build at the same time
      Thread.sleep(delayMs.toLong)
      df.groupBy(col("v")).agg(count(lit(1)).as("n"))
    }.collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted
    println(s"RESULT ${out.mkString(",")}")
    spark.stop()
  }
}

ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hungergamesgluestreamingetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Whole-stage codegen emits one or more classes per query stage; the
  // JVM default 240m JIT code cache fills after a few dozen Spark query
  // plans, after which the JIT compiler shuts off and everything runs
  // interpreted (10-50x slower, and erratically so). Size it generously
  // and allow flushing.
  "-XX:ReservedCodeCacheSize=2g",
  "-XX:+UseCodeCacheFlushing",
)
// Extra forked-JVM flags for GC experiments without editing the build,
// e.g. SPARK_JAVA_OPTS="-XX:+UseParallelGC" sbt "runMain graft.ScaleSmoke ..."
// Split on bare whitespace — flags whose VALUES contain spaces (e.g.
// -Xlog with a quoted path) are not supported; every GC/sizing flag this
// hook exists for is space-free.
javaOptions ++= sys.env.get("SPARK_JAVA_OPTS")
  .map(_.trim.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Nil)

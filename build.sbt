ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "qcardiadataspark"
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
// The driver scrapes a bounded tail of sbt's stdout and json-parses the
// last line. Two things broke that for eight rounds: (1) the default
// LoggedOutput strategy prefixes forked-process stdout with "[info] ",
// so the JSON line never starts with '{'; (2) sbt appends its own
// "[success] Total time: ..." line after the program's output, so the
// JSON line is never last. StdoutOutput passes the forked process's
// stdout through raw, and showSuccess drops the trailer.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys ++= Set(run / outputStrategy, showSuccess)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// LocalCluster* suites spin their own local-cluster[2,...] SparkContext
// (separate executor processes, isLocal=false — the non-local checkpoint
// arm, VERDICT r15 item 4). A JVM holds ONE SparkContext and every other
// spec shares SparkSpec's local[4] session, so those suites get their own
// forked JVM group; sbt runs forked groups sequentially by default.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val policy = Tests.SubProcess(ForkOptions().withRunJVMOptions(opts))
  // the worker's ExecutorRunner builds the executor java command via
  // AbstractCommandBuilder, which needs SPARK_SCALA_VERSION (else it
  // hunts for source-tree "build directories") and SPARK_HOME (the
  // /opt/spark dist whose jars we compile against)
  val clusterPolicy = Tests.SubProcess(ForkOptions()
    .withRunJVMOptions(opts)
    .withEnvVars(Map(
      "SPARK_SCALA_VERSION" -> "2.13",
      "SPARK_HOME" -> "/opt/spark")))
  val (cluster, rest) = tests.partition(_.name.contains("LocalCluster"))
  Seq(Tests.Group("rest", rest, policy),
    Tests.Group("localcluster", cluster, clusterPolicy)).filter(_.tests.nonEmpty)
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared executor-launch wiring for `local-cluster[...]` masters (REAL
  * separate executor JVMs): the JDK-17 module opens every executor needs
  * (mirrors build.sbt's driver list — keep in ONE place so the next JDK's
  * addition cannot be applied to one tool and missed in another), this
  * build's classes on the executor classpath, and an explicit executor
  * memory (local-cluster's worker size does NOT flow into it; the 1 GiB
  * default OOMs on production frames).
  *
  * Environment prerequisites (see SCALE_r07.md §5): SPARK_HOME=/opt/spark
  * and SPARK_SCALA_VERSION=2.13 — the launcher's build-directory scan
  * fails on this distribution layout without the explicit version.
  */
object LocalClusterConf {
  val addOpens: String = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")

  /** Add executor launch config to `b` for a local-cluster master. */
  def executorConf(b: SparkSession.Builder,
                   executorMem: String): SparkSession.Builder =
    b.config("spark.executor.extraClassPath",
        getClass.getProtectionDomain.getCodeSource.getLocation.getPath)
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.executor.memory", executorMem)
}

package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: query names to run (iteration aid; the driver
    // passes none and gets the full registry)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Engine.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-verify"),
      cpus.toInt
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Gate-environment metadata (VERDICT r10 ask #7): the builder's
    // DuckDB/JVM/Spark versions travel with the artifact, so a
    // driver-vs-builder environment skew (the cluster_kmeans r9/r10
    // hash divergence) is visible in the verify dir instead of
    // inferred. DuckDB is a python lib here — best-effort shell-out.
    val duck = try {
      val pb = new ProcessBuilder("python3", "-c",
        "import duckdb; print(duckdb.__version__)")
      pb.redirectErrorStream(true) // never let a filling stderr pipe wedge us
      val p = pb.start()
      // bounded wait: metadata is a nicety and must not be able to hang
      // the verify run (a deadlocked import would otherwise block forever)
      if (!p.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)) {
        p.destroyForcibly(); "unknown"
      } else {
        val out = new String(p.getInputStream.readAllBytes, "UTF-8").trim
        if (p.exitValue() == 0 && out.nonEmpty) out.linesIterator.next() else "unknown"
      }
    } catch { case _: Exception => "unknown" }
    val meta = Map(
      "builder_duckdb" -> duck,
      "spark" -> spark.version,
      "jvm" -> System.getProperty("java.version"),
      "scala" -> scala.util.Properties.versionNumberString)
    Files.writeString(Paths.get(s"$outDir/verify_meta.json"),
      meta.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional third arg (local iteration only — the driver passes two):
    // run just the queries whose name contains any of the
    // comma-separated substrings
    val only = args.drop(2).headOption.map(_.split(",").toSeq)
    // Exclusive run lock + quiescence report (round-8 lesson: a zombie
    // background chain raced this main's output dir and flipped 5
    // hashes while rows/schema matched). Held for the whole run.
    val guard = tools.RunGuard.acquire("graft.Verify")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Write the oracle map BEFORE running any query: round 6's record
    // came back as an empty {} because this main previously wrote
    // oracle_sql.json only after all ~215 queries — a crash, OOM, or
    // driver timeout mid-run left nothing to compare at all. Written
    // first, a partial run still yields per-query verdicts for
    // everything that completed (missing parquet reads as a visible
    // failure, never as silent absence of evidence).
    writeOracles(outDir)
    // run-identity stamp: written at start, re-read at end. If another
    // process wrote into this outDir while we ran (the round-8 clobber
    // mode), the stamp mismatch turns a silent artifact corruption into
    // a loud nonzero exit.
    val stamp = s"""{"main":"graft.Verify","sf_dir":${q(sfDir)},""" +
      guard.metaJson + "}"
    val stampPath = Paths.get(s"$outDir/run_meta.json")
    Files.writeString(stampPath, stamp)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // remove any stale output from an earlier run so a failure can
        // never be masked by yesterday's parquet
        Util.rmrf(new java.io.File(s"$outDir/$name"))
      }
      // queries that persist() internally would otherwise pin blocks for
      // the rest of this 150-query session
      finally spark.catalog.clearCache()
    }
    spark.stop()
    guard.release()
    val stampBack = try Files.readString(stampPath)
      catch { case _: Throwable => "<missing>" }
    if (stampBack != stamp) {
      System.err.println("[verify] FATAL: run_meta.json was rewritten " +
        s"mid-run (expected this run's stamp, found: $stampBack) — " +
        "another process wrote into this output dir; results are " +
        "not trustworthy")
      sys.exit(3)
    }
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def writeOracles(outDir: String): Unit = {
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}

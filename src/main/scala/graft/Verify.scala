package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Crash-isolation (round-2 postmortem: one pathological query zeroed all
  * 42 correctness signals):
  *  - oracle_sql.json is written BEFORE the query loop, so it exists even
  *    if a later query hangs or kills the JVM;
  *  - every query dump runs in its own watchdog'd thread with a per-query
  *    wall-clock budget; on timeout its Spark job group is cancelled and
  *    the loop moves on — a single bad query costs one row, not the round.
  * VerifySpec proves both properties with a deliberately hanging query.
  */
object Verify {

  /** Dump `queries` results to `outDir`, one parquet dir per query, under a
    * per-query watchdog. Returns (ok, failed-or-timed-out) query names.
    */
  def dumpAll(spark: SparkSession, sfDir: String, outDir: String,
              queries: Map[String, (SparkSession, String) => DataFrame],
              budgetSec: Long): (Seq[String], Seq[String]) = {
    val ok = Seq.newBuilder[String]
    val bad = Seq.newBuilder[String]
    queries.foreach { case (name, fn) =>
      @volatile var err: Option[Throwable] = None
      val worker = new Thread(() =>
        try {
          spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        } catch { case e: Throwable => err = Some(e) }
        finally spark.sparkContext.clearJobGroup(),
        s"verify-$name")
      worker.setDaemon(true) // an un-interruptible hang must not block exit
      val t0 = System.nanoTime()
      worker.start()
      worker.join(budgetSec * 1000)
      // A failed/timed-out query must not leave a partial parquet dir (or
      // _temporary debris) where the driver's compare step could read it as
      // a (garbage) result — and an un-interruptible worker may still be
      // appending to it (ADVICE r3, low). Best-effort delete.
      def scrub(): Unit = org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(s"$outDir/$name")): Unit
      if (worker.isAlive) {
        spark.sparkContext.cancelJobGroup(name)
        worker.interrupt()
        worker.join(10000) // brief grace for the cancel to unwind
        System.err.println(s"[verify] $name TIMED OUT after ${budgetSec}s — skipped")
        scrub()
        bad += name
      } else err match {
        case Some(e) =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          scrub()
          bad += name
        case None =>
          val sec = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[verify] $name ok ($sec%.1f s)")
          ok += name
      }
    }
    (ok.result(), bad.result())
  }

  /** oracle_sql.json — written FIRST (see scaladoc). JSON string escape
    * covers backslash, quote, and ALL control chars (<0x20) — a tab or CR
    * in builder-authored SQL would otherwise make the driver's json.load
    * fail and silently zero the round's correctness.
    */
  def writeOracleJson(outDir: String, oracles: Map[String, String]): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val outAbs = new java.io.File(outDir).getAbsolutePath
    val json = oracles
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("__GRAFT_OUT__", outAbs))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    writeOracleJson(outDir, SparkEntry.oracleSql)

    // The deterministic transcripts table the generator-based queries
    // (q33-q36) run over — dumped so their DuckDB oracles can read the SAME
    // input via the __GRAFT_OUT__ substitution above.
    graft.alco.Gen.turns(spark, 20000L).toDF().coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/transcripts_input")
    // planted-PII documents for q51/q53 (same dump-and-oracle contract)
    graft.alco.Gen.piiDocs(spark, 5000L).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/pii_docs_input")
    // planted multi-line documents for q58 line-level dedup
    graft.alco.Gen.linedDocs(spark, 4000L).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/lined_docs_input")
    // SimHash signatures of the sf documents, computed ONCE by the custom
    // codegen'd expression and dumped so the q23 oracle can replay the
    // banding + hamming verify in pure SQL (VERDICT r4 #4). The signature
    // function itself has no SQL equivalent (FNV-1a bit votes); its
    // determinism/pigeonhole properties are pinned in OpsSpec.
    locally {
      import org.apache.spark.sql.functions.{col, shiftleft, xxhash64}
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").as("id"),
          graft.functions.GraftFunctions.simhash64(
            graft.ops.TextOps.tokens(col("text"))).as("sig"))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/simhash_sigs_input")
      // per-conversation seq bases (Route.seqCol = (xxhash64(conv_id) << 32)
      // + turn_idx): lets the q75 oracle replay the grep surface's exact
      // total order — xxhash64 has no DuckDB equivalent, but the per-conv
      // base is just data
      graft.alco.Gen.turns(spark, 20000L).toDF()
        .select(col("conv_id")).distinct()
        .select(col("conv_id"),
          shiftleft(xxhash64(col("conv_id")), 32).as("seq_base"))
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/conv_seq_input")
    }

    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_VERIFY_TIMEOUT", "240").toLong
    dumpAll(spark, sfDir, outDir, SparkEntry.queries, budgetSec)
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Host-capability microbenchmark: a purely CPU-bound embarrassingly
  * parallel job (no shuffle, no IO) at two thread counts. Establishes the
  * ceiling the host can actually deliver for 8→32 scaling — if THIS doesn't
  * scale, nothing will (vCPU oversubscription), and pipeline efficiency
  * numbers must be read against this ceiling.
  */
object CpuScale {
  def main(args: Array[String]): Unit = {
    def run(cpus: Int): Double = {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      // warm
      spark.range(0, 20000000L, 1, cpus * 4)
        .select(max(xxhash64(col("id"), col("id") + 3, col("id") + 7))).collect()
      val t0 = System.nanoTime()
      spark.range(0, 4000000000L, 1, cpus * 4)
        .select(max(xxhash64(col("id"), col("id") + 3, col("id") + 7))).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.stop()
      sec
    }
    val n = sys.env.getOrElse("SPARK_SCALE_N", "8").toInt
    val s1 = run(n)
    val s2 = run(4 * n)
    println(f"CPUSCALE local$n=$s1%.2f s local${4 * n}=$s2%.2f s speedup=${s1 / s2}%.2f eff=${s1 / s2 / 4}%.2f")
  }
}

package graft.tools

import graft.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe (diagnostic, not driver-run): replicate the sf0.1 documents
  * table N× with shifted ids — every copy is an exact duplicate of the
  * original, the regime a crawl corpus actually presents — and time the
  * near-dup operators. What this demonstrates: exact-collapse keeps the
  * banded-join work constant in the replication factor (class count is
  * unchanged; only the slim class-assignment exchange and the final
  * expansion grow), so clustering scales ~linearly in rows while a
  * collapse-free design would grow quadratically with duplication.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_SCALE_N=10
  *        sbt "runMain graft.tools.ScaleProbe"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    def replicated(k: Int) =
      (0 until k).map(i => base.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("text")))
        .reduce(_ union _)

    def time[T](tag: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $tag: $r in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }

    for (k <- Seq(1, n)) {
      val docs = replicated(k).localCheckpoint() // isolate op cost from input build
      time(s"${k}x clusters") {
        Dedup.minhashClusters(docs, "text", "doc_id").count()
      }
      time(s"${k}x exact") {
        Dedup.exact(docs, "text", "doc_id").count()
      }
    }
    spark.stop()
  }
}

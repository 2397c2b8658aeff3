package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Staged directory swap for persisted-index maintenance. Rewriting a
  * parquet directory in place would race the lazy scan against its own
  * delete, so maintenance writes the new contents NEXT TO the live
  * directory and swaps with a filesystem rename. The swap window is the
  * documented durability caveat: a crash between delete and rename loses
  * the live directory (the staging copy survives and the operation is
  * re-runnable from it) — on an object store a production deployment
  * would point a manifest/catalog entry at the new location instead.
  */
object Stage {
  def swapRewrite(spark: SparkSession, livePath: String)
                 (write: String => Unit): Unit = {
    val staged = s"$livePath.staging"
    write(staged)
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(livePath)
    val fs = live.getFileSystem(conf)
    fs.delete(live, true)
    fs.rename(new org.apache.hadoop.fs.Path(staged), live)
  }

  /** The common case: replace a directory's contents with a DataFrame. */
  def swapRewrite(spark: SparkSession, livePath: String, df: DataFrame): Unit =
    swapRewrite(spark, livePath)(staged =>
      df.write.mode("overwrite").parquet(staged))
}

package graft.ops

import org.apache.spark.sql.SparkSession

/** Tiny sidecar files (index/serving-table parameter specs) written with
  * the Hadoop FileSystem API so the serving-table operators work on ANY
  * table path (hdfs://, s3a://, local) — `java.nio.file` would silently
  * target the driver's local disk for remote paths. Written AFTER the
  * table data: a crash in between leaves a table whose probes fail
  * loudly (missing sidecar) rather than read mismatched parameters. */
object Sidecar {

  def write(spark: SparkSession, tablePath: String, name: String,
            content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(tablePath, name)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  def read(spark: SparkSession, tablePath: String, name: String): String = {
    val p = new org.apache.hadoop.fs.Path(tablePath, name)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }
}

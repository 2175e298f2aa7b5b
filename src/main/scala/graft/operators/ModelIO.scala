package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Manifest I/O for persisted ANN models (IVF centroids, PQ
  * codebooks). The manifest `_model.json` is the COMMIT MARKER: it is
  * written last, after the model's parquet payload, and loaders treat
  * its absence as "no model here" — a crash mid-save leaves a
  * half-written dir that reads as empty and is overwritten by the next
  * save. Savers must DELETE the marker before touching the payload
  * (see [[deleteManifest]]) so a re-save or a lost concurrent-save
  * race never leaves a committed manifest pointing at a missing or
  * half-rewritten payload. Flat string→string JSON; keys/values are
  * identifiers and numbers, no escaping needed. All FS access resolves
  * through the session's Hadoop configuration (spark.hadoop.*, object-
  * store credentials) so model dirs can live beside the data on any
  * filesystem (file:/, hdfs://, s3a://) — a bare `new Configuration()`
  * would silently drop the session's credentials.
  */
private[graft] object ModelIO {
  private def manifestPath(dir: String) = new Path(s"$dir/_model.json")

  private def fs(spark: SparkSession, dir: String) =
    manifestPath(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** Un-commit: remove the marker BEFORE rewriting the payload, so the
    * dir reads as "no model" for the whole rewrite window.
    */
  def deleteManifest(spark: SparkSession, dir: String): Unit = {
    fs(spark, dir).delete(manifestPath(dir), false)
    ()
  }

  def writeManifest(spark: SparkSession, dir: String,
                    fields: Map[String, String]): Unit = {
    val body = fields.toSeq.sorted
      .map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val os = fs(spark, dir).create(manifestPath(dir), true)
    try os.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
  }

  /** None when no committed model exists at `dir`. */
  def readManifest(spark: SparkSession, dir: String): Option[Map[String, String]] = {
    val p = manifestPath(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      val pair = """"([^"]*)"\s*:\s*"([^"]*)"""".r
      Some(pair.findAllMatchIn(s).map(m => m.group(1) -> m.group(2)).toMap)
    }
  }
}

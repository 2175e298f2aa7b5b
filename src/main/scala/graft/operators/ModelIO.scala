package graft.operators

import org.apache.hadoop.fs.Path

/** Manifest I/O for persisted ANN models (IVF centroids, PQ
  * codebooks). The manifest `_model.json` is the COMMIT MARKER: it is
  * written last, after the model's parquet payload, and loaders treat
  * its absence as "no model here" — a crash mid-save leaves a
  * half-written dir that reads as empty and is overwritten by the next
  * save. Flat string→string JSON; keys/values are identifiers and
  * numbers, no escaping needed. Hadoop FS throughout so model dirs can
  * live beside the data on any filesystem (file:/, hdfs://, s3a://).
  */
private[graft] object ModelIO {
  private def manifestPath(dir: String) = new Path(s"$dir/_model.json")

  def writeManifest(dir: String, fields: Map[String, String]): Unit = {
    val p = manifestPath(dir)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val body = fields.toSeq.sorted
      .map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val os = fs.create(p, true)
    try os.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
  }

  /** None when no committed model exists at `dir`. */
  def readManifest(dir: String): Option[Map[String, String]] = {
    val p = manifestPath(dir)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      val pair = """"([^"]*)"\s*:\s*"([^"]*)"""".r
      Some(pair.findAllMatchIn(s).map(m => m.group(1) -> m.group(2)).toMap)
    }
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (binary) column plumbing.
  *
  * Media decode/resample libraries are not available in this environment,
  * so the decode step is a clearly-marked deterministic stub — but the
  * Spark-side contract is real: opaque `binary` payloads with typed
  * metadata flow through a `mapPartitions` batch stage (the Scala analog of
  * a `mapInPandas` batch UDF: one iterator per partition, amortized setup
  * per partition, output schema declared up front). Partitioning stays
  * whatever the upstream scan chose; nothing here shuffles.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("content_digest", StringType, nullable = false),
    StructField("fake_width", IntegerType, nullable = false),
    StructField("fake_height", IntegerType, nullable = false)))

  /** STUB decode: a real implementation would parse the media container
    * and decode frames/samples here (per-partition codec setup, batch
    * decode). The stub derives deterministic pseudo-metadata from the raw
    * bytes so the pipeline shape — binary in, typed features out — is
    * fully exercised and oracle-checkable. */
  private def decodeStub(id: Long, payload: Array[Byte]): Row = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(payload).map("%02x".format(_)).mkString
    Row(id, payload.length.toLong, digest,
      (payload.length % 640).toInt, (payload.length % 480).toInt)
  }

  /** Batch feature extraction over a binary column: mapPartitions with a
    * per-partition "codec" (here the MD5 instance) — the shape a real
    * image/audio decode stage takes. */
  def extractFeatures(binDf: DataFrame, idCol: String = "doc_id",
      binCol: String = "payload"): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(featureSchema))
    binDf.select(col(idCol).cast(LongType), col(binCol))
      .mapPartitions { rows =>
        // per-partition setup happens once (real codecs are expensive)
        rows.map(r => decodeStub(r.getLong(0), r.getAs[Array[Byte]](1)))
      }(enc)
  }

  /** Build a binary-payload table from text (the testdata carries no real
    * media; encoding text to UTF-8 bytes gives a faithful opaque-binary
    * column for plumbing tests). */
  def binaryFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"))
}

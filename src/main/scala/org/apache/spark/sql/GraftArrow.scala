package org.apache.spark.sql

import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame}
import org.apache.spark.sql.execution.arrow.ArrowConverters
import org.apache.spark.sql.util.ArrowUtils

/** Bridge to Spark's `private[sql]` Arrow machinery.
  *
  * Sink direction: serialize a DataFrame result to a complete Arrow IPC
  * stream (schema message + record batches + end-of-stream), the payload
  * format the reference puts on the wire as `rowsetBase64`
  * (`universql/protocol/snowflake.py:223-243`).
  *
  * Source direction: parse an Arrow IPC stream into a DataFrame — the
  * reference materializes remote `to_query` results and Polaris scans
  * from Arrow (`universql/catalog/iceberg.py:52`, `README.md:245`).
  */
object GraftArrow {

  def toArrowIpcStream(df: Dataset[Row]): Array[Byte] = {
    val classic = df.asInstanceOf[ClassicDataFrame]
    val spark = classic.sparkSession
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    val schema = classic.schema
    val rows = classic.queryExecution.executedPlan.executeCollect()
    val batches = ArrowConverters.toBatchIterator(
      rows.iterator, schema, maxRecordsPerBatch = 10000, timeZoneId = tz,
      errorOnDuplicatedFieldNames = false, largeVarTypes = false,
      context = null)

    val out = new java.io.ByteArrayOutputStream()
    val ch = new org.apache.arrow.vector.ipc.WriteChannel(
      java.nio.channels.Channels.newChannel(out))
    val arrowSchema = ArrowUtils.toArrowSchema(schema, tz,
      errorOnDuplicatedFieldNames = false, largeVarTypes = false)
    org.apache.arrow.vector.ipc.message.MessageSerializer.serialize(ch, arrowSchema)
    // toBatchIterator emits MessageSerializer-framed record-batch bytes —
    // already in IPC stream message format, so they concatenate directly
    batches.foreach(bytes => ch.write(bytes))
    // end-of-stream marker: continuation 0xFFFFFFFF + zero length
    ch.writeIntLittleEndian(-1)
    ch.writeIntLittleEndian(0)
    out.toByteArray
  }

  def fromArrowIpcStream(spark: SparkSession, bytes: Array[Byte]): Dataset[Row] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val (iter, schema) = ArrowConverters.fromIPCStream(bytes)
    try {
      // the iterator reuses row buffers; copy before materializing
      val rows = iter.map(_.copy()).toIndexedSeq
      classic.internalCreateDataFrame(
        classic.sparkContext.parallelize(rows, 1), schema)
    } finally iter.close()
  }
}

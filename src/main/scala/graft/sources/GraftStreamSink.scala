package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink

/** `df.writeStream.format("graft").option("path", root)` — the
  * versioned table as a STREAMING SINK, closing the addressing
  * matrix's last face (batch read/write, SQL, catalog names, stream
  * read — and now stream write): every micro-batch lands as ONE
  * versioned commit via
  * [[graft.ops.SinkOps.commitStreamBatch]], so the stream's output is
  * immediately time-travelable, changefeed-consumable
  * ([[GraftStreamSource]] can tail it — graft→graft pipes compose),
  * and EXACTLY-ONCE: the batch's dir name is deterministic in
  * (txnAppId, batchId) and a replayed batch whose dir any manifest
  * references is skipped — the Delta transactional-sink discipline
  * with zero new manifest syntax.
  *
  * Append-only (`outputMode` append; complete/update refuse loudly —
  * a versioned table's history is immutable commits, not a mutable
  * result set). Options: `txnAppId` (namespaces batch dirs when
  * several independent streams feed one table), `retries` (OCC
  * budget against concurrent batch writers, default 3 races).
  */
class GraftStreamSink(sqlContext: SQLContext, path: String,
                      txnAppId: String, maxTries: Int)
    extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // The engine hands addBatch a streaming-tagged slice that batch
    // writers refuse — re-root it as a batch leaf (the Kafka-sink
    // shape), then commit.
    val batch = org.apache.spark.sql.GraftSqlBridge.asBatch(data)
    graft.ops.SinkOps.commitStreamBatch(batch, path, batchId,
      txnAppId, maxTries)
    ()
  }

  override def toString: String = s"GraftStreamSink[$path]"
}

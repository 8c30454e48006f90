package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{IndexArtifact, KnnJoin, Searcher}

/** Streaming retrieval: a continuous stream of query vectors answered
  * micro-batch-by-micro-batch against a static base.
  *
  * SURVEY §2.9: the reference is entirely batch — its only incremental
  * surface is the batched query loop
  * (`experiment_runner.py:420-439`), and streaming ingestion of query
  * batches was scoped "future work only". This is that path, readStream-
  * native: a Structured Streaming micro-batch IS the reference's query
  * batch, so each trigger runs the same exact-kNN relational plan
  * (broadcast(queries) × base scan + bounded-heap top-k) the batch
  * engine uses, against the same static base relation.
  *
  * `foreachBatch` rather than a stream-side groupBy: a retrieval
  * request is complete within its micro-batch — per-query top-k needs
  * no cross-batch state, so watermark machinery would be pure overhead.
  * The sink callback receives the answered batch (qid, rank, id, dist)
  * and the epoch id; production sinks write parquet/kafka, specs
  * collect.
  */
object QueryStream {

  /** Start the stream. `queryStream` is a streaming DataFrame of
    * (qid, vector); `base` a static (id, vector) relation — cache it,
    * it is scanned once per micro-batch. Empty triggers are skipped. */
  def knnStream(queryStream: DataFrame, base: DataFrame, k: Int,
      metric: String)(sink: (DataFrame, Long) => Unit): StreamingQuery =
    queryStream.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) sink(KnnJoin.knnJoin(batch, base, k, metric), epochId)
      }
      .start()

  /** Same shape over a pre-built index: any registered [[Searcher]]
    * (IVF, PQ, SQ8, LSH, HNSW, …) serves the stream — build once,
    * answer every micro-batch from the artifact. The micro-batch is the
    * unit the searchers' adaptive local/distributed switch already
    * optimizes for, so a small trigger takes the driver-local fast path
    * and a flood falls back to the distributed scan automatically. */
  def searchStream(queryStream: DataFrame, artifact: IndexArtifact,
      searcher: Searcher, k: Int)
      (sink: (DataFrame, Long) => Unit): StreamingQuery =
    queryStream.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) sink(searcher.search(artifact, batch, k), epochId)
      }
      .start()
}

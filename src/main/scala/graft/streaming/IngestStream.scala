package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{IndexAppend, IndexArtifact}

/** Streaming index ingestion — the other half of the lifecycle
  * [[QueryStream]] serves: a continuous stream of (id, vector) arrivals
  * folded into a frozen-model index with [[IndexAppend]], micro-batch by
  * micro-batch. Build once on the backfill, then every trigger encodes
  * only its arrivals (the build's own zero-shuffle projection) and
  * unions them in — no retrain, no rebuild, no touched rows, exactly
  * the FAISS `Index.add` contract made continuous.
  *
  * `foreachBatch`: an arrival batch is complete in itself (encoding a
  * row needs no cross-batch state — the models are frozen), so stateful
  * streaming machinery would be pure overhead. Searches between
  * triggers read the current artifact snapshot via [[current]];
  * micro-batches are serialized by the streaming engine, so the swap is
  * a plain atomic reference.
  *
  * At scale the union chain grows one plan node per trigger; compaction
  * (periodically persisting the artifact through
  * [[graft.sources.ArtifactStore]] and reloading, which also restores
  * partitionBy pruning for the appended rows) is the sink callback's
  * decision — `onAppend` receives the artifact after every fold.
  */
final class IngestStream private (
    ref: AtomicReference[IndexArtifact], val query: StreamingQuery) {
  /** the latest appended artifact snapshot — serve searches from this */
  def current: IndexArtifact = ref.get()
}

object IngestStream {

  /** Start folding `arrivals` (streaming (id, vector)) into `initial`.
    * `onAppend` fires after each non-empty micro-batch with the updated
    * artifact and the epoch id (checkpoint/compact/publish hook).
    *
    * Each micro-batch is snapshotted to LocalRelations before the
    * trigger ends (a streaming source relation is only readable inside
    * its trigger, but the artifact's union plan must stay valid for
    * later searches). `maxBatchRows` bounds DRIVER MEMORY per slice, not
    * the trigger: an oversized (backlog / poison) micro-batch is folded
    * in maxBatchRows-sized slices rather than failing the query — a
    * thrown require inside foreachBatch would terminate the
    * StreamingQuery permanently, and a restart would replay the same
    * batch into the same failure. The batch streams through
    * `toLocalIterator` (one partition resident at a time), so no slice
    * ever materializes more than maxBatchRows rows plus one partition. */
  def appendStream(arrivals: DataFrame, initial: IndexArtifact,
      maxBatchRows: Int = 1 << 20)
      (onAppend: (IndexArtifact, Long) => Unit = (_, _) => ()): IngestStream = {
    val ref = new AtomicReference[IndexArtifact](initial)
    val q = arrivals.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val proj = batch.select("id", "vector").persist()
          try {
            import scala.jdk.CollectionConverters._
            var cur = ref.get()
            proj.toLocalIterator().asScala.grouped(maxBatchRows).foreach { slice =>
              val frozen = spark.createDataFrame(slice.asJava, proj.schema)
              cur = IndexAppend.append(cur, frozen)
              // publish after every slice: searches between triggers see
              // monotone progress, and slices are append-only so a
              // mid-batch snapshot is always a consistent index
              ref.set(cur)
            }
            onAppend(cur, epochId)
          } finally proj.unpersist(false)
        }
      }
      .start()
    new IngestStream(ref, q)
  }
}

package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence PACKING for pre-training: documents are concatenated (in
  * a deterministic order) into a token stream that is chopped into
  * fixed-length training sequences; each document needs to know which
  * sequence(s) it lands in and whether it straddles a boundary (the
  * cross-document-attention / document-masking bookkeeping every
  * packed-pretraining loader needs).
  *
  * The distributed shape mirrors how packed shards are actually
  * written at scale: `writers` independent writer groups (a stable
  * hash of the doc key — each group is one output shard stream), and
  * WITHIN each group a deterministic hash order and an exclusive
  * prefix-sum of token counts. All windows are partitioned by writer,
  * so the shuffle is one hash exchange + per-group sort — no global
  * single-partition funnel; writer count scales with the cluster
  * (thousands at 100 TB), and each group's packing is a pure function
  * of its member docs (incremental re-runs and engine ports agree).
  *
  * Outputs per doc: writer, exclusive `cum_before` offset, the
  * sequence ids its first/last token land in (`start_seq`/`end_seq`
  * at `seqLen` tokens per sequence), and `crosses_boundary`. Integer
  * arithmetic throughout (`div`), portable to any SQL engine.
  */
object Packing {

  def packSequences(df: DataFrame, keyCol: String, tokenCol: String,
                    seqLen: Long, writers: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be positive: $seqLen")
    val w = Window.partitionBy(col("writer"))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("writer", Sampling.hashBucket(col(keyCol), writers))
      .withColumn("cum_before", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("start_seq", expr(s"cum_before div ${seqLen}L"))
      // a zero-token doc "lands" at its offset's sequence; otherwise
      // the last token's position. greatest() keeps the integer math
      // branch-free for both.
      .withColumn("end_seq",
        expr(s"greatest(cum_before, cum_before + $tokenCol - 1) div ${seqLen}L"))
      .withColumn("crosses_boundary", col("end_seq") > col("start_seq"))
  }
}

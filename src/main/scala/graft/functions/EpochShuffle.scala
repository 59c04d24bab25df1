package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic EPOCH SHUFFLE + SHARDING for training-data delivery
  * — the last mile between a curated corpus and a data loader. A
  * training run needs (a) a DIFFERENT document order every epoch,
  * (b) the SAME order for the same (seed, epoch) on every re-run and
  * every worker (resumable jobs re-derive their position, they never
  * store the permutation), and (c) a stateless shard assignment so
  * each of N loader workers reads only its slice.
  *
  * Everything derives from one seeded md5: `h = md5("seed:epoch:id")`.
  * The shard is h's top 60 bits mod nShards (stateless, no global
  * count needed); the within-shard order is h itself (a shard is a
  * partition at scale, so the order materializes as a PARTITION-LOCAL
  * sort — the global permutation is never sorted globally, which is
  * the whole trick: a 100 TB epoch shuffle costs one hash projection
  * + one keyed write, not a distributed sort). Per-position binding
  * of the md5-fold trick used across the repo (Sampling.hashBucket /
  * q44), so the oracle can restate the permutation itself: the
  * order-md5 certificate hashes doc ids IN shuffle order, proving
  * order, membership and disjointness at once.
  */
object EpochShuffle {

  /** The shuffle hash for (seed, epoch, id) — the single source of
    * order and shard.
    */
  def shuffleHash(seed: Long, epoch: Int, id: Column): Column =
    md5(concat(lit(s"$seed:$epoch:"), id.cast("string")))

  /** Adds `h` (hex order key) and `shard` in [0, nShards). */
  def assign(docs: DataFrame, idCol: String, seed: Long, epoch: Int,
             nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards $nShards")
    val h = shuffleHash(seed, epoch, col(idCol))
    docs.withColumn("h", h)
      .withColumn("shard",
        conv(substring(col("h"), 1, 15), 16, 10).cast("long") % nShards)
  }

  /** Per-(epoch, shard) delivery certificate: document count, token
    * mass, and the md5 of ids concatenated IN SHUFFLE ORDER — a
    * reader that consumes the shard in order reproduces this hash,
    * so the certificate pins the permutation, not just the split.
    */
  def manifest(docs: DataFrame, idCol: String, textCol: String, seed: Long,
               epochs: Range, nShards: Int): DataFrame =
    epochs.map { e =>
      assign(docs, idCol, seed, e, nShards)
        .withColumn("toks", TextFunctions.tokenCount(coalesce(col(textCol), lit(""))))
        .groupBy(col("shard"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("toks")).cast("long").as("sum_tokens"),
          md5(concat_ws("", transform(
            sort_array(collect_list(struct(col("h"),
              col(idCol).cast("string").as("d")))),
            x => x.getField("d")))).as("order_md5"))
        .withColumn("epoch", lit(e))
    }.reduce(_.unionByName(_))
      .select(col("epoch"), col("shard"), col("n_docs"), col("sum_tokens"), col("order_md5"))
}

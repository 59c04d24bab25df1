package graft.dedup

import graft.SparkSpec
import graft.functions.{SimHash, SimHashImpl}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away into " +
    "the green forest tonight while stars shine brightly above the quiet sleeping village " +
    "and rivers flow gently down the old stone valley toward morning"
  private val nearDup = base.replace("tonight", "today") // one-token edit → simhash hamming 1
  private val distinctDoc = "completely different content about database engines and shuffle partitioning strategies"

  private lazy val docs = Seq(
    (0L, base), (1L, base), (2L, nearDup), (3L, distinctDoc),
    (4L, "  " + base.toUpperCase + "  ") // normalized fingerprint treats this as a dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup keeps min-id per fingerprint") {
    val kept = ExactDedup.dedupe(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    // 0 and 1 are exact dups (lowercased fingerprint also matches 4)
    assert(kept.toSeq == Seq(0L, 2L, 3L))
    val dropped = ExactDedup.duplicates(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(dropped.toSeq == Seq(1L, 4L))
  }

  test("minhash lsh finds the planted near-dup pair and skips distinct docs") {
    val pairs = MinHashLsh.nearDuplicates(docs, "doc_id", "text", threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L)) || pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 1L))) // exact dup always survives
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("group near-dup: mergeability — a full mirror host scores J=1, disjoint hosts never pair") {
    // host A serves docs {base, distinctDoc}; host B mirrors A exactly;
    // host C serves unrelated content
    val hosted = Seq(
      ("a", base), ("a", distinctDoc),
      ("b", base), ("b", distinctDoc),
      ("c", "totally unrelated words about streaming watermarks and state stores tonight"),
      ("c", "another page on checkpoint recovery and exactly once semantics for sinks")
    ).toDF("host", "text")
    val out = MinHashLsh.groupNearDuplicates(hosted, "host", "text", threshold = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(out.keySet === Set(("a", "b")), s"only the mirror pair: ${out.keySet}")
    val (ni, na, nb, j) = out(("a", "b"))
    assert(j === 1.0 && ni === na && na === nb, "full mirror: identical shingle unions")
  }

  test("group near-dup: elementwise-min merge equals the signature of the UNION set") {
    // the mergeability theorem the operator rests on, checked against
    // signatureOfBases over the actual unioned shingle-hash set
    val cfg = MinHashLsh.Config()
    val perDoc = MinHashLsh.signatures(
      Seq(("h", base), ("h", distinctDoc)).toDF("host", "text")
        .select(col("host").as("_grp"), col("text").as("_t")), "_grp", "_t", cfg)
    val sigs = perDoc.select(col("sig")).collect().toSeq.map(_.getSeq[Long](0))
    val mergedByMin = sigs.transpose.map(_.min)
    val unionSig = perDoc.groupBy(col("_grp"))
      .agg(array_distinct(flatten(collect_list(col("_bases")))).as("_u"))
      .select(MinHashLsh.signatureOfBases(col("_u"), cfg).as("sig"))
      .collect().head.getSeq[Long](0)
    assert(mergedByMin === unionSig)
  }

  test("minhash signature is deterministic and k-wide") {
    val cfg = MinHashLsh.Config()
    val sig1 = MinHashLsh.bandedSignatures(docs, "doc_id", "text", cfg)
      .select("sig").as[Seq[Long]].head()
    val sig2 = MinHashLsh.bandedSignatures(docs, "doc_id", "text", cfg)
      .select("sig").as[Seq[Long]].head()
    assert(sig1 == sig2 && sig1.size == cfg.numHashes)
  }

  test("simhash: near-dups within small hamming, distinct docs far") {
    val h1 = SimHashImpl.simhash64(org.apache.spark.unsafe.types.UTF8String.fromString(base))
    val h2 = SimHashImpl.simhash64(org.apache.spark.unsafe.types.UTF8String.fromString(nearDup))
    val h3 = SimHashImpl.simhash64(org.apache.spark.unsafe.types.UTF8String.fromString(distinctDoc))
    assert(SimHashImpl.hamming(h1, h2) <= 3) // one-token edit on a 37-token doc
    assert(SimHashImpl.hamming(h1, h3) > 12)
  }

  test("simhash expression runs in the plan (codegen path) and matches impl") {
    val viaExpr = SimHashDedup.fingerprints(docs.filter($"doc_id" === 0L), "doc_id", "text")
      .select("simhash").as[Long].head()
    val direct = SimHashImpl.simhash64(
      org.apache.spark.unsafe.types.UTF8String.fromString(base))
    assert(viaExpr == direct)
  }

  test("simhash near-duplicate banding finds the pair") {
    val pairs = SimHashDedup.nearDuplicates(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L)))
  }
}

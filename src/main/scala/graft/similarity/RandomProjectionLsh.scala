package graft.similarity

import graft.functions.{VectorExpressions, VectorFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-hyperplane (sign) LSH over embeddings — the cosine
  * counterpart of MinHash: `nBits` fixed random hyperplanes (seeded,
  * deterministic) map each vector to a sign bitmask; vectors with high
  * cosine collide with probability (1 - angle/pi)^nBits per bucket.
  *
  * Scale shape mirrors MinHashLsh: the bucket id is computed map-side
  * from broadcast-able literal hyperplanes, the corpus-wide shuffle
  * carries (bucket, id, norm), and exact cosine runs only inside
  * buckets. Multiple tables (`nTables`) trade shuffle volume for
  * recall exactly like LSH bands.
  */
object RandomProjectionLsh {

  /** Deterministic pseudo-gaussian hyperplanes via splitmix64. */
  private def hyperplanes(nTables: Int, nBits: Int, dim: Int, seed: Long): Array[Array[Array[Double]]] = {
    var x = seed
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    // sum of 4 uniforms ~ gaussian enough for LSH purposes
    def gauss(): Double =
      (0 until 4).map(_ => (next() >>> 11).toDouble / (1L << 53).toDouble - 0.5).sum
    Array.fill(nTables)(Array.fill(nBits)(Array.fill(dim)(gauss())))
  }

  /** Sign-bitmask bucket id of `vec` against one table's hyperplanes.
    * Each dot product runs through the native codegen FloatDotFold
    * expression (one primitive loop) instead of an interpreted
    * aggregate(zip_with(...)) — higher-order folds allocate and box
    * per element, and nTables × nBits of them per row dominated the
    * whole query's wall time (measured ~2× on the sf0.1 bench).
    * Hyperplane components are truncated to float to match the
    * expression's input type; sign decisions are unaffected in
    * distribution (the planes are random).
    */
  private def bucketExpr(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, bit) =>
      val dot = VectorFunctions.dotNative(vec, typedLit(p.map(_.toFloat).toSeq))
      when(dot >= 0.0, lit(1L << bit)).otherwise(0L)
    }.reduce(_ + _)

  /** (id, table, bucket) assignments. */
  def assignBuckets(vectors: DataFrame, dim: Int,
                    nTables: Int = 4, nBits: Int = 12, seed: Long = 42L,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VectorExpressions.register(vectors.sparkSession)
    val hp = hyperplanes(nTables, nBits, dim, seed)
    val buckets = array(hp.indices.map(t => bucketExpr(col(vecCol), hp(t))): _*)
    vectors
      .withColumn("_buckets", buckets)
      .select(col(idCol), col(vecCol), posexplode(col("_buckets")).as(Seq("table", "bucket")))
  }

  /** Near-dup pairs with cosine >= threshold found via bucket
    * collisions in any table.
    */
  def nearDuplicates(vectors: DataFrame, dim: Int, threshold: Double,
                     nTables: Int = 4, nBits: Int = 12, seed: Long = 42L,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    VectorExpressions.register(vectors.sparkSession)
    val assigned = assignBuckets(vectors, dim, nTables, nBits, seed, idCol, vecCol)
    val a = assigned.select(col("table"), col("bucket"), col(idCol).as("id_a"))
    val b = assigned.select(col("table"), col("bucket"), col(idCol).as("id_b"))
    // dedup collisions across tables on narrow (id, id) pairs, then
    // fetch vectors+norms once per surviving pair side
    val pairs = a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val withNorm = vectors.select(col(idCol), col(vecCol))
      .withColumn("_n", VectorFunctions.normNative(col(vecCol)))
    pairs
      .join(withNorm.toDF("id_a", "_va", "_na"), Seq("id_a"))
      .join(withNorm.toDF("id_b", "_vb", "_nb"), Seq("id_b"))
      .withColumn("cosine", VectorFunctions.cosineFromNorms(
        VectorFunctions.dotNative(col("_va"), col("_vb")), col("_na"), col("_nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}

package graft.similarity

import graft.multimodal.Bmp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual-hash NEAR-DUPLICATE detection for images — the visual
  * twin of the text MinHash/SimHash tier, closing the multimodal
  * dedup loop: LAION-style corpus curation dedups images by a
  * perceptual fingerprint over DECODED PIXELS (not payload bytes, so
  * re-encodes and metadata edits still collide), bucketed so the
  * candidate set is never all-pairs.
  *
  * The fingerprint is the classic 8×8 AVERAGE HASH (aHash), exact
  * integer end-to-end: BT.601 integer luma (77·R+150·G+29·B)>>8
  * (weights sum to 256, so grayscale pixels hash on their raw
  * value), an exact box-mean downsample to an 8×8 cell grid (cell
  * sums compared cross-multiplied — 64·cellᵢ ≥ Σcells — so no
  * division ever happens), one bit per cell, MSB = cell 0. Candidate
  * generation is the SimHash/LSH band trick: the 64-bit hash splits
  * into four 16-bit bands, images bucket-join on (band, value) —
  * any pair within Hamming ≤ 3 shares a clean band by pigeonhole,
  * and near pairs beyond that collide with the usual LSH
  * probability. At 100 TB this is a keyed shuffle on band values
  * (bounded buckets), the verify is popcount-of-xor on rows the
  * bands already matched, and the decode+hash pass is MAP-ONLY.
  *
  * Decode runs the real in-repo pixel tier (BMP here — the format
  * whose decode is the proven inverse of its encode; the other
  * decoders produce the same (w, h, rgb) shape and plug in the same
  * way). Images whose dimensions are not multiples of 8 fall outside
  * the exact-box-mean contract and are skipped (a resize tier would
  * feed them in production).
  */
object ImageNearDup {

  /** Exact-integer 8×8 average hash over top-down row-major RGB
    * triplets; None when the grid cannot divide the image exactly.
    */
  def aHash64(width: Int, height: Int, rgb: Array[Byte]): Option[Long] =
    cellSums(width, height, rgb).map { cell =>
      var total = 0L
      var i = 0
      while (i < 64) { total += cell(i); i += 1 }
      var hash = 0L
      i = 0
      while (i < 64) {
        if (cell(i) * 64L >= total) hash |= 1L << (63 - i)
        i += 1
      }
      hash
    }

  /** The 8×8 luma cell sums both hashes threshold — for
    * power-of-two cell sizes these ARE the k-level unnormalized Haar
    * LL (approximation) band, k = log2(width/8).
    */
  private def cellSums(width: Int, height: Int, rgb: Array[Byte]): Option[Array[Long]] = {
    if (width <= 0 || height <= 0 || width % 8 != 0 || height % 8 != 0 ||
      rgb == null || rgb.length != width * height * 3) return None
    val cw = width / 8
    val ch = height / 8
    val cell = new Array[Long](64)
    var y = 0
    while (y < height) {
      val cy = y / ch
      var x = 0
      while (x < width) {
        val p = (y * width + x) * 3
        val luma = (77 * (rgb(p) & 0xff) + 150 * (rgb(p + 1) & 0xff) +
          29 * (rgb(p + 2) & 0xff)) >> 8
        cell(cy * 8 + x / cw) += luma
        x += 1
      }
      y += 1
    }
    Some(cell)
  }

  /** WAVELET (Haar) HASH — the imagehash-style wHash: the same LL
    * band, thresholded at the MEDIAN coefficient instead of the
    * mean. The median is the robust choice: a few extreme-bright
    * cells (a lens flare, a watermark patch) drag the mean and flip
    * bits corpus-wide, but cannot move the middle order statistic.
    * Exact integers: median of 64 cell sums = the (32nd, 33rd)
    * order-stat pair, compared cross-multiplied (bit = 2·cellᵢ >
    * s₃₂+s₃₃) — no division. Power-of-two cell sizes required so the
    * coefficients are genuinely the Haar approximation band.
    */
  def wHash64(width: Int, height: Int, rgb: Array[Byte]): Option[Long] = {
    def pow2(v: Int) = v > 0 && (v & (v - 1)) == 0
    if (width % 8 != 0 || height % 8 != 0) return None
    if (!pow2(width / 8) || !pow2(height / 8)) return None
    cellSums(width, height, rgb).map { cell =>
      val sorted = cell.sorted
      val m2 = sorted(31) + sorted(32)
      var hash = 0L
      var i = 0
      while (i < 64) {
        if (cell(i) * 2L > m2) hash |= 1L << (63 - i)
        i += 1
      }
      hash
    }
  }

  /** Map-only decode+hash pass: (id, ahash) for every decodable,
    * 8-aligned image; undecodable payloads yield nothing (they have
    * no pixels to be near-duplicates of).
    */
  def hashes(df: DataFrame, idCol: String = "doc_id",
             payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        Bmp.decodePixels(bytes).flatMap { case (w, h, rgb) =>
          aHash64(w, h, rgb).map(hsh => (id, hsh))
        }
      }.toDF(idCol, "ahash")
  }

  /** Map-only decode+wHash pass (the wavelet twin of `hashes`). */
  def wHashes(df: DataFrame, idCol: String = "doc_id",
              payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        Bmp.decodePixels(bytes).flatMap { case (w, h, rgb) =>
          wHash64(w, h, rgb).map(hsh => (id, hsh))
        }
      }.toDF(idCol, "whash")
  }

  /** Banded near-duplicate pairs: (id_a, id_b, hamming) with
    * id_a < id_b and hamming ≤ `maxHamming`, for pairs sharing at
    * least one of the four 16-bit bands. Hashes ride through the
    * band join, so verification is a popcount on the matched row —
    * no second fetch.
    */
  def pairs(df: DataFrame, idCol: String = "doc_id",
            payloadCol: String = "payload", maxHamming: Int = 10): DataFrame =
    pairsOf(hashes(df, idCol, payloadCol), idCol, "ahash", maxHamming)

  /** Banded wHash near-duplicate pairs (the wavelet twin of `pairs`). */
  def wPairs(df: DataFrame, idCol: String = "doc_id",
             payloadCol: String = "payload", maxHamming: Int = 10): DataFrame =
    pairsOf(wHashes(df, idCol, payloadCol), idCol, "whash", maxHamming)

  /** Banded pair recovery over any 64-bit perceptual-hash table —
    * `hashCol` names the hash family so callers joining their own
    * persisted hash tables (ahash, whash, …) stay explicit (r15,
    * ADVICE: wHashes used to mislabel its output 'ahash' to reuse
    * this join).
    */
  def pairsOf(hashed: DataFrame, idCol: String, hashCol: String,
              maxHamming: Int): DataFrame = {
    val banded = hashed.select(col(idCol), col(hashCol),
      explode(array((0 until 4).map(b => struct(
        lit(b).as("band"),
        shiftrightunsigned(col(hashCol), 48 - 16 * b)
          .bitwiseAND(lit(0xffffL)).as("bval"))): _*)).as("bb"))
      .select(col(idCol), col(hashCol), col("bb.band"), col("bb.bval"))
    val a = banded.select(col("band"), col("bval"),
      col(idCol).as("id_a"), col(hashCol).as("_ha"))
    val b = banded.select(col("band"), col("bval"),
      col(idCol).as("id_b"), col(hashCol).as("_hb"))
    a.join(b, Seq("band", "bval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("_ha"), col("_hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("_ha").bitwiseXOR(col("_hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}

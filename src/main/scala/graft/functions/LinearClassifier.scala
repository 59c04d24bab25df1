package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Linear (fastText-style) document scoring over HASHED token
  * features — the model-based quality-filter shape (a trained linear
  * classifier over bag-of-words deciding keep/drop for each document)
  * reduced to its engine side: at scoring time the model is a hashed
  * weight table and the corpus pass is `score = Σ_t w(hash(t))` per
  * doc — map-only, no shuffle at any corpus size, the whole pass in
  * whole-stage codegen.
  *
  * In production the weight table is a trained artifact: either a
  * broadcast array indexed by `hash(t) % dim` (the feature-hashing
  * trick — fixed memory however large the vocabulary) or a broadcast
  * map join for small vocabularies. This container has no trained
  * model, so the STAND-IN weight function derives each bucket's
  * weight deterministically from the hash itself (md5 fold → integer
  * in [−1000, 1000]); the plumbing — tokenize, hash, fold with
  * multiplicity, integer margin, threshold verdict — is exactly what
  * a real weight table plugs into, and is what q72 oracle-checks
  * bit-for-bit. Declared stand-in, same policy as the multimodal
  * fakes (SURVEY §6).
  *
  * All-integer: weights are integers, the margin is an exact integer
  * sum (no float accumulation order issues), and the verdict is a
  * margin-sign test — portable to any engine.
  */
object LinearClassifier {

  /** Stand-in hashed weight for one token: md5-fold of the token to a
    * 32-bit value, mapped to [−1000, 1000]. A trained model replaces
    * this with `weights[fold % dim]`.
    */
  def tokenWeight(token: Column): Column =
    conv(substring(md5(token), 1, 8), 16, 10).cast("long") % 2001L - 1000L

  /** Integer margin: Σ w(token) over lowercased whitespace tokens,
    * WITH multiplicity (bag-of-words, not set-of-words). Empty docs
    * score 0.
    */
  def margin(text: Column): Column =
    aggregate(TextFunctions.tokens(lower(text)), lit(0L),
      (acc, t) => acc + tokenWeight(t))

  /** Keep verdict at an integer margin threshold. */
  def keep(text: Column, threshold: Long = 0L): Column =
    margin(text) >= threshold
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting can't help (e.g. a single key holding >1 task's
  * worth of FACT rows joined to a non-broadcastable dimension).
  *
  * Mechanics: the fact side gets a random-but-deterministic salt in
  * [0, factor); the other side is exploded `factor` times so every
  * salted key can still match. The hot key's rows now spread over
  * `factor` reducers instead of one. Cost: the small side is
  * replicated `factor`x — use only on keys that are actually hot
  * (`saltedJoinHotKeys` restricts salting to a hot-key list and joins
  * the long tail normally).
  */
object SkewJoin {

  /** Full salted join (every key salted). Deterministic salt derived
    * from a stable hash of the whole fact row's key + a row id.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, factor: Int,
                 joinType: String = "inner"): DataFrame = {
    require(factor > 1)
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(factor.toLong)))
    val exploded = dim.withColumn("_salt", explode(
      sequence(lit(0L), lit(factor.toLong - 1))))
    salted.join(exploded, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Salt only the keys in `hotKeys`; the rest take the normal join.
    * This is the production shape: the replicate-cost is paid only for
    * the handful of keys that need it.
    */
  def saltedJoinHotKeys(fact: DataFrame, dim: DataFrame, key: String,
                        hotKeys: Seq[Any], factor: Int): DataFrame = {
    require(hotKeys.nonEmpty && factor > 1)
    val isHot = col(key).isin(hotKeys: _*)
    val hotPart = saltedJoin(fact.filter(isHot), dim.filter(isHot), key, factor)
    val coldPart = fact.filter(!isHot).join(dim.filter(!isHot), Seq(key))
    hotPart.unionByName(coldPart)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi join: explode the hot-key concentration by
  * salting. The large (skewed) side gets a deterministic salt in
  * [0, salts) derived from a per-row tie-break column; the small side
  * is replicated once per salt value; the join key becomes
  * (key, salt) — a single hot key now spreads across `salts` tasks.
  *
  * AQE's skew-join handles many cases at runtime (sort-merge splits);
  * salting is the explicit form for when the skew is known and extreme
  * (one key >> task memory) or the join isn't SMJ. Results are
  * identical to the plain join (salt is derived, never random —
  * deterministic re-execution matters under task retries).
  */
object SaltedJoin {
  /** @param large    skewed fact side
    * @param small    replicable side (salts x its size must stay small)
    * @param key      equi-key column name on both sides
    * @param tieBreak any column on `large` with per-row variety (e.g. a
    *                 unique id) — drives the deterministic salt
    * @param salts    number of salt buckets for hot keys
    */
  def apply(large: DataFrame, small: DataFrame, key: String,
            tieBreak: Column, salts: Int, joinType: String = "inner"): DataFrame =
    applyKeys(large, small, Seq(key), tieBreak, salts, joinType)

  /** [[apply]] over a composite equi-key (e.g. the near-dup probe's
    * (band, bucket)) — the salt extends the key tuple.
    */
  def applyKeys(large: DataFrame, small: DataFrame, keys: Seq[String],
            tieBreak: Column, salts: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit `salts` null-padded copies of every
    // unmatched small-side row (the replication has no inverse there)
    val supported = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")
    require(supported(joinType.toLowerCase),
      s"SaltedJoin does not support $joinType (small side is replicated)")
    require(keys.nonEmpty, "at least one join key required")
    val l = large.withColumn("__salt", pmod(xxhash64(tieBreak), lit(salts)).cast("int"))
    val s = small.withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    l.join(s, keys :+ "__salt", joinType).drop("__salt")
  }
}

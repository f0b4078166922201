package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join utilities for the 100 TB path.
  *
  * A shuffle equi-join hashes both sides by the key: one hot key (a
  * boilerplate document hash, a null-ish default id, a celebrity user)
  * lands its entire volume on ONE reducer and the stage runs at the speed
  * of that straggler. AQE's skew-join handles this at runtime when
  * statistics surface it (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default here); salting is the explicit form for when the skew is known
  * ahead of time or the join sits under an operator AQE won't split.
  *
  * `saltedJoin(big, small, key, r)`: the big side scatters each row into
  * one of `r` salt lanes (a deterministic per-row hash — seeded `rand` is
  * stable given the same input partitioning); the small side replicates
  * every row into ALL `r` lanes (explode of a literal range — r× the
  * SMALL side only). The join key becomes (key, salt), so a hot key's
  * rows spread across r reducers instead of one. Semantics are exactly
  * the plain inner equi-join — the salt column never escapes.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, r: Int): DataFrame = {
    require(r >= 1, s"salt lanes must be >= 1, got $r")
    val bigS = big.withColumn("__salt", floor(rand(42) * r).cast("int"))
    val smallS = small.withColumn("__salt", explode(array((0 until r).map(lit): _*)))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §4 "salting for skew").
  *
  * When one join key dominates (a "hot" customer, a null-heavy foreign
  * key), hash partitioning sends the whole hot key to ONE task and the
  * stage runs at straggler speed. Salting splits each fact row into one
  * of `factor` sub-keys deterministically, and replicates each dim row
  * across all `factor` sub-keys, so the hot key's work spreads over
  * `factor` tasks. The join result is EXACTLY the plain join's (each
  * fact row meets each matching dim row exactly once — oracle-checked
  * by q80 against the unsalted SQL join).
  *
  * The salt is `xxhash64(saltCols) mod factor` — deterministic (no
  * rand(): retries and speculative tasks must agree), and `saltCols`
  * should uniquely identify a fact row so the hot key spreads evenly.
  *
  * This is the manual form of what AQE skew-join does adaptively at
  * runtime; it exists for engines/plans where AQE cannot see the skew
  * (e.g. skew appearing after a transform) and as the explicit recipe.
  */
object SaltedJoin {

  /** Inner equi-join of `fact` (large, possibly skewed) with `dim`
    * (replicated `factor`×) on `factKey == dimKey`.
    */
  def inner(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltCols: Seq[Column], factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltCols: _*), lit(factor.toLong)))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until factor).map(i => lit(i.toLong)): _*)))
    salted.join(replicated,
        salted(factKey) === replicated(dimKey)
          && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}

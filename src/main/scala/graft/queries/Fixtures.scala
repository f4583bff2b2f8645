package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Planted-duplicate fixtures: several catalog queries union a table with
  * an id-shifted copy of itself so the dedup operators have KNOWN
  * positives whose expected keep/pair set is derivable.
  *
  * The shift must be scale-proof. Round 12 found the failure class the
  * hard way: a +100,000 stride collided with real ids at sf10 (500k
  * docs), silently degenerating the fixtures for eleven rounds — and no
  * differential gate could see it, because BOTH engines computed the
  * same muddle. A cross-engine-consistent fixture bug is invisible to a
  * differential oracle, so the invariant has to be asserted where the
  * fixture is ASSEMBLED: the real id domain must be provably disjoint
  * from its shifted image at the scale actually being read, or the query
  * fails loudly instead of quietly testing nothing. */
object Fixtures {
  /** The planted-id shift shared by every fixture union (mirrored as the
    * literal `+ 100000000` in the oracle SQL). */
  val Stride: Long = 100000000L

  /** Assert the real id domain of `df` cannot alias its [[Stride]]-shifted
    * image — `max(id) - min(id) < stride` makes `[min, max]` and
    * `[min+S, max+S]` disjoint — then return `df` unchanged. One
    * column-pruned min/max scan of the id column at assembly time; at
    * fixture scale (≤ millions of rows) that is noise, and it is the only
    * check that travels WITH the data to whatever scale the driver reads.
    * A deliberately-colliding stride (the sf10 regression replayed in
    * FixturesSpec) dies here with the measured domain in the message. */
  def assertNoAlias(df: DataFrame, idCol: String,
                    stride: Long = Stride): DataFrame = {
    val r = df.agg(min(col(idCol).cast("long")).as("lo"),
      max(col(idCol).cast("long")).as("hi")).head
    if (!r.isNullAt(0)) {
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      require(hi - lo < stride && hi + stride > hi,
        s"fixture stride $stride aliases the real `$idCol` domain " +
          s"[$lo, $hi] — planted ids [${lo + stride}, ${hi + stride}] " +
          "would collide with real rows and degenerate the fixture " +
          "(the round-12 sf10 bug class); raise the stride")
    }
    df
  }

  /** The shift itself, so the constant lives in one place. */
  def shifted(idCol: Column): Column = idCol + lit(Stride)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A 62-bit BIJECTION for permutation keys beyond [[Lcg]]'s 2^31
  * domain — the upgrade path Lcg's scope note promises, built so it
  * stays ORACLE-EXPRESSIBLE (the reason Lcg didn't just use a 64-bit
  * multiply mixer: splitmix-style constants need wrapping 64-bit
  * multiplication, which checked-arithmetic engines reject).
  *
  * Construction: a 4-round balanced Feistel network on 31-bit halves
  * (Luby–Rackoff; the classic DES structure). Split x < 2^62 into
  * (L, R) = (x div 2^31, x mod 2^31); each round
  *
  *   (L, R) → (R, L XOR F_i(R)),  F_i(R) = (R · A + K_i) mod 2^31
  *
  * and re-join L · 2^31 + R. A Feistel round is a bijection for ANY
  * round function — the inverse replays rounds backwards with
  * L = R' XOR F_i(L'), R = L' — so the whole map is a permutation of
  * [0, 2^62) by construction, no number theory required
  * (FeistelProps proves it with the constructive inverse).
  *
  * Every intermediate is exact in both engines: halves < 2^31, the
  * round product R·A < 2^31 · 2^31 = 2^62 < 2^63−1 (no BIGINT
  * overflow, no double rounding), and XOR of sub-2^31 values is
  * exact integer bit-math Spark (`^`) and DuckDB (`xor`) share.
  * Cost: ~12 integer ops per key, map-side, codegen'd — same plan
  * shape as Lcg.key (a projection inside the scan stage).
  *
  * Round keys: arbitrary distinct odd constants (secrecy is not a
  * goal — determinism and mixing are); A is the Lcg multiplier.
  */
object Feistel {
  val HALF: Long = 1L << 31 // 2^31
  val A: Long = 1103515245L
  val KS: Seq[Long] = Seq(12345L, 0x5DEECE66DL % HALF, 0x41C64E6DL, 1013904223L)

  private def round(l: Long, r: Long, k: Long): (Long, Long) =
    (r, l ^ ((r * A + k) % HALF))

  /** Scala twin — keep in lockstep with [[key(Column)]] and the oracle
    * SQL from [[keySql]]. Input must be in [0, 2^62). */
  def key(x: Long): Long = {
    require(x >= 0 && x < (HALF * HALF), s"input $x outside [0, 2^62)")
    var l = x / HALF
    var r = x % HALF
    KS.foreach { k => val (nl, nr) = round(l, r, k); l = nl; r = nr }
    l * HALF + r
  }

  /** Constructive inverse (proves bijectivity in FeistelProps). */
  def invKey(y: Long): Long = {
    var l = y / HALF
    var r = y % HALF
    KS.reverse.foreach { k =>
      val pl = r ^ ((l * A + k) % HALF) // undo: r' = l XOR F(r), l' = r
      val pr = l
      l = pl; r = pr
    }
    l * HALF + r
  }

  /** Column form (non-ANSI long arithmetic; all values < 2^62 so the
    * same expressions run under checked arithmetic too). shiftright,
    * not `/`: Column division is DOUBLE division, which silently
    * rounds above 2^53. */
  def key(x: Column): Column = {
    val half = lit(HALF)
    val x62 = pmod(x, lit(HALF * HALF))
    var l = shiftright(x62, 31)
    var r = pmod(x62, half)
    KS.foreach { k =>
      val f = pmod(r * A + k, half)
      val nl = r
      val nr = l.bitwiseXOR(f)
      l = nl; r = nr
    }
    l * HALF + r
  }

  /** DuckDB spelling of the same network over a BIGINT expression —
    * generated, so the constants can never drift from [[KS]]. */
  def keySql(x: String): String = {
    val h = HALF
    var l = s"(($x) % ${h * h}) // $h"
    var r = s"($x) % $h"
    KS.foreach { k =>
      val f = s"((($r) * $A + $k) % $h)"
      val nl = r
      val nr = s"xor(($l), $f)"
      l = nl; r = nr
    }
    s"(($l) * $h + ($r))"
  }
}

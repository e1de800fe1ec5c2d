package graft

import graft.functions.Feistel
import org.scalacheck.{Gen, Prop, Properties}

/** Properties of the 62-bit Feistel permutation key (pl_epoch_shard62):
  * range containment, the constructive inverse (bijectivity needs no
  * number theory — reversing the rounds recovers any input), pairwise
  * injectivity over random 62-bit draws, real avalanche across the
  * halves, and overflow safety at the domain edge. */
object FeistelProps extends Properties("feistel") {

  private val dom: Long = Feistel.HALF * Feistel.HALF // 2^62
  private val domGen: Gen[Long] = Gen.choose(0L, dom - 1)

  property("key lands in [0, 2^62)") = Prop.forAll(domGen) { x =>
    val k = Feistel.key(x); k >= 0L && k < dom
  }

  property("constructive inverse recovers any input (bijection)") =
    Prop.forAll(domGen) { x => Feistel.invKey(Feistel.key(x)) == x }

  property("injective: distinct 62-bit inputs never collide") =
    Prop.forAll(domGen, domGen) { (x, y) =>
      (x == y) == (Feistel.key(x) == Feistel.key(y))
    }

  property("avalanche: low-bit flip moves the HIGH half too") =
    // a single-round or broken network leaves one half untouched; the
    // 4-round schedule must propagate a low-bit change into both halves
    // for most inputs (sampled, not universal — mixing is statistical)
    Prop.forAllNoShrink(Gen.listOfN(64, domGen)) { xs =>
      val moved = xs.count { x =>
        val a = Feistel.key(x)
        val b = Feistel.key(x ^ 1L)
        (a >> 31) != (b >> 31)
      }
      moved >= 56 // >= 7/8 of samples
    }

  property("domain-edge arithmetic stays exact (no overflow)") = {
    val edge = Seq(0L, 1L, Feistel.HALF - 1, Feistel.HALF, dom - 2, dom - 1)
    Prop.all(edge.map(x =>
      Prop(Feistel.invKey(Feistel.key(x)) == x && Feistel.key(x) >= 0L)): _*)
  }
}

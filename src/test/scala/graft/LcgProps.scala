package graft

import graft.functions.Lcg
import org.scalacheck.{Gen, Prop, Properties}

/** Properties of the shared permutation key behind pl_epoch_shard /
  * pl_domain_cap: Hull–Dobell bijectivity (injectivity over arbitrary
  * sub-domains of [0, 2^31)), range containment, overflow safety at
  * the domain edge, and the invertibility witness (a has an odd
  * modular inverse mod 2^31, so the map provably permutes). */
object LcgProps extends Properties("lcg") {

  private val domGen: Gen[Long] = Gen.choose(0L, Lcg.M - 1)

  property("key lands in [0, 2^31)") = Prop.forAll(domGen) { x =>
    val k = Lcg.key(x); k >= 0L && k < Lcg.M
  }

  property("injective: distinct inputs below 2^31 never collide") =
    Prop.forAll(domGen, domGen) { (x, y) =>
      (x == y) == (Lcg.key(x) == Lcg.key(y))
    }

  property("exact inverse recovers the input (constructive bijection)") = {
    // a^-1 mod 2^31 exists because a is odd; computed once by
    // extended-Euclid over the spec's own constants
    val aInv = BigInt(Lcg.A).modInverse(BigInt(Lcg.M)).toLong
    Prop.forAll(domGen) { x =>
      val k = Lcg.key(x)
      val back = (BigInt(aInv) * BigInt((k - Lcg.C + Lcg.M) % Lcg.M))
        .mod(BigInt(Lcg.M)).toLong
      back == x
    }
  }

  property("inputs >= 2^31 wrap onto the same orbit (no overflow)") =
    Prop.forAll(domGen) { x =>
      Lcg.key(x + Lcg.M) == Lcg.key(x) && Lcg.key(Long.MaxValue) >= 0L
    }

  // the r13 tie-break permutation: same Hull–Dobell obligations
  property("key2 lands in [0, 2^31) and is injective below 2^31") =
    Prop.forAll(domGen, domGen) { (x, y) =>
      val kx = Lcg.key2(x)
      kx >= 0L && kx < Lcg.M && ((x == y) == (kx == Lcg.key2(y)))
    }

  property("key2 has an exact inverse (constructive bijection)") = {
    val aInv = BigInt(Lcg.A2).modInverse(BigInt(Lcg.M)).toLong
    Prop.forAll(domGen) { x =>
      val k = Lcg.key2(x)
      val back = (BigInt(aInv) * BigInt((k - Lcg.C2 % Lcg.M + Lcg.M) % Lcg.M))
        .mod(BigInt(Lcg.M)).toLong
      back == x
    }
  }

  // r14 (r13 ADVICE): the Scala twins use floorMod so they match the
  // Column pmod form on the FULL signed domain, not just x >= 0
  property("negative inputs land in [0, 2^31) and equal the wrapped orbit") =
    Prop.forAll(domGen) { x =>
      val neg = -x - 1 // covers [Long.MinValue side via small negatives]
      val k = Lcg.key(neg); val k2 = Lcg.key2(neg)
      k >= 0L && k < Lcg.M && k2 >= 0L && k2 < Lcg.M &&
        Lcg.key(neg + Lcg.M * 4) == k && Lcg.key2(neg + Lcg.M * 4) == k2 &&
        Lcg.key(Long.MinValue) >= 0L && Lcg.key2(Long.MinValue) >= 0L
    }

  property("key2 is decorrelated from key (not a shift of the same orbit)") =
    Prop.forAll(domGen, domGen) { (x, y) =>
      // the composite (key, key2) separates any two distinct inputs the
      // same way each component does; and the two maps genuinely differ
      (x == y) || Lcg.key(x) != Lcg.key2(x) || Lcg.key(y) != Lcg.key2(y)
    }
}

package graft

import graft.functions.ImageGeometry._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** FIXTURES.md §3 geometry cases — pure Array[Double] functions, no
  * session needed (the UDF wrappers are exercised by a12_ten_crop).
  * ScalaCheck properties for this family live in [[GeometryProps]]. */
class ImageGeometrySpec extends AnyFunSuite with Matchers {

  private val img3 = (1 to 9).map(_.toDouble).toArray // 3x3 row-major [1..9]
  private val img4 = (0 until 16).map(_.toDouble).toArray // 4x4

  test("A11 flipH on 3x3 [1..9]: each row reversed") {
    flipH(img3, 3).toSeq shouldBe Seq(3.0, 2.0, 1.0, 6.0, 5.0, 4.0, 9.0, 8.0, 7.0)
  }

  test("A11 flipH involution: flip(flip(a)) == a (seeded sweep)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val w = 1 + rnd.nextInt(8); val h = 1 + rnd.nextInt(8)
      val a = Array.fill(w * h)(rnd.nextDouble() * 200 - 100)
      flipH(flipH(a, w), w) shouldBe a
    }
  }

  test("A11 flipV on 3x3 [1..9]: rows reversed top-to-bottom") {
    flipV(img3, 3).toSeq shouldBe Seq(7.0, 8.0, 9.0, 4.0, 5.0, 6.0, 1.0, 2.0, 3.0)
  }

  test("A13 augmentFlipV is deterministic and flips on the stream-5 draw") {
    val a = img3
    augmentFlipV(a, 3, 42L, 1) shouldBe augmentFlipV(a, 3, 42L, 1)
    // every output is either the original or its exact vertical flip,
    // decided by the stream-5 LCG bit — verify against the direct draw
    for (id <- 0L to 20L) {
      val expectFlip = lcg((id & 0xffffL) * 131071L + 5L) < 0x40000000L
      val out = augmentFlipV(a, 3, id, 0).toSeq
      out shouldBe (if (expectFlip) flipV(a, 3).toSeq else a.toSeq)
    }
  }

  test("A12 crop: 2x2 corners + center of 4x4") {
    crop(img4, 4, 0, 0, 2, 2).toSeq shouldBe Seq(0.0, 1.0, 4.0, 5.0) // TL
    crop(img4, 4, 2, 0, 2, 2).toSeq shouldBe Seq(2.0, 3.0, 6.0, 7.0) // TR
    crop(img4, 4, 0, 2, 2, 2).toSeq shouldBe Seq(8.0, 9.0, 12.0, 13.0) // BL
    crop(img4, 4, 2, 2, 2, 2).toSeq shouldBe Seq(10.0, 11.0, 14.0, 15.0) // BR
    crop(img4, 4, 1, 1, 2, 2).toSeq shouldBe Seq(5.0, 6.0, 9.0, 10.0) // center
  }

  test("A12 tenCrop: 10 crops of w*h, fixed [TL,TR,BL,BR,C] x {orig,flip} order") {
    val crops = tenCrop(img4, 4, 4, 2, 2)
    crops should have length 10
    all(crops.map(_.length)) shouldBe 4
    crops(0).toSeq shouldBe Seq(0.0, 1.0, 4.0, 5.0) // TL of original
    // TL of flipped image = reversed first rows' left block
    val flipped = flipH(img4, 4)
    crops(5) shouldBe crop(flipped, 4, 0, 0, 2, 2)
  }

  test("A8 bilinearResize: identity when sizes match") {
    bilinearResize(img4, 4, 4, 4, 4) shouldBe img4
  }

  test("A8 bilinearResize: 2x2 -> 4x4 known interpolation values") {
    // image [[0,1],[2,3]]; half-pixel centers, edge clamp
    val out = bilinearResize(Array(0.0, 1.0, 2.0, 3.0), 2, 2, 4, 4)
    out should have length 16
    out(0) shouldBe 0.0 // corner clamps to source corner
    out(15) shouldBe 3.0
    // horizontal midpoints interpolate between columns
    out(1) shouldBe 0.25 +- 1e-12
    out(2) shouldBe 0.75 +- 1e-12
  }

  test("A8 bilinearResize: downscale 4x4 -> 2x2 averages 2x2 blocks at centers") {
    val out = bilinearResize(img4, 4, 4, 2, 2)
    // center of TL quadrant = avg(0,1,4,5) = 2.5
    out.toSeq shouldBe Seq(2.5, 4.5, 10.5, 12.5)
  }

  test("A13 augmentFlip is deterministic in (id, epoch)") {
    val a = img3
    augmentFlip(a, 3, 42L, 1) shouldBe augmentFlip(a, 3, 42L, 1)
    // both branches occur over ids
    val outs = (0L to 20L).map(id => augmentFlip(a, 3, id, 0).toSeq)
    outs.toSet.size shouldBe 2
  }
}

package graft

import graft.functions.ImageGeometry._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** A13 full augmentation: affine inverse-mapping resampler fixtures. */
class AffineSpec extends AnyFunSuite with Matchers {

  private val img3 = (1 to 9).map(_.toDouble) // 3x3 [1..9]

  private def approxSeq(got: Seq[Double], want: Seq[Double], eps: Double = 1e-9): Unit = {
    got.length shouldBe want.length
    got.zip(want).foreach { case (g, w) => g shouldBe w +- eps }
  }

  test("identity transform returns the image") {
    approxSeq(affine(img3, 3, 3, 0.0, 1.0, 0.0, 0.0), img3)
  }

  test("90-degree rotation permutes the grid") {
    // out(0,0) samples source (0,2)=7; first row becomes [7,4,1]
    approxSeq(affine(img3, 3, 3, math.Pi / 2, 1.0, 0.0, 0.0),
      Seq(7.0, 4.0, 1.0, 8.0, 5.0, 2.0, 9.0, 6.0, 3.0), 1e-7)
  }

  test("zoom 2x samples the center neighborhood") {
    // out(0,0) samples (0.5, 0.5) -> mean of the TL 2x2 block
    val out = affine(img3, 3, 3, 0.0, 2.0, 0.0, 0.0)
    out(0) shouldBe (1.0 + 2.0 + 4.0 + 5.0) / 4 +- 1e-9
    out(4) shouldBe 5.0 +- 1e-9 // center invariant
  }

  test("shift by one pixel clamps at the edge") {
    // shiftX = 1/3 of width 3 -> source col = c-1, clamped at 0
    approxSeq(affine(img3, 3, 3, 0.0, 1.0, 1.0 / 3, 0.0),
      Seq(1.0, 1.0, 2.0, 4.0, 4.0, 5.0, 7.0, 7.0, 8.0))
  }

  test("rotation preserves the center pixel and value bounds") {
    for (deg <- Seq(10, 17, 30)) {
      val out = affine(img3, 3, 3, math.toRadians(deg), 1.0, 0.0, 0.0)
      out(4) shouldBe 5.0 +- 1e-9
      all(out) should (be >= 1.0 and be <= 9.0)
    }
  }

  test("augmentFull is deterministic in (id, epoch) and varies across both") {
    val a = (1 to 64).map(_.toDouble)
    augmentFull(a, 8, 7L, 2) shouldBe augmentFull(a, 8, 7L, 2)
    val byId = (0L to 10L).map(id => augmentFull(a, 8, id, 0)).toSet
    byId.size should be > 5
    augmentFull(a, 8, 7L, 0) should not be augmentFull(a, 8, 7L, 1)
  }
}

package graft

import graft.functions.ImageGeometry._
import org.scalacheck.{Gen, Prop, Properties}

/** SURVEY.md §5.3 ScalaCheck properties over the pure geometry/array
  * functions (sbt's ScalaCheck framework runs Properties objects). */
object GeometryProps extends Properties("geometry") {

  private val imgGen: Gen[(Array[Double], Int, Int)] = for {
    w <- Gen.choose(1, 10)
    h <- Gen.choose(1, 10)
    a <- Gen.listOfN(w * h, Gen.choose(-1000.0, 1000.0))
  } yield (a.toArray, w, h)

  property("flipH is an involution") = Prop.forAll(imgGen) { case (a, w, _) =>
    flipH(flipH(a, w), w).sameElements(a)
  }

  property("flipH preserves multiset of pixels") = Prop.forAll(imgGen) { case (a, w, _) =>
    flipH(a, w).sorted.sameElements(a.sorted)
  }

  property("flipV is an involution") = Prop.forAll(imgGen) { case (a, w, _) =>
    flipV(flipV(a, w), w).sameElements(a)
  }

  property("flipV preserves multiset of pixels") = Prop.forAll(imgGen) { case (a, w, _) =>
    flipV(a, w).sorted.sameElements(a.sorted)
  }

  property("flipV∘flipH == flipH∘flipV (180° rotation)") =
    Prop.forAll(imgGen) { case (a, w, _) =>
      flipV(flipH(a, w), w).sameElements(flipH(flipV(a, w), w))
    }

  property("tenCrop yields 10 crops of exactly w*h pixels") =
    Prop.forAll(Gen.choose(2, 8), Gen.choose(2, 8)) { (cw, ch) =>
      val w = 10; val h = 10
      val a = Array.tabulate(w * h)(_.toDouble)
      val crops = tenCrop(a, w, h, cw, ch)
      crops.length == 10 && crops.forall(_.length == cw * ch)
    }

  property("crop contents come from the source rectangle") =
    Prop.forAll(Gen.choose(0, 4), Gen.choose(0, 4)) { (x0, y0) =>
      val w = 8
      val a = Array.tabulate(w * w)(_.toDouble)
      val c = crop(a, w, x0, y0, 3, 3)
      c.zipWithIndex.forall { case (v, i) =>
        v == a((y0 + i / 3) * w + (x0 + i % 3))
      }
    }

  property("bilinearResize to same size is identity") = Prop.forAll(imgGen) {
    case (a, w, h) => bilinearResize(a, h, w, h, w).sameElements(a)
  }

  property("bilinearResize output within [min,max] of input") =
    Prop.forAll(imgGen, Gen.choose(1, 12), Gen.choose(1, 12)) { case ((a, w, h), w1, h1) =>
      val out = bilinearResize(a, h, w, h1, w1)
      val (mn, mx) = (a.min, a.max)
      out.forall(v => v >= mn - 1e-9 && v <= mx + 1e-9)
    }
}

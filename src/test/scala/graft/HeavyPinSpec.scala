package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** RE-PIN POLICY enforcement for the heavy host-drift controls
  * (VERDICT r14 #1): `Bench.heavyRef` pins the isolated idle minima of
  * three LIVE suite entries (dd_components / gr_pagerank / ml_stack).
  * Those pins are only valid while the pinned entries' code is
  * unchanged — a plan-changing edit to one of them shifts its wall
  * time for non-host reasons, and an un-re-pinned `heavyRef` then
  * launders that entry's own regression/win into "host weather"
  * (exactly the light-pin failure mode the r13→r14 A/B adjudicated).
  *
  * Mechanism: `Bench.heavyRefPlanPin` snapshots each pinned entry's
  * exact-deterministic plan vector (exchange/broadcast/scan counts +
  * shuffle rows at the pinned sf0.1) from the PLAN_BASELINE.json the
  * pin run produced. Any code change to a pinned entry changes that
  * vector; bench_compare's default exit-1 baseline gate forces the
  * refreshed vector into the committed PLAN_BASELINE.json; and this
  * spec then FAILS until `heavyRef` is re-measured and both maps are
  * updated together. The chain makes a silent stale pin impossible
  * without deleting the spec.
  */
class HeavyPinSpec extends AnyFunSuite with Matchers {

  test("heavy pins and their plan fingerprints cover the same entries") {
    Bench.heavyRefPlanPin.keySet shouldBe Bench.heavyRef.keySet
    Bench.heavyRefSourceUnits.keySet shouldBe Bench.heavyRef.keySet
    Bench.heavyRefSourceDigest.keySet shouldBe Bench.heavyRef.keySet
  }

  test("working-tree source of each pinned entry still matches its pin-time digest") {
    // The plan-vector pin below is blind to edits that don't move the
    // vector (a UDF body, an MLlib hyperparameter, a constant inside an
    // unchanged plan shape) — this digest isn't (r16, VERDICT r15 #6).
    // Comments and whitespace are stripped first, so doc-only edits
    // never force a re-pin; any behavior-adjacent edit does.
    val moved = Bench.heavyRefSourceUnits.toSeq.sortBy(_._1).flatMap {
      case (entry, units) =>
        val got = Bench.sourceDigestOf(units)
        if (got == Bench.heavyRefSourceDigest(entry)) None
        else Some(s"""    "$entry" -> "$got",""")
    }
    withClue("source digest of heavy-pin entries moved — their defining " +
      "code changed in a way the plan vector may not see. RE-PIN: " +
      "re-measure each isolated idle minimum (Bench.scala RE-PIN " +
      "POLICY), then update Bench.heavyRef, heavyRefPlanPin AND " +
      "heavyRefSourceDigest together. Fresh digests:\n" +
      moved.mkString("\n") + "\n: ") {
      moved shouldBe empty
    }
  }

  test("the digest tripwire actually trips on a code edit and ignores comment/format edits") {
    // self-test of the normalizer: the three properties the pin relies on
    val code = "object X {\n  // c\n  val a = 1 /* b */\n  val s = \"x // y\"\n}\n"
    val reformatted = "object X { val a=1\n  val s = \"x // y\" }"
    val edited = code.replace("= 1", "= 2")
    Bench.stripScala(code) shouldBe Bench.stripScala(reformatted)
    Bench.stripScala(code) should not be Bench.stripScala(edited)
    // string literals survive verbatim (the // inside is NOT a comment)
    Bench.stripScala(code) should include("\"x // y\"")
    // entrySlice isolates one declaration: a sibling edit doesn't move it
    val reg = "object R {\n  val aEntry: Entry = Entry(\"a\",\n    body1)\n\n" +
      "  val bEntry: Entry = Entry(\"b\",\n    body2)\n}\n"
    val sliceA = Bench.entrySlice(reg, "aEntry")
    sliceA should include("body1")
    sliceA should not include "body2"
    Bench.entrySlice(reg.replace("body2", "body2x"), "aEntry") shouldBe sliceA
  }

  test("PLAN_BASELINE.json still matches the heavy pins' pin-time plan vectors") {
    // forked test JVMs run with cwd = repo root (sbt default)
    val f = new java.io.File("PLAN_BASELINE.json")
    withClue("committed plan baseline missing — bench_compare's default " +
      "gate AND this re-pin enforcement both depend on it: ") {
      f.isFile shouldBe true
    }
    val plan = new ObjectMapper().readTree(f).get("plan")
    plan should not be null
    for ((entry, pin) <- Bench.heavyRefPlanPin) {
      val node = plan.get(entry)
      withClue(s"heavy-pin entry '$entry' has no PLAN_BASELINE row: ") {
        node should not be null
      }
      for ((field, v) <- pin) withClue(
        s"$entry.$field moved vs the pin-time vector — the pinned entry's " +
          "code/plan changed. RE-PIN: re-measure its isolated idle minimum " +
          "(Bench.scala RE-PIN POLICY), then update Bench.heavyRef AND " +
          "Bench.heavyRefPlanPin together: ") {
        node.get(field).asLong shouldBe v
      }
    }
  }
}

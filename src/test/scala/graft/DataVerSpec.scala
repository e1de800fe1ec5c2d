package graft

/** [[Tables.dataVer]] — the data-version token every derived-fixture
  * cache key folds in (r8 near-miss: a regenerated testdata dir kept
  * serving code-versioned fixtures). The contract: same bytes → same
  * token; touched mtime OR changed length → different token, so a
  * regen retargets every `target/tmp` cache path that embeds it. */
class DataVerSpec extends SparkSpec {

  private def tmpTable(dir: java.io.File, name: String, bytes: Array[Byte]): Unit =
    java.nio.file.Files.write(
      dir.toPath.resolve(s"$name.parquet"), bytes): Unit

  test("dataVer is stable for identical files and order-insensitive") {
    val dir = java.nio.file.Files.createTempDirectory("dv").toFile
    tmpTable(dir, "a", Array[Byte](1, 2, 3))
    tmpTable(dir, "b", Array[Byte](4, 5))
    val v1 = Tables.dataVer(dir.getPath, "a", "b")
    val v2 = Tables.dataVer(dir.getPath, "b", "a") // sorted internally
    v1 shouldBe v2
    v1 should fullyMatch regex "[0-9a-f]+"
  }

  test("reapStaleSiblings removes superseded hour-cold dirs, keeps live ones") {
    val base = new java.io.File("target/tmp")
    base.mkdirs()
    val fam = s"dvreap_${ProcessHandle.current().pid()}_"
    val keep = new java.io.File(base, fam + "new")
    val staleOld = new java.io.File(base, fam + "old")
    val freshOld = new java.io.File(base, fam + "racing")
    Seq(keep, staleOld, freshOld).foreach { d =>
      d.mkdirs(); java.nio.file.Files.writeString(d.toPath.resolve("x"), "x"): Unit
    }
    // hour-cold sibling → reaped; fresh sibling (a concurrent writer) and
    // the keep dir → untouched
    staleOld.setLastModified(System.currentTimeMillis() - 2 * 3600L * 1000) shouldBe true
    Tables.reapStaleSiblings(fam, keep.getName)
    keep.exists() shouldBe true
    freshOld.exists() shouldBe true
    staleOld.exists() shouldBe false
    Seq(keep, freshOld).foreach { d =>
      java.nio.file.Files.deleteIfExists(d.toPath.resolve("x"))
      d.delete(): Unit
    }
  }

  test("tbl schema cache retargets on data regen") {
    val dir = java.nio.file.Files.createTempDirectory("tblc").toFile
    import spark.implicits._
    Seq((1, "x")).toDF("k", "v").write.mode("overwrite")
      .parquet(s"${dir.getPath}/t.parquet")
    Tables.tbl(spark, dir.getPath, "t").columns.toSeq shouldBe Seq("k", "v")
    // second resolve serves the cached schema (and stays correct)
    Tables.tbl(spark, dir.getPath, "t").as[(Int, String)].collect()
      .toSeq shouldBe Seq((1, "x"))
    // regen with a different schema: the cache must serve the NEW
    // schema, not the stale one (the r8 stale-fixture failure class)
    Seq((1, "x", 9L)).toDF("k", "v", "w").write.mode("overwrite")
      .parquet(s"${dir.getPath}/t.parquet")
    val f = new java.io.File(dir, "t.parquet")
    f.setLastModified(f.lastModified() + 60000): Unit
    Tables.tbl(spark, dir.getPath, "t").columns.toSeq shouldBe Seq("k", "v", "w")
  }

  test("a touched or resized source changes the token (forces recompute)") {
    val dir = java.nio.file.Files.createTempDirectory("dv").toFile
    tmpTable(dir, "a", Array[Byte](1, 2, 3))
    val v0 = Tables.dataVer(dir.getPath, "a")
    // regen with different content length → new token even at same mtime
    tmpTable(dir, "a", Array[Byte](1, 2, 3, 4))
    val v1 = Tables.dataVer(dir.getPath, "a")
    v1 should not be v0
    // same length, bumped mtime (the driver rewrites in place) → new token
    val f = new java.io.File(dir, "a.parquet")
    f.setLastModified(f.lastModified() + 60000) shouldBe true
    val v2 = Tables.dataVer(dir.getPath, "a")
    v2 should not be v1
  }
}

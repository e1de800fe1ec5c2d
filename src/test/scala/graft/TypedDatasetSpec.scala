package graft

import org.apache.spark.sql.Dataset

/** SURVEY §1.3: the typed Dataset[SarScene] sugar over the ingest
  * layer — case-class Encoders where type safety helps, DataFrame
  * everywhere schema is dynamic. */
object TypedDatasetSpec {
  case class SarScene(id: String, band_1: Seq[Double], band_2: Seq[Double],
      inc_angle: Option[Double], is_iceberg: Option[Int])
}

class TypedDatasetSpec extends SparkSpec {
  import TypedDatasetSpec._
  import spark.implicits._

  private lazy val fixture: String = {
    val dir = java.nio.file.Files.createTempDirectory("sar-typed").toFile
    val f = new java.io.File(dir, "train.json")
    java.nio.file.Files.writeString(f.toPath,
      """[{"id":"t1","band_1":[1.0,2.0],"band_2":[3.0,4.0],"inc_angle":"38.1","is_iceberg":1},
        |{"id":"t2","band_1":[5.0,6.0],"band_2":[7.0,8.0],"inc_angle":"na","is_iceberg":0}]""".stripMargin)
    f.getAbsolutePath
  }

  test("ingest round-trips through the typed Dataset[SarScene]") {
    val ds: Dataset[SarScene] =
      Ingest.coerce(Ingest.readSarJson(spark, fixture)).as[SarScene]
    val scenes = ds.collect().sortBy(_.id)
    scenes.map(_.id).toSeq shouldBe Seq("t1", "t2")
    scenes(0).inc_angle shouldBe Some(38.1)
    scenes(1).inc_angle shouldBe None // "na" coerced to null -> None
    scenes(0).band_1 shouldBe Seq(1.0, 2.0)
    // typed transforms keep the encoder
    val labels = ds.map(s => s.id -> s.is_iceberg.getOrElse(-1)).collect().toMap
    labels shouldBe Map("t1" -> 1, "t2" -> 0)
  }
}

package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.io.{Catalog, IO}
import graft.mm.Multimodal
import graft.pipeline.Stages

class IoPipelineMmSpec extends SparkSpec {
  import spark.implicits._

  test("IO csv/json round-trip preserves data; sanitize cleans names") {
    val tmp = Files.createTempDirectory("graft_io").toString
    val df = Seq((1, "a", 1.5), (2, "b", 2.5)).toDF("ID", "Name Col", "Some-Value")
    IO.exportData(df, s"$tmp/t.csv")
    val back = IO.readData(spark, s"$tmp/t.csv", sanitizeNames = true)
    assert(back.columns.toSeq == Seq("id", "name_col", "some_value"))
    assert(back.count() == 2)
    IO.exportData(df, s"$tmp/t.json")
    assert(IO.readData(spark, s"$tmp/t.json").count() == 2)
    // .pkl/.sas7bdat/.sav now dispatch to their pure-JVM readers
    // (PickleSpec/SasSpec/SavSpec); the remaining documented descope
    // (.h5) still refuses loudly
    intercept[IllegalArgumentException] { IO.readData(spark, s"$tmp/t.h5") }
  }

  test("IO exports .html (round-trips through Scrape) and .tex") {
    val tmp = Files.createTempDirectory("graft_texhtml").toString
    val df = Seq((1L, "a<b&c", 1.5), (2L, "d_e%f", 2.5))
      .toDF("id", "txt", "v")
    IO.exportData(df, s"$tmp/t.html")
    val back = IO.readData(spark, s"$tmp/t.html")
    assert(back.count() === 2L)
    assert(back.columns.toSeq === Seq("id", "txt", "v"))
    assert(back.orderBy("id").select($"txt").as[String].collect().toSeq ===
      Seq("a<b&c", "d_e%f"))
    IO.exportData(df, s"$tmp/t.tex")
    val tex = Files.readString(java.nio.file.Paths.get(s"$tmp/t.tex"))
    assert(tex.startsWith("\\begin{tabular}{lll}"))
    assert(tex.contains("d\\_e\\%f"))
    assert(tex.contains("id & txt & v"))
  }

  test("IO exports .md tables and round-trips .pkl records") {
    val tmp = Files.createTempDirectory("graft_mdpkl").toString
    val df = Seq((1L, "a|b", 0.5), (2L, "c", 1.5)).toDF("id", "txt", "v")
    IO.exportData(df, s"$tmp/t.md")
    val md = Files.readString(java.nio.file.Paths.get(s"$tmp/t.md"))
    assert(md.startsWith("| id | txt | v |\n| --- | --- | --- |"))
    assert(md.contains("| a\\|b |")) // pipe escaped
    IO.exportData(df, s"$tmp/t.pkl")
    val back = IO.readData(spark, s"$tmp/t.pkl")
      .orderBy("id").select($"id", $"txt", $"v")
      .as[(Double, String, Double)].collect() // numerics widen to double
    assert(back.toSeq === Seq((1.0, "a|b", 0.5), (2.0, "c", 1.5)))
  }

  test("IO reads xml via the built-in reader") {
    val tmp = Files.createTempDirectory("graft_xml").toString
    val f = java.nio.file.Paths.get(tmp, "t.xml")
    Files.writeString(f,
      "<rows><row><id>1</id><name>a</name></row><row><id>2</id><name>b</name></row></rows>")
    val df = IO.readData(spark, f.toString)
    assert(df.count() == 2)
    assert(df.columns.toSet == Set("id", "name"))
  }

  test("Catalog save/table/list/drop lifecycle") {
    val wh = Files.createTempDirectory("graft_wh").toString
    val cat = new Catalog(spark, wh)
    cat.save("orders_small", T.orders(spark, sf).limit(100))
    cat.save("regions", T.region(spark, sf))
    assert(cat.list() == Seq("orders_small", "regions"))
    assert(cat.table("orders_small").count() == 100)
    assert(cat.drop("regions"))
    assert(cat.list() == Seq("orders_small"))
  }

  test("preprocessor pipeline emits standardized feature vectors") {
    val df = T.customer(spark, sf)
    val model = Stages.preprocessor(Seq("c_acctbal"), Seq("c_mktsegment")).fit(df)
    val out = model.transform(df)
    val v = out.select("features").head.getAs[org.apache.spark.ml.linalg.Vector](0)
    // 1 numeric + one-hot over 6 indexed categories (5 + keep-invalid
    // bucket) with the default drop-last -> 5 dims
    assert(v.size == 1 + 5)
  }

  test("tfidf pipeline vectorizes documents") {
    val docs = T.documents(spark, sf).limit(50)
    val out = Stages.tfidf("text", numFeatures = 1024).fit(docs).transform(docs)
    val v = out.select("tfidf").head.getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(v.numNonzeros > 0)
  }

  test("kmeansFeaturizer assigns a bounded cluster id") {
    val df = T.customer(spark, sf)
    val out = Stages.kmeansFeaturizer(Seq("c_acctbal"), k = 4).fit(df).transform(df)
    val ids = out.select("cluster").distinct().as[Int].collect().toSet
    assert(ids.subsetOf(Set(0, 1, 2, 3)) && ids.size > 1)
  }

  test("byte-histogram featurizer is deterministic and schema-stable") {
    val media = Multimodal.toMediaFrame(spark, Seq(
      (1L, Array[Byte](1, 2, 3), "png", 8, 8, 0L),
      (2L, Array[Byte](9, 9), "wav", 0, 0, 5000L),
      (3L, null, "png", 0, 0, 0L)))
    val f1 = Multimodal.decodeFeatures(media, dim = 8).orderBy("media_id")
      .as[(Long, Seq[Float], Int)].collect()
    val f2 = Multimodal.decodeFeatures(media, dim = 8).orderBy("media_id")
      .as[(Long, Seq[Float], Int)].collect()
    assert(f1.toSeq == f2.toSeq) // deterministic
    assert(f1.forall(_._2.length == 8))
    assert(f1.find(_._1 == 3L).get._3 == 0) // null content handled
  }

  test("sampleFrames explodes one row per frame step") {
    val media = Multimodal.toMediaFrame(spark, Seq(
      (1L, Array[Byte](1), "mp4", 0, 0, 10000L)))
    val frames = Multimodal.sampleFrames(media, everyMs = 2500L)
    assert(frames.count() == 5) // 0, 2500, 5000, 7500, 10000
  }
}

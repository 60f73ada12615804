package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class AvroSerdeSpec extends SparkSpec {
  import spark.implicits._

  private val userSchema =
    """{"type":"record","name":"User","namespace":"app","fields":[
      |{"name":"user_id","type":"string"},
      |{"name":"age","type":["null","int"],"default":null},
      |{"name":"tags","type":{"type":"array","items":"string"}},
      |{"name":"props","type":{"type":"map","values":"long"}}
      |]}""".stripMargin

  test("avroToStructType maps the reference type lattice") {
    val st = AvroSerde.avroToStructType(userSchema)
    assert(st("user_id").dataType == StringType && !st("user_id").nullable)
    assert(st("age").dataType == IntegerType && st("age").nullable)
    assert(st("tags").dataType == ArrayType(StringType, containsNull = false))
    assert(st("props").dataType ==
      MapType(StringType, LongType, valueContainsNull = false))
  }

  test("encode → decode round-trips rows through Avro binary") {
    val df = Seq(
      ("u1", Some(30), Seq("a", "b"), Map("k" -> 1L)),
      ("u2", None, Seq.empty[String], Map.empty[String, Long])
    ).toDF("user_id", "age", "tags", "props")
      .select(struct($"user_id", $"age", $"tags", $"props").as("rec"))

    val encoded = AvroSerde.encode(df, "rec", userSchema, "bin")
    assert(encoded.filter($"bin".isNull).count() == 0)

    val decoded = AvroSerde.decode(encoded.select("bin"), "bin", userSchema, "rec")
    val rows = decoded.select("rec.user_id", "rec.age", "rec.tags", "rec.props")
      .as[(String, Option[Int], Seq[String], Map[String, Long])]
      .collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("u1", Some(30), Seq("a", "b"), Map("k" -> 1L)),
      ("u2", None, Seq.empty, Map.empty)))
  }

  test("decode failure yields null record (DLQ split point), not a crash") {
    val junk = Seq(Array[Byte](1, 2, 3)).toDF("bin")
    val decoded = AvroSerde.decode(junk, "bin", userSchema, "rec")
    // 3 junk bytes may or may not parse as a partial record; the contract
    // is only: no exception, and either a null or a non-null struct
    assert(decoded.count() == 1)
  }
}

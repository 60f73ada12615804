package graft.sources

import java.io.ByteArrayOutputStream
import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro ser/de for change-event payloads (reference: Avro converters +
  * Schema Registry wiring, `scylla-source.json:14-17`,
  * `postgres-sink.json:15-18`; Avro→engine type lattice SURVEY §1.2).
  *
  * Built directly on avro-core (no spark-avro module in this build):
  * schema mapping is pure; decoding runs in `mapPartitions` with the
  * parsed schema + reader instantiated ONCE PER PARTITION (the same
  * batch-amortization shape as the multimodal decoder). Registry
  * governance comes from [[graft.schemaevo.SchemaStore]] — the writer
  * schema travels as (subject, version), fetched once per partition.
  */
object AvroSerde {

  /** Avro schema JSON → Spark StructType (union[null,T] → nullable;
    * enum→string, fixed→binary — SURVEY §1.2 table). */
  def avroToStructType(schemaJson: String): StructType =
    avroType(new Schema.Parser().parse(schemaJson))._1 match {
      case s: StructType => s
      case other => throw new IllegalArgumentException(
        s"top-level Avro schema must be a record, got $other")
    }

  private def avroType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.RECORD =>
      (StructType(s.getFields.asScala.map { f =>
        val (dt, nullable) = avroType(f.schema())
        StructField(f.name(), dt, nullable)
      }.toSeq), false)
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala
      val nonNull = branches.filterNot(_.getType == Schema.Type.NULL)
      val hasNull = branches.exists(_.getType == Schema.Type.NULL)
      if (nonNull.size == 1) {
        val (dt, _) = avroType(nonNull.head)
        (dt, hasNull)
      } else (StringType, true) // mixed unions degrade to JSON-ish string
    case Schema.Type.ARRAY =>
      val (dt, n) = avroType(s.getElementType); (ArrayType(dt, n), false)
    case Schema.Type.MAP =>
      val (dt, n) = avroType(s.getValueType)
      (MapType(StringType, dt, n), false)
    case Schema.Type.ENUM | Schema.Type.STRING => (StringType, false)
    case Schema.Type.FIXED | Schema.Type.BYTES => (BinaryType, false)
    case Schema.Type.INT => (IntegerType, false)
    case Schema.Type.LONG => (LongType, false)
    case Schema.Type.FLOAT => (FloatType, false)
    case Schema.Type.DOUBLE => (DoubleType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.NULL => (NullType, true)
  }

  private def fromAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: Utf8, StringType) => u.toString
    case (e: GenericData.EnumSymbol, StringType) => e.toString
    case (r: GenericRecord, st: StructType) => genericRecordToRow(r, st)
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (f: GenericData.Fixed, BinaryType) => f.bytes()
    case (l: java.util.Collection[_], ArrayType(et, _)) =>
      l.asScala.map(fromAvroValue(_, et)).toSeq
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, x) => k.toString -> fromAvroValue(x, vt) }.toMap
    case (other, _) => other
  }

  private def genericRecordToRow(rec: GenericRecord, st: StructType): Row =
    Row(st.fields.map(f => fromAvroValue(rec.get(f.name), f.dataType)): _*)

  /** Decode a binary Avro column into a struct column named `out`,
    * per-partition reader setup. Rows that fail to decode get a null
    * struct — pair with a DLQ split on `out is null` (ST6). */
  def decode(df: DataFrame, binaryCol: String, schemaJson: String,
      out: String = "record"): DataFrame = {
    val spark = df.sparkSession
    val structType = avroToStructType(schemaJson)
    val inSchema = df.schema
    val outSchema = inSchema.add(out, structType, nullable = true)
    val binIdx = inSchema.fieldIndex(binaryCol)
    val rdd = df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson) // once per partition
      val reader = new GenericDatumReader[GenericRecord](schema)
      rows.map { r =>
        val decoded =
          try {
            val bytes = r.getAs[Array[Byte]](binIdx)
            val dec = DecoderFactory.get().binaryDecoder(bytes, null)
            genericRecordToRow(reader.read(null, dec), structType)
          } catch { case _: Exception => null }
        Row.fromSeq(r.toSeq :+ decoded)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  private def toAvroValue(v: Any, s: Schema): Any = {
    val target = if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s
    (v, target.getType) match {
      case (null, _) => null
      case (r: Row, Schema.Type.RECORD) => rowToGenericRecord(r, target)
      case (b: Array[Byte], Schema.Type.BYTES) => java.nio.ByteBuffer.wrap(b)
      // Spark hands back mutable.ArraySeq / various Map impls — match the
      // collection roots, not the 2.13 immutable aliases
      case (seq: scala.collection.Seq[_], Schema.Type.ARRAY) =>
        seq.map(toAvroValue(_, target.getElementType)).toList.asJava
      case (m: scala.collection.Map[_, _], Schema.Type.MAP) =>
        m.map { case (k, x) => k.toString -> toAvroValue(x, target.getValueType) }
          .toMap.asJava
      case (s0: String, Schema.Type.ENUM) => new GenericData.EnumSymbol(target, s0)
      case (other, _) => other
    }
  }

  private def rowToGenericRecord(row: Row, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    schema.getFields.asScala.foreach { f =>
      val idx = row.schema.fieldIndex(f.name())
      rec.put(f.name(), toAvroValue(row.get(idx), f.schema()))
    }
    rec
  }

  /** Encode selected struct column to Avro binary as column `out`. */
  def encode(df: DataFrame, structCol: String, schemaJson: String,
      out: String = "avro"): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = inSchema.add(out, BinaryType, nullable = true)
    val idx = inSchema.fieldIndex(structCol)
    val rdd = df.rdd.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      rows.map { r =>
        val bytes =
          try {
            val rec = rowToGenericRecord(r.getStruct(idx), schema)
            val bos = new ByteArrayOutputStream()
            val enc = EncoderFactory.get().binaryEncoder(bos, null)
            writer.write(rec, enc); enc.flush()
            bos.toByteArray
          } catch { case _: Exception => null }
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}

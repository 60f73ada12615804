package graft.cdc

import org.apache.spark.sql.types._

/** Typed schemas for the reference's five application tables plus sink
  * metadata (reference: source DDL `docker/scylla/init.cql:21-100`,
  * warehouse DDL `docker/postgres/init.sql:19-151`; type mapping
  * SURVEY §1.2 — UUIDs as canonical strings, UTC timestamps,
  * DECIMAL(12,2) money, MAP<STRING,STRING> for CQL maps).
  */
object ReferenceSchemas {

  /** Sink-side CDC metadata columns (init.sql:29-35). */
  val cdcMeta: Seq[StructField] = Seq(
    StructField("__deleted", StringType),
    StructField("cdc_operation", StringType),
    StructField("cdc_timestamp", TimestampType),
    StructField("cdc_source", StringType),
    StructField("cdc_stream_id", StringType))

  val users: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false), // UUID
    StructField("email", StringType),
    StructField("username", StringType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("status", StringType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("metadata", MapType(StringType, StringType))))

  val orders: StructType = StructType(Seq(
    StructField("order_id", StringType, nullable = false), // UUID
    StructField("user_id", StringType),
    StructField("status", StringType),
    StructField("total_amount", DecimalType(12, 2)),
    StructField("shipping_address", StringType),
    StructField("order_date", TimestampType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType)))

  val orderItems: StructType = StructType(Seq(
    StructField("order_id", StringType, nullable = false),  // composite PK 1
    StructField("item_id", StringType, nullable = false),   // composite PK 2
    StructField("product_id", StringType),
    StructField("quantity", IntegerType),
    StructField("unit_price", DecimalType(12, 2)),
    StructField("created_at", TimestampType)))

  val products: StructType = StructType(Seq(
    StructField("product_id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("price", DecimalType(12, 2)),
    StructField("stock_quantity", IntegerType),
    StructField("is_active", BooleanType),
    StructField("category", StringType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("attributes", MapType(StringType, StringType))))

  val inventoryTransactions: StructType = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false), // TIMEUUID
    StructField("product_id", StringType),
    StructField("quantity_change", IntegerType),
    StructField("transaction_type", StringType),
    StructField("reference_id", StringType),
    StructField("created_at", TimestampType),
    StructField("notes", StringType)))

  /** Per-table primary keys (init.cql; order_items composite,
    * init.cql:55-65). */
  val primaryKeys: Map[String, Seq[String]] = Map(
    "users" -> Seq("user_id"),
    "orders" -> Seq("order_id"),
    "order_items" -> Seq("order_id", "item_id"),
    "products" -> Seq("product_id"),
    "inventory_transactions" -> Seq("transaction_id"))

  def withCdcMeta(t: StructType): StructType =
    StructType(t.fields ++ cdcMeta)

  val all: Map[String, StructType] = Map(
    "users" -> users, "orders" -> orders, "order_items" -> orderItems,
    "products" -> products, "inventory_transactions" -> inventoryTransactions)
}

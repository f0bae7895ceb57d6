package graft.schema

import org.apache.spark.sql.types._

/** Explicit schemas for the reference's five JSON entities
  * (SURVEY.md §1.2; generator source of truth at
  * dataset_generator.py:169-182,210-219,234-243,304-321,406-417 and the
  * loader docstrings load_mongo.py:17-120).
  *
  * Always passed explicitly to readers — NEVER schema-inferred — because
  * `cart_contents` is a dynamic-key JSON object that inference would
  * explode into a struct with one field per product id
  * (dataset_generator.py:318); it must be MapType(String, Struct).
  * Timestamps stay ISO-8601 strings at the storage boundary (the
  * reference's convention, dataset_generator.py:160); typed columns are
  * derived with to_timestamp where needed.
  */
object Schemas {

  /** categories (dataset_generator.py:169-182) */
  val categories: StructType = StructType(Seq(
    StructField("category_id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("subcategories", ArrayType(StructType(Seq(
      StructField("subcategory_id", StringType),
      StructField("name", StringType),
      StructField("profit_margin", DoubleType)))))))

  /** products (dataset_generator.py:210-219); base_price carries as-of
    * semantics: it equals the LAST price_history entry
    * (dataset_generator.py:209). */
  val products: StructType = StructType(Seq(
    StructField("product_id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("category_id", StringType),
    StructField("base_price", DoubleType),
    StructField("current_stock", IntegerType),
    StructField("is_active", BooleanType),
    StructField("price_history", ArrayType(StructType(Seq(
      StructField("price", DoubleType),
      StructField("date", StringType))))),
    StructField("creation_date", StringType)))

  /** users (dataset_generator.py:234-243) */
  val users: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("geo_data", StructType(Seq(
      StructField("city", StringType),
      StructField("state", StringType),
      StructField("country", StringType)))),
    StructField("registration_date", StringType),
    StructField("last_active", StringType)))

  /** sessions (dataset_generator.py:304-321); cart_contents MUST be a
    * map (see object Scaladoc); page_views' product/category ids are
    * nullable for non-product pages (dataset_generator.py:292-293). */
  val sessions: StructType = StructType(Seq(
    StructField("session_id", StringType, nullable = false),
    StructField("user_id", StringType),
    StructField("start_time", StringType),
    StructField("end_time", StringType),
    StructField("duration_seconds", IntegerType),
    StructField("geo_data", StructType(Seq(
      StructField("city", StringType),
      StructField("state", StringType),
      StructField("country", StringType),
      StructField("ip_address", StringType)))),
    StructField("device_profile", StructType(Seq(
      StructField("type", StringType),
      StructField("os", StringType),
      StructField("browser", StringType)))),
    StructField("viewed_products", ArrayType(StringType)),
    StructField("page_views", ArrayType(StructType(Seq(
      StructField("timestamp", StringType),
      StructField("page_type", StringType),
      StructField("product_id", StringType, nullable = true),
      StructField("category_id", StringType, nullable = true),
      StructField("view_duration", IntegerType))))),
    StructField("cart_contents", MapType(StringType, StructType(Seq(
      StructField("quantity", IntegerType),
      StructField("price", DoubleType))))),
    StructField("conversion_status", StringType),
    StructField("referrer", StringType)))

  /** transactions (dataset_generator.py:406-417); session_id is null for
    * synthetic top-up transactions (dataset_generator.py:471). */
  val transactions: StructType = StructType(Seq(
    StructField("transaction_id", StringType, nullable = false),
    StructField("session_id", StringType, nullable = true),
    StructField("user_id", StringType),
    StructField("timestamp", StringType),
    StructField("items", ArrayType(StructType(Seq(
      StructField("product_id", StringType),
      StructField("quantity", IntegerType),
      StructField("unit_price", DoubleType),
      StructField("subtotal", DoubleType))))),
    StructField("subtotal", DoubleType),
    StructField("discount", DoubleType),
    StructField("total", DoubleType),
    StructField("payment_method", StringType),
    StructField("status", StringType)))

  val all: Map[String, StructType] = Map(
    "categories" -> categories, "products" -> products, "users" -> users,
    "sessions" -> sessions, "transactions" -> transactions)
}

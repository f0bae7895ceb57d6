package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded, Spark-native synthetic data generator reproducing the
  * reference generator's schemas, cardinalities and distributions
  * (SURVEY §2.1 S14; dataset_generator.py:42-56,74-527). Parity is at
  * schema/cardinality/distribution level — the reference's Faker values
  * are not replicable (SURVEY §7).
  *
  * Scale design: all "randomness" is hash-derived from the row id
  * (`xxhash64(seed, id, salt)`), so generation is stateless,
  * deterministic under any partitioning, and embarrassingly parallel —
  * `spark.range(2e6)` generates the reference's 2M sessions across every
  * executor with no RNG coordination, vs. the reference's single-threaded
  * ~5.3k sessions/s (dataset_generator.log:57-95). No UDFs; everything is
  * column expressions inside codegen.
  */
object DataGen {
  private val Seed = 42L
  // 90-day window ending 2025-06-08 (dataset_generator.py:43-48 window;
  // log timestamps dataset_generator.log:1)
  private val WindowStart = 1741564800L // 2025-03-10T00:00:00Z
  private val WindowSecs = 90L * 86400

  /** Uniform in [0,1) derived from (seed, id, salt) — deterministic,
    * partition-independent. */
  private def u(salt: Int): Column =
    pmod(xxhash64(lit(Seed), col("id"), lit(salt)), lit(1000000L)) / 1000000.0

  /** Integer in [0, n) from a salted hash. */
  private def h(salt: Int, n: Int): Column =
    pmod(xxhash64(lit(Seed), col("id"), lit(salt)), lit(n.toLong)).cast("int")

  private def pick(salt: Int, values: Seq[String]): Column =
    element_at(array(values.map(lit): _*), h(salt, values.size) + 1)

  private def iso(epochSecs: Column): Column =
    date_format(timestamp_seconds(epochSecs), "yyyy-MM-dd'T'HH:mm:ss")

  private val CityPool = Seq("Kigali", "Nairobi", "Lagos", "Accra", "Cairo",
    "Dakar", "Kampala", "Lusaka", "Harare", "Tunis")
  private val StatePool = Seq("CA", "NY", "TX", "WA", "FL", "IL", "GA", "MA", "CO", "OR")
  private val Nouns = Seq("Widget", "Gadget", "Device", "Tool", "Kit",
    "Module", "System", "Unit", "Pack", "Set")
  private val Adjs = Seq("Smart", "Eco", "Pro", "Ultra", "Mini",
    "Max", "Prime", "Basic", "Deluxe", "Compact")

  /** categories: 25 rows, 3-5 subcategories each, profit margin
    * 0.10-0.40 2dp (dataset_generator.py:169-182). */
  def categories(spark: SparkSession, n: Int = 25): DataFrame =
    spark.range(n).select(
      format_string("cat_%03d", col("id")).as("category_id"),
      concat(pick(1, Adjs), lit(" "), pick(2, Nouns), lit("s")).as("name"),
      expr(s"""transform(sequence(0, ${2} + cast(pmod(xxhash64($Seed, id, 3), 3) as int)),
          j -> struct(
            format_string('sub_%03d_%02d', id, j) AS subcategory_id,
            concat('Sub ', id, '-', j) AS name,
            round(0.10 + pmod(xxhash64($Seed, id, j, 4), 31) * 0.01, 2) AS profit_margin))""")
        .as("subcategories"))

  /** products: 5000 rows; base_price == last price_history entry (the
    * as-of invariant, dataset_generator.py:209); price_history sorted
    * ascending by date; stock 413-644; ~95% active
    * (dataset_generator.py:210-219). */
  def products(spark: SparkSession, n: Int = 5000, nCats: Int = 25): DataFrame =
    spark.range(n).select(
      col("id"),
      format_string("prod_%05d", col("id")).as("product_id"),
      concat(pick(5, Adjs), lit(" "), pick(6, Nouns)).as("name"),
      format_string("cat_%03d", h(7, nCats)).as("category_id"),
      (h(8, 232) + 413).as("current_stock"),
      (u(9) < 0.95).as("is_active"))
      .withColumn("price_history", expr(
        s"""transform(sequence(0, cast(pmod(xxhash64($Seed, id, 10), 3) as int)),
            j -> struct(
              round(5.0 + pmod(xxhash64($Seed, id, j, 11), 49500) * 0.01, 2) AS price,
              date_format(timestamp_seconds($WindowStart - 86400 * (30 * (2 - j))),
                          "yyyy-MM-dd'T'HH:mm:ss") AS date))"""))
      .withColumn("base_price",
        element_at(col("price_history"), -1).getField("price"))
      .withColumn("creation_date",
        element_at(col("price_history"), 1).getField("date"))
      .drop("id")

  /** users: 10k rows with nested geo_data; last_active >= registration
    * (dataset_generator.py:234-243). */
  def users(spark: SparkSession, n: Int = 10000): DataFrame = {
    val reg = lit(WindowStart) - (u(21) * 365 * 86400).cast("long")
    spark.range(n).select(
      format_string("user_%06d", col("id")).as("user_id"),
      struct(pick(18, CityPool).as("city"), pick(19, StatePool).as("state"),
        lit("US").as("country")).as("geo_data"),
      iso(reg).as("registration_date"),
      iso(reg + (u(22) * 300 * 86400).cast("long")).as("last_active"))
  }

  /** sessions: the heavy table (reference: 2M rows). Page walks are
    * hash-driven rather than Markov-stateful — same page_type enum &
    * length distribution, order-free so it parallelizes
    * (cf. dataset_generator.py:110-127; SURVEY W6 records the semantic
    * delta). cart_contents keys are guaranteed-distinct product ids
    * (stride coprime with nProds). */
  def sessions(spark: SparkSession, n: Long = 20000, nUsers: Int = 10000,
               nProds: Int = 5000): DataFrame = {
    // id-format contract: session ids are exactly 10 hex chars and the
    // derived transaction ids slice those 10 chars back out — both
    // collision-free ONLY while ids fit in 40 bits. 2^40 ≈ 1.1e12
    // sessions (≈10× a 100-TB table at ~1 KB/row), so this is a
    // documented bound, not a latent overflow.
    require(n < (1L << 40), s"session id format caps n at 2^40, got $n")
    val start = lit(WindowStart) + (u(31) * WindowSecs).cast("long")
    val dur = (u(32) * 3570).cast("int") + 30
    spark.range(n)
      .withColumn("_start", start)
      .withColumn("duration_seconds", dur)
      .select(
        col("id"), col("_start"), col("duration_seconds"),
        // hex of the row id, NOT a truncated hash: 10 hex chars = 40 bits,
        // and md5-prefix ids collide at the reference's own 2M-session
        // scale (~2 expected birthday collisions), which would break the
        // session_id PK and cascade into duplicate transaction_ids
        format_string("sess_%010x", col("id")).as("session_id"),
        format_string("user_%06d", h(33, nUsers)).as("user_id"),
        iso(col("_start")).as("start_time"),
        iso(col("_start") + col("duration_seconds")).as("end_time"),
        struct(pick(34, CityPool).as("city"), pick(35, StatePool).as("state"),
          lit("US").as("country"),
          format_string("10.%d.%d.%d", h(36, 255), h(37, 255), h(38, 255)).as("ip_address"))
          .as("geo_data"),
        struct(pick(39, Seq("mobile", "desktop", "tablet")).as("type"),
          pick(40, Seq("iOS", "Android", "Windows", "macOS")).as("os"),
          pick(41, Seq("Chrome", "Safari", "Firefox", "Edge")).as("browser"))
          .as("device_profile"),
        expr(s"""transform(sequence(1, 1 + cast(pmod(xxhash64($Seed, id, 42), 8) as int)),
            j -> format_string('prod_%05d', pmod(pmod(xxhash64($Seed, id, 43), $nProds) + j * 104729, $nProds)))""")
          .as("viewed_products"),
        when(u(44) < 0.15, "converted").when(u(44) < 0.55, "abandoned")
          .otherwise("browsed").as("conversion_status"),
        pick(45, Seq("direct", "email", "social", "search_engine", "affiliate"))
          .as("referrer"))
      .withColumn("page_views", expr(
        s"""transform(sequence(0, 2 + cast(pmod(xxhash64($Seed, id, 46), 6) as int)),
            j -> named_struct(
              'timestamp', date_format(timestamp_seconds(_start + j * 30), "yyyy-MM-dd'T'HH:mm:ss"),
              'page_type', element_at(array('home','search','category_listing',
                 'product_detail','cart','checkout','confirmation'),
                 cast(pmod(xxhash64($Seed, id, j, 47), 7) as int) + 1),
              'product_id', CASE WHEN pmod(xxhash64($Seed, id, j, 47), 7) = 3
                 THEN format_string('prod_%05d', pmod(xxhash64($Seed, id, j, 48), $nProds)) END,
              'category_id', CASE WHEN pmod(xxhash64($Seed, id, j, 47), 7) IN (2, 3)
                 THEN format_string('cat_%03d', pmod(xxhash64($Seed, id, j, 49), 25)) END,
              'view_duration', cast(pmod(xxhash64($Seed, id, j, 50), 290) as int) + 10))"""))
      .withColumn("cart_contents", expr(
        s"""CASE WHEN conversion_status IN ('converted', 'abandoned') THEN
            map_from_entries(transform(
              sequence(1, 1 + cast(pmod(xxhash64($Seed, id, 51), 3) as int)),
              j -> struct(
                format_string('prod_%05d', pmod(pmod(xxhash64($Seed, id, 52), $nProds) + j * 7919, $nProds)),
                named_struct(
                  'quantity', cast(pmod(xxhash64($Seed, id, j, 53), 3) as int) + 1,
                  'price', round(5.0 + pmod(xxhash64($Seed, id, j, 54), 49500) * 0.01, 2)))))
            ELSE map() END"""))
      .drop("id", "_start")
  }

  /** transactions derived from converted sessions (the reference's txn
    * derivation, dataset_generator.py:380-417): items from the cart,
    * subtotal = Σ item subtotals (A15 higher-order aggregate), 2dp money,
    * discount {5,10,15,20}% w.p. 0.2, total = subtotal − discount;
    * timestamp = session end_time. A fraction of synthetic "top-up"
    * transactions carries session_id = NULL (dataset_generator.py:471). */
  def transactions(sessions: DataFrame, topupFraction: Double = 0.1): DataFrame = {
    // txn ids reuse the session's unique hex suffix (12 chars, zero-
    // padded) — collision-free by construction; top-ups get a disjoint
    // "ff"-prefixed range below
    val fromSessions = sessions
      .filter(col("conversion_status") === "converted")
      .select(
        concat(lit("txn_"), lpad(substring(col("session_id"), 6, 10), 12, "0")).as("transaction_id"),
        col("session_id"), col("user_id"),
        col("end_time").as("timestamp"),
        expr("""transform(map_entries(cart_contents), e -> struct(
              e.key AS product_id,
              e.value.quantity AS quantity,
              e.value.price AS unit_price,
              round(e.value.quantity * e.value.price, 2) AS subtotal))""").as("items"),
        xxhash64(col("session_id")).as("_h"))
      .withColumn("subtotal",
        round(expr("aggregate(items, 0D, (acc, x) -> acc + x.subtotal)"), 2))
      .withColumn("discount", when(pmod(col("_h"), lit(10)) < 2,
        round(col("subtotal") * (pmod(col("_h"), lit(4)).cast("double") * 0.05 + 0.05), 2))
        .otherwise(0.0))
      .withColumn("total", round(col("subtotal") - col("discount"), 2))
      .withColumn("payment_method", element_at(
        array(Seq("credit_card", "paypal", "apple_pay", "crypto",
          "bank_transfer", "gift_card").map(lit): _*),
        pmod(col("_h"), lit(6)).cast("int") + 1))
      .withColumn("status", element_at(
        array(Seq("completed", "processing", "shipped", "delivered").map(lit): _*),
        pmod(col("_h"), lit(4)).cast("int") + 1))
      .drop("_h")
    // top-ups: session-less purchases sampled from the same sessions' users
    val topups = sessions.sample(withReplacement = false, topupFraction, Seed)
      .select(
        concat(lit("txn_ff"), substring(col("session_id"), 6, 10)).as("transaction_id"),
        lit(null).cast("string").as("session_id"),
        col("user_id"), col("start_time").as("timestamp"),
        expr("""array(struct(
              element_at(viewed_products, 1) AS product_id, 1 AS quantity,
              49.99D AS unit_price, 49.99D AS subtotal))""").as("items"),
        lit(49.99).as("subtotal"), lit(0.0).as("discount"), lit(49.99).as("total"),
        lit("credit_card").as("payment_method"), lit("completed").as("status"))
    fromSessions.unionByName(topups)
  }

  /** Generate and register the full entity set as temp views. */
  def registerAll(spark: SparkSession, nSessions: Long = 20000): Unit = {
    val cats = categories(spark)
    val prods = products(spark)
    val us = users(spark)
    val sess = sessions(spark, nSessions)
    val txns = transactions(sess)
    cats.createOrReplaceTempView("categories")
    prods.createOrReplaceTempView("products")
    us.createOrReplaceTempView("users")
    sess.createOrReplaceTempView("sessions")
    txns.createOrReplaceTempView("transactions")
  }
}

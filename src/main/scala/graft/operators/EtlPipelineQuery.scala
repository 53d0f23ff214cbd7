package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.etl.Pipeline
import graft.sources.Tables.table

/** The full reference-parity unification pipeline (SURVEY.md §2 Part A,
  * A1–A27) driven end-to-end as a declared query: synthesize raw all-string
  * platform frames from the testdata tables (the reference's inputs are
  * dtype-less CSVs), run extract→transform→merge→final-cast, return the
  * unified 50-column frame.
  *
  * Oracle regime (SURVEY §8, the tx18/tx18e split applied here): ep01 is
  * the declared FULL-SURFACE form — all 50 columns including the three
  * hash-derived ones (uid = UUIDv5/SHA-1, company_id / address_id =
  * xxhash64 fallbacks) no DuckDB build mirrors — and is deliberately
  * rows-only-DETERMINISTIC (`now` is pinned, reruns byte-identical; the
  * e0x/q1x column oracles + EtlPipelineSpec cover semantics). ep02
  * projects the same dataflow to the mirrorable columns and carries the
  * hash-exact oracle. */
object EtlPipelineQuery {

  /** DomClick-shaped raw frame derived deterministically from `orders`. */
  private def domclickFromOrders(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "orders").select(
      col("o_orderkey").cast(StringType).as("Object ID"),
      col("o_totalprice").cast(StringType).as("Price"),
      (col("o_totalprice") / 40.0).cast(StringType).as("Price per sqm"),
      lit("5.5").as("Mortgage Rate"),
      concat(lit("addr "), col("o_custkey").cast(StringType)).as("Address"),
      col("o_custkey").cast(StringType).as("Address ID"),
      lit("40").as("Area"),
      (col("o_orderkey") % 5 + 1).cast(StringType).as("Rooms"),
      (col("o_orderkey") % 20 + 1).cast(StringType).as("Floor"),
      col("o_orderpriority").as("Description"),
      col("o_orderdate").cast(StringType).as("Published Date"),
      col("o_orderdate").cast(StringType).as("Updated Date"),
      col("o_custkey").cast(StringType).as("Seller ID"),
      md5(col("o_custkey").cast(StringType).cast("binary")).as("Seller Name Hash"),
      concat(lit("company "), (col("o_custkey") % 50).cast(StringType)).as("Company Name"),
      when(col("o_orderkey") % 3 === 0, lit(null).cast(StringType))
        .otherwise((col("o_custkey") % 1000).cast(StringType)).as("Company ID"),
      when(col("o_orderstatus") === "O", "flat").otherwise("house").as("Property Type"),
      lit("living").as("Category"),
      lit("17").as("House Floors"),
      lit("sale").as("Deal Type"),
      lit("None").as("Discount Status"),
      lit("0").as("Discount Value"),
      when(col("o_orderkey") % 2 === 0, "True").otherwise("False").as("Placement Paid"),
      lit("False").as("Big Card"),
      lit("1").as("Pin Color"),
      lit("37.6").as("Longitude"),
      lit("55.7").as("Latitude"),
      lit("[350.0, 870.5]").as("Subway Distances"),
      lit("['Арбатская']").as("Subway Names"),
      lit("['/p/1.jpg', 'p/2.jpg']").as("Photos URLs"),
      lit("21000").as("Monthly Payment"),
      lit("0").as("Advance Payment"),
      lit("0").as("Auction Status"))

  /** Avito-shaped raw frame derived from `documents`. */
  private def avitoFromDocuments(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents").select(
      concat(lit("https://avito.ru/item/"), col("doc_id").cast(StringType)).as("url_offer"),
      col("doc_id").cast(StringType).as("id_offer"),
      (col("n_chars") * 1000).cast(StringType).as("price_offer"),
      (col("n_chars") % 100).cast(StringType).as("square_total_offer"),
      concat(lit("addr "), col("source")).as("address_offer"),
      (col("doc_id") % 4 + 1).cast(StringType).as("rooms_offer"),
      (col("doc_id") % 15 + 1).cast(StringType).as("floor_offer"),
      substring(col("text"), 1, 40).as("description_offer"),
      lit("2024-10-10 10:10:10").as("date_offer"),
      lit("Flat").as("type_offer"),
      lit("sale").as("sdelka_offer"),
      lit("9").as("floors_house"),
      lit("54.9").as("latitude"),
      lit("73.3").as("longitude"),
      col("lang").as("metro_name1"),
      lit(null).cast(StringType).as("metro_name2"),
      lit("").as("metro_name3"),
      lit("500.5").as("distance_to_metro1"),
      lit(null).cast(StringType).as("distance_to_metro2"),
      lit("bad").as("distance_to_metro3"),
      lit("['x.jpg']").as("photo_list_offer"),
      when(col("doc_id") % 2 === 0, "developer").otherwise(lit(null).cast(StringType))
        .as("developer_offer"),
      lit("owner").as("seller"),
      lit("2.7").as("height_offer"),
      lit("20").as("square_rooms_offer"),
      col("source").as("renovation_offer"),
      lit("2015").as("built_year_offer"),
      lit("brick").as("type_house_offer"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ep01_unified_pipeline" -> ((s, dir) => {
      val unified = Pipeline.run(
        Map(
          "domclick" -> domclickFromOrders(s, dir),
          "avito" -> avitoFromDocuments(s, dir)),
        now = lit("2025-01-15 12:00:00").cast("timestamp"))
      // Serialize array columns for the driver's pandas-based rows check
      // (ndarray cells crash its sort; round-1 ep01 failure).
      val cols = unified.schema.fields.map { f =>
        f.dataType match {
          case _: org.apache.spark.sql.types.ArrayType =>
            to_json(col(f.name)).as(f.name)
          case _ => col(f.name)
        }
      }
      unified.select(cols.toIndexedSeq: _*).orderBy("platform_id", "listing_id")
    }),

    // The same full dataflow, HASH-CHECKED: every canonical column except
    // the three hash-derived ones (uid: SHA-1 UUIDv5; company_id /
    // address_id: xxhash64 fallbacks — none mirrorable in DuckDB), with
    // created_at pinned through the pipeline's `now` hook. Arrays are
    // serialized with explicit element formatting so both engines emit the
    // same string. This gives A25 (schema-align union: every typed-null →
    // fill path is exercised by columns absent from one platform) and A26
    // (typed cast + domain clamp + null fill) a DuckDB oracle instead of
    // ep01's rows-only check.
    "ep02_pipeline_hashable" -> ((s, dir) => {
      val unified = Pipeline.run(
        Map(
          "domclick" -> domclickFromOrders(s, dir),
          "avito" -> avitoFromDocuments(s, dir)),
        now = lit("2025-01-15 12:00:00").cast("timestamp"))
      val hashDerived = Set("uid", "company_id", "address_id")
      val cols = unified.schema.fields.filterNot(f => hashDerived(f.name)).map { f =>
        f.dataType match {
          case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
            array_join(transform(col(f.name), x => format_string("%.4f", x)), ";").as(f.name)
          case _: org.apache.spark.sql.types.ArrayType =>
            array_join(col(f.name), ";").as(f.name)
          case _ => col(f.name)
        }
      }
      unified.select(cols.toIndexedSeq: _*).orderBy("platform_id", "listing_id")
    }))

  /** ep02's oracle replays the whole pipeline in SQL: the domclick branch
    * re-derives each canonical column from `orders`, the avito branch from
    * `documents`, constants fold to literals, absent columns fold to their
    * A26 fill values, and UNION ALL mirrors the A25 merge. */
  val oracle: Map[String, String] = Map(
    "ep02_pipeline_hashable" ->
      """WITH dom AS (
        |  SELECT o_orderkey AS listing_id,
        |    'https://domclick.ru/card/' || CAST(o_orderkey AS VARCHAR) AS listing_url,
        |    o_totalprice AS price,
        |    o_totalprice / 40.0 AS price_per_sqm,
        |    CAST(5.5 AS FLOAT4) AS mortgage_rate,
        |    'addr ' || CAST(o_custkey AS VARCHAR) AS address,
        |    CAST(40.0 AS DOUBLE) AS area,
        |    CAST(o_orderkey % 5 + 1 AS SMALLINT) AS rooms,
        |    CAST(o_orderkey % 20 + 1 AS SMALLINT) AS floor,
        |    o_orderpriority AS description,
        |    date_trunc('second', CAST(o_orderdate AS TIMESTAMP)) AS published_date,
        |    date_trunc('second', CAST(o_orderdate AS TIMESTAMP)) AS updated_date,
        |    o_custkey AS seller_id,
        |    md5(CAST(o_custkey AS VARCHAR)) AS seller_name_hash,
        |    'company ' || CAST(o_custkey % 50 AS VARCHAR) AS company_name,
        |    CASE WHEN o_orderstatus = 'O' THEN 'flat' ELSE 'house' END AS property_type,
        |    'living' AS category,
        |    CAST(17 AS SMALLINT) AS house_floors,
        |    'sale' AS deal_type,
        |    'None' AS discount_status,
        |    CAST(0.0 AS DOUBLE) AS discount_value,
        |    CAST(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS SMALLINT) AS placement_paid,
        |    CAST(0 AS SMALLINT) AS big_card,
        |    CAST(1 AS SMALLINT) AS pin_color,
        |    CAST(37.6 AS DOUBLE) AS longitude,
        |    CAST(55.7 AS DOUBLE) AS latitude,
        |    '350.0000;870.5000' AS subway_distances,
        |    'Арбатская' AS subway_names,
        |    'https://img.dmclk.ru/p/1.jpg;https://img.dmclk.ru/p/2.jpg' AS photo_urls,
        |    CAST(21000.0 AS DOUBLE) AS monthly_payment,
        |    CAST(0.0 AS DOUBLE) AS advance_payment,
        |    CAST(0.0 AS DOUBLE) AS auction_status,
        |    CAST(1 AS SMALLINT) AS platform_id,
        |    TIMESTAMP '2025-01-15 12:00:00' AS created_at,
        |    'UNKNOWN' AS seller_type,
        |    'UNKNOWN' AS flat_type,
        |    CAST(0.0 AS DOUBLE) AS height,
        |    CAST(0.0 AS DOUBLE) AS area_rooms,
        |    CAST(0.0 AS DOUBLE) AS previous_price,
        |    '' AS renovation_offer,
        |    'UNKNOWN' AS balcony_type,
        |    'UNKNOWN' AS window_view,
        |    CAST(0 AS SMALLINT) AS built_year_offer,
        |    'UNKNOWN' AS building_state,
        |    '' AS type_house_offer,
        |    CAST(0 AS TINYINT) AS valid,
        |    CAST(NULL AS VARCHAR) AS subway_time
        |  FROM orders),
        |av AS (
        |  SELECT doc_id AS listing_id,
        |    'https://avito.ru/item/' || CAST(doc_id AS VARCHAR) AS listing_url,
        |    CAST(n_chars * 1000 AS DOUBLE) AS price,
        |    COALESCE(CASE WHEN CAST(n_chars % 100 AS DOUBLE) > 0
        |      THEN CAST(n_chars * 1000 AS DOUBLE) / CAST(n_chars % 100 AS DOUBLE) END, 0.0) AS price_per_sqm,
        |    CAST(0.0 AS FLOAT4) AS mortgage_rate,
        |    'addr ' || source AS address,
        |    CAST(n_chars % 100 AS DOUBLE) AS area,
        |    CAST(doc_id % 4 + 1 AS SMALLINT) AS rooms,
        |    CAST(doc_id % 15 + 1 AS SMALLINT) AS floor,
        |    substring(text, 1, 40) AS description,
        |    TIMESTAMP '2024-10-10 10:10:10' AS published_date,
        |    TIMESTAMP '2024-10-10 10:10:10' AS updated_date,
        |    CAST(0 AS BIGINT) AS seller_id,
        |    '' AS seller_name_hash,
        |    '' AS company_name,
        |    'flat' AS property_type,
        |    'living' AS category,
        |    CAST(9 AS SMALLINT) AS house_floors,
        |    'sale' AS deal_type,
        |    'Unknown' AS discount_status,
        |    CAST(0.0 AS DOUBLE) AS discount_value,
        |    CAST(0 AS SMALLINT) AS placement_paid,
        |    CAST(0 AS SMALLINT) AS big_card,
        |    CAST(0 AS SMALLINT) AS pin_color,
        |    CAST(73.3 AS DOUBLE) AS longitude,
        |    CAST(54.9 AS DOUBLE) AS latitude,
        |    '500.5000' AS subway_distances,
        |    array_to_string(list_filter([lang, NULL, ''],
        |      x -> x IS NOT NULL AND trim(x) <> ''), ';') AS subway_names,
        |    'x.jpg' AS photo_urls,
        |    CAST(0.0 AS DOUBLE) AS monthly_payment,
        |    CAST(0.0 AS DOUBLE) AS advance_payment,
        |    CAST(0.0 AS DOUBLE) AS auction_status,
        |    CAST(2 AS SMALLINT) AS platform_id,
        |    TIMESTAMP '2025-01-15 12:00:00' AS created_at,
        |    CASE WHEN doc_id % 2 = 0 THEN 'DEVELOPER' ELSE 'OWNER' END AS seller_type,
        |    'UNKNOWN' AS flat_type,
        |    CAST(2.7 AS DOUBLE) AS height,
        |    CAST(20.0 AS DOUBLE) AS area_rooms,
        |    CAST(0.0 AS DOUBLE) AS previous_price,
        |    source AS renovation_offer,
        |    'UNKNOWN' AS balcony_type,
        |    'UNKNOWN' AS window_view,
        |    CAST(2015 AS SMALLINT) AS built_year_offer,
        |    'UNKNOWN' AS building_state,
        |    'brick' AS type_house_offer,
        |    CAST(0 AS TINYINT) AS valid,
        |    CAST(NULL AS VARCHAR) AS subway_time
        |  FROM documents)
        |SELECT * FROM (SELECT * FROM dom UNION ALL SELECT * FROM av)
        |ORDER BY platform_id, listing_id""".stripMargin)
}

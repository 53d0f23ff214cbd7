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
  * unified 50-column frame. Rows-only check (the pipeline's semantics are
  * covered column-by-column by the e0x/q1x oracle queries and
  * EtlPipelineSpec). */
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
    }))

  val oracle: Map[String, String] = Map.empty
}

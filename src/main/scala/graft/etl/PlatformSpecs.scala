package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.EtlFunctions._

/** A platform is DATA, not a subclass: the reference's four transformer
  * classes are ~90% the same recipe (`src/etl/transformation.py`), so one
  * generic `Transform.apply(df, spec)` drives them all.
  *
  * `exprs` maps canonical *pretty* names (Canonical.prettyNames) to column
  * expressions over the platform's raw (all-string) CSV columns. Missing
  * canonical columns are added as typed nulls by the merger (A25).
  */
final case class PlatformSpec(
    name: String,
    platformId: Int,
    /** A22 — keep-first dedup key (None = no dedup). */
    dedupKey: Option[String],
    /** A23 — rows missing any of these canonical columns are dropped. */
    required: Seq[String],
    exprs: Map[String, Column],
    /** passthrough specs (Cian) only select raw columns actually present —
      * the merger adds the rest as typed nulls. */
    passthrough: Boolean = false)

object PlatformSpecs {

  private def req(c: String): Column = col(c)

  /** DomClick — ref `src/etl/transformation.py:20-183`; platform_id=1 (`:164`). */
  val domclick: PlatformSpec = PlatformSpec(
    name = "domclick",
    platformId = 1,
    dedupKey = None,
    required = Seq("Object ID", "Price", "Area", "Rooms", "Address"), // `:150-154`
    exprs = Map(
      "Object ID" -> flooredLong(req("Object ID")),
      "listing_url" -> prefixUrl("https://domclick.ru/card/", req("Object ID")), // `:21-22,36-38`
      "Price" -> numCoerce(req("Price")),
      "Price per sqm" -> numCoerce(req("Price per sqm")),
      "Mortgage Rate" -> numCoerce(req("Mortgage Rate")),
      "Address" -> req("Address"),
      "Address ID" -> flooredLong(req("Address ID")),
      "Area" -> numCoerce(req("Area")),
      "Rooms" -> numCoerce(req("Rooms")),
      "Floor" -> flooredLong(req("Floor")),
      "Description" -> coalesce(req("Description"), lit("")),
      "Published Date" -> tsNormalize(req("Published Date")), // `:67-78`
      "Updated Date" -> tsNormalize(req("Updated Date")),
      "Seller ID" -> flooredLong(req("Seller ID")),
      "Seller Name Hash" -> coalesce(req("Seller Name Hash"), lit("")),
      "Company Name" -> coalesce(req("Company Name"), lit("")),
      // A11/A12 — null company id <- stable hash of company name (`:98-104`)
      "Company ID" -> coalesce(flooredLong(req("Company ID")), stableId(req("Company Name"))),
      "Property Type" -> coalesce(req("Property Type"), lit("Unknown")),
      "Category" -> coalesce(req("Category"), lit("Unknown")),
      "House Floors" -> flooredLong(req("House Floors")),
      "Deal Type" -> coalesce(req("Deal Type"), lit("Unknown")),
      "Discount Status" -> coalesce(req("Discount Status"), lit("Unknown")),
      "Discount Value" -> coalesce(numCoerce(req("Discount Value")), lit(0.0)),
      "Placement Paid" -> boolFlag(req("Placement Paid")), // `:119-121`
      "Big Card" -> boolFlag(req("Big Card")),
      "Pin Color" -> numCoerce(req("Pin Color")),
      "Longitude" -> numCoerce(req("Longitude")),
      "Latitude" -> numCoerce(req("Latitude")),
      "Subway Distances" -> safeListParse(req("Subway Distances")).try_cast(ArrayType(DoubleType)),
      "Subway Names" -> safeListParse(req("Subway Names")),
      "Photos URLs" -> prefixEach("https://img.dmclk.ru/", safeListParse(req("Photos URLs"))), // `:157-159,21`
      "Monthly Payment" -> coalesce(numCoerce(req("Monthly Payment")), lit(0.0)),
      "Advance Payment" -> coalesce(numCoerce(req("Advance Payment")), lit(0.0)),
      "Auction Status" -> numCoerce(req("Auction Status"))))

  /** Yandex Realty — ref `:214-355`; platform_id=4 (`:324`). */
  val yandex: PlatformSpec = PlatformSpec(
    name = "yandex",
    platformId = 4,
    dedupKey = Some("url_offer_yand"), // `:224-228`
    required = Seq("Price", "Area", "Rooms", "Address"), // `:328-331`
    exprs = Map(
      "Object ID" -> extractId(req("url_offer_yand"), "/offer/(\\d+)"), // `:231-237,371-383`
      "listing_url" -> prefixUrl("https:", req("url_offer_yand")), // `:216,235-237`
      "Price" -> numCoerce(req("price_offer")),
      // plain (unguarded) division — `:242-246`
      "Price per sqm" -> (numCoerce(req("price_offer")) / numCoerce(req("square_total_offer"))),
      "Area" -> numCoerce(req("square_total_offer")),
      "Address" -> req("address_offer"),
      "Rooms" -> numCoerce(req("rooms_offer")),
      "Floor" -> flooredLong(req("floor_offer")),
      "Description" -> coalesce(req("description_offer"), lit("")),
      "Published Date" -> tsNormalize(req("date_offer")), // `:272-284`
      "Updated Date" -> tsNormalize(req("date_offer")),
      "Property Type" -> condMap(req("type_offer"), "NEW_FLAT", "layout", "flat"), // `:290-292`
      "Category" -> lit("living"), // `:293`
      "Deal Type" -> lit("sale"), // `:297`
      "House Floors" -> flooredLong(req("floors_house")),
      "Longitude" -> numCoerce(req("longitude")),
      "Latitude" -> numCoerce(req("latitude")),
      "Subway Names" -> arrayCompactStr(req("metro_name")), // `:313-315`
      "subway_time" -> metroJson(req("metro_name"), req("metro_transp"), req("time_to_metro")), // `:340-346`
      "Photos URLs" -> prefixEach("https:", safeListParse(req("photo_list_offer"))), // `:317-319,357-359`
      "seller_type" -> upper(req("seller")), // `:334,499`
      "flat_type" -> req("type_offer"), // `:335`
      "height" -> numCoerce(req("height_offer")),
      "area_rooms" -> numCoerce(req("square_rooms_offer")),
      "previous_price" -> numCoerce(req("previous_price_offer"))))

  /** Avito — ref `:389-537`; platform_id=2 (`:492`). */
  val avito: PlatformSpec = PlatformSpec(
    name = "avito",
    platformId = 2,
    dedupKey = Some("url_offer"), // `:395`
    required = Seq("Price", "Area", "Rooms", "Address"), // `:532-533`
    exprs = Map(
      "Object ID" -> flooredLong(req("id_offer")),
      "listing_url" -> req("url_offer"), // passthrough `:402`
      "Price" -> numCoerce(req("price_offer")),
      // guarded division: denominator present and > 0 — `:408-413`
      "Price per sqm" -> safeDiv(numCoerce(req("price_offer")), numCoerce(req("square_total_offer"))),
      "Area" -> numCoerce(req("square_total_offer")),
      "Address" -> req("address_offer"),
      "Address ID" -> stableId(req("address_offer")), // `:418-419`
      "Rooms" -> numCoerce(req("rooms_offer")),
      "Floor" -> flooredLong(req("floor_offer")),
      "Description" -> coalesce(req("description_offer"), lit("")),
      "Published Date" -> tsNormalize(req("date_offer")), // `:428-432`
      "Updated Date" -> tsNormalize(req("date_offer")),
      "Property Type" -> lower(req("type_offer")), // `:441`
      "Category" -> lit("living"), // `:444`
      "Deal Type" -> coalesce(lower(req("sdelka_offer")), lit("sale")), // `:450`
      "House Floors" -> flooredLong(req("floors_house")),
      "Longitude" -> numCoerce(req("longitude")),
      "Latitude" -> numCoerce(req("latitude")),
      "Subway Names" -> arrayCompactStr(req("metro_name1"), req("metro_name2"), req("metro_name3")), // `:467-470`
      "Subway Distances" -> arrayCompactNum(
        numCoerce(req("distance_to_metro1")), numCoerce(req("distance_to_metro2")),
        numCoerce(req("distance_to_metro3"))), // `:472-481`
      "Photos URLs" -> safeListParse(req("photo_list_offer")), // `:484`
      "seller_type" -> upper(coalesce(req("developer_offer"), req("seller"))), // `:499`
      "flat_type" -> lower(req("type_offer")), // `:502`
      "height" -> numCoerce(req("height_offer")),
      "area_rooms" -> numCoerce(req("square_rooms_offer")),
      "renovation_offer" -> coalesce(req("renovation_offer"), lit("")), // `:514`
      "balcony_type" -> lit("UNKNOWN"), // `:517`
      "window_view" -> lit("UNKNOWN"), // `:520`
      "built_year_offer" -> flooredLong(req("built_year_offer")), // `:523`; year NOT wrapped mod 256
      "building_state" -> lit("UNKNOWN"), // `:526`
      "type_house_offer" -> coalesce(req("type_house_offer"), lit("")))) // `:529`

  /** Cian — the reference has NO transformer (abstract raises,
    * `transformation.py:15-17`; API default 'skip', `main.py:19`). We treat
    * its near-canonical columns as passthrough. */
  val cian: PlatformSpec = PlatformSpec(
    name = "cian",
    platformId = 3,
    dedupKey = None,
    required = Seq("Object ID"),
    passthrough = true,
    exprs = Canonical.fields.collect {
      case f if f.snake != "uid" && f.snake != "created_at" && f.snake != "platform_id" =>
        f.pretty -> col(f.pretty).try_cast(f.dataType)
    }.toMap)

  val all: Seq[PlatformSpec] = Seq(domclick, yandex, avito, cian)
  val byName: Map[String, PlatformSpec] = all.map(s => s.name -> s).toMap
}

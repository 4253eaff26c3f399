package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{functions => F}

/** WKT `POINT (lon lat)` parsing (reference data model §1.1: origin_coord /
  * destination_coord are WKT point strings, trips.csv:2). The reference
  * never computes on coordinates — it only concatenates them into the trip
  * key — so a regex-based parse over builtins is sufficient; no GIS
  * dependency (SURVEY.md §7.3).
  *
  * Built entirely from codegen'd builtins (regexp_extract + cast), so the
  * parse stays inside whole-stage codegen at scale.
  */
object Wkt {

  private val lonPattern = "^POINT \\(([-+0-9.eE]+) [-+0-9.eE]+\\)$"
  private val latPattern = "^POINT \\([-+0-9.eE]+ ([-+0-9.eE]+)\\)$"

  /** Longitude of a WKT point string; null for malformed input (the empty
    * regexp_extract result casts to null double).
    */
  def lon(c: Column): Column =
    F.nullif(F.regexp_extract(c, lonPattern, 1), F.lit("")).cast(DoubleType)

  def lat(c: Column): Column =
    F.nullif(F.regexp_extract(c, latPattern, 1), F.lit("")).cast(DoubleType)

  /** Parsed point as a struct column {lon, lat}. */
  def point(c: Column): Column =
    F.struct(lon(c).as("lon"), lat(c).as("lat"))
}

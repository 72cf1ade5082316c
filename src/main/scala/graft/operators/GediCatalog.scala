package graft.operators

import org.apache.spark.sql.DataFrame

/** GEDI product catalog — the domain constants a GEDI tool shares
  * (reference: gedixr/constants.py; the values themselves are public NASA
  * GEDI facts: beam IDs and L2A/L2B HDF5 layer names).
  *
  * Wiring these into the generic operators gives reference-parity calls:
  * `beamFilterGroup(df, "beam", "power")` and
  * `Extract.selectVariables(df, GediCatalog.defaultVariables("L2A"))`.
  */
object GediCatalog {

  val products: Seq[String] = Seq("L2A", "L2B")

  /** product → granule-id prefix (ref constants.py PRODUCT_MAPPING). */
  val productPrefix: Map[String, String] =
    Map("L2A" -> "GEDI02_A", "L2B" -> "GEDI02_B")

  /** product → granule filename glob (ref constants.py PATTERN_*). */
  val granulePattern: Map[String, String] =
    products.map(p => p -> s"*${productPrefix(p)}_*.h5").toMap

  /** Beam groups (ref constants.py POWER_BEAMS/COVERAGE_BEAMS — public
    * GEDI instrument facts). */
  val beamGroups: Map[String, Seq[String]] = {
    val coverage = Seq("BEAM0000", "BEAM0001", "BEAM0010", "BEAM0011")
    val power = Seq("BEAM0101", "BEAM0110", "BEAM1000", "BEAM1011")
    Map("coverage" -> coverage, "power" -> power, "all" -> (coverage ++ power))
  }

  /** Default base columns per product: output name <- HDF5 layer path
    * (ref constants.py DEFAULT_BASE). */
  val defaultBase: Map[String, Seq[(String, String)]] = Map(
    "L2A" -> Seq(
      "shot" -> "shot_number",
      "latitude" -> "lat_lowestmode",
      "longitude" -> "lon_lowestmode",
      "elev" -> "elev_lowestmode",
      "elev_dem_tdx" -> "digital_elevation_model",
      "degrade_flag" -> "degrade_flag",
      "quality_flag" -> "quality_flag",
      "sensitivity" -> "sensitivity",
      "num_detectedmodes" -> "num_detectedmodes"),
    "L2B" -> Seq(
      "shot" -> "shot_number",
      "latitude" -> "geolocation/lat_lowestmode",
      "longitude" -> "geolocation/lon_lowestmode",
      "elev" -> "geolocation/elev_lowestmode",
      "elev_dem_tdx" -> "geolocation/digital_elevation_model",
      "degrade_flag" -> "geolocation/degrade_flag",
      "quality_flag" -> "l2b_quality_flag",
      "sensitivity" -> "sensitivity",
      "num_detectedmodes" -> "num_detectedmodes"))

  /** Default measurement variables per product (ref constants.py
    * DEFAULT_VARIABLES). */
  val defaultVariables: Map[String, Seq[(String, String)]] = Map(
    "L2A" -> Seq("rh98" -> "rh98"),
    "L2B" -> Seq(
      "tcc" -> "cover",
      "fhd" -> "fhd_normal",
      "pai" -> "pai",
      "rh100" -> "rh100"))

  /** Beam selection by named group — ref extract.py:112-119 dispatches
    * "all"/"power"/"coverage"/explicit list. */
  def beamFilterGroup(df: DataFrame, beamCol: String, group: String): DataFrame =
    Extract.beamFilter(df, beamCol,
      beamGroups.getOrElse(group.toLowerCase,
        throw new IllegalArgumentException(
          s"unknown beam group '$group' (use ${beamGroups.keys.mkString("/")} or an explicit list)")))
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{DateFunctions, GeoFunctions}
import graft.functions.GeoFunctions._
import graft.functions.DateFunctions.convert_two_digit_years
import graft.sources.{GeoJson, Kml}

/** The reference's flagship pipeline (SURVEY §3 E2) rebuilt as one
  * declarative Spark plan per stage: KML service-area geometries +
  * certificate metadata + chronology events → validated, patched,
  * published GeoJSON layers.
  *
  * Stage map (reference file:line in /root/reference/R/functions.R):
  *  - cleanCertificates: 194-228 (classify + filter active utilities)
  *  - processChronology: 251-277 (sentinel dates, sort)
  *  - enrichCertificates: 306-380 (first/latest event per cert — the
  *    J5 correlated lookup decorrelated into one window pass;
  *    KML-description regex split 337-349; freshness flag 287-304)
  *  - buildLayer: 173-192,446-476 (KML scan → make-valid → per-cert
  *    st_collect → broadcast join metadata)
  *  - applyMergePatches: 421-444 (acquired utilities unioned into
  *    acquirers, gated on expected KML version)
  *  - publish: 500-529,559 (final schema + sync status + GeoJSON sink)
  *
  * All dimension joins broadcast (≤ hundreds of rows of metadata at
  * reference scale; at engine scale the fact side — KML features — is
  * the only large input and is never collected).
  */
object ServiceAreas {

  case class MergePatch(certTo: Double, certFrom: Double)

  case class Config(
      operatorIds: Seq[Double] = Seq.empty,
      inactiveExtraIds: Seq[Double] = Seq.empty,
      mergePatches: Seq[MergePatch] = Seq.empty,
      // cert → expected KML "most recent update" date (gate, _targets.R:170-192)
      expectedKmlDates: Map[Double, String] = Map.empty)

  /** Clean + classify the scraped certificate list
    * (R/functions.R:194-228). Null cert numbers dropped, operators
    * flagged, inactive + operator rows excluded from the cleaned set.
    */
  def cleanCertificates(certs: DataFrame, cfg: Config): DataFrame =
    certs
      .filter(col("certificate_number").isNotNull)
      .withColumn("entity_type",
        when(col("certificate_number").isin(cfg.operatorIds: _*),
          "operator").otherwise("utility"))
      .filter(col("certificate_status") === "Active" &&
        col("entity_type") === "utility" &&
        !col("certificate_number").isin(cfg.inactiveExtraIds: _*))

  /** Chronology events: blank dates → 1900-01-01 sentinel, two-digit
    * year pivot, stable sort (R/functions.R:251-277).
    */
  def processChronology(chron: DataFrame): DataFrame =
    chron
      .withColumn("order_date",
        convert_two_digit_years(coalesce(col("order_date"), lit(""))))
      .orderBy(col("certificate"), col("order_date"))

  /** Enrich certificates with first/latest chronology events — the
    * decorrelated rewrite of the reference's per-row lookups (J5):
    * one window pass, one broadcast join.
    */
  def enrichCertificates(cleaned: DataFrame, chron: DataFrame): DataFrame = {
    val w = Window.partitionBy("certificate")
    // order_number tiebreak: tied dates are common (all blank dates
    // collapse to the 1900-01-01 sentinel) and row_number over an
    // ambiguous order would make last/first event nondeterministic
    val events = chron
      .withColumn("is_area_change",
        !col("type").isin("Deregulated", "Controlling Interest"))
      .withColumn("rk_last", row_number().over(
        w.orderBy(col("order_date").desc, col("order_number").desc)))
      .withColumn("rk_first", row_number().over(
        w.orderBy(col("order_date").asc, col("order_number").asc)))
      .withColumn("last_area_change_date",
        max(when(col("is_area_change"), col("order_date"))).over(w))
    val latest = events.filter(col("rk_last") === 1).select(
      col("certificate"),
      col("order_date").as("certificate_last_update_date"),
      col("order_number").as("certificate_last_update_order"),
      col("type").as("certificate_last_update_type"),
      col("last_area_change_date"))
    val first = events.filter(col("rk_first") === 1).select(
      col("certificate"),
      year(col("order_date")).as("certificate_granted_year"))
    cleaned
      .join(broadcast(latest),
        cleaned("certificate_number") === latest("certificate"), "left")
      .drop("certificate")
      .join(broadcast(first),
        cleaned("certificate_number") === first("certificate"), "left")
      .drop("certificate")
  }

  /** The HTML-wrapped-description pre-clean (read_kml_description,
    * R/functions.R:230-247): a few certificates' KML descriptions come
    * wrapped in an HTML table — slice the "Granted to:" … end-marker
    * window and unescape the double-escaped tags. Plain descriptions
    * pass through.
    */
  private val HtmlEndMarker = "</td> </tr> </table> </td> </tr> </table>"
  def cleanKmlDescription(desc: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val start = locate("Granted to:", desc)
    val len = locate(HtmlEndMarker, desc) - start
    val unescaped = regexp_replace(
      regexp_replace(desc.substr(start, len), "&lt;", "<"), "&gt;", ">")
    when(desc.startsWith("<html"), unescaped).otherwise(desc)
  }

  /** The strict 3-field description split (separate_wider_regex,
    * R/functions.R:337-349): anchored pattern, groups =
    * kml_utility_name / kml_utility_type /
    * kml_most_recent_update_included. Same character classes as the
    * reference (name excludes digits and '<', so it stops at the first
    * tag).
    */
  val KmlDescPattern: String =
    "^Granted to: ([-A-Za-z/().,&\\\\ ]+)" +
      "(?:<br><br>Utility Type: )?((?:[A-Za-z]+)?)" +
      "(?:<br>)?<br>CHRONOLOGY: ([-.,?A-Za-z0-9/():& ]*)" +
      "(?:<br> ?(?:<br> ?)?)?$"

  /** First feature's description per certificate from the ORIGINAL
    * service-area KMLs (read_kml_description reads
    * `data/{cert}-servicearea.kml`, never the patch files; `[1,]` picks
    * the first feature — here min-by within-file explode order).
    */
  def kmlDescriptions(spark: SparkSession, kmlGlob: String): DataFrame =
    Kml.read(spark, kmlGlob)
      .filter(col("path").rlike("""-servicearea\.kml$"""))
      .withColumn("certificate_number",
        regexp_extract(col("path"), """([\d]+(\.[\d]+)?)-servicearea""", 1)
          .cast("double"))
      .filter(col("certificate_number").isNotNull)
      .withColumn("fid", monotonically_increasing_id())
      .groupBy("certificate_number")
      .agg(min_by(col("description"), col("fid")).as("kml_desc_field"))

  /** Apply the pre-clean + strict split + alt-name rule
    * (R/functions.R:337-352,364-366) to a frame carrying
    * `kml_desc_field` and `certificate_name`. Strict like the
    * reference's separate_wider_regex: a NON-NULL description that
    * doesn't match the pattern raises; a missing description (no KML)
    * yields null fields. alt_name is the KML-granted name only where it
    * DIFFERS (case-insensitively) from the certificate name.
    */
  def splitKmlDescription(df: DataFrame): DataFrame = {
    val cleaned = cleanKmlDescription(col("kml_desc_field"))
    val checked = when(col("kml_desc_field").isNull,
        lit(null).cast("string"))
      .when(cleaned.rlike(KmlDescPattern), cleaned)
      .otherwise(raise_error(concat(
        lit("KML description does not match the Granted-to pattern: "),
        cleaned)))
    // exactly-2-digit DAY, like the reference (R/functions.R:363-364):
    // a 1-digit day ("Amended 6/1/2012") intentionally yields NO date
    // (reference NA), which can gate the merge/PLSS patch version check
    val datePat = """[\d]{1,2}/[\d]{2}/(?:[\d]{4}|[\d]{2})"""
    df.withColumn("kml_desc_clean", checked)
      .withColumn("kml_utility_name",
        regexp_extract(col("kml_desc_clean"), KmlDescPattern, 1))
      .withColumn("kml_utility_type",
        regexp_extract(col("kml_desc_clean"), KmlDescPattern, 2))
      .withColumn("kml_most_recent_update_included",
        regexp_extract(col("kml_desc_clean"), KmlDescPattern, 3))
      .withColumn("alt_name",
        when(lower(col("certificate_name")) ===
          lower(col("kml_utility_name")), lit(null).cast("string"))
          .otherwise(col("kml_utility_name")))
      .withColumn("kml_most_recent_update_date",
        when(regexp_extract(col("kml_most_recent_update_included"),
          datePat, 0) =!= "",
          convert_two_digit_years(regexp_extract(
            col("kml_most_recent_update_included"), datePat, 0))))
      .drop("kml_desc_clean")
  }

  /** KML dir → one validated geometry per certificate
    * (R/functions.R:446-476): cert number from the file name, make-valid
    * per feature, collect (NOT dissolve) per cert.
    */
  def buildGeometry(spark: SparkSession, kmlGlob: String): DataFrame = {
    GeoFunctions.registerAll(spark)
    Kml.read(spark, kmlGlob)
      .withColumn("certificate_number",
        regexp_extract(col("path"), """([\d]+(\.[\d]+)?)-servicearea""", 1)
          .cast("double"))
      .filter(col("certificate_number").isNotNull)
      .withColumn("geometry", st_makeValid(col("geometry")))
      .withColumn("kml_date_raw",
        regexp_extract(col("description"),
          """[\d]{1,2}/[\d]{1,2}/(?:[\d]{4}|[\d]{2})""", 0))
      .groupBy("certificate_number")
      .agg(
        st_collect_agg(col("geometry")).as("geometry"),
        max(when(col("kml_date_raw") =!= "",
          convert_two_digit_years(col("kml_date_raw"))))
          .as("geometry_last_update"))
  }

  /** Merge acquired utilities' polygons into acquirers
    * (R/functions.R:421-444), version-gated (_targets.R:170-192): a
    * patch applies only when the acquired cert's KML date matches the
    * expected snapshot — otherwise the patch is skipped with the
    * original rows kept (graceful degradation, SURVEY §5.2).
    * Distributed form: map cert → target cert, group-union by target.
    */
  def applyMergePatches(spark: SparkSession, geo: DataFrame,
      cfg: Config): DataFrame = {
    import spark.implicits._
    if (cfg.mergePatches.isEmpty) return geo
    // one pass collects every gated cert's KML date (collecting inside
    // a per-patch closure would re-execute the whole upstream KML plan
    // once per patch)
    val gatedCerts = cfg.mergePatches.map(_.certFrom)
      .filter(cfg.expectedKmlDates.contains)
    val actualDates: Map[Double, String] =
      if (gatedCerts.isEmpty) Map.empty
      else geo
        .filter(col("certificate_number").isin(gatedCerts: _*))
        .select(col("certificate_number"),
          date_format(col("geometry_last_update"), "M/d/yyyy"))
        .collect()
        .flatMap(r => Option(r.getString(1)).map(r.getDouble(0) -> _))
        .toMap
    val gateOk: MergePatch => Boolean = p =>
      cfg.expectedKmlDates.get(p.certFrom).forall(expected =>
        actualDates.get(p.certFrom).contains(expected))
    val applied = cfg.mergePatches.filter(gateOk)
    val mapping = applied.map(p => (p.certFrom, p.certTo))
      .toDF("from_cert", "to_cert")
    geo
      .join(broadcast(mapping),
        col("certificate_number") === col("from_cert"), "left")
      .withColumn("target_cert",
        coalesce(col("to_cert"), col("certificate_number")))
      .groupBy(col("target_cert").as("certificate_number"))
      .agg(
        st_union_agg(col("geometry")).as("geometry"),
        max(col("geometry_last_update")).as("geometry_last_update"))
  }

  /** Final published schema + sync status (R/functions.R:490-529,
    * about.qmd:30-42). geometry_is_current: KML-embedded date >= last
    * service-area-changing chronology event; 3-valued (null = unknown).
    *
    * The reference's freshness cross-check
    * (kml_has_newest_service_area_updates, R/functions.R:287-304) has a
    * warn branch its flag value alone can't convey: a KML date NEWER
    * than the newest chronology entry of ANY type means RCA's
    * chronology is incomplete ("should have an entry dated X but
    * doesn't") — the reference `warning()`s and returns NA. Those
    * impossible states surface here as a `sync_warning` column
    * (null = consistent):
    *   - `chronology_missing_entry` — the R:293 warn branch;
    *   - `no_chronology_entries` — a KML date but no chronology rows at
    *     all (the reference's length-0 `tail()` comparison would error;
    *     guarded here as a named state).
    * Both force geometry_is_current to null (the reference's NA), and a
    * chronology with NO area-changing entries is `true` (the
    * reference's `nrow(newer) == 0` → TRUE path), not unknown. The
    * reference emits warnings to the console, not the GeoJSON, so
    * [[run]] drops the column before the file write (byte parity).
    */
  def publishLayer(enriched: DataFrame, geo: DataFrame): DataFrame = {
    val hasKml = col("geometry_last_update").isNotNull
    geo.join(broadcast(enriched), Seq("certificate_number"), "inner")
      .withColumn("sync_warning",
        when(hasKml && col("certificate_last_update_date").isNull,
          lit("no_chronology_entries"))
          .when(hasKml && (col("certificate_last_update_date") <
            col("geometry_last_update")), lit("chronology_missing_entry")))
      .withColumn("geometry_is_current",
        when(!hasKml || col("sync_warning").isNotNull,
          lit(null).cast("boolean"))
          .otherwise(col("last_area_change_date").isNull ||
            col("geometry_last_update") >= col("last_area_change_date")))
      .withColumn("geometry_cert_sync_status",
        when(col("geometry_is_current") === true, "up_to_date")
          .when(col("geometry_is_current") === false, "outdated")
          .otherwise("unknown"))
      .select(
        col("certificate_number"),
        col("entity"),
        col("certificate_name"),
        col("cpcn_url").as("certificate_url"),
        col("certificate_granted_year"),
        col("certificate_last_update_date"),
        col("certificate_last_update_order"),
        col("certificate_last_update_type"),
        col("geometry_last_update"),
        col("geometry_is_current"),
        col("geometry_cert_sync_status"),
        col("sync_warning"),
        col("geometry"))
  }

  /** Conditional whole-column int downcast (reference A5,
    * R/functions.R:220-224,524-528): cast to int iff every value is
    * integral — a plan-dependent schema, so necessarily a two-pass
    * action (SURVEY §7.4).
    */
  def maybeDowncastToInt(df: DataFrame, colName: String): DataFrame = {
    val allInt = df
      .agg(every(col(colName) === floor(col(colName)) ||
        col(colName).isNull))
      .head().getBoolean(0)
    if (allInt) df.withColumn(colName, col(colName).cast("int")) else df
  }

  /** End-to-end run under StageCache memoization; writes raw + cleaned
    * GeoJSON layers and returns the cleaned DataFrame.
    */
  def run(spark: SparkSession, certsCsv: String, chronCsv: String,
      kmlGlob: String, cfg: Config, outDir: String,
      cacheDir: String): DataFrame = {
    DateFunctions.registerAll(spark)
    GeoFunctions.registerAll(spark)
    val cache = new StageCache(spark, cacheDir)
    def csv(p: String) = spark.read
      .option("header", "true").option("inferSchema", "true").csv(p)

    // config participates in the cache key: a changed exclusion list or
    // patch table must invalidate config-dependent stages. Canonical
    // serialization (sorted, field-tagged) + SHA-256 — toString.hashCode
    // was 32-bit and sensitive to Seq/Map formatting (ADVICE r01).
    val cfgVer = "v1-" + cache.versionHash(Seq(
      "operators=" + cfg.operatorIds.sorted.mkString(","),
      "inactive=" + cfg.inactiveExtraIds.sorted.mkString(","),
      "merges=" + cfg.mergePatches
        .map(p => s"${p.certFrom}->${p.certTo}").sorted.mkString(","),
      "expectedKml=" + cfg.expectedKmlDates.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k:$v" }.mkString(",")))

    val cleaned = cache.stage("clean_certificates", cfgVer, Seq(certsCsv)) {
      cleanCertificates(csv(certsCsv), cfg)
    }
    val chron = cache.stage("chronology", "v1", Seq(chronCsv)) {
      processChronology(csv(chronCsv))
    }
    val enriched0 = cache.stage("enriched", cfgVer,
      Seq(certsCsv, chronCsv)) {
      enrichCertificates(cleaned, chron)
    }
    // description-derived kml_* columns ride the certificates frame as
    // in the reference (build_certificates_df); the published select
    // drops them, matching R/functions.R:505-518
    val enriched = splitKmlDescription(
      enriched0.join(broadcast(kmlDescriptions(spark, kmlGlob)),
        Seq("certificate_number"), "left"))
    val geoRaw = buildGeometry(spark, kmlGlob)

    // raw layer: original CSV columns + geometry (R/functions.R:173-192)
    val raw = geoRaw.join(broadcast(csv(certsCsv)
        .filter(col("certificate_number").isNotNull)),
      Seq("certificate_number"), "inner")
    GeoJson.write(raw.drop("geometry_last_update"), "geometry",
      s"$outDir/service-areas-raw.geojson", "service-areas-raw")

    val patched = applyMergePatches(spark, geoRaw, cfg)
    val published =
      maybeDowncastToInt(publishLayer(enriched, patched),
        "certificate_number")
    // sync_warning mirrors the reference's CONSOLE warnings — it is not
    // a property of its GeoJSON output, so drop it for byte parity; the
    // returned frame keeps it as the structured surface of those states
    GeoJson.write(published.drop("sync_warning"), "geometry",
      s"$outDir/service-areas.geojson", "service-areas")
    published
  }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S6 — the polymorphic provinces/regencies read.
  *
  * The reference's region endpoints tolerate wildly varying payload shapes
  * (web.py:51-76 provinces, web.py:105-115 regencies): the JSON may be a
  * bare list of records, a dict keyed `provinces` / `data` / `regencies` (or
  * even the province code itself), or a plain `{id: name}` map; record ids
  * hide under `id` | `province_id` | `code` and names under `name` |
  * `province_name` | `nama`, with numeric ids stringified.
  *
  * Spark-first shape: every candidate form is ONE `from_json` Column against
  * a permissive schema (mismatching payloads parse to null, never error),
  * normalized into a common record array and resolved with `coalesce` —
  * list-form first, keyed forms next, map-form last (a map parse can
  * "succeed" vacuously on keyed payloads, so it only wins when everything
  * else failed). All of it stays in the scan stage with no UDFs.
  */
object RegionSource {

  /** The union record schema across all candidate key aliases. */
  private val ItemsType = "array<struct<id:string,province_id:string,code:string,name:string,province_name:string,nama:string>>"

  /** Null-padded record struct from a plain map entry. */
  private def mapEntryToItem(e: Column): Column =
    struct(
      e.getField("key").as("id"),
      lit(null).cast("string").as("province_id"),
      lit(null).cast("string").as("code"),
      e.getField("value").as("name"),
      lit(null).cast("string").as("province_name"),
      lit(null).cast("string").as("nama"))

  /** A candidate record array only wins the coalesce if it holds at least
    * one COMPLETE record. Necessary because Spark's `from_json` with an
    * array schema wraps a lone JSON object into a one-element array of
    * all-null fields — a vacuous "success" that would otherwise shadow the
    * keyed/map forms for every dict payload. */
  private def usable(arr: Column): Column =
    when(exists(arr, x =>
      coalesce(x.getField("id"), x.getField("province_id"), x.getField("code")).isNotNull &&
      coalesce(x.getField("name"), x.getField("province_name"), x.getField("nama")).isNotNull), arr)

  /** Normalize one payload column into a record array, trying: bare list →
    * each of `listKeys` → plain string map. */
  def itemsColumn(payload: Column, listKeys: Seq[String]): Column = {
    val none = Map.empty[String, String]
    val bare = from_json(payload, ItemsType, none)
    val keyedSchema = listKeys.map(k => s"`$k`:$ItemsType").mkString("struct<", ",", ">")
    val keyed = from_json(payload, keyedSchema, none)
    val mapForm = from_json(payload, "map<string,string>", none)
    // the map fallback is for plain {id: name} payloads; from_json stringifies
    // nested objects/arrays into the value, so scalar-looking values only
    // (stricter than the reference, which would emit the JSON text as a name)
    val mapItems = transform(
      map_entries(map_filter(mapForm, (_, v) =>
        v.isNotNull && !v.startsWith("{") && !v.startsWith("["))),
      mapEntryToItem(_))
    val candidates =
      (Seq(bare) ++ listKeys.map(keyed.getField)).map(usable) ++
        Seq(when(size(mapItems) > 0, mapItems))
    coalesce(candidates: _*)
  }

  /** (id, name) rows from a frame of payload strings: explode the normalized
    * record array, coalesce the id/name aliases, keep only complete records
    * — exactly the reference's `if prov_id and prov_name` gate. */
  def normalize(payloads: DataFrame, payloadCol: String = "payload",
                listKeys: Seq[String] = Seq("provinces", "data")): DataFrame =
    payloads
      .select(explode(itemsColumn(col(payloadCol), listKeys)).as("item"))
      .select(
        coalesce(col("item.id"), col("item.province_id"), col("item.code")).as("id"),
        coalesce(col("item.name"), col("item.province_name"), col("item.nama")).as("name"))
      .filter(col("id").isNotNull && col("name").isNotNull)

  /** Regencies variant (web.py:105-115): candidate keys are `data`,
    * `regencies`, and the province code itself. */
  def normalizeRegencies(payloads: DataFrame, provinceCode: String,
                         payloadCol: String = "payload"): DataFrame =
    normalize(payloads, payloadCol,
      listKeys = Seq("data", "regencies", provinceCode))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StringType}

/** JSONPath helpers that complete the engine's jsonb function family
  * (reference: rust/datafusion-extensions/src/jsonb/path_query.rs —
  * `jsonb_path_query` returns every match, `jsonb_path_query_first`
  * the first; both registered in src/lib.rs:70-71). The multi-match
  * query itself is served by Spark's `get_json_object`, which returns
  * all matches of a wildcard path as a JSON array — `pathQueryFirst`
  * peels the first element off that array, or passes a single-match
  * path through untouched. Pure codegen'd builtins, no UDF.
  */
object Jsonb {

  /** First result of evaluating `path` against the JSON string `j` —
    * the `jsonb_path_query_first` analog. For a multi-match path
    * (`[*]` / `.*` wildcards) this is element 0 of the match set in
    * document order; for a single-match path it is the match itself.
    * Returns a string column (null when nothing matches), like the
    * reference's variant-to-string serving path.
    *
    * Wildcard caveats:
    *  - OBJECT wildcard (trailing `.*`): Spark's `get_json_object`
    *    has no object wildcard at all (the whole match is null), so
    *    the object at the prefix path is parsed as a map and its
    *    first value taken in document order — `from_json`'s string
    *    converter renders non-string values (numbers, nested
    *    containers) as their raw JSON text, matching DuckDB's
    *    `json_extract_string(j, '$.o.*')[1]`. A mid-path object
    *    wildcard is outside this function's contract.
    *  - ARRAY wildcard (`[*]`): `get_json_object` UNWRAPS the
    *    match-set array when the wildcard finds exactly one match —
    *    and in wildcard mode the unwrapped match keeps its JSON text
    *    form (a string match stays quoted). The fallback re-wraps the
    *    scalar match in `[...]` and parses, which both unquotes and
    *    unescapes it, keeping parity with engines that return the
    *    single match directly. A single match that is itself a JSON
    *    array is indistinguishable from a multi-match set in Spark's
    *    representation (inherent to the unwrapping) and resolves as a
    *    match set.
    */
  /** ALL results of evaluating `path` against the JSON string `j`, as
    * a JSON array in text form — the `jsonb_path_query` analog
    * (reference path_query.rs `PathQueryMode::All`:
    * `select_array_by_path` wraps every match in a jsonb array; no
    * match yields the empty array, a null input yields null).
    *
    * Representation caveats (inherent to serving jsonb over JSON
    * text + Spark's JsonPath grammar, same class as
    * [[pathQueryFirst]]'s):
    *  - ARRAY wildcard (`[*]`): matches keep their exact JSON text
    *    form (`get_json_object` preserves it in wildcard mode), so
    *    the result is the faithful match-set array. A single match
    *    that is itself a JSON array is indistinguishable from a
    *    multi-match set in Spark's representation and resolves as a
    *    match set.
    *  - Plain paths and trailing OBJECT wildcard (`.*`): the match
    *    comes back through the string converter (strings unquoted,
    *    numbers/containers as raw text), so it is re-serialized as a
    *    JSON STRING element — `'$.n'` over `{"n":7}` is `["7"]`, not
    *    `[7]`. Same string-converted view `jsonb_as_string` serves.
    */
  def pathQuery(j: Column, path: String): Column = {
    val matchSet =
      if (path.endsWith(".*")) {
        val prefix = path.dropRight(2)
        val obj = if (prefix == "$") j else get_json_object(j, prefix)
        to_json(map_values(from_json(obj, MapType(StringType, StringType))))
      } else if (path.contains("[*]") || path.contains(".*")) {
        val matches = get_json_object(j, path)
        when(matches.isNull, lit("[]"))
          .when(matches.rlike("^\\["), matches)
          .otherwise(concat(lit("["), matches, lit("]")))
      } else {
        val m = get_json_object(j, path)
        when(m.isNull, lit("[]")).otherwise(to_json(array(m)))
      }
    when(j.isNull, lit(null).cast(StringType)).otherwise(coalesce(matchSet, lit("[]")))
  }

  def pathQueryFirst(j: Column, path: String): Column =
    if (path.endsWith(".*")) {
      val prefix = path.dropRight(2)
      val obj = if (prefix == "$") j else get_json_object(j, prefix)
      element_at(map_values(from_json(obj, MapType(StringType, StringType))), 1)
    } else if (path.contains("[*]") || path.contains(".*")) {
      val matches = get_json_object(j, path)
      coalesce(
        element_at(from_json(matches, ArrayType(StringType)), 1),
        element_at(from_json(concat(lit("["), matches, lit("]")),
          ArrayType(StringType)), 1),
        matches)
    } else
      get_json_object(j, path)
}

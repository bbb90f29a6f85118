package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

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
    */
  def pathQueryFirst(j: Column, path: String): Column =
    if (path.contains("[*]") || path.contains(".*"))
      element_at(from_json(get_json_object(j, path), ArrayType(StringType)), 1)
    else
      get_json_object(j, path)
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, GetJsonObject, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}

/** The reference engine's OWN SQL names, registered over graft's
  * expressions — so a user migrating from the reference can paste the
  * function calls from its query guide (reference:
  * doc/how_to_query/README.md §Functions — `property_get`,
  * `make_histogram`, `sum_histograms`, `quantile_from_histogram`,
  * `variance_from_histogram`, `count_from_histogram`,
  * `sum_from_histogram`, the `jsonb_*` family, and the
  * `view_instance(view, id)` table function) and have them resolve
  * unchanged. Aliases only: each name binds the expression tree the
  * graft-prefixed name already uses, so the oracle-checked semantics
  * are shared, never forked.
  *
  * Representation note: the reference's JSONB is an engine-native
  * binary format; here the properties/JSON columns ARE JSON text, so
  * `jsonb_parse`/`jsonb_format_json` are identity over that text and
  * the accessor family evaluates against it — same observable
  * semantics (`jsonb_as_string(jsonb_get(jsonb_parse(p), 'k'))` returns
  * what the reference returns), different wire format.
  */
object ReferenceNames {

  /** A string the caller must supply as a foldable literal (function
    * names, JSON paths — things the reference also requires constant).
    */
  private def litString(e: Expression, fn: String): String = e match {
    case l: Literal if l.foldable && l.value != null => l.value.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a constant string argument, got: $other")
  }

  private def litDouble(e: Expression, fn: String): Double = e match {
    case l: Literal if l.foldable && l.value != null => l.value.toString.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn expects a constant numeric argument, got: $other")
  }

  /** Column-helper bridge: apply a Column function to expression args. */
  private def viaColumn(f: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column)(
      args: Seq[Expression]): Expression =
    Shim.expression(f(args.map(Shim.column)))

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "property_get" -> { args =>
      require(args.length == 2, "property_get(properties, key)")
      GraftPropertyGet(args(0), args(1))
    },
    "make_histogram" -> { args =>
      require(args.length == 4, "make_histogram(start, end, nb_bins, values)")
      HistogramAgg(
        Cast(args(0), DoubleType), Cast(args(1), DoubleType),
        Cast(args(2), IntegerType), Cast(args(3), DoubleType)).toAggregateExpression()
    },
    "sum_histograms" -> { args =>
      require(args.length == 1, "sum_histograms(histogram)")
      SumHistogramsAgg(args(0)).toAggregateExpression()
    },
    "quantile_from_histogram" -> { args =>
      require(args.length == 2, "quantile_from_histogram(histogram, quantile)")
      val q = litDouble(args(1), "quantile_from_histogram")
      viaColumn(cs => Histograms.quantileFromHistogram(cs.head, q))(args.take(1))
    },
    "variance_from_histogram" -> { args =>
      require(args.length == 1, "variance_from_histogram(histogram)")
      viaColumn(cs => Histograms.varianceFromHistogram(cs.head))(args)
    },
    "count_from_histogram" -> { args =>
      require(args.length == 1, "count_from_histogram(histogram)")
      viaColumn(cs => Histograms.countFromHistogram(cs.head))(args)
    },
    "sum_from_histogram" -> { args =>
      require(args.length == 1, "sum_from_histogram(histogram)")
      viaColumn(cs => Histograms.sumFromHistogram(cs.head))(args)
    },
    // jsonb family over JSON text (see representation note above)
    "jsonb_parse" -> { args =>
      require(args.length == 1, "jsonb_parse(json_string)")
      Cast(args(0), StringType)
    },
    "jsonb_format_json" -> { args =>
      require(args.length == 1, "jsonb_format_json(jsonb)")
      Cast(args(0), StringType)
    },
    "jsonb_get" -> { args =>
      require(args.length == 2, "jsonb_get(jsonb, key)")
      val key = litString(args(1), "jsonb_get")
      // GetJsonObject's JsonPath grammar has no escape syntax inside
      // ['…'] — the name token excludes ' and ?, so a key containing
      // them either silently changes which field is read or nulls the
      // whole lookup. The reference's jsonb_get is a byte-exact key
      // lookup for ANY key; since that's not addressable via JsonPath,
      // reject loudly instead of misreading (ADVICE r10).
      require(!key.exists(c => c == '\'' || c == '\\' || c == '?'),
        s"jsonb_get: key containing ', \\ or ? is not addressable via " +
          s"GetJsonObject's JsonPath grammar (no escape syntax): '$key'")
      GetJsonObject(args(0), Literal(s"$$['$key']"))
    },
    "jsonb_as_string" -> { args =>
      require(args.length == 1, "jsonb_as_string(jsonb_value)")
      Cast(args(0), StringType)
    },
    "jsonb_as_f64" -> { args =>
      require(args.length == 1, "jsonb_as_f64(jsonb_value)")
      Cast(args(0), DoubleType)
    },
    "jsonb_as_i64" -> { args =>
      require(args.length == 1, "jsonb_as_i64(jsonb_value)")
      Cast(args(0), LongType)
    },
    "jsonb_path_query_first" -> { args =>
      require(args.length == 2, "jsonb_path_query_first(jsonb, path)")
      val path = litString(args(1), "jsonb_path_query_first")
      viaColumn(cs => Jsonb.pathQueryFirst(cs.head, path))(args.take(1))
    },
    "jsonb_path_query" -> { args =>
      require(args.length == 2, "jsonb_path_query(jsonb, path)")
      val path = litString(args(1), "jsonb_path_query")
      viaColumn(cs => Jsonb.pathQuery(cs.head, path))(Seq(Cast(args(0), StringType)))
    },
    "jsonb_array_length" -> { args =>
      require(args.length == 1, "jsonb_array_length(jsonb)")
      // reference array_length.rs returns Int64
      viaColumn(cs => org.apache.spark.sql.functions.json_array_length(cs.head).cast("long"))(
        Seq(Cast(args(0), StringType)))
    },
    "jsonb_object_keys" -> { args =>
      require(args.length == 1, "jsonb_object_keys(jsonb)")
      // reference keys.rs: the object's keys; served as a native
      // array<string> (the Spark-idiomatic form of a jsonb string array)
      viaColumn(cs => org.apache.spark.sql.functions.json_object_keys(cs.head))(
        Seq(Cast(args(0), StringType)))
    },
    // —— properties family (reference datafusion-extensions properties/
    // + analytics/src/properties/properties_to_{jsonb,dict}_udf.rs).
    // Properties here ARE JSON text (representation note above), so the
    // jsonb/dict conversions are identity over that text: the
    // reference's dictionary encoding is a physical-layout optimization
    // (identical property sets stored once) with no observable query
    // semantics, and the jsonb conversion is a wire-format change. The
    // accessor compositions users write — property_get(...),
    // jsonb_get(properties_to_jsonb(p), 'k') — evaluate identically.
    "properties_to_jsonb" -> { args =>
      require(args.length == 1, "properties_to_jsonb(properties)")
      Cast(args(0), StringType)
    },
    "properties_to_dict" -> { args =>
      require(args.length == 1, "properties_to_dict(properties)")
      Cast(args(0), StringType)
    },
    "properties_to_array" -> { args =>
      require(args.length == 1, "properties_to_array(properties)")
      // list<struct<key,value>> in property appearance order
      // (properties_udf.rs:76 PropertiesToArray)
      viaColumn { cs =>
        import org.apache.spark.sql.functions._
        map_entries(from_json(cs.head, org.apache.spark.sql.types.MapType(StringType, StringType)))
      }(Seq(Cast(args(0), StringType)))
    },
    "properties_length" -> { args =>
      require(args.length == 1, "properties_length(properties)")
      viaColumn { cs =>
        import org.apache.spark.sql.functions._
        size(map_keys(from_json(cs.head,
          org.apache.spark.sql.types.MapType(StringType, StringType)))).cast("long")
      }(Seq(Cast(args(0), StringType)))
    },
    // —— math/binning family (reference datafusion-extensions/src/math/
    // lerp.rs, unlerp.rs + binning/bin_center.rs; all Float64→Float64,
    // null-propagating — Spark's default null semantics match, and
    // double division by zero yields ±Infinity/NaN in both engines)
    "lerp" -> { args =>
      require(args.length == 3, "lerp(a, b, t)")
      viaColumn(cs => cs(0) + (cs(1) - cs(0)) * cs(2))(args.map(Cast(_, DoubleType)))
    },
    "unlerp" -> { args =>
      require(args.length == 3, "unlerp(a, b, x)")
      viaColumn(cs => (cs(2) - cs(0)) / (cs(1) - cs(0)))(args.map(Cast(_, DoubleType)))
    },
    "bin_center" -> { args =>
      require(args.length == 2, "bin_center(coord, cell_size)")
      // bin_center.rs:82 — ((c + cs*0.5)/cs).floor() * cs
      viaColumn { cs =>
        import org.apache.spark.sql.functions._
        floor((cs(0) + cs(1) * lit(0.5)) / cs(1)) * cs(1)
      }(args.map(Cast(_, DoubleType)))
    },
    // —— color family (reference datafusion-extensions/src/color/;
    // packed 0xRRGGBBAA — BIGINT here, the reference's UInt32 doesn't
    // fit a signed int, Colors.scala representation note)
    "rgba" -> { args =>
      require(args.length == 4, "rgba(r, g, b, a)")
      viaColumn(cs => Colors.rgba(cs(0), cs(1), cs(2), cs(3)))(args.map(Cast(_, DoubleType)))
    },
    "lerp_color" -> { args =>
      require(args.length == 3, "lerp_color(c1, c2, t)")
      viaColumn(cs => Colors.lerpColor(cs(0), cs(1), cs(2)))(
        Seq(Cast(args(0), LongType), Cast(args(1), LongType), Cast(args(2), DoubleType)))
    },
    "color_scale" -> { args =>
      require(args.length == 3, "color_scale(name, t, alpha)")
      val name = litString(args(0), "color_scale")
      require(name.equalsIgnoreCase("viridis"),
        s"color_scale: colormap '$name' is not implemented here — 'viridis' is " +
          "(the reference recognizes viridis, magma, plasma, inferno, cividis, " +
          "turbo; color_scale.rs:15)")
      viaColumn(cs => Colors.colorScaleViridis(cs(0), cs(1)))(
        Seq(Cast(args(1), DoubleType), Cast(args(2), DoubleType)))
    })

  /** `view_instance(view_name, instance_id)` — the reference's JIT
    * per-process/per-stream view table function (reference:
    * rust/analytics/src/lakehouse/view_instance_table_function.rs;
    * doc/how_to_query/README.md §view_instance). Resolves against the
    * lake dir the session's views were registered for (Graft.query /
    * registerViews), the same session-scoped resolution the reference's
    * FlightSQL service applies. The instance scope is pushed to the raw
    * source column so it prunes at the parquet reader
    * (Lakehouse.viewInstance).
    */
  def viewInstanceBuilder(spark: SparkSession)(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2, "view_instance(view_name, instance_id)")
    val view = litString(args(0), "view_instance")
    val id = litString(args(1), "view_instance")
    val dir = graft.Graft.registeredDir(spark).getOrElse(throw new IllegalStateException(
      "view_instance: no lake registered on this session — call Graft.query/registerViews first"))
    new graft.Lakehouse(spark, dir).viewInstance(view, id).queryExecution.logical
  }

  /** `get_payload(process_id, stream_id, block_id)` — the reference's
    * raw-block-payload fetch (reference:
    * rust/analytics/src/lakehouse/get_payload_function.rs — a scalar
    * (Utf8, Utf8, Utf8) → Binary UDF doing one object-store GET per
    * row). Served here as a TABLE function over literal ids: the
    * reference's scalar form exists so one block's bytes can be
    * SELECTed by id, and per-row blob fetches inside a projection are
    * exactly what a distributed plan shouldn't do — the relational
    * bulk form is `Lakehouse.blockPayloads`. The plan filters the raw
    * scan on the process/stream ids (prunes at the parquet reader,
    * like view_instance) and synthesizes the block's payload bytes
    * (same deterministic synthesis as the oracle-checked
    * m_block_payload — shared code, never forked).
    */
  def getPayloadBuilder(spark: SparkSession)(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3, "get_payload(process_id, stream_id, block_id)")
    val pid = litString(args(0), "get_payload")
    val stream = litString(args(1), "get_payload")
    val block = litString(args(2), "get_payload")
    require(block.forall(c => c.isDigit || c == '-'),
      s"get_payload: block_id is the block's start epoch-ms here, got: '$block'")
    val dir = graft.Graft.registeredDir(spark).getOrElse(throw new IllegalStateException(
      "get_payload: no lake registered on this session — call Graft.query/registerViews first"))
    new graft.Lakehouse(spark, dir).getPayload(pid, stream, block.toLong)
      .queryExecution.logical
  }

  /** `jsonb_each(jsonb)` / `jsonb_array_elements(jsonb)` — the
    * reference's jsonb generator table functions (reference
    * datafusion-extensions/src/jsonb/each.rs:79 — (key Utf8, value
    * jsonb) rows — and array_elements.rs:75 — (value jsonb) rows;
    * both registered as UDTFs in lib.rs). DataFusion UDTFs take
    * constant arguments, so the verbatim form serves a literal JSON
    * document; the per-ROW generator idiom in Spark is `LATERAL VIEW
    * explode(...)` over the same from_json trees (the oracle-checked
    * m_jsonb_each / m_jsonb_elements queries). Values come through
    * the string converter — the same jsonb_as_string view the scalar
    * family serves.
    */
  def jsonbEachBuilder(spark: SparkSession)(args: Seq[Expression]): LogicalPlan = {
    import org.apache.spark.sql.functions._
    require(args.length == 1, "jsonb_each(jsonb)")
    val j = litString(args(0), "jsonb_each")
    spark.range(1)
      .select(explode(from_json(lit(j),
        org.apache.spark.sql.types.MapType(StringType, StringType))))
      .select("key", "value")
      .queryExecution.logical
  }

  def jsonbArrayElementsBuilder(spark: SparkSession)(args: Seq[Expression]): LogicalPlan = {
    import org.apache.spark.sql.functions._
    require(args.length == 1, "jsonb_array_elements(jsonb)")
    val j = litString(args(0), "jsonb_array_elements")
    spark.range(1)
      .select(explode(from_json(lit(j),
        org.apache.spark.sql.types.ArrayType(StringType))).as("value"))
      .queryExecution.logical
  }

  /** Install the alias names on a session we didn't build (idempotent
    * via createOrReplace; cheap). The extensions path registers the
    * same builders at session build time.
    */
  def register(spark: SparkSession): Unit = {
    val ss = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionState
    builders.foreach { case (name, b) =>
      ss.functionRegistry.createOrReplaceTempFunction(name, b, "scala_udf")
    }
    ss.tableFunctionRegistry.createOrReplaceTempFunction(
      "view_instance", viewInstanceBuilder(spark), "scala_udf")
    ss.tableFunctionRegistry.createOrReplaceTempFunction(
      "get_payload", getPayloadBuilder(spark), "scala_udf")
    ss.tableFunctionRegistry.createOrReplaceTempFunction(
      "jsonb_each", jsonbEachBuilder(spark), "scala_udf")
    ss.tableFunctionRegistry.createOrReplaceTempFunction(
      "jsonb_array_elements", jsonbArrayElementsBuilder(spark), "scala_udf")
  }
}

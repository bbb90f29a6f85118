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
  }
}

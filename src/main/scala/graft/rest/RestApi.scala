package graft.rest

import graft.api.Graft
import graft.model.{ArchivePolicy, ArchivePolicyItem, Granularity}
import graft.query.MeasureSearch
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

/** The reference's REST surface (rest/api.py:2378-2402 route tree)
  * re-expressed as a pure `(method, path, query, body) → Response`
  * dispatcher over the [[Graft]] facade — transport-free so every route
  * is spec-testable without sockets; [[RestServer]] binds it to the
  * JDK's HTTP server for wire use.
  *
  * Routes carry the reference's wire shapes: measures as
  * `[[timestamp, granularity_s, value], …]` triples (rest/api.py:
  * 520-527), 202-accepted ingestion, the measure-search boolean tree
  * (rest/api.py:1514-1652), and the resource filter DSL. Responses are
  * driver-sized by contract (a REST page, never a corpus) — bulk data
  * belongs on the DataFrame doors of the facade.
  */
final case class Response(status: Int, body: JValue,
                          headers: Map[String, String] = Map.empty)

/** @param requireAuth when true, mutating routes enforce the
  *   reference's default policy shape (rest/api.py:113 `enforce` +
  *   policy.json): archive-policy / policy-rule / resource-type
  *   mutation needs the `admin` creator, resource PATCH/DELETE needs
  *   admin or the row's recorded creator, and an unauthenticated
  *   request to a guarded route gets 401. Off by default — the
  *   reference's own gabbi runs mostly use a permissive auth helper.
  */
object RestApi {
  // The reference parses request bodies with Python's json module,
  // which accepts bare NaN/Infinity literals by default — a measure
  // POSTed as {"value": NaN} ingests and stores as float64 NaN
  // (carbonara kernels then propagate it, see KernelsSpec). Both
  // directions ride the engine-wide [[graft.api.JsonCodec]] (a
  // dedicated mapper; the process-global json4s one stays stock).
  /** Parse a REST body with the NaN-literal-accepting mapper. */
  private[graft] def parseJson(s: String): JValue =
    graft.api.JsonCodec.parse(s)

  /** Serialize a REST response; NaN/±Infinity render as bare literals
    * (the reference's json.dumps behavior). */
  private[graft] def renderJson(v: JValue): String =
    graft.api.JsonCodec.render(v)
}

class RestApi(val g: Graft, requireAuth: Boolean = false,
              authMode: String = "basic") {

  private def ok(b: JValue) = Response(200, b)
  private def created(b: JValue) = Response(201, b)
  private def accepted = Response(202, JNothing)
  private def noContent = Response(204, JNothing)
  private def err(status: Int, msg: String): Response =
    Response(status, JObject("code" -> JInt(status), "description" -> JString(msg)))

  /** Escape a value for interpolation into the string filter grammar —
    * its string escape is BACKSLASH-based (FilterParser), so the
    * SQL-style doubled quote would mis-lex apostrophe-bearing ids. */
  private def qesc(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")

  /** ONE `utcnow()` anchor per dispatched request (utils.py:80-84): a
    * `start=-5 minutes&stop=-1 second` pair must resolve against the
    * SAME now. Set at [[dispatchBytes]] entry, cleared on exit; a
    * facade-level caller outside a dispatch falls back to the clock.
    */
  private val requestNow = new ThreadLocal[java.lang.Long]

  // Request-scoped keystone roles (X-Roles): the admin-enforcement
  // points take only `creator`, so role-admin rides beside the request
  // the same way the request clock does. Set at the outermost
  // dispatch, cleared there too. Only keystone mode reads it — the
  // reference's other auth helpers have no role plane.
  private val requestRoles = new ThreadLocal[Set[String]]
  private def roleAdmin: Boolean =
    authMode == "keystone" &&
      Option(requestRoles.get).exists(_.contains("admin"))

  private def nowMs: Long = {
    val anchored = requestNow.get
    if (anchored ne null) anchored.longValue else System.currentTimeMillis()
  }

  /** Test seam: run `f` with the request-now anchor pinned to `ms`. */
  private[graft] def withRequestNow[T](ms: Long)(f: => T): T = {
    requestNow.set(ms)
    try f finally requestNow.remove()
  }

  /** Accept ISO-8601 (Z or offset or bare), SQL timestamp strings,
    * epoch numbers, and RELATIVE timespans ("-5 minutes", "2h32m")
    * resolved against the per-request now — the reference's
    * utils.to_timestamp surface (utils.py:86-123, pytimeparse fallback
    * at :103-109).
    */
  private def parseTs(s: String): java.sql.Timestamp =
    if (s.matches("^-?[0-9]+(\\.[0-9]+)?$"))
      new java.sql.Timestamp((s.toDouble * 1000).toLong)
    else if (s.contains("T"))
      java.sql.Timestamp.from(java.time.Instant.parse(
        if (!s.endsWith("Z") && !s.matches(".*[+-][0-9]{2}:[0-9]{2}$")) s + "Z"
        else s))
    else parseTimespanS(s) match {
      case Some(spanS) => new java.sql.Timestamp(
        nowMs + (spanS * 1000).toLong)
      case None => java.sql.Timestamp.valueOf(s)
    }

  private def parseTimespanS(s0: String): Option[Double] =
    graft.model.Timespan.parseS(s0)

  /** Measure-list body → (timestamp, value) points. The timestamp
    * FORMAT is decided by the first element and applied to the whole
    * list (utils.to_timestamps:86-123): epoch numbers, ISO strings, or
    * relative timespans — mixing formats is the reference's 400
    * (gabbits/metric-timestamp-format.yaml). Relative stamps anchor on
    * the per-request now.
    */
  private def parseMeasureList(arr: List[JValue]): Seq[(String, Double)] =
    graft.ingest.MeasureList.parse(arr, nowMs)
      .map { case (t, v) => (t.toString, v) }

  /** `granularity`/`resample` query params carry the reference's
    * utils.to_timespan surface (utils.py:138-150): plain seconds (int
    * or float) or a pytimeparse timespan ("1h", "5 minutes"), positive
    * only, with the reference's error strings. The engine's bucket
    * model is whole seconds, so a sub-second span is a clean 400
    * instead of a silent floor.
    */
  private def parseGranS(s: String): Long = {
    val spanS: Double = s.trim.toDoubleOption
      .orElse(parseTimespanS(s))
      .getOrElse(throw new IllegalArgumentException(
        s"Unable to parse timespan: $s"))
    if (spanS <= 0)
      throw new IllegalArgumentException("Timespan must be positive")
    val g = spanS.toLong
    if (g.toDouble != spanS) throw new IllegalArgumentException(
      s"sub-second granularity is not supported: $s")
    g
  }

  /** Body-JSON numeric granularity — the same whole-second/positive
    * contract as [[parseGranS]]'s string forms (a 0.5 body literal must
    * not silently floor to 0 and surface as a bogus 404). */
  private def granFromNum(d: Double): Long = {
    if (d <= 0)
      throw new IllegalArgumentException("Timespan must be positive")
    val g = d.toLong
    if (g.toDouble != d) throw new IllegalArgumentException(
      s"sub-second granularity is not supported: $d")
    g
  }

  private def iso(t: java.sql.Timestamp): String = t.toInstant.toString

  private def jnum(v: JValue): Double = v match {
    case JInt(n) => n.toDouble; case JLong(n) => n.toDouble
    case JDouble(n) => n;       case JDecimal(n) => n.toDouble
    case other => throw new IllegalArgumentException(s"expected number: $other")
  }

  private def jstr(v: JValue): String = v match {
    case JString(s) => s
    case other => throw new IllegalArgumentException(s"expected string: $other")
  }

  /** MetricsSchema wire form (rest/api.py:732-746): per name either an
    * EXISTING metric id (string) to attach or an object creating one
    * ({"archive_policy_name": p} / {} for the R9 rules). Intra-body
    * duplicate names reject up front.
    */
  private def parseMetricsSchema(
      v: JValue): Map[String, Either[String, Option[String]]] = v match {
    case JObject(fields) =>
      val dup = fields.map(_._1).groupBy(identity)
        .collect { case (n, more) if more.size > 1 => n }
      if (dup.nonEmpty) throw new IllegalArgumentException(
        s"duplicate metric names: ${dup.toSeq.sorted.mkString(", ")}")
      fields.map {
        case (n, JString(existing)) => n -> Left(existing)
        case (n, o: JObject) => o \ "archive_policy_name" match {
          case JString(p) => n -> Right(Some(p))
          case _          => n -> Right(None)
        }
        case (n, _) => n -> Right(None)
      }.toMap
    case other =>
      throw new IllegalArgumentException(s"bad metrics body: $other")
  }

  /** Resource-body keys the door accepts: the registered catalog's
    * columns minus the server-managed ones, plus the inline `metrics`
    * map — the reference's schema_for() voluptuous surface, where an
    * extra key is a 400 (rest/api.py:1060-1069; PREVENT_EXTRA).
    */
  private def resourceInputKeys(g: Graft): Set[String] =
    g.resourceColumns.toSet -- Set("id", "type", "creator",
      "original_resource_id", "revision_start", "revision_end") + "metrics"

  private def rejectExtraKeys(fields: List[(String, JValue)],
                              allowed: Set[String]): Unit =
    for (k <- fields.map(_._1).find(!allowed.contains(_)))
      throw new IllegalArgumentException(
        s"Invalid input: extra keys not allowed @ data['$k']")

  /** Measure-search boolean tree (rest/api.py:1514-1652 MeasureQuery):
    * `{"and": [...]}`/`{"or"}`/`{"not"}`, comparison nodes
    * `{">=": [operand, operand]}` with the shorthand `{">=": 10}` for
    * `value >= 10`, operands either "value"/number/arith node.
    */
  private def parsePred(v: JValue): MeasureSearch.Pred = v match {
    case JObject(List((op, arg))) => op.toLowerCase match {
      case "and" | "∧" => arg match {
        case JArray(vs) => MeasureSearch.And(vs.map(parsePred))
        case other => throw new IllegalArgumentException(s"'and' expects a list: $other")
      }
      case "or" | "∨" => arg match {
        case JArray(vs) => MeasureSearch.Or(vs.map(parsePred))
        case other => throw new IllegalArgumentException(s"'or' expects a list: $other")
      }
      case "not" | "¬" => MeasureSearch.Not(parsePred(arg))
      case cmp => arg match {
        case JArray(List(l, r)) => MeasureSearch.Cmp(cmp, parseExpr(l), parseExpr(r))
        case n => MeasureSearch.Cmp(cmp, MeasureSearch.Value, parseExpr(n))
      }
    }
    case other => throw new IllegalArgumentException(s"bad predicate: $other")
  }

  /** Resource attribute-filter JSON tree (rest/api.py:1381-1437):
    * `{"and"|"or": [...]}`, `{"not": {...}}`, `{"in": {attr: [...]}}`,
    * `{"like": {attr: "pat"}}`, `{"<op>": {attr: value}}`.
    */
  private def parseFilterTree(v: JValue): graft.catalog.Filter = {
    import graft.catalog.Filter._
    def anyOf(x: JValue): Any = x match {
      case JString(s)  => s
      case JInt(n)     => n.toLong
      case JLong(n)    => n
      case JDouble(n)  => n
      case JDecimal(n) => n.toDouble
      case JBool(b)    => b
      case JNull       => null
      case other => throw new IllegalArgumentException(s"bad value: $other")
    }
    v match {
      case JObject(List((op, arg))) => op.toLowerCase match {
        case "and" | "∧" => arg match {
          case JArray(vs) => And(vs.map(parseFilterTree))
          case other => throw new IllegalArgumentException(s"bad and: $other")
        }
        case "or" | "∨" => arg match {
          case JArray(vs) => Or(vs.map(parseFilterTree))
          case other => throw new IllegalArgumentException(s"bad or: $other")
        }
        case "not" | "¬" => Not(parseFilterTree(arg))
        case "in" => arg match {
          case JObject(List((attr, JArray(Nil)))) =>
            // voluptuous Length(min=1) on the in-list
            // (gabbits/search.yaml "empty in_" → 400)
            throw new IllegalArgumentException(
              s"'in' requires at least one value: $attr")
          case JObject(List((attr, JArray(vs)))) => In(attr, vs.map(anyOf))
          case other => throw new IllegalArgumentException(s"bad in: $other")
        }
        case "like" => arg match {
          case JObject(List((attr, JString(p)))) => Like(attr, p)
          case other => throw new IllegalArgumentException(s"bad like: $other")
        }
        case cmp => arg match {
          case JObject(List((attr, value))) => Cmp(cmp, attr, anyOf(value))
          case other => throw new IllegalArgumentException(s"bad $cmp: $other")
        }
      }
      case other => throw new IllegalArgumentException(s"bad filter: $other")
    }
  }

  private def parseExpr(v: JValue): MeasureSearch.Expr = v match {
    case JString("value") => MeasureSearch.Value
    case JObject(List((op, JArray(List(l, r))))) =>
      MeasureSearch.Arith(op, parseExpr(l), parseExpr(r))
    case n => MeasureSearch.Const(jnum(n))
  }

  private def policyJson(p: ArchivePolicy): JValue =
    ("name" -> p.name) ~ ("back_window" -> p.backWindow) ~
      ("aggregation_methods" -> p.aggregationMethods.toList.sorted) ~
      ("definition" -> p.definition.map { item =>
        ("granularity" -> item.granularity.token) ~
          ("points" -> item.points) ~
          ("timespan" -> item.completed.timespanNs.map(_ / 1e9))
      })

  private def parsePolicy(b: JValue): ArchivePolicy = {
    val name = jstr(b \ "name")
    val back = b \ "back_window" match {
      case JNothing => 0; case n => jnum(n).toInt
    }
    val methods = b \ "aggregation_methods" match {
      case JArray(a) => ArchivePolicy.resolveMethods(a.map(jstr).toSet)
      case JNothing  => ArchivePolicy.defaultMethods
      case other => throw new IllegalArgumentException(s"bad methods: $other")
    }
    val items = (b \ "definition").asInstanceOf[JArray].arr.map { d =>
      ArchivePolicyItem(
        Granularity.parse(d \ "granularity" match {
          case JString(s) => s; case n => jnum(n).toLong.toString
        }),
        d \ "points" match { case JNothing => None; case n => Some(jnum(n).toLong) },
        d \ "timespan" match {
          case JNothing => None
          // utils.to_timespan surface: numbers (seconds) or pytimeparse
          // phrases — search-metric.yaml posts `timespan: 1 hour`
          case JString(s) => Some((s.trim.toDoubleOption
            .orElse(parseTimespanS(s))
            .getOrElse(throw new IllegalArgumentException(
              s"Unable to parse timespan: $s")) * 1e9).toLong)
          case n => Some((jnum(n) * 1e9).toLong)
        }).completed
    }
    ArchivePolicy(name, back, items, methods)
  }

  /** Attribute-type wire forms (resource_type.py schema names). */
  private def parseAttrType(spec: JValue): graft.catalog.ResourceTypes.AttrType = {
    import graft.catalog.ResourceTypes.AttrType._
    def numOpt(k: String): Option[Double] =
      spec \ k match { case JNothing => None; case v => Some(jnum(v)) }
    // the reference's ResourceTypeSchema is a CLOSED voluptuous schema
    // per type (resource_type.py) — unknown keys and inverted bounds
    // are 400s (gabbits/resource-type.yaml "bad string" /
    // "bad min_length value" / "bad min value")
    val tpe = jstr(spec \ "type")
    val allowed: Set[String] = Set("type", "required", "options") ++ (tpe match {
      case "string" => Set("max_length", "min_length")
      case "number" => Set("min", "max")
      case _        => Set.empty[String]
    })
    spec match {
      case JObject(fields) =>
        for (k <- fields.map(_._1).find(!allowed(_)))
          throw new IllegalArgumentException(
            s"extra keys not allowed @ attribute spec: $k")
      case _ => ()
    }
    tpe match {
      case "string" =>
        val maxL = spec \ "max_length" match {
          case JNothing => 255; case v => jnum(v).toInt
        }
        val minL = spec \ "min_length" match {
          case JNothing => 0; case v => jnum(v).toInt
        }
        require(minL <= maxL,
          s"min_length ($minL) greater than max_length ($maxL)")
        Str(maxL, minL)
      case "uuid"     => Uuid
      case "datetime" => Datetime
      case "number"   =>
        val (mn, mx) = (numOpt("min"), numOpt("max"))
        for (a <- mn; b <- mx) require(a <= b,
          s"min ($a) greater than max ($b)")
        Num(mn, mx)
      case "bool"     => Bool
      case other => throw new IllegalArgumentException(s"unknown attr type $other")
    }
  }

  private def resourceTypeJson(
      rt: graft.catalog.ResourceTypes.ResourceType): JValue = {
    import graft.catalog.ResourceTypes.AttrType._
    ("name" -> rt.name) ~ ("attributes" -> JObject(rt.attrs.toList.map { a =>
      val base: List[(String, JValue)] = a.tpe match {
        case Str(ml, mn) => List("type" -> JString("string"),
          "max_length" -> JInt(ml), "min_length" -> JInt(mn))
        case Uuid       => List("type" -> JString("uuid"))
        case Datetime   => List("type" -> JString("datetime"))
        case Num(mn, mx) => List[(String, JValue)]("type" -> JString("number")) ++
          mn.map(v => "min" -> JDouble(v)) ++ mx.map(v => "max" -> JDouble(v))
        case Bool       => List("type" -> JString("bool"))
      }
      a.name -> JObject(("required" -> JBool(a.required)) :: base)
    }))
  }

  private def measuresTriples(rows: Seq[(java.sql.Timestamp, Long, Double)]): JValue =
    JArray(rows.toList.map { case (t, gS, v) =>
      JArray(List(JString(iso(t)), JDouble(gS.toDouble), JDouble(v)))
    })

  /** Per-reference measures block for non-aggregated `/v1/aggregates`
    * (processor.py:246-272 m_output): `{metric_id: {method: [[ts,
    * gran, v], ...]}}` with each reference's triples coarse→fine then
    * bucket-ascending, as the reference's reverse-sorted sampling loop
    * extends them. `granS` carries the single requested granularity;
    * None means the frame carries a `gran_s` column (the
    * every-common-granularity form).
    */
  private def refsMeasuresJson(df: org.apache.spark.sql.DataFrame,
                               granS: Option[Long]): JValue = {
    import org.apache.spark.sql.functions.col
    // REST-page cap + ListBuffer accumulation: List `:+` per row over
    // an uncapped collect is quadratic driver-side work on a large
    // window (same 100000-row cap as the aggregated branch)
    val ordered = (granS match {
      case Some(_) => df.orderBy(col("metric_id"), col("method"), col("bucket"))
      case None => df.orderBy(col("metric_id"), col("method"),
        col("gran_s").desc, col("bucket"))
    }).limit(100000).collect()
    val byMetric = scala.collection.mutable.LinkedHashMap.empty[String,
      scala.collection.mutable.LinkedHashMap[String,
        scala.collection.mutable.ListBuffer[JValue]]]
    ordered.foreach { r =>
      // null value cells are absent points, not 0.0 (unchecked
      // getAs[Double] unboxes null to 0) — skip, as groupedMeasuresJson
      if (!r.isNullAt(r.fieldIndex("value"))) {
        val g = granS.getOrElse(r.getAs[Long]("gran_s"))
        val triple: JValue = JArray(List(
          JString(iso(r.getAs[java.sql.Timestamp]("bucket"))),
          JDouble(g.toDouble), JDouble(r.getAs[Double]("value"))))
        byMetric.getOrElseUpdate(r.getAs[String]("metric_id"),
            scala.collection.mutable.LinkedHashMap.empty)
          .getOrElseUpdate(r.getAs[String]("method"),
            scala.collection.mutable.ListBuffer.empty) += triple
      }
    }
    JObject(byMetric.toList.map { case (mid, methods) =>
      mid -> (JObject(methods.toList.map { case (m, ts) =>
        m -> (JArray(ts.toList): JValue) }): JValue)
    })
  }

  /** Per-RESOURCE measures block for search-scoped non-aggregated
    * `/v1/aggregates` (processor.py:264-272 r_output):
    * `{resource_id: {metric_name: {method: [[ts, gran, v], ...]}}}`.
    */
  private def resourceMeasuresJson(df: org.apache.spark.sql.DataFrame,
                                   granS: Option[Long],
                                   seed: Seq[(String, String, String)] = Nil)
      : JValue = {
    import org.apache.spark.sql.functions.col
    // None = the every-common-granularity form: the frame carries a
    // `gran_s` column and each reference's triples run coarse→fine
    val ordered = (granS match {
      case Some(_) => df.orderBy(col("resource_id"), col("metric_name"),
        col("method"), col("bucket"))
      case None => df.orderBy(col("resource_id"), col("metric_name"),
        col("method"), col("gran_s").desc, col("bucket"))
    }).limit(100000).collect()
    val byRes = scala.collection.mutable.LinkedHashMap.empty[String,
      scala.collection.mutable.LinkedHashMap[String,
        scala.collection.mutable.LinkedHashMap[String,
          scala.collection.mutable.ListBuffer[JValue]]]]
    // the RESOLVED key universe first: a resolved metric whose series
    // produced no rows still appears with an empty list
    // (gabbits/aggregates-with-resources.yaml `cpu.idle.mean: []`)
    seed.sorted.foreach { case (rid, name, m) =>
      byRes.getOrElseUpdate(rid,
          scala.collection.mutable.LinkedHashMap.empty)
        .getOrElseUpdate(name,
          scala.collection.mutable.LinkedHashMap.empty)
        .getOrElseUpdate(m, scala.collection.mutable.ListBuffer.empty)
    }
    ordered.foreach { r =>
      // null value cells skip (absent points, not 0.0); the resolved
      // seed above keeps the metric visible with an empty list
      if (!r.isNullAt(r.fieldIndex("value"))) {
        val gv = granS.getOrElse(r.getAs[Long]("gran_s"))
        val triple: JValue = JArray(List(
          JString(iso(r.getAs[java.sql.Timestamp]("bucket"))),
          JDouble(gv.toDouble), JDouble(r.getAs[Double]("value"))))
        byRes.getOrElseUpdate(r.getAs[String]("resource_id"),
            scala.collection.mutable.LinkedHashMap.empty)
          .getOrElseUpdate(r.getAs[String]("metric_name"),
            scala.collection.mutable.LinkedHashMap.empty)
          .getOrElseUpdate(r.getAs[String]("method"),
            scala.collection.mutable.ListBuffer.empty) += triple
      }
    }
    JObject(byRes.toList.map { case (rid, mets) =>
      rid -> (JObject(mets.toList.map { case (m, aggs) =>
        m -> (JObject(aggs.toList.map { case (a, ts) =>
          a -> (JArray(ts.toList): JValue) }): JValue) }): JValue)
    })
  }

  /** Grouped `/v1/aggregates` response (rest/aggregates/api.py:653-672
    * get_measures_grouping; :474-493 Grouper.format_response): a LIST
    * of `{"group": {attr: value}, "measures": {"measures":
    * {"aggregated": [[ts, gran, v], ...]}}}` entries in group-key
    * order. Groups with no measures are omitted and an EMPTY result
    * 404s with the referenced metric names (api.py:602-606). `scope`
    * (details=true) attaches each group's matched resource ids as
    * `measures.references` (api.py:704-710) — ids here; full rows ride
    * the resource routes.
    */
  /** @param scope   resolved (group key, resource id) membership,
    *                 feeding the per-group `measures.references` block
    *                 when `details` is set.
    * @param groupsFromScope the PLAIN grouped door's group list comes
    *                 from the matched resources, so a group with
    *                 metrics but no measures still appears with an
    *                 empty `aggregated` list (api.py:653-672); the
    *                 history door's Grouper instead DROPS empty groups
    *                 (format_response `if aggregated`, api.py:485-490)
    *                 — its group list is the measure keys.
    * @param details  attach per-group resource ids as
    *                 `measures.references`.
    * An empty RESULT LIST 404s with the referenced metric names
    * (api.py:602-606) on both doors.
    */
  private def groupedMeasuresJson(df: org.apache.spark.sql.DataFrame,
      groupby: Seq[String], granS: Option[Long], operations: String,
      scope: Seq[(Seq[Any], String)],
      groupsFromScope: Boolean,
      details: Boolean): JValue = {
    import org.apache.spark.sql.functions.col
    // None = every-common-granularity form (gran_s column, coarse→fine
    // within each group)
    val ordered = (granS match {
      case Some(_) => df.orderBy((groupby :+ "bucket").map(col): _*)
      case None => df.orderBy(groupby.map(col) ++
        Seq(col("gran_s").desc, col("bucket")): _*)
    }).limit(100000).collect()
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[Seq[Any], scala.collection.mutable.ListBuffer[JValue]]
    ordered.foreach { r =>
      val vi = r.fieldIndex("value")
      // null cells (absent grid positions under fill=null) skip, as the
      // single-series door's shaped() — triples carry present points
      if (!r.isNullAt(vi)) {
        val gv = granS.getOrElse(r.getAs[Long]("gran_s"))
        val triple: JValue = JArray(List(
          JString(iso(r.getAs[java.sql.Timestamp]("bucket"))),
          JDouble(gv.toDouble), JDouble(r.getDouble(vi))))
        groups.getOrElseUpdate(groupby.map(a => r.getAs[Any](a)),
          scala.collection.mutable.ListBuffer.empty) += triple
      }
    }
    // group list: the resolved scope (plain door) or the measure keys
    // (history door); the reference sorts resources by the groupby
    // attribute VALUES (typed)
    val keys: Seq[Seq[Any]] =
      if (groupsFromScope) scope.map(_._1).distinct.sorted(groupKeyOrd)
      else groups.keys.toSeq
    if (keys.isEmpty) {
      val names = graft.ops.GroupedOps.collectRefs(
        graft.ops.Parser.parse(operations)).map(_._1).distinct.sorted
      throw new graft.api.GraftError.NotFound(
        s"Metrics not found: ${names.mkString(", ")}")
    }
    JArray(keys.toList.map { key =>
      val triples = groups.get(key).map(_.toList).getOrElse(Nil)
      val measures: JValue = "aggregated" -> (JArray(triples): JValue)
      val inner: JValue =
        if (details) ("measures" -> measures) ~
          ("references" -> JArray(scope.collect {
            case (k, rid) if k == key => rid
          }.distinct.sorted.toList.map(id => (("id" -> id): JValue))))
        else "measures" -> measures
      ("group" -> JObject(groupby.zip(key).toList.map {
        case (a, v) => a -> anyJ(v) })) ~ ("measures" -> inner)
    })
  }

  /** Typed ordering for group-key tuples: numbers compare numerically
    * (the reference sorts resources by the ATTRIBUTE VALUES, so integer
    * flavors order 2 < 9 < 10, not the lexicographic '10' < '2' < '9'),
    * timestamps chronologically, nulls first, everything else as text.
    */
  private val groupValOrd: Ordering[Any] = (a: Any, b: Any) => (a, b) match {
    case (null, null) => 0
    case (null, _)    => -1
    case (_, null)    => 1
    case (x: Number, y: Number) =>
      java.lang.Double.compare(x.doubleValue, y.doubleValue)
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case (x, y) => String.valueOf(x).compareTo(String.valueOf(y))
  }
  private val groupKeyOrd: Ordering[Seq[Any]] = {
    implicit val v: Ordering[Any] = groupValOrd
    Ordering.Implicits.seqOrdering[Seq, Any]
  }

  /** Row attribute value → JSON (group keys carry the catalog's own
    * attribute types). */
  private def anyJ(v: Any): JValue = v match {
    case null                   => JNull
    case s: String              => JString(s)
    case i: Int                 => JInt(i)
    case l: Long                => JInt(l)
    case d: Double              => JDouble(d)
    case f: Float               => JDouble(f.toDouble)
    case b: Boolean             => JBool(b)
    case t: java.sql.Timestamp  => JString(iso(t))
    case d: java.math.BigDecimal => JDecimal(BigDecimal(d))
    case other                  => JString(other.toString)
  }

  private def ruleJson(r: (String, String, String)): JValue =
    ("name" -> r._1) ~ ("metric_pattern" -> r._2) ~
      ("archive_policy_name" -> r._3)

  /** `?attrs=a,b` projection over a JSON row page (rest/api.py:
    * 1219-1223 jsonify params): keep the listed attributes plus `id`;
    * unknown names simply project away (gabbits/search.yaml accepts
    * bogus attrs).
    */
  private def attrsProject(page: JValue, q: Map[String, String]): JValue =
    q.get("attrs") match {
      case Some(attrs) =>
        val keep = attrs.split(",").map(_.trim).toSet + "id"
        page match {
          case JArray(rows) => JArray(rows.map {
            case JObject(fields) => JObject(fields.filter(f => keep(f._1)))
            case other => other
          })
          case other => other
        }
      case None => page
    }

  /** `key[:dir][,key[:dir]…]` sort syntax (rest/api.py sort params;
    * repeated ?sort= keys arrive comma-joined). Directions follow the
    * reference's `asc|desc[-nullsfirst|-nullslast]` grammar; anything
    * else is a clean 400 (gabbits/pagination.yaml "invalid sort_dir").
    * Nulls placement rides Spark's defaults (asc = nulls first,
    * desc = nulls last).
    */
  private def parseSorts(s: String): Seq[(String, Boolean)] =
    s.split(",").toSeq.filter(_.nonEmpty).map { part =>
      part.split(":", 2) match {
        case Array(k) => k -> true
        case Array(k, d) => d match {
          case "asc" | "asc-nullsfirst" | "asc-nullslast"    => k -> true
          case "desc" | "desc-nullsfirst" | "desc-nullslast" => k -> false
          case other => throw new IllegalArgumentException(
            s"Invalid sort direction: $other")
        }
      }
    }

  /** DataFrame → JSON rows (REST-page sized by contract). */
  private def frameJson(df: org.apache.spark.sql.DataFrame, limit: Int): JValue =
    JArray(df.limit(limit).toJSON.collect().toList.map(JsonMethods.parse(_)))

  def dispatch(method: String, rawPath: String,
               query: Map[String, String] = Map.empty,
               body: String = "",
               creator: Option[String] = None,
               reqHeaders: Map[String, String] = Map.empty): Response =
    dispatchBytes(method, rawPath, query,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8), creator,
      reqHeaders)

  /** Byte-level entry: the wire-protocol routes (prometheus snappy+
    * protobuf) need the raw body; JSON routes decode it as UTF-8.
    * `creator` is the authenticated user (basic-auth user at the
    * transport), the reference's `pecan.request.auth_helper` value —
    * it salts non-UUID resource-id transformation and feeds the
    * enforce hook.
    */
  def dispatchBytes(method: String, rawPath: String,
                    query: Map[String, String],
                    bytes: Array[Byte],
                    creator: Option[String] = None,
                    reqHeaders: Map[String, String] = Map.empty): Response = {
    // segments are %-decoded AFTER splitting so ids containing an
    // encoded slash (metric "r1/cpu" → r1%2Fcpu) stay one segment
    val segs = rawPath.split("/").filter(_.nonEmpty).toList
      .map(java.net.URLDecoder.decode(_, java.nio.charset.StandardCharsets.UTF_8))
    def json: JValue = {
      val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      if (s.trim.isEmpty) JNothing else RestApi.parseJson(s)
    }
    // respect an outer anchor (the withRequestNow test seam); a real
    // dispatch stack sets it exactly once, at the outermost entry
    val outerAnchor = requestNow.get
    if (outerAnchor eq null) requestNow.set(System.currentTimeMillis())
    val outerRoles = requestRoles.get
    if (outerRoles eq null) requestRoles.set(
      reqHeaders.collectFirst {
        case (k, v) if k.equalsIgnoreCase("X-Roles") => v
      }.getOrElse("").split(",")
        .map(_.trim.toLowerCase).filter(_.nonEmpty).toSet)
    try route(method.toUpperCase, segs, query, () => json, bytes, creator,
      reqHeaders)
    catch {
      // the facade's typed domain errors carry their own HTTP status —
      // the ONE place the mapping lives (graft.api.GraftError)
      case e: RuntimeException with graft.api.GraftError =>
        err(e.status,
          if (e.status == 401 || e.status == 403)
            "Access was denied to this resource"
          else Option(e.getMessage).getOrElse("error"))
      case e @ (_: IllegalArgumentException | _: IllegalStateException |
                _: MappingException | _: ClassCastException |
                _: java.time.format.DateTimeParseException |
                _: com.fasterxml.jackson.core.JacksonException) =>
        err(400, Option(e.getMessage).getOrElse("bad request"))
      case e: NoSuchElementException => err(404, e.getMessage)
      case _: SecurityException =>
        err(403, "Access was denied to this resource")
    }
    finally {
      if (outerAnchor eq null) requestNow.remove()
      if (outerRoles eq null) requestRoles.remove()
    }
  }

  // ---- minimal enforce hook (rest/api.py:113; default policy.json) ----
  private def enforceAuthed(creator: Option[String]): String =
    creator.getOrElse {
      if (requireAuth)
        throw new graft.api.GraftError.Unauthenticated("unauthenticated")
      ""
    }

  private def enforceAdmin(creator: Option[String]): Unit =
    // keystone role-admin (X-Roles carries "admin") satisfies the
    // admin rule exactly as oslo policy's role:admin does; elsewhere
    // the facade's "admin" creator is the admin identity
    if (requireAuth && !roleAdmin && enforceAuthed(creator) != "admin")
      throw new graft.api.GraftError.Forbidden("admin required")

  // ---- keystone-mode READ scoping (auth_helper.py:225-270 -----------
  // get_resource_policy_filter / get_metric_policy_filter, merged into
  // every search/list as rest/api.py:1457-1466 does). Under the
  // reference's default policy a NON-admin keystone user only sees
  // resources of their own project or created by their project; an
  // admin (X-Roles carries "admin") reads unscoped. Other auth modes
  // have no project plane — identification-only, unscoped, as the
  // reference's basic helper (its policy filters key off
  // X-Project-Id, which only keystone supplies).

  /** Some(projectId) when this request's reads must be scoped:
    * keystone mode, auth enforced, and the caller is not role-admin.
    */
  private def keystoneNonAdmin(creator: Option[String],
      reqHeaders: Map[String, String]): Option[String] =
    if (!requireAuth || authMode != "keystone") None
    else {
      val roles = reqHeaders.collectFirst {
          case (k, v) if k.equalsIgnoreCase("X-Roles") => v
        }.getOrElse("").split(",").map(_.trim.toLowerCase).toSet
      // roleAdmin rides the request-scoped ThreadLocal too: nested
      // route() re-dispatches (resource→named-metric doors) don't
      // thread reqHeaders, but the outermost dispatch recorded roles
      if (roles.contains("admin") || roleAdmin) None
      else {
        // keystone identities are "user:project" (auth_helper.py:31-35)
        val who = enforceAuthed(creator)
        Some(who.split(":", 2) match {
          case Array(_, p) => p
          case _           => ""
        })
      }
    }

  /** The reference's resource policy filter
    * {"or": [{"=": {"project_id": P}}, {"like": {"creator": "%:P"}}]}
    * restricted to columns the registered catalog actually carries; a
    * catalog carrying NEITHER has unknowable ownership → the
    * reference's empty-policy-filter 403 (auth_helper.py:265-267).
    */
  private def resourcePolicyFilter(creator: Option[String],
      reqHeaders: Map[String, String]): Option[graft.catalog.Filter] =
    keystoneNonAdmin(creator, reqHeaders).map { project =>
      val cols = g.resourceColumns.toSet
      val clauses = Seq(
        if (cols.contains("project_id"))
          Some(graft.catalog.Filter.Cmp("=", "project_id", project))
        else None,
        if (cols.contains("creator"))
          Some(graft.catalog.Filter.Like("creator", "%:" + project))
        else None).flatten
      if (clauses.isEmpty)
        throw new graft.api.GraftError.Forbidden("Insufficient privileges")
      graft.catalog.Filter.Or(clauses)
    }

  /** "get metric" / "get measures" / "post measures" enforcement for
    * keystone non-admins (rest/api.py:479-499 enforce_metric under the
    * default admin_or_creator policy): the metric's recorded creator
    * must belong to the caller's project, else the reference's
    * enforce → abort(403). Callers resolve EXISTENCE first so an
    * unknown id stays 404 (lookup-before-enforce, as the reference's
    * controller construction).
    */
  private def enforceMetricScope(creator: Option[String],
      reqHeaders: Map[String, String], metricId: String): Unit =
    for (project <- keystoneNonAdmin(creator, reqHeaders))
      if (!g.metricCreatorOf(metricId).exists(_.endsWith(":" + project)))
        throw new graft.api.GraftError.Forbidden("not the metric creator")

  /** [[resourcePolicyFilter]] rendered in the STRING filter grammar,
    * for doors whose scope is a grammar filter (the aggregates search
    * form). Same clauses, same empty-clause 403.
    */
  private def resourcePolicyFilterStr(creator: Option[String],
      reqHeaders: Map[String, String]): Option[String] =
    keystoneNonAdmin(creator, reqHeaders).map { project =>
      val cols = g.resourceColumns.toSet
      val clauses = Seq(
        if (cols.contains("project_id"))
          Some(s"project_id = '${qesc(project)}'")
        else None,
        if (cols.contains("creator"))
          Some(s"creator like '%:${qesc(project)}'")
        else None).flatten
      if (clauses.isEmpty)
        throw new graft.api.GraftError.Forbidden("Insufficient privileges")
      clauses.mkString("(", " or ", ")")
    }

  /** True when keystone scoping HIDES the resolved resource from this
    * caller — the resource-scoped sub-routes (history, named metrics)
    * then answer the same anti-enumeration 404 as the single read.
    * Nonexistent resources return false: the route's own existence
    * check owns that 404 and its message.
    */
  private def resourceHidden(creator: Option[String],
      reqHeaders: Map[String, String], ridT: String): Boolean =
    keystoneNonAdmin(creator, reqHeaders).exists { project =>
      val rows = g.searchResources(s"id = '${qesc(ridT)}'").limit(1).collect()
      rows.nonEmpty && {
        val r = rows.head
        val cols = r.schema.fieldNames.toSet
        val byCreator = cols.contains("creator") &&
          Option(r.getAs[String]("creator")).exists(_.endsWith(":" + project))
        val byProject = cols.contains("project_id") &&
          Option(r.getAs[String]("project_id")).contains(project)
        !(byCreator || byProject)
      }
    }

  /** Admin-or-creator on one resource row (policy.json
    * `admin_or_creator`). A NONEXISTENT resource passes through so the
    * route 404s, matching the reference's lookup-before-enforce order.
    * A catalog with no `creator` column has unknowable ownership:
    * non-admin mutation is denied (secure default — the reference's
    * schema always records the creator).
    */
  private def enforceResourceOwner(creator: Option[String], rid: String): Unit =
    if (requireAuth) {
      val who = enforceAuthed(creator)
      if (who != "admin" && !roleAdmin) {
        val rows = g.searchResources(s"id = '${qesc(rid)}'").limit(1).collect()
        if (rows.nonEmpty) {
          val owner =
            if (!rows.head.schema.fieldNames.contains("creator")) None
            else Option(rows.head.getAs[String]("creator"))
          if (!owner.contains(who))
            throw new graft.api.GraftError.Forbidden("not the creator")
        }
      }
    }

  /** Stage a parsed wire frame `(metric_id, timestamp, value)`: create
    * missing metrics via the R9 rules (the reference's influxdb.py:
    * 119-125 / prometheus auto-create posture) and hand the frame to
    * the facade's bulk door — a write body's SERIES list is REST-page
    * bounded (collected to create metrics), but the measures
    * themselves stay a DataFrame end to end.
    */
  private def stageWire(parsed: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.functions.col
    val ids = parsed.select(col("metric_id")).distinct()
      .collect().map(_.getString(0))
    ids.filterNot(g.hasMetric).foreach(g.createMetric(_))
    g.batchAddMeasures(parsed)
  }

  /** The wire doors' get_or_create_resource_and_metrics resource side
    * (rest/api.py:398-458 via influxdb.py:229-240 / the prometheus
    * controller): ensure each wire resource exists with the route's
    * type — an existing SAME-type row passes, a different-type one is
    * the reference's 409 — creating missing ones (uuid5 id,
    * original_resource_id, creator). No-op without a registered
    * resource catalog (the facade's metric-only mode). Returns the 409
    * to short-circuit with, if any. `pairs` are wire-body bounded.
    */
  private def wireResources(resourceIds: Seq[String], tpe: String,
      creator: Option[String],
      attrsOf: String => JValue = _ => JObject(Nil)): Option[Response] = {
    if (!g.hasResourceTable) return None
    val byTid = resourceIds.distinct.map(rv =>
      graft.catalog.ResourceUuid.transform(rv, creator) -> rv).toMap
    // ONE catalog scan resolves every existing wire resource (steady
    // state: zero per-id jobs on the highest-frequency ingest door);
    // only first-contact resources pay a create each, matching the
    // reference's per-resource indexer insert
    val existing = g.searchResources(
        graft.catalog.Filter.In("id", byTid.keys.toSeq))
      .collect().map { row =>
        row.getAs[String]("id") ->
          (if (row.schema.fieldNames.contains("type"))
             Option(row.getAs[String]("type"))
           else None)
      }.toMap
    for ((tid, rtype) <- existing if rtype.exists(_ != tpe))
      return Some(Response(409, JObject(List(
        "cause" -> JString("Resource already exists"),
        "detail" -> JString(tid)))))
    for ((tid, rv) <- byTid if !existing.contains(tid))
      g.createResource(tpe, rv, RestApi.renderJson(attrsOf(rv)), creator)
    None
  }

  /** Register the wire write's metrics as the resource's NAMED metrics
    * (the other half of get_or_create_resource_and_metrics). */
  private def wireAttach(pairs: Seq[(String, String)],
                         creator: Option[String]): Unit =
    if (g.hasResourceTable)
      g.attachExistingMetrics(pairs.map { case (rv, name) =>
        (s"$rv/$name", graft.catalog.ResourceUuid.transform(rv, creator),
          name) })

  private def route(method: String, segs: List[String],
                    q: Map[String, String], body: () => JValue,
                    raw: Array[Byte],
                    creator: Option[String] = None,
                    reqHeaders: Map[String, String] = Map.empty): Response = {
    // header lookup is case-insensitive on the wire (RFC 9110)
    def header(name: String): Option[String] =
      reqHeaders.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
    // Resource ids in the URL resolve through the same ResourceUUID
    // transformation as creation, salted with the REQUESTING creator
    // (rest/api.py ResourceController) — so the external string form
    // and the internal uuid both route, per user. One divergence from
    // the reference: an EXACT raw match wins first, because this
    // facade also serves externally-registered catalogs whose ids
    // never went through the transformation (the reference's indexer
    // owns its schema, so that state can't exist there).
    val ridCache = scala.collection.mutable.Map.empty[String, String]
    def rawIdExists(id: String): Boolean =
      try !g.searchResources(s"id = '${qesc(id)}'").isEmpty
      // no resource table registered (metrics-only deployments):
      // nothing to disambiguate against — treat the raw form as valid
      catch { case _: IllegalStateException => true }
    def rid(id: String): String = ridCache.getOrElseUpdate(id, {
      val transformed =
        try Right(graft.catalog.ResourceUuid.transform(id, creator))
        catch { case e: IllegalArgumentException => Left(e) }
      transformed match {
        // already-canonical ids resolve to themselves either way —
        // skip the raw-exists probe (a catalog scan) on that hot path
        case Right(t) if t == id => id
        // raw match wins; an untransformable id ('/' etc.) that is
        // not raw-registered surfaces the transform error (400)
        case t => if (rawIdExists(id)) id else t.fold(throw _, identity)
      }
    })
    // one resource row with its named-metric map embedded — the
    // reference's resource jsonify shape shared by GET/POST/PATCH
    def resourceWithMetrics(id: String): Option[JValue] =
      frameJson(g.searchResources(s"id = '${qesc(rid(id))}'"), 2) match {
        case JArray(List(JObject(fields))) =>
          Some(JObject(fields :+ ("metrics" -> JObject(
            g.metricsForResources(Seq(rid(id)))
              .getOrElse(rid(id), Nil).toList
              .map { case (n, mid) => n -> (JString(mid): JValue) }))))
        case JArray(List(one)) => Some(one)
        case _                 => None
      }
    (method, segs) match {
      // -------------------------------------------------- root + capability
      // version document (rest/api.py:2423-2438; gabbits/base.yaml
      // asserts $.versions[0].id/status)
      case ("GET", Nil) | ("GET", List("v1")) =>
        ok("versions" -> List(
          ("status" -> "CURRENT") ~
            ("links" -> List(("rel" -> "self") ~ ("href" -> "/v1/"))) ~
            ("id" -> "v1.0") ~
            ("updated" -> "2015-03-19")))

      // liveness door (gabbits/healthcheck.yaml; the reference mounts
      // oslo's healthcheck app) — 200 with no body
      case ("GET", List("healthcheck")) => ok(JNothing)

      case ("GET", List("v1", "capabilities")) =>
        ok("aggregation_methods" -> g.capabilities.toList.sorted)

      // /v1/status (rest/api.py StatusController): backlog summary.
      // The metricd block always exists in the reference response; with
      // no coordinator it reports processors=null, statistics={}
      // (rest/api.py:2216-2219) — the daemon fleet is replaced by Spark
      // here, so that no-coordinator shape is the truthful one, and
      // clients that read the key don't crash.
      case ("GET", List("v1", "status")) =>
        val st = g.status()
        val summary: JObject = "summary" -> (
          ("metrics" -> st.size) ~ ("measures" -> st.values.sum))
        // ?details=False drops the per-metric backlog block
        // (rest/api.py:2204-2213; gabbits/base.yaml "no details")
        val storage: JValue =
          if (q.get("details").exists(_.equalsIgnoreCase("false"))) summary
          else summary ~ ("measures_to_process" -> JObject(
            st.toList.sortBy(_._1).map { case (m, n) => m -> JInt(n) }))
        // lock_leaks: store-lock files left by over-stale batch holds
        // (MetricStore.withStoreLock release path) — a nonzero count
        // means lockStaleMs is below the longest batch
        ok(("storage" -> storage) ~
          ("metricd" -> (
            ("processors" -> JNull) ~
            ("statistics" -> JObject(List("lock_leaks" ->
              JInt(BigInt(graft.ingest.MetricStore.lockLeaks.get()))))))))

      // -------------------------------------------------- archive policies
      case ("POST", List("v1", "archive_policy")) =>
        enforceAdmin(creator)
        val p = parsePolicy(body())
        g.createPolicy(p)
        created(policyJson(p))

      case ("GET", List("v1", "archive_policy")) =>
        ok(JArray(g.listPolicies.toList.map(policyJson)))

      case ("GET", List("v1", "archive_policy", name)) =>
        g.policies.get(name) match {
          case Some(p) => ok(policyJson(p))
          case None    => err(404, s"no policy $name")
        }

      case ("DELETE", List("v1", "archive_policy", name)) =>
        enforceAdmin(creator)
        if (!g.policies.contains(name)) err(404, s"no policy $name")
        else { g.deletePolicy(name); noContent }

      case ("PATCH", List("v1", "archive_policy", name)) =>
        enforceAdmin(creator)
        val b = body()
        val items = (b \ "definition").asInstanceOf[JArray].arr.map { d =>
          ArchivePolicyItem(
            Granularity.parse(jstr(d \ "granularity")),
            d \ "points" match { case JNothing => None; case n => Some(jnum(n).toLong) },
            d \ "timespan" match {
              case JNothing => None; case n => Some((jnum(n) * 1e9).toLong)
            }).completed
        }
        g.updatePolicy(name, items)
        ok(policyJson(g.policies(name)))

      // rules are NAMED entities routed by name; the pattern is a
      // matching attribute (rest/api.py ArchivePolicyRule{s,}Controller,
      // gabbits/archive-rule.yaml). Name defaults to the pattern for
      // bodies that omit it (a lenient superset of the required field).
      case ("POST", List("v1", "archive_policy_rule")) =>
        enforceAdmin(creator)
        val b = body()
        val pat = jstr(b \ "metric_pattern")
        val name = b \ "name" match { case JString(n) => n; case _ => pat }
        g.createPolicyRule(name, pat, jstr(b \ "archive_policy_name"))
        created(ruleJson((name, pat, jstr(b \ "archive_policy_name"))))

      case ("GET", List("v1", "archive_policy_rule")) =>
        ok(JArray(g.listPolicyRules.toList.map(ruleJson)))

      case ("GET", List("v1", "archive_policy_rule", name)) =>
        g.listPolicyRules.find(_._1 == name) match {
          case Some(r) => ok(ruleJson(r))
          case None => err(404, s"no archive policy rule $name")
        }

      // rename — name is the only mutable field; a missing name in the
      // body is a 400 (gabbits/archive-rule.yaml "missing name")
      case ("PATCH", List("v1", "archive_policy_rule", name)) =>
        enforceAdmin(creator)
        val newName = jstr(body() \ "name")
        g.renamePolicyRule(name, newName)
        ok(ruleJson(g.listPolicyRules.find(_._1 == newName).get))

      case ("DELETE", List("v1", "archive_policy_rule", name)) =>
        enforceAdmin(creator)
        g.deletePolicyRule(name); noContent

      // -------------------------------------------------- metrics
      case ("GET", List("v1", "metric")) =>
        // attribute filters + sort + keyset marker (rest/api.py
        // MetricsController.get_all; gabbits/metric-list.yaml:
        // ?name= ?unit= ?creator= ?id= ?archive_policy_name=
        // &sort=name:desc&limit=&marker=)
        val names = g.metricNames // one catalog collect; standalone
        def nameOf(id: String) = names.getOrElse(id, id)
        var rows: Seq[(String, String)] = g.listMetrics // (id, policy)
        for (v <- q.get("id")) rows = rows.filter(_._1 == v)
        for (v <- q.get("name")) rows = rows.filter(r => nameOf(r._1) == v)
        for (v <- q.get("unit"))
          rows = rows.filter(r => g.metricUnitOf(r._1).contains(v))
        for (v <- q.get("creator"))
          rows = rows.filter(r => g.metricCreatorOf(r._1).contains(v))
        for (v <- q.get("archive_policy_name")) rows = rows.filter(_._2 == v)
        // keystone read scoping: non-admin lists only metrics their
        // project created — get_metric_policy_filter's
        // {"like": {"creator": "%:" + project}} (auth_helper.py:273-300)
        for (project <- keystoneNonAdmin(creator, reqHeaders))
          rows = rows.filter(r =>
            g.metricCreatorOf(r._1).exists(_.endsWith(":" + project)))
        val sorts = q.get("sort").map(parseSorts).getOrElse(Seq("id" -> true))
        // validate keys UP FRONT — a lazy check inside Ordering.compare
        // never fires on a 0/1-row page and the 400 contract must not
        // depend on store contents
        val validKeys =
          Set("id", "name", "unit", "creator", "archive_policy_name")
        sorts.collectFirst { case (k, _) if !validKeys(k) => k }.foreach(
          k => throw new IllegalArgumentException(s"Invalid sort key: $k"))
        def keyOf(r: (String, String), k: String): String = k match {
          case "id" => r._1
          case "name" => nameOf(r._1)
          case "unit" => g.metricUnitOf(r._1).getOrElse("")
          case "creator" => g.metricCreatorOf(r._1).getOrElse("")
          case "archive_policy_name" => r._2
          case other => throw new IllegalArgumentException(
            s"Invalid sort key: $other")
        }
        val ord = sorts.foldRight[Ordering[(String, String)]](
            Ordering.by(_._1)) { case ((k, asc), tie) =>
          val by = Ordering.by[(String, String), String](keyOf(_, k))
          val main = if (asc) by else by.reverse
          (a, b) => { val c = main.compare(a, b)
            if (c != 0) c else tie.compare(a, b) }
        }
        val sorted = rows.sorted(ord)
        val after = q.get("marker") match {
          case Some(m) =>
            val i = sorted.indexWhere(_._1 == m)
            if (i < 0) throw new IllegalArgumentException(s"Invalid marker: $m")
            sorted.drop(i + 1)
          case None => sorted
        }
        val limit = q.get("limit").map(_.toInt).getOrElse(100)
        val page = after.take(limit).toList
        // the next-page link must carry the SAME filters and sort —
        // a bare marker link would page a different, unfiltered listing
        val hdrs =
          if (page.size >= limit && page.nonEmpty) {
            val qs = ((q - "marker") ++ Map("limit" -> limit.toString,
                "marker" -> page.last._1))
              .toSeq.sortBy(_._1).map { case (k, v) =>
                k + "=" + java.net.URLEncoder.encode(v, "UTF-8")
              }.mkString("&")
            Map("Link" -> s"</v1/metric?$qs>; rel=\"next\"")
          } else Map.empty[String, String]
        // list rows carry the NESTED archive_policy (the reference's
        // list endpoint loads the relation, so Metric.jsonify emits
        // the full policy — sqlalchemy_base.py:138-141;
        // resample-calendar.yaml asserts $[0].archive_policy.name)
        ok(JArray(page.map { case (id, pol) =>
          ("id" -> id) ~
            ("name" -> names.get(id)) ~
            ("unit" -> g.metricUnitOf(id)) ~
            ("creator" -> g.metricCreatorOf(id)) ~
            ("archive_policy" -> policyJson(g.policies(pol)))
        })).copy(headers = hdrs)

      case ("GET", List("v1", "metric", id)) =>
        val pol = g.metricPolicyName(id) // 404s unknown ids first
        enforceMetricScope(creator, reqHeaders, id)
        ok(("id" -> id) ~
          ("name" -> g.metricNameOf(id)) ~
          ("unit" -> g.metricUnitOf(id)) ~
          ("creator" -> g.metricCreatorOf(id)) ~
          ("archive_policy" -> policyJson(g.policies(pol))))

      case ("POST", List("v1", "metric")) =>
        enforceAuthed(creator)
        val b = body()
        val unit = b \ "unit" match {
          case JString(u) => Some(u); case _ => None
        }
        val polOpt = b \ "archive_policy_name" match {
          case JString(pol) => Some(pol); case _ => None
        }
        b \ "resource_id" match {
          // resource-attached form (MetricSchema's resource_id,
          // rest/api.py:596+622-632; gabbits/
          // create-metric-with-resource-id.yaml): the id transforms
          // under the creator, `name` is mandatory, and a duplicate
          // (resource, name) is a 400 here — unlike the named-metric
          // door's 409 (abort(400, NamedMetricAlreadyExists) at :666
          // vs :792)
          case JString(extId) =>
            val name = b \ "name" match {
              case JString(n) => n
              case _ => throw new IllegalArgumentException(
                "Attribute value error: name — Name cannot be null " +
                  "if resource_id is not null")
            }
            val ridT = rid(extId)
            val attached =
              try g.attachMetricsSchema(ridT, Map(name -> Right(polOpt)),
                unit.map(name -> _).toMap)
              catch {
                case _: graft.api.GraftError.Conflict =>
                  throw new IllegalArgumentException(
                    s"Named metric $name already exists")
              }
            val mid = attached.head._2
            creator.foreach(g.setMetricCreator(mid, _))
            created(("id" -> mid) ~ ("name" -> name) ~
              ("resource_id" -> ridT) ~ ("unit" -> unit) ~
              ("creator" -> creator) ~
              ("archive_policy_name" -> g.metricPolicyName(mid)))
          case _ =>
            // id defaults to name; with NEITHER given the server
            // assigns a uuid4, as MetricsController.post
            // (rest/api.py:683-704 indexer.create_metric(uuid.uuid4()))
            val id = (b \ "id" match {
              case JNothing => b \ "name"; case v => v }) match {
              case JNothing => java.util.UUID.randomUUID().toString
              case v        => jstr(v)
            }
            polOpt match {
              case Some(pol) => g.createMetric(id, pol, unit)
              case None      => g.createMetricRuled(id, unit) // R9 rules
            }
            creator.foreach(g.setMetricCreator(id, _))
            // the create response carries the FLAT policy name
            // (Metric.jsonify with archive_policy unloaded,
            // sqlalchemy_base.py:138-141; metric-list.yaml asserts
            // $.archive_policy_name on every POST)
            created(("id" -> id) ~ ("unit" -> unit) ~
              ("creator" -> creator) ~
              ("archive_policy_name" -> g.metricPolicyName(id)))
        }

      case ("DELETE", List("v1", "metric", id)) =>
        enforceAuthed(creator)
        if (g.hasMetric(id)) enforceMetricScope(creator, reqHeaders, id)
        g.deleteMetric(id); noContent

      // POST measures — 202, deferred processing (rest/api.py:488-494).
      // The timestamp FORMAT is decided by the first element and
      // applied to the whole batch (utils.to_timestamps:86-123): epoch
      // numbers, ISO strings, or relative timespans — mixing formats
      // is the reference's 400 (gabbits/metric-timestamp-format.yaml).
      case ("POST", List("v1", "metric", id, "measures")) =>
        enforceAuthed(creator)
        if (g.hasMetric(id)) enforceMetricScope(creator, reqHeaders, id)
        g.addMeasures(id, parseMeasureList(body().asInstanceOf[JArray].arr))
        accepted

      case ("GET", List("v1", "metric", id, "measures")) =>
        if (g.hasMetric(id)) enforceMetricScope(creator, reqHeaders, id)
        val resample = q.get("resample").map(Granularity.parse)
        val rows = g.getMeasures(id,
          method = q.getOrElse("aggregation", "mean"),
          granS = q.get("granularity").map(parseGranS),
          from = q.get("start").map(parseTs(_).toString),
          to = q.get("stop").map(parseTs(_).toString),
          resample = resample,
          refreshFirst = q.get("refresh").contains("true"))
        // a resampled read reports the RESAMPLED granularity in each
        // triple (rest/api.py:552: results carry the post-resample
        // aggregation) — 60.0 for fixed (metric.yaml), the calendar
        // token STRING for Y/H/Q/M/W (resample-calendar.yaml)
        ok(resample match {
          case None => measuresTriples(rows)
          case Some(r) =>
            val gj: JValue = r match {
              case graft.model.Granularity.Fixed(ns) => JDouble(ns / 1e9)
              case graft.model.Granularity.Calendar(u) => JString(u)
            }
            JArray(rows.toList.map { case (t, _, v) =>
              JArray(List(JString(iso(t)), gj, JDouble(v)))
            })
        })

      // -------------------------------------------------- batch ingest
      case ("POST", List("v1", "batch", "resources", "metrics", "measures")) =>
        g.batchAddMeasures(RestApi.renderJson(body()),
          createMetrics = q.get("create_metrics").contains("true"),
          nowMs = nowMs)
        accepted

      // POST /v1/batch/metrics/measures (rest/api.py:1694-1723): body
      // maps metric ID → measure list; unknown ids 400 with the list.
      case ("POST", List("v1", "batch", "metrics", "measures")) =>
        val entries = body() match {
          case JObject(fields) => fields
          case other => throw new IllegalArgumentException(s"bad batch body: $other")
        }
        val unknown = entries.map(_._1).filterNot(g.hasMetric)
        if (unknown.nonEmpty)
          return err(400, s"unknown metrics: ${unknown.sorted.mkString(", ")}")
        // keystone: batch writes enforce the same per-metric
        // creator-project rule as the single measures door
        entries.map(_._1).foreach(enforceMetricScope(creator, reqHeaders, _))
        // same fixed-format-per-list contract as the single door — the
        // reference runs every batch list through utils.to_timestamps
        // (rest/api.py:1694-1723), so a mixed list 400s here too
        entries.foreach { case (id, ms) =>
          g.addMeasures(id, parseMeasureList(ms.asInstanceOf[JArray].arr))
        }
        accepted

      // -------------------------------------------------- search
      // Body is EITHER {"filter": "<string grammar>"} (the reference's
      // ?filter= / x-www-form form) or the raw attribute-filter JSON
      // tree ({"and": [{"=": {...}}, ...]}, rest/api.py:1381-1437).
      case ("POST", List("v1", "search", "resource", tpe)) =>
        // ?filter= carries the string grammar (gabbits/search.yaml
        // "search in_ query string"); otherwise the body is either
        // {"filter": "<string>"} or the raw attribute-filter tree
        val parsed0 = q.get("filter") match {
          case Some(s) => graft.catalog.FilterParser.parse(s)
          case None => body() match {
            case JObject(List(("filter", JString(s)))) =>
              graft.catalog.FilterParser.parse(s)
            case JNothing => // empty body matches everything, as the reference
              graft.catalog.Filter.Like("id", "%")
            case tree => parseFilterTree(tree)
          }
        }
        // keystone read scoping: AND-merge the policy filter into the
        // request's tree BEFORE compile (rest/api.py:1457-1466)
        val parsed = resourcePolicyFilter(creator, reqHeaders) match {
          case Some(pf) => graft.catalog.Filter.And(Seq(pf, parsed0))
          case None     => parsed0
        }
        // ?history=true searches across every revision
        // (rest/api.py:1453-1475)
        // the <type> segment scopes non-generic routes (typed catalogs)
        val searched =
          if (q.get("history").contains("true"))
            g.searchResourcesHistory(parsed) // history frame scoping below
          else g.searchResources(parsed, tpe)
        val scoped =
          if (q.get("history").contains("true") && tpe != "generic" &&
              searched.columns.contains("type"))
            searched.filter(org.apache.spark.sql.functions.col("type") === tpe)
          else searched
        // ?sort/?marker/?limit keyset-paginate the search page exactly
        // like the listing route (rest/api.py:1453-1481;
        // gabbits/search.yaml "search with paging"); ?attrs projects.
        // The HISTORY frame is multi-revision per id, so `id` alone is
        // not a unique key — append the revision tiebreaker exactly as
        // listResourcesHistory does, or revisions straddling a page
        // boundary would silently drop
        val baseSorts = q.get("sort").map(parseSorts)
          .getOrElse(Seq("id" -> true))
        val sorts2 =
          if (q.get("history").contains("true") &&
              scoped.columns.contains("revision") &&
              !baseSorts.exists(_._1 == "revision"))
            baseSorts :+ ("revision" -> true)
          else baseSorts
        val paged = graft.catalog.Pagination(scoped, sorts2,
          "id", q.get("marker"),
          q.get("limit").map(_.toInt).getOrElse(1000))
        ok(attrsProject(frameJson(paged, Int.MaxValue), q))

      case ("POST", List("v1", "search", "metric")) =>
        val ids = q.getOrElse("metric_id",
          throw new IllegalArgumentException("metric_id required"))
          .split(",").toSeq
        // keystone: value search reads measures — scope known ids to
        // the caller's project (unknown ids keep their existing path)
        ids.filter(g.hasMetric)
          .foreach(enforceMetricScope(creator, reqHeaders, _))
        val method = q.getOrElse("aggregation", "mean")
        // start/stop validate with the reference's exact 400 text
        // (rest/api.py:1668-1678), BEFORE the query body parses
        val fromTs = q.get("start").map(s =>
          try parseTs(s) catch { case _: Throwable =>
            return err(400, "Invalid value for start") })
        val toTs = q.get("stop").map(s =>
          try parseTs(s) catch { case _: Throwable =>
            return err(400, "Invalid value for stop") })
        // repeated ?granularity= params arrive comma-joined from the
        // server (arg_to_list surface); each parses as a timespan
        val grans = q.get("granularity").map(_.split(",").toSeq
          .map(parseGranS))
        // a granularity the metric's policy never stored is the
        // reference's storage.AggregationDoesNotExist → a STRUCTURED
        // 400 (search-metric.yaml pins description.cause/detail)
        for (gs <- grans; m <- ids) {
          val polGrans = g.policies(g.metricPolicyName(m)).definition
            .map(_.granularity).collect {
              case graft.model.Granularity.Fixed(ns) =>
                ns / 1_000_000_000L
            }
          for (missing <- gs.find(!polGrans.contains(_)))
            return Response(400, ("code" -> 400) ~ ("description" ->
              (("cause" -> "Aggregation does not exist") ~
                ("detail" -> (("granularity" -> missing) ~
                  ("aggregation_method" -> method))))))
        }
        val df = g.searchMetricValuesMulti(ids, method, grans,
          parsePred(body()), fromTs, toTs)
        ok(frameJson(df.orderBy("metric_id", "bucket"), 10000))

      // -------------------------------------------------- aggregates DSL
      case ("POST", List("v1", "aggregates")) =>
        val b = body()
        // operations arrive as the string DSL OR the nested-list form
        // (OperationsSchema accepts both; the gabbits use
        // `["metric", ["<id>", "mean"], ...]` extensively) — the list
        // form renders to the equivalent s-expression for one parser
        def opsToSexpr(v: JValue): String = v match {
          case JArray(items) => items.map(opsToSexpr).mkString("(", " ", ")")
          case JString(s)    => s
          case JInt(n)       => n.toString
          case JLong(n)      => n.toString
          case JDouble(d)    => d.toString
          case JDecimal(d)   => d.toString
          case JBool(x)      => x.toString
          case other => throw new IllegalArgumentException(
            s"bad operations node: $other")
        }
        val operations = b \ "operations" match {
          case JString(s) => s
          case a: JArray  => opsToSexpr(a)
          case other => throw new IllegalArgumentException(
            s"operations must be a string or list: $other")
        }
        // start/stop arrive as query params (rest/aggregates/api.py:515
        // post(self, start=None, stop=None, ...))
        val from = q.get("start").map(parseTs)
        val to = q.get("stop").map(parseTs)
        val overlap = (b \ "needed_overlap" match {
          case JNothing => None; case o => Some(jnum(o))
        }).orElse(q.get("needed_overlap").map(_.toDouble))
        // the REST layer defaults fill="dropna" when NEITHER fill nor
        // needed_overlap is given (rest/aggregates/api.py:521-522) —
        // evaluation stays NaN-skipping (dropna never touches the
        // grid), only the output drop engages
        val fill = (b \ "fill" match {
          case JString(s) => Some(s); case _ => None
        }).orElse(q.get("fill"))
          .orElse(if (overlap.isEmpty) Some("dropna") else None)
        // groupby rides the query string in the reference
        // (post(self, ..., groupby=None); repeated keys, gabbits/
        // aggregates-with-resources.yaml) — body list also accepted
        val groupby = (b \ "groupby" match {
          case JArray(a) => a.map(jstr); case _ => Nil
        }) ++ q.get("groupby").map(_.split(",").toSeq
          .filter(_.nonEmpty)).getOrElse(Nil)
        val search = b \ "search" match {
          case JString(s) => Some(s); case _ => None
        }
        // resource-scoped / grouped form (rest/aggregates/api.py:372-493):
        // metric leaves resolve by NAME against the searched resources,
        // one series per group via GroupedOps
        if (search.isDefined || groupby.nonEmpty) {
          val granOpt: Option[Long] = b \ "granularity" match {
            case JNothing => q.get("granularity").map(parseGranS)
            case JString(sp) => Some(parseGranS(sp))
            case n => Some(granFromNum(jnum(n)))
          }
          val fltRaw = search.getOrElse(throw new IllegalArgumentException(
            "search required with groupby"))
          // the body's resource_type scopes the search (FetchController
          // .post's resource_type="generic" default — an instance-typed
          // query must never read other types' resources,
          // gabbits/aggregates-with-resources.yaml "groupby on
          // flavor_id" posts resource_type: instance)
          val rtype = b \ "resource_type" match {
            case JString(t) => t; case _ => "generic"
          }
          val flt0 =
            if (rtype != "generic" && g.resourceColumns.contains("type"))
              s"type = '${qesc(rtype)}' and ($fltRaw)"
            else fltRaw
          // keystone read scoping: the measure plane must not leak
          // other projects' resources through the aggregates search —
          // the reference merges the policy filter here too
          // (rest/aggregates/api.py:545-556). Rendered in the string
          // grammar because this door's scope IS a grammar filter.
          val flt = resourcePolicyFilterStr(creator, reqHeaders) match {
            case Some(pf) => s"$pf and ($flt0)"
            case None     => flt0
          }
          // no granularity → EVERY granularity common to the resolved
          // metrics, coarse→fine (gabbits/aggregates-with-resources
          // .yaml "batch get" cases; processor P1 planning)
          lazy val grans: Seq[Long] = granOpt.map(Seq(_)).getOrElse(
            g.commonGranularitiesByResource(operations, flt))
          // evaluate `per` at each granularity and union with gran_s;
          // single-granularity requests skip the extra column.
          // `resolve` supplies the no-granularity plan — the history
          // door resolves against the REVISION table, not the current
          // attributes (a resource whose zone has since changed must
          // still plan from its historical scope)
          def overGransWith(resolve: => Seq[Long])(
              per: Long => org.apache.spark.sql.DataFrame)
              : org.apache.spark.sql.DataFrame = granOpt match {
            case Some(gr) => per(gr)
            case None => resolve.map(gr => per(gr).withColumn("gran_s",
              org.apache.spark.sql.functions.lit(gr)))
              .reduce(_ unionByName _)
          }
          def overGrans(per: Long => org.apache.spark.sql.DataFrame)
              : org.apache.spark.sql.DataFrame = overGransWith(grans)(per)
          val det = q.get("details").contains("true") ||
            b \ "details" == JBool(true)
          // groupby attributes are deduped and sorted (api.py:557
          // groupby = sorted(set(api.arg_to_list(groupby))))
          val grpSorted = groupby.distinct.sorted
          // G3/G4 use_history=true (rest/aggregates/api.py:571-577):
          // the full Grouper surface — a groupby attribute LIST and an
          // arbitrary aggregated operations tree, evaluated per
          // resource and weighted by the attribute-revision windows.
          // use_history WITHOUT groupby is silently ignored, exactly
          // as the reference (`if not groupby` short-circuits before
          // the use_history check, api.py:561-573)
          val useHistory = q.get("use_history").contains("true") ||
            b \ "use_history" == JBool(true)
          if (useHistory && grpSorted.nonEmpty) {
            // no granularity → PER-RESOURCE common granularities: the
            // Grouper runs one _get_measures_by_name per revision slice
            // (rest/aggregates/api.py:383-417), so each resource plans
            // from its own metrics' policies
            val df = granOpt match {
              case Some(gr) => g.groupByAggregatesHistoryOps(
                operations, gr, flt, grpSorted, fill, from, to)
              case None =>
                val byRes =
                  g.commonGranularitiesPerResourceHistory(operations, flt)
                byRes.flatMap(_._2).distinct.sorted.reverse.map { gr =>
                  g.groupByAggregatesHistoryOps(operations, gr, flt,
                    grpSorted, fill, from, to,
                    onlyResources = Some(byRes.filter(_._2.contains(gr))
                      .map(_._1)))
                    .withColumn("gran_s",
                      org.apache.spark.sql.functions.lit(gr))
                }.reduce(_ unionByName _)
            }
            return ok(groupedMeasuresJson(df, grpSorted, granOpt, operations,
              scope = if (det) g.resolvedResourceScopeHistory(operations,
                flt, grpSorted) else Nil,
              groupsFromScope = false, details = det))
          }
          // search WITHOUT groupby + a non-aggregated tree → the
          // per-RESOURCE fan-out (_get_measures_by_name →
          // processor.py:246-272 r_output): {measures: {resource:
          // {metric: {agg: [...]}}}}. Aggregated trees (and grouped
          // queries) keep the scoped/grouped series form.
          if (grpSorted.isEmpty && !g.aggregatesIsAggregated(operations)) {
            val m = resourceMeasuresJson(
              overGrans(gr => g.aggregatesByResource(operations, gr, flt,
                fill, overlap, from, to)), granOpt,
              seed = g.resolvedResourceMetricRefs(operations, flt))
            // details=true attaches every matched resource
            // (rest/aggregates/api.py:708-709 response["references"] =
            // resources) — from the RESOLVED scope, not the emitted
            // measure keys: a matched resource whose series produced
            // zero output rows still appears. Ids here; full rows ride
            // the resource routes.
            return ok(
              if (!det) "measures" -> m
              else ("measures" -> m) ~ ("references" ->
                JArray(g.resolvedResourceScope(operations, flt).map(_._2)
                  .distinct.sorted.toList.map(id => (("id" -> id): JValue)))))
          }
          if (grpSorted.isEmpty) {
            // search-scoped AGGREGATED tree without groupby
            // (api.py:562-569 → _get_measures_by_name): ONE
            // {"aggregated": [...]} block, coarse→fine across the
            // common granularities when none was requested;
            // details=true attaches the resolved resource scope
            val rows = grans.flatMap { gr =>
              g.shaped(g.groupByAggregatesOps(operations, gr, flt, Nil,
                fill, from, to), gr)
            }
            val m: JValue = "aggregated" -> measuresTriples(rows)
            return ok(
              if (!det) "measures" -> m
              else ("measures" -> m) ~ ("references" ->
                JArray(g.resolvedResourceScope(operations, flt).map(_._2)
                  .distinct.sorted.toList.map(id => (("id" -> id): JValue)))))
          }
          // no granularity → PER-GROUP common granularities: each group
          // is its own _get_measures_by_name call (rest/aggregates/
          // api.py:649-672), so heterogeneous archive policies across
          // groups evaluate each group at its own set
          val df = granOpt match {
            case Some(gr) => g.groupByAggregatesOps(operations, gr, flt,
              grpSorted, fill, from, to)
            case None =>
              val byGroup =
                g.commonGranularitiesByGroup(operations, flt, grpSorted)
              byGroup.flatMap(_._2).distinct.sorted.reverse.map { gr =>
                g.groupByAggregatesOps(operations, gr, flt, grpSorted,
                  fill, from, to, onlyGroups =
                    Some(byGroup.filter(_._2.contains(gr)).map(_._1)))
                  .withColumn("gran_s",
                    org.apache.spark.sql.functions.lit(gr))
              }.reduce(_ unionByName _)
          }
          // the group list comes from the RESOLVED scope: a group whose
          // metrics produced no measures still appears (empty list)
          return ok(groupedMeasuresJson(df, grpSorted, granOpt, operations,
            scope = g.resolvedResourceScope(operations, flt, grpSorted),
            groupsFromScope = true, details = det))
        }
        // keystone: the metric-ID form reads measures for explicit
        // ids — every known referenced metric must belong to the
        // caller's project (the reference's per-metric enforce when
        // AggregatesController resolves ids); unknown ids keep their
        // existing 404 path
        for (_ <- keystoneNonAdmin(creator, reqHeaders))
          g.aggregatesReferences(operations).map(_._1).distinct
            .filter(g.hasMetric)
            .foreach(enforceMetricScope(creator, reqHeaders, _))
        // ?details=true (query or body) attaches the RESOLVED metric
        // references next to the measures (rest/aggregates/api.py:
        // 639-646 response["references"] = metrics)
        val details = q.get("details").contains("true") ||
          b \ "details" == JBool(true)
        def withRefs(measures: JValue): JValue =
          if (!details) "measures" -> measures
          else {
            // ONE bulk catalog collect — per-id metricNameOf would run
            // a Spark job per reference
            val names = g.metricNames
            ("measures" -> measures) ~
              ("references" -> g.aggregatesReferences(operations)
                .map(_._1).distinct.sorted.map(id =>
                  ("id" -> id) ~
                    ("name" -> names.get(id)) ~
                    ("unit" -> g.metricUnitOf(id)) ~
                    ("archive_policy" ->
                      policyJson(g.policies(g.metricPolicyName(id))))))
          }
        // Output SHAPE follows the reference's is_aggregated flag
        // (processor.py:229-272): an `aggregate`-collapsed (or
        // series⊕series) tree emits ONE "aggregated" list; any other
        // tree fans out per metric reference, {metric: {agg: [...]}}
        // (rest/aggregates/api.py + gabbits/aggregates-with-metric-ids
        // .yaml "get aggregates, no references").
        val aggregated = g.aggregatesIsAggregated(operations)
        (b \ "granularity" match {
          case JNothing => q.get("granularity").map(parseGranS)
          case JString(sp) => Some(parseGranS(sp)) // "1h" timespan form
          case n => Some(granFromNum(jnum(n)))
        }) match {
          case None => // P1: every common granularity, coarse→fine
            if (aggregated) {
              val df = g.aggregatesAuto(operations, fill, from, to)
              ok(withRefs("aggregated" ->
                frameJson(df.orderBy("gran_s", "bucket"), 100000)))
            } else
              ok(withRefs(refsMeasuresJson(
                g.aggregatesRefsAuto(operations, fill, from, to), None)))
          case Some(granS) =>
            if (aggregated) {
              val rows = g.shaped(
                g.aggregates(operations, granS, fill, overlap, from, to),
                granS)
              ok(withRefs("aggregated" -> measuresTriples(rows)))
            } else
              ok(withRefs(refsMeasuresJson(
                g.aggregatesRefs(operations, granS, fill, overlap, from, to),
                Some(granS))))
        }

      // -------------------------------------------------- resources
      // keyset-paginated listing: ?sort=zone:desc,id:asc&limit=&marker=
      // A full page carries `Link: <...>; rel="next"` with the keyset
      // marker, as the reference (rest/api.py:1474-1481) — clients walk
      // pages without re-deriving the marker.
      case ("GET", List("v1", "resource", tpe)) =>
        val sorts = q.get("sort").map(parseSorts)
          .getOrElse(Seq("id" -> true))
        val limit = q.get("limit").map(_.toInt).getOrElse(100)
        val history = q.get("history").contains("true")
        // keystone read scoping (rest/api.py:1224 list_resources with
        // the auth helper's policy filter)
        val pf = resourcePolicyFilter(creator, reqHeaders)
        val page0 = frameJson(
          if (history)
            g.listResourcesHistory(sorts, q.get("marker"), limit, tpe, pf)
          else g.listResources(sorts, q.get("marker"), limit, tpe, pf),
          Int.MaxValue)
        // ?details=true embeds metrics per resource; ?attrs=a,b projects
        // the listed attributes (rest/api.py:1219-1223 jsonify params)
        val page1 =
          if (!q.get("details").contains("true")) page0
          else page0 match {
            case JArray(rows) =>
              val ids = rows.collect { case r if (r \ "id").isInstanceOf[JString] =>
                jstr(r \ "id") }
              val byRes = g.metricsForResources(ids.distinct)
              JArray(rows.map {
                case JObject(fields) =>
                  val rid0 = fields.collectFirst {
                    case ("id", JString(v)) => v }.getOrElse("")
                  JObject(fields :+ ("metrics" -> JObject(
                    byRes.getOrElse(rid0, Nil).toList.map { case (n, mid) =>
                      n -> (JString(mid): JValue) })))
                case other => other
              })
            case other => other
          }
        val page = attrsProject(page1, q)
        // full page → Link rel="next"; history markers are id@revision
        // (rest/api.py:1238-1241). Markers derive from the PRE-attrs
        // rows: the projection strips `revision`, and a degraded
        // `id@-1` marker would re-serve or skip revision rows.
        val nextLink = page0 match {
          case JArray(rows) if rows.size >= limit && rows.nonEmpty =>
            (rows.last \ "id") match {
              case JString(last) =>
                val m =
                  if (history) last + "@" + (rows.last \ "revision" match {
                    case JInt(r) => r.toString; case JLong(r) => r.toString
                    case _ => "-1"
                  })
                  else last
                val qs = (q - "marker") + ("marker" -> m) +
                  ("limit" -> limit.toString)
                val enc = qs.toSeq.sortBy(_._1).map { case (k, v) =>
                  k + "=" + java.net.URLEncoder.encode(v, "UTF-8")
                }.mkString("&")
                Map("Link" -> s"""</v1/resource/$tpe?$enc>; rel="next"""")
              case _ => Map.empty[String, String]
            }
          case _ => Map.empty[String, String]
        }
        ok(page).copy(headers = nextLink)

      case ("GET", List("v1", "resource", _, id)) =>
        resourceWithMetrics(id) match {
          case Some(one) =>
            // keystone scoping on a single read: out-of-project rows
            // answer 404, not 403 — the reference hides existence from
            // enumeration (auth_helper.py:195-200 aborts NoSuchResource)
            keystoneNonAdmin(creator, reqHeaders) match {
              case Some(project) =>
                val byCreator = one \ "creator" match {
                  case JString(s) => s.endsWith(":" + project)
                  case _          => false
                }
                val byProject = one \ "project_id" match {
                  case JString(s) => s == project
                  case _          => false
                }
                if (byCreator || byProject) ok(one)
                else err(404, s"no resource $id")
              case None => ok(one)
            }
          case None      => err(404, s"no resource $id")
        }

      // POST /v1/resource/<type>: create one resource row against the
      // registered catalog schema; duplicate id → 409, an unknown body
      // key → 400 (schema_for() PREVENT_EXTRA), and an inline
      // `metrics` map creates/attaches named metrics atomically with
      // the resource (ResourceSchema, rest/api.py:1060-1069). Non-UUID
      // ids transform (uuid5 under the creator) inside the facade.
      case ("POST", List("v1", "resource", tpe)) =>
        enforceAuthed(creator)
        val fields = body() match {
          case JObject(fs) => fs
          case other => throw new IllegalArgumentException(s"bad body: $other")
        }
        rejectExtraKeys(fields, resourceInputKeys(g) + "id")
        val id = jstr(JObject(fields) \ "id")
        val metrics = (JObject(fields) \ "metrics") match {
          case JNothing => Map.empty[String, Either[String, Option[String]]]
          case mv       => parseMetricsSchema(mv)
        }
        // an externally-registered row keyed by this RAW id is a
        // conflict too: creation always stores the transformed id, and
        // a raw twin would shadow it at every lookup (rid prefers the
        // exact raw match) — a silent hidden duplicate
        if (graft.catalog.ResourceUuid.transform(id, creator) != id &&
            rawIdExists(id))
          return err(409, s"resource $id already exists")
        g.createResourceWithMetrics(tpe, id,
          RestApi.renderJson(JObject(fields.filterNot(_._1 == "metrics"))),
          metrics, creator)
        created(resourceWithMetrics(id).getOrElse(JObject(fields)))

      // PATCH /v1/resource/<type>/<id>: update attributes — the
      // pre-patch row end-dates into the history table only when a
      // value actually changes — and/or REPLACE the named-metric set
      // via an inline `metrics` map. Unknown keys (including `id`) are
      // the schema's extra-keys 400.
      case ("PATCH", List("v1", "resource", _, id)) =>
        enforceResourceOwner(creator, rid(id))
        val fields = body() match {
          case JObject(fs) => fs
          case JNothing    => Nil // "{}" existence check
          case other => throw new IllegalArgumentException(s"bad patch: $other")
        }
        rejectExtraKeys(fields, resourceInputKeys(g))
        val metricsJv = fields.collectFirst { case ("metrics", v) => v }
        val updates = fields.filterNot(_._1 == "metrics").toMap.map {
          case (k, JString(s))  => k -> (s: Any)
          case (k, JBool(v))    => k -> (v: Any)
          case (k, JNull)       => k -> (null: Any)
          case (k, n)           => k -> (jnum(n): Any)
        }
        // metrics validate BEFORE any attribute lands (the reference's
        // update_resource is one transaction — a bad metrics map must
        // not leave the attributes half-patched)
        val parsedMetrics = metricsJv.map(parseMetricsSchema)
        parsedMetrics.foreach(g.validateMetricsSchema(rid(id), _))
        g.patchResource(rid(id), updates,
          q.get("now").map(_.toLong).getOrElse(
            java.time.Instant.now.getEpochSecond))
        parsedMetrics.foreach(g.replaceResourceMetrics(rid(id), _))
        resourceWithMetrics(id) match {
          case Some(one) => ok(one)
          case None      => err(404, s"no resource $id")
        }

      // DELETE /v1/resource/<type>: delete-by-query — body is the
      // filter tree / {"filter": str} or ?filter=; an EMPTY query is
      // refused (rest/api.py:1249-1278: "it will delete entire
      // database"). Returns {"deleted": n}.
      case ("DELETE", List("v1", "resource", tpe)) =>
        enforceAdmin(creator) // policy.json "delete resources": admin rule
        val parsed = body() match {
          case JObject(List(("filter", JString(s)))) =>
            Some(graft.catalog.FilterParser.parse(s))
          case JNothing =>
            q.get("filter").map(graft.catalog.FilterParser.parse)
          case tree => Some(parseFilterTree(tree))
        }
        parsed match {
          case None => err(400, "caution: the query can not be empty, " +
            "or it will delete entire database")
          case Some(f) => ok("deleted" -> g.deleteResources(f, tpe))
        }

      case ("DELETE", List("v1", "resource", _, id)) =>
        enforceResourceOwner(creator, rid(id))
        g.deleteResource(rid(id)); noContent

      // GET /v1/resource/<type>/<id>/metric/<name>/measures: resolve
      // the resource's NAMED metric via the catalog, then read as the
      // plain metric-measures route.
      case ("GET", List("v1", "resource", _, id, "metric", name, "measures")) =>
        route("GET", List("v1", "metric", g.resourceMetricId(rid(id), name),
          "measures"), q, body, raw, creator, reqHeaders)

      // POST .../metric/<name>/measures: ingest against the NAMED
      // metric (NamedMetricController route in the reference).
      case ("POST", List("v1", "resource", _, id, "metric", name, "measures")) =>
        route("POST", List("v1", "metric", g.resourceMetricId(rid(id), name),
          "measures"), q, body, raw, creator, reqHeaders)

      // GET /v1/resource/<type>/<id>/metric/<name>: ONE named metric,
      // in the same shape as GET /v1/metric/<id>
      // (NamedMetricController lookup).
      case ("GET", List("v1", "resource", _, id, "metric", name)) =>
        route("GET", List("v1", "metric", g.resourceMetricId(rid(id), name)),
          q, body, raw, creator, reqHeaders)

      // GET /v1/resource/<type>/<id>/metric: the resource's named
      // metrics (NamedMetricController.get_all) — unknown resource is
      // 404 (rest/api.py:799-830), same check as the POST below.
      case ("GET", List("v1", "resource", _, id, "metric")) =>
        if (g.searchResources(s"id = '${qesc(rid(id))}'").isEmpty ||
            resourceHidden(creator, reqHeaders, rid(id)))
          err(404, s"no resource $id")
        else ok(JArray(g.resourceMetrics(rid(id)).map { case (n, mid) =>
          JObject(List("name" -> JString(n), "id" -> JString(mid)))
        }.toList))

      // POST /v1/resource/<type>/<id>/metric: append named metrics.
      // MetricsSchema (rest/api.py:732-746): a STRING value is an
      // EXISTING metric id to attach; an object value creates a new
      // metric ({"archive_policy_name": p} or {} for the R9 rules).
      // Unknown resource → 404, name collision → 409, unknown
      // existing-metric id → 400.
      case ("POST", List("v1", "resource", _, id, "metric")) =>
        if (g.searchResources(s"id = '${qesc(rid(id))}'").isEmpty ||
            resourceHidden(creator, reqHeaders, rid(id)))
          err(404, s"no resource $id")
        else {
          val metrics = parseMetricsSchema(body())
          created(JArray(g.attachMetricsSchema(rid(id), metrics).map {
            case (n, mid) =>
              JObject(List("name" -> JString(n), "id" -> JString(mid)))
          }.toList))
        }

      // GET /v1/resource/<type>/<id>/history: the revision rows —
      // unknown resource is 404 (ResourceHistoryController).
      case ("GET", List("v1", "resource", _, id, "history")) =>
        if (g.searchResources(s"id = '${qesc(rid(id))}'").isEmpty ||
            resourceHidden(creator, reqHeaders, rid(id)))
          err(404, s"no resource $id")
        else ok(frameJson(g.resourceHistory(rid(id)), Int.MaxValue))

      // -------------------------------------------------- resource types
      case ("POST", List("v1", "resource_type")) =>
        enforceAdmin(creator)
        val b = body()
        val attrs = b \ "attributes" match {
          case JObject(fields) => fields.map { case (n, spec) =>
            graft.catalog.ResourceTypes.AttrSpec(n, parseAttrType(spec),
              required = spec \ "required" == JBool(true))
          }
          case JNothing => Nil
          case other => throw new IllegalArgumentException(s"bad attributes: $other")
        }
        val rt = graft.catalog.ResourceTypes.ResourceType(jstr(b \ "name"), attrs)
        g.createResourceType(rt)
        created(resourceTypeJson(rt))

      case ("GET", List("v1", "resource_type")) =>
        ok(JArray(g.listResourceTypes.map(resourceTypeJson).toList))

      // resources index page: {type: url} (rest/api.py
      // ResourcesController index; gabbits/base.yaml "Get list of
      // resource type and URL")
      case ("GET", List("v1", "resource")) =>
        // "generic" is the reference's built-in base type — always
        // listed even before any custom type is registered
        ok(JObject((g.listResourceTypes.map(_.name).toSet + "generic")
          .toList.sorted.map(t =>
            t -> (JString(s"/v1/resource/$t"): JValue))))

      case ("GET", List("v1", "resource_type", name)) =>
        ok(resourceTypeJson(g.resourceType(name)))

      case ("DELETE", List("v1", "resource_type", name)) =>
        enforceAdmin(creator)
        g.deleteResourceType(name); noContent

      // PATCH /v1/resource_type/<name>: RFC-6902-style attribute ops
      // (rest/api.py ResourceTypesController.patch) — add/remove on
      // /attributes/<attr>, with the add's backfill under
      // options.fill; applied through the facade's (newType, backfill)
      // ALTER to both the current and history tables.
      case ("PATCH", List("v1", "resource_type", name)) =>
        enforceAdmin(creator)
        val ops = body().asInstanceOf[JArray].arr
        val adds = scala.collection.mutable.ArrayBuffer
          .empty[(graft.catalog.ResourceTypes.AttrSpec, Option[Any])]
        val dels = scala.collection.mutable.ArrayBuffer.empty[String]
        ops.foreach { op =>
          val attr = jstr(op \ "path").stripPrefix("/attributes/")
          jstr(op \ "op") match {
            case "add" =>
              val spec = op \ "value"
              val fill: Option[Any] = spec \ "options" \ "fill" match {
                case JNothing => None
                case JString(s) => Some(s)
                case JBool(v) => Some(v)
                case n => Some(jnum(n))
              }
              adds += ((graft.catalog.ResourceTypes.AttrSpec(attr,
                parseAttrType(spec),
                required = spec \ "required" == JBool(true)), fill))
            case "remove" => dels += attr
            case other => throw new IllegalArgumentException(
              s"unsupported patch op $other")
          }
        }
        g.patchResourceType(name, add = adds.toSeq, del = dels.toSeq)
        ok(resourceTypeJson(g.resourceType(name)))

      // Legacy cross-metric aggregation (rest/api.py
      // AggregationController, deprecated in the reference but still
      // routed): ?metric=id1,id2&aggregation=mean[&granularity=s]
      // [&start=][&stop=] → flat measure triples via the aggregates
      // DSL's (aggregate agg (metric ...)) form.
      case ("GET" | "POST", List("v1", "aggregation", "metric")) =>
        // POST carries the id list as the JSON body (MetricIDsSchema,
        // rest/api.py:2133-2150 `post_metric = get_metric`); GET as
        // repeated ?metric= keys (comma-joined at the transport)
        val ids = (if (method == "POST") body() match {
            case JArray(items) => items.map {
              case JString(s) => s
              case other => throw new IllegalArgumentException(
                s"Invalid input: $other is not a metric id")
            }
            case other => throw new IllegalArgumentException(
              s"Invalid input: expected a metric id list, got $other")
          }
          else q.getOrElse("metric",
            throw new IllegalArgumentException("metric required"))
            .split(",").toSeq.filter(_.nonEmpty)).distinct
        ids.foreach(g.metricPolicyName) // unknown id → 404, as the lookup
        ids.foreach(enforceMetricScope(creator, reqHeaders, _)) // keystone
        val agg = q.getOrElse("aggregation", "mean")
        val s = g.spark; import s.implicits._
        // one anonymous group holding the whole id list — the reference
        // route IS one get_cross_metric_measures_from_objs call
        // (rest/api.py:2137-2163): reaggregation defaults to the fetch
        // aggregation, no granularity = every common one coarse→fine,
        // needed_overlap defaults 100, single id short-circuits to the
        // raw read
        val df = g.legacyCrossAggregation(ids.toDF("metric_id"), Nil,
          agg, q.getOrElse("reaggregation", agg),
          q.get("granularity").map(parseGranS),
          q.get("needed_overlap").map(v =>
            v.toDoubleOption.getOrElse(graft.api.GraftError.badInput(
              "Must be a number"))).getOrElse(100.0),
          q.get("fill"), q.get("resample").map(parseGranS),
          q.get("start").map(parseTs), q.get("stop").map(parseTs),
          refreshFirst = q.get("refresh").contains("true"))
        // null cells (all-NaN buckets under fill=null) are absent
        // points, not 0.0 — an unchecked getAs[Double] unboxes null
        // to 0 (same isNullAt skip as groupedMeasuresJson)
        val rows = df.orderBy(
            org.apache.spark.sql.functions.col("gran_s").desc,
            org.apache.spark.sql.functions.col("bucket"))
          .limit(100000).collect().toSeq
          .filter(r => !r.isNullAt(r.fieldIndex("value")))
          .map { r =>
            (r.getAs[java.sql.Timestamp]("bucket"),
              r.getAs[Long]("gran_s"), r.getAs[Double]("value"))
          }
        ok(measuresTriples(rows))

      // Legacy resource-scoped aggregation (rest/api.py
      // AggregationController.resource): POST with the resource search
      // body; aggregates the NAMED metric across matched resources.
      case ("POST", List("v1", "aggregation", "resource", _, "metric", name)) =>
        // search scope: ?filter= carries the string DSL; otherwise the
        // POST body IS the attribute filter tree (ResourceSearchSchema;
        // `{"filter": "..."}` and empty-body = match-all also accepted,
        // gabbits/resource-aggregation.yaml)
        val scopeFilter0: graft.catalog.Filter = q.get("filter") match {
          case Some(f) => graft.catalog.FilterParser.parse(f)
          case None => body() match {
            case JNothing | JObject(Nil) => graft.catalog.Filter.Like("id", "%")
            case JObject(List(("filter", JString(f)))) =>
              graft.catalog.FilterParser.parse(f)
            case o => parseFilterTree(o)
          }
        }
        // keystone read scoping on the legacy cross-metric door: the
        // policy filter AND-merges into the resource scope exactly as
        // on the search routes
        val scope = g.searchResources(
          resourcePolicyFilter(creator, reqHeaders) match {
            case Some(pf) => graft.catalog.Filter.And(Seq(pf, scopeFilter0))
            case None     => scopeFilter0
          })
        val agg = q.getOrElse("aggregation", "mean")
        // repeated ?groupby= keys arrive comma-joined from the
        // transport; the reference sorts the unique attribute list
        // (rest/api.py:1898 `sorted(set(arg_to_list(groupby)))`)
        val grpBy = q.get("groupby").map(_.split(",").toSeq
          .filter(_.nonEmpty)).getOrElse(Nil).distinct.sorted
        val df = g.legacyResourceAggregation(name, agg,
          q.get("granularity").map(parseGranS), scope, grpBy,
          // reaggregation defaults to the FETCH aggregation
          // (rest/api.py:2021-2022), not to mean
          acrossAgg = q.getOrElse("reaggregation", agg),
          from = q.get("start").map(parseTs),
          to = q.get("stop").map(parseTs),
          resampleS = q.get("resample").map(parseGranS),
          fill = q.get("fill"),
          refreshFirst = q.get("refresh").contains("true"),
          neededOverlap = q.get("needed_overlap").map(v =>
            v.toDoubleOption.getOrElse(graft.api.GraftError.badInput(
              "Must be a number"))).getOrElse(100.0))
        // coarse→fine within each group (rest/api.py cross-measures
        // page order)
        val rows = df.orderBy((grpBy.map(
            org.apache.spark.sql.functions.col) ++ Seq(
            org.apache.spark.sql.functions.col("gran_s").desc,
            org.apache.spark.sql.functions.col("bucket"))): _*)
          .limit(100000).collect()
        // null value cells skip (see the metric-list route above)
        def triplesOf(rs: Seq[org.apache.spark.sql.Row]): JValue =
          measuresTriples(rs
            .filter(r => !r.isNullAt(r.fieldIndex("value")))
            .map { r =>
              (r.getAs[java.sql.Timestamp]("bucket"), r.getAs[Long]("gran_s"),
                r.getAs[Double]("value"))
            })
        if (grpBy.isEmpty) ok(triplesOf(rows.toSeq))
        else {
          // legacy grouped shape: [{measures: [...], group: {...}}] —
          // EVERY group of the resolved scope appears, in sorted-key
          // order; a group with no matched metric carries an empty
          // measures list (rest/api.py:1925-1937 loops the sorted
          // resources and get_cross_metric_measures returns [] for an
          // empty metric list). The universe is catalog metadata —
          // driver-bounded by contract.
          val universe = scope
            .select(grpBy.map(org.apache.spark.sql.functions.col): _*)
            .distinct().collect()
            .map(r => grpBy.map(a => r.getAs[Any](a))).toSeq
            .sorted(groupKeyOrd) // typed: numeric attrs order numerically
          val byKey = rows.toSeq.groupBy(r => grpBy.map(a => r.getAs[Any](a)))
          ok(JArray(universe.toList.map { key =>
            ("measures" -> triplesOf(byKey.getOrElse(key, Nil))) ~
              ("group" -> JObject(grpBy.zip(key).toList.map {
                case (a, v) => a -> anyJ(v) }))
          }))
        }

      // -------------------------------------------------- wire protocols
      // InfluxDB compatibility handshake (rest/influxdb.py:106-139):
      // real clients (telegraf) ping and issue CREATE DATABASE before
      // the first write, so without these two routes a stock client
      // fails before any data flows. ping answers with the version
      // header; query understands exactly the reference's grammar —
      // `CREATE DATABASE <name>[;]`, name bare-word or double-quoted
      // with backslash escapes — creating <name> as a resource type
      // (already-exists passes, influxdb.py:133-136); any other q is
      // 501 with the reference's error triple.
      case ("GET" | "HEAD", List("v1", "influxdb", "ping")) =>
        noContent.copy(headers =
          Map("X-Influxdb-Version" -> "Graft influxdb-compat"))

      case ("POST", List("v1", "influxdb", "query")) =>
        // q arrives as a query param or a form-encoded body field
        val qParam = q.get("q").orElse {
          new String(raw, java.nio.charset.StandardCharsets.UTF_8)
            .split("&").toSeq.collectFirst {
              case kv if kv.startsWith("q=") =>
                java.net.URLDecoder.decode(kv.substring(2), "UTF-8")
            }
        }
        qParam match {
          case None => ok(JNothing) // reference: absent q is a no-op 200
          case Some(query) =>
            val Create = ("(?is)\\s*create\\s+database\\s+" +
              "(?:\"((?:[^\"\\\\]|\\\\.)+)\"|([A-Za-z_][A-Za-z0-9_]*))" +
              "\\s*;?\\s*").r
            query match {
              case Create(quoted, bare) =>
                // the reference enforces "create resource type" here
                // (influxdb.py:130) — same gate as the direct route
                enforceAdmin(creator)
                val name =
                  if (quoted != null) quoted.replaceAll("(?s)\\\\(.)", "$1")
                  else bare
                try g.createResourceType(
                  graft.catalog.ResourceTypes.ResourceType(name, Nil))
                catch { case _: graft.api.GraftError.Conflict => () }
                noContent
              case _ => Response(501, JObject(
                "cause" -> JString("Not implemented error"),
                "detail" -> JString("q"),
                "reason" -> JString("Query not implemented")))
            }
        }

      // InfluxDB line-protocol write (the reference's rest/influxdb.py):
      // text body of lines; metrics auto-create via the R9 rules; 204.
      case ("POST", List("v1", "influxdb", "write")) =>
        val s = g.spark
        import s.implicits._
        import org.apache.spark.sql.functions._
        val lines = new String(raw, java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").toSeq.toDF("line")
        // which tag becomes the resource id is client-selectable
        // (influxdb.py:158-160 X-Gnocchi-InfluxDB-Tag-Resource-ID)
        val rtag = header("X-Gnocchi-InfluxDB-Tag-Resource-ID")
          .getOrElse("host")
        val parsed = graft.ingest.LineProtocol.parse(lines, resourceTag = rtag)
        // any line missing the selected resource tag aborts the whole
        // write 400, as the reference (influxdb.py:198-208) — a typo'd
        // X-Gnocchi-InfluxDB-Tag-Resource-ID must fail loudly, not
        // silently rebucket every line. Request bodies are bounded, so
        // the extra pass is a per-request constant, not a scale cost.
        if (parsed.filter(parsed("resource_id").isNull).limit(1).count() > 0)
          return Response(400, JObject(
            "cause" -> JString("Value error"),
            "detail" -> JString("key"),
            "reason" -> JString(s"Unable to find key `$rtag' in tags")))
        // get_or_create resources of the db's type + named-metric
        // attachments (influxdb.py:229-240; ?db= defaults "influxdb");
        // the wire body is request-bounded, so the pair collect is O(body)
        val influxPairs = parsed.select(col("resource_id"), col("metric"))
          .distinct().collect().map(r => (r.getString(0), r.getString(1)))
          .toSeq
        val db = q.getOrElse("db", "influxdb")
        for (conflict <- wireResources(influxPairs.map(_._1), db, creator))
          return conflict
        stageWire(parsed
          .select(
            concat(col("resource_id"), lit("/"), col("metric")).as("metric_id"),
            coalesce(timestamp_micros((col("ts_ns") / 1000).cast("long")),
              current_timestamp()).as("timestamp"),
            col("value")))
        wireAttach(influxPairs, creator)
        noContent

      // Prometheus remote-write (rest/api.py:2337-2371): snappy-framed
      // protobuf body through the real codec; 202-accepted.
      case ("POST", List("v1", "prometheus", "write")) =>
        val s = g.spark
        import s.implicits._
        import org.apache.spark.sql.functions._
        val bodies = Seq(raw).toDF("body")
        val promMeasures =
          graft.ingest.RemoteWrite.remoteWriteToMeasures(bodies)
        // get_or_create "prometheus"-typed resources carrying the
        // job/instance attributes split back out of "job@instance"
        // (rest/api.py:2319-2361) + named-metric attachments
        val promPairs = promMeasures.select(col("resource_id"), col("metric"))
          .distinct().collect().map(r => (r.getString(0), r.getString(1)))
          .toSeq
        for (conflict <- wireResources(promPairs.map(_._1), "prometheus",
            creator, attrsOf = rv => {
              val Array(job, instance) = rv.split("@", 2) match {
                case a if a.length == 2 => a
                case a => Array(a(0), "none")
              }
              JObject(List("job" -> JString(job),
                "instance" -> JString(instance)))
            }))
          return conflict
        stageWire(promMeasures
          .select(
            concat(col("resource_id"), lit("/"), col("metric")).as("metric_id"),
            col("timestamp"), col("value")))
        wireAttach(promPairs, creator)
        accepted

      // a wrong METHOD on a known collection route is 405, not 404
      // (gabbits/archive.yaml "wrong method" — pecan RestController)
      case (_, List("v1", "archive_policy"))
         | (_, List("v1", "archive_policy_rule"))
         | (_, List("v1", "metric"))
         | (_, List("v1", "resource", _))
         | (_, List("v1", "resource_type")) =>
        err(405, s"method $method not allowed")

      case _ => err(404, s"no route for $method /${segs.mkString("/")}")
    }
  }
}

package graft.api

import org.json4s.JValue
import org.json4s.jackson.JsonMethods

/** The engine's JSON codec: a DEDICATED Jackson mapper (a configured
  * copy of json4s's, modules included) that accepts and emits bare
  * NaN/±Infinity literals, matching the reference's Python `json`
  * module behavior — a measure POSTed as `{"value": NaN}` must ingest
  * as float64 NaN everywhere (single-metric door, batch doors, wire
  * relays). Kept OFF the process-global json4s mapper so other json4s
  * consumers in the JVM see stock behavior.
  */
object JsonCodec {
  val mapper: com.fasterxml.jackson.databind.ObjectMapper = {
    import com.fasterxml.jackson.core.json.{JsonReadFeature, JsonWriteFeature}
    JsonMethods.mapper.copy()
      .enable(JsonReadFeature.ALLOW_NON_NUMERIC_NUMBERS.mappedFeature())
      .disable(JsonWriteFeature.WRITE_NAN_AS_STRINGS.mappedFeature())
  }

  def parse(s: String): JValue = mapper.readValue(s, classOf[JValue])

  def render(v: JValue): String = mapper.writeValueAsString(v)
}

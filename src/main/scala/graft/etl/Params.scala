package graft.etl

/** Parameter resolution with fallback chain (reference `widget_utils
  * .py:7-51`: Databricks widget → explicit arg → environment variable →
  * default). Widgets don't exist in OSS Spark, so the chain here is
  * explicit args → JVM system property → environment variable → default —
  * same precedence contract, host-agnostic.
  */
object Params {
  def resolve(name: String, explicit: Map[String, String] = Map.empty,
      default: Option[String] = None): Option[String] =
    explicit.get(name)
      .orElse(sys.props.get(s"graft.$name"))
      .orElse(sys.env.get(s"GRAFT_${name.toUpperCase}"))
      .orElse(default)

  def require(name: String, explicit: Map[String, String] = Map.empty): String =
    resolve(name, explicit).getOrElse(
      throw new IllegalArgumentException(
        s"parameter '$name' not provided (args/-Dgraft.$name/GRAFT_${name.toUpperCase})"))
}

package graft.kg

/** Custom entity/edge type registry — the reference's Pydantic model
  * registry (`graphiti_hf/custom_types.py:25-367`) as case classes + pure
  * validation functions. The reference's eval-string rules
  * (`entity_extractor.py:455-478`) are deliberately NOT reproduced
  * (arbitrary-code validation; SURVEY.md §2.13).
  */
object CustomTypes {

  final case class AttributeSpec(
      name: String,
      required: Boolean = false,
      validate: String => Boolean = _ => true,
      // declarative regex twin of `validate` — the part that survives
      // export/import round-trips (functions don't serialize)
      pattern: Option[String] = None,
  )

  final case class EntityTypeSpec(
      name: String,
      surfacePattern: Option[String] = None, // regex the surface must match
      attributes: Seq[AttributeSpec] = Nil,
  )

  final case class Violation(typeName: String, field: String, reason: String)

  /** Built-in registry mirroring the reference's PersonEntity /
    * OrganizationEntity / LocationEntity shapes (`custom_types.py:212-367`).
    */
  val builtin: Map[String, EntityTypeSpec] = Seq(
    EntityTypeSpec("Person", surfacePattern = Some("^[A-Z].*")),
    EntityTypeSpec(
      "Organization",
      attributes = Seq(AttributeSpec("industry"), AttributeSpec("founded", pattern = Some("\\d{4}"))),
    ),
    EntityTypeSpec("Place"),
    EntityTypeSpec("Entity"),
  ).map(t => t.name -> t).toMap

  def register(registry: Map[String, EntityTypeSpec], spec: EntityTypeSpec): Map[String, EntityTypeSpec] =
    registry + (spec.name -> spec)

  /** Validate one entity instance against the registry. */
  def validate(
      registry: Map[String, EntityTypeSpec],
      typeName: String,
      surface: String,
      attributes: Map[String, String],
  ): Seq[Violation] =
    registry.get(typeName) match {
      case None => Seq(Violation(typeName, "", "unknown entity type"))
      case Some(spec) =>
        val surfaceV = spec.surfacePattern
          .filterNot(p => surface.matches(p))
          .map(p => Violation(typeName, "surface", s"does not match $p"))
          .toSeq
        val attrV = spec.attributes.flatMap { a =>
          attributes.get(a.name) match {
            case None if a.required => Some(Violation(typeName, a.name, "missing required attribute"))
            case Some(v) if !a.validate(v) || !a.pattern.forall(v.matches) =>
              Some(Violation(typeName, a.name, s"invalid value '$v'"))
            case _ => None
          }
        }
        surfaceV ++ attrV
    }

  // ------------------------------------------------------------------
  // Export / import — the reference's export_custom_types /
  // import_custom_types JSON round-trip (huggingface_driver.py:3225-3284).
  // Only the declarative schema serializes (patterns, required flags);
  // function validators are process-local, like the reference's skipped
  // eval-string rules.
  // ------------------------------------------------------------------

  def exportJson(registry: Map[String, EntityTypeSpec]): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def attrJ(a: AttributeSpec): JValue = JObject(
      "name" -> JString(a.name),
      "required" -> JBool(a.required),
      "pattern" -> a.pattern.map(JString(_): JValue).getOrElse(JNull),
    )
    val types = JObject(registry.toSeq.sortBy(_._1).map { case (name, spec) =>
      name -> (JObject(
        "surface_pattern" -> spec.surfacePattern.map(JString(_): JValue).getOrElse(JNull),
        "attributes" -> JArray(spec.attributes.map(attrJ).toList),
      ): JValue)
    }.toList)
    JsonMethods.pretty(JsonMethods.render(JObject("entity_types" -> types)))
  }

  def importJson(json: String): Map[String, EntityTypeSpec] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val parsed = JsonMethods.parse(json)
    (parsed \ "entity_types") match {
      case JObject(fields) =>
        fields.map { case (name, v) =>
          val surface = (v \ "surface_pattern") match {
            case JString(s) => Some(s)
            case _ => None
          }
          val attrs = (v \ "attributes") match {
            case JArray(items) =>
              items.map { a =>
                AttributeSpec(
                  name = (a \ "name") match { case JString(s) => s; case _ => "" },
                  required = (a \ "required") match { case JBool(b) => b; case _ => false },
                  pattern = (a \ "pattern") match { case JString(s) => Some(s); case _ => None },
                )
              }
            case _ => Nil
          }
          name -> EntityTypeSpec(name, surface, attrs)
        }.toMap
      case _ => Map.empty
    }
  }
}

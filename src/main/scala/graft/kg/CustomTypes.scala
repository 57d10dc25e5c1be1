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
      attributes = Seq(AttributeSpec("industry"), AttributeSpec("founded", validate = _.matches("\\d{4}"))),
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
            case Some(v) if !a.validate(v) => Some(Violation(typeName, a.name, s"invalid value '$v'"))
            case _ => None
          }
        }
        surfaceV ++ attrV
    }
}

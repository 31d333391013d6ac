package graft.catalog

import scala.collection.mutable

/** Dataset access metadata — the reference's ACL surface as a pure
  * registry (SURVEY.md §1.1 scopes it to "registry metadata, no runtime
  * behavior"; Spark has no dataset-level grants to enforce).
  *
  * Mirrors /root/reference/cmd/bq_create_view/main.go:
  *   - syncDataset (main.go:132-181): first touch of a dataset seeds the
  *     default access entries (projectOwners OWNER, projectWriters
  *     WRITER, projectReaders READER) plus a WRITER entry for the
  *     deploying user; a later sync with a new user appends exactly one
  *     WRITER entry, and an already-present user is a no-op.
  *   - syncDatasetAccess (main.go:183-223): for every table a view
  *     references, the dataset CONTAINING the referenced table gets an
  *     authorized-view entry for the view — skipped when view and target
  *     live in the same dataset ("Access entries to the same project and
  *     dataset are unnecessary (and an error)"), and idempotent when the
  *     entry already exists.
  *   - the ".acl.json" document shape (/root/reference/acl/
  *     private.acl.json:1-13): `{"access": [{"role": …,
  *     "specialGroup"|"userByEmail"|…: …}]}`.
  */
final case class AccessEntry(role: String, entityType: String,
    entity: String)

object AccessEntry {

  /** Default entries a freshly-created dataset receives
    * (main.go:150-160).
    */
  val datasetDefaults: Seq[AccessEntry] = Seq(
    AccessEntry("OWNER", "specialGroup", "projectOwners"),
    AccessEntry("WRITER", "specialGroup", "projectWriters"),
    AccessEntry("READER", "specialGroup", "projectReaders"))

  /** Authorized-view entry — role is unused for view access
    * (main.go:207: "Role & Entity fields are not used for view access").
    */
  def view(qualifiedView: String): AccessEntry =
    AccessEntry("", "view", qualifiedView)

  /** Parse the reference's ".acl.json" document shape. Jackson is on
    * the Spark classpath; the shape is one `access` array whose objects
    * carry `role` plus exactly one entity-typed key.
    */
  def parseAclJson(json: String): Seq[AccessEntry] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val access = root.get("access")
    if (access == null) Seq.empty
    else {
      val out = mutable.ArrayBuffer[AccessEntry]()
      access.forEach { e =>
        val role = Option(e.get("role")).map(_.asText).getOrElse("")
        e.fieldNames.forEachRemaining { f =>
          if (f != "role") out += AccessEntry(role, f, e.get(f).asText)
        }
      }
      out.toSeq
    }
  }
}

/** In-memory dataset-ACL registry; one entry list per dataset name,
  * insertion-ordered like the BigQuery access array the reference
  * appends to.
  */
class AclRegistry {

  private val acls =
    mutable.LinkedHashMap[String, mutable.ArrayBuffer[AccessEntry]]()

  /** Dataset of a (possibly) qualified table/view name: the prefix
    * before the last dot, or "default" for bare names.
    */
  def datasetOf(name: String): String = {
    val i = name.lastIndexOf('.')
    if (i < 0) "default" else name.substring(0, i)
  }

  /** main.go:132-181 — create-with-defaults or append the user WRITER
    * entry; both idempotent. `extra` seeds additional declared entries
    * (the ".acl.json" use case) on first creation only.
    */
  def syncDataset(dataset: String, user: String = "",
      extra: Seq[AccessEntry] = Nil): Unit = {
    val entries = acls.getOrElseUpdate(dataset, {
      val seed = mutable.ArrayBuffer[AccessEntry]()
      seed ++= AccessEntry.datasetDefaults
      seed ++= extra
      seed
    })
    if (user.nonEmpty &&
        !entries.exists(e => e.entityType == "userByEmail" &&
          e.entity == user))
      entries += AccessEntry("WRITER", "userByEmail", user)
  }

  /** main.go:183-223 — grant `qualifiedView` access to the dataset that
    * contains `targetTable`. Same-dataset grants are skipped; repeat
    * grants are no-ops. The target dataset must already be registered
    * (the reference reads its metadata and fails on absence).
    */
  def syncViewAccess(qualifiedView: String, targetTable: String): Unit = {
    val viewDs = datasetOf(qualifiedView)
    val targetDs = datasetOf(targetTable)
    if (viewDs == targetDs) return
    require(acls.contains(targetDs),
      s"dataset $targetDs not registered (deploy order violated?)")
    val entries = acls(targetDs)
    val entry = AccessEntry.view(qualifiedView)
    if (!entries.contains(entry)) entries += entry
  }

  /** Current access list of a dataset (empty if never synced). */
  def accessOf(dataset: String): Seq[AccessEntry] =
    acls.get(dataset).map(_.toSeq).getOrElse(Seq.empty)

  /** All registered datasets, in first-touch order. */
  def datasets: Seq[String] = acls.keys.toSeq
}

package graft.channel

/** T7 — the reference's FULL read-preference surface
  * (src/main/scala/mongo/package.scala:24-54): a mode enum
  * (Primary/Secondary/Nearest), a `preferred` flag, and a list of tag sets
  * that narrow which replicas may serve the read. The reference maps the
  * combination onto the Mongo driver's native `ReadPreference` factories
  * and rejects the one combination the driver has no factory for — plain
  * `primary` with tag sets (package.scala:53 `sys.error`).
  *
  * Spark translation: there are no replicas behind a parquet scan or the
  * embedded store, so routing is METADATA — but the surface is typed and
  * validated exactly like the reference's, rendered to the canonical
  * driver-mode string (`secondaryPreferred[dc=east,rack=r1;dc=west]`) that
  * the connector records store-side and a real multi-replica connector
  * would route by. Validation is fail-fast at build, before any job is
  * planned (the channel's AnalysisException-shaped contract).
  */
object ReadMode extends Enumeration {
  val Primary, Secondary, Nearest = Value
}

/** One tag set: an ordered list of (name, value) requirements a replica
  * must all satisfy (the reference's `com.mongodb.TagSet`). Rendered
  * `name=value,name=value`. */
final case class ReplicaTagSet(tags: List[(String, String)]) {
  require(tags.nonEmpty, "a tag set must contain at least one tag")
  tags.foreach { case (k, v) =>
    require(k.nonEmpty, "tag name must be non-empty")
    require(!k.exists(c => c == '=' || c == ',' || c == ';' || c == '[' || c == ']'),
      s"tag name '$k' contains a reserved character (=,;[])")
    require(!v.exists(c => c == '=' || c == ',' || c == ';' || c == '[' || c == ']'),
      s"tag value '$v' contains a reserved character (=,;[])")
  }
  def render: String = tags.map { case (k, v) => s"$k=$v" }.mkString(",")
}

final case class ReadPreference(
    mode: ReadMode.Value,
    preferred: Boolean = false,
    tagSets: List[ReplicaTagSet] = Nil) {
  // the reference's unsupported combination (mongo/package.scala:53):
  // plain primary reads exactly one node, so tag sets cannot apply
  require(!(mode == ReadMode.Primary && !preferred && tagSets.nonEmpty),
    "primary does not accept tag sets (use primaryPreferred)")
  // nearest has no preferred variant in the driver surface; the reference
  // pattern-matches `Nearest` with `_` for the flag — normalize instead of
  // silently ignoring
  require(!(mode == ReadMode.Nearest && preferred),
    "nearest has no preferred variant")

  /** Builder-style flag setter (reference `preferred(b)`,
    * mongo/package.scala:35). */
  def preferred(b: Boolean): ReadPreference = copy(preferred = b)

  /** Append tag sets (reference `tags(ts)`, mongo/package.scala:37). */
  def tags(ts: List[ReplicaTagSet]): ReadPreference =
    copy(tagSets = tagSets ++ ts)

  /** Canonical driver-mode string the connector records and a real
    * connector would route by. */
  def render: String = {
    val m = mode match {
      case ReadMode.Primary   => if (preferred) "primaryPreferred" else "primary"
      case ReadMode.Secondary => if (preferred) "secondaryPreferred" else "secondary"
      case ReadMode.Nearest   => "nearest"
    }
    if (tagSets.isEmpty) m
    else m + "[" + tagSets.map(_.render).mkString(";") + "]"
  }
}

object ReadPreference {
  val Primary: ReadPreference = ReadPreference(ReadMode.Primary)
  val PrimaryPreferred: ReadPreference =
    ReadPreference(ReadMode.Primary, preferred = true)
  val Secondary: ReadPreference = ReadPreference(ReadMode.Secondary)
  val SecondaryPreferred: ReadPreference =
    ReadPreference(ReadMode.Secondary, preferred = true)
  val Nearest: ReadPreference = ReadPreference(ReadMode.Nearest)

  /** Parse the canonical string form (mode, optionally
    * `[tagset;tagset]` where a tagset is `k=v,k=v`). Inverse of
    * [[ReadPreference.render]]; throws `IllegalArgumentException` on an
    * unknown mode, malformed tag syntax, or an invalid combination — the
    * fail-fast the reference gets from its enum + match. */
  def parse(s: String): ReadPreference = {
    val trimmed = s.trim
    val (modePart, tagPart) = trimmed.indexOf('[') match {
      case -1 => (trimmed, None)
      case i =>
        require(trimmed.endsWith("]"),
          s"readPreference '$s': unterminated tag-set list")
        (trimmed.substring(0, i), Some(trimmed.substring(i + 1, trimmed.length - 1)))
    }
    val (mode, pref) = modePart match {
      case "primary"            => (ReadMode.Primary, false)
      case "primaryPreferred"   => (ReadMode.Primary, true)
      case "secondary"          => (ReadMode.Secondary, false)
      case "secondaryPreferred" => (ReadMode.Secondary, true)
      case "nearest"            => (ReadMode.Nearest, false)
      case other => throw new IllegalArgumentException(
        s"readPreference '$other' is not one of primary, primaryPreferred, " +
          "secondary, secondaryPreferred, nearest")
    }
    val sets = tagPart.toList.flatMap(_.split(";", -1).toList).map { ts =>
      require(ts.nonEmpty, s"readPreference '$s': empty tag set")
      ReplicaTagSet(ts.split(",", -1).toList.map { kv =>
        kv.split("=", -1) match {
          case Array(k, v) if k.nonEmpty => (k, v)
          case _ => throw new IllegalArgumentException(
            s"readPreference '$s': tag '$kv' is not name=value")
        }
      })
    }
    ReadPreference(mode, pref, sets)
  }
}

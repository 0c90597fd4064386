package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** client.Info analog (reference client/client.go:88-103): per-request
  * context produced by receivers and authenticators, consumed by
  * processors and exporters for batching, tenancy, routing, and
  * tagging decisions.
  *
  * The reference carries Info in the Go context propagated alongside
  * the data. A Spark pipeline has no side channel — the frame IS the
  * flow — so the info rides as ONE struct column `_client`
  * (addr, auth map, metadata map<string,array<string>>) attached at
  * the receiver. A constant-per-request struct costs nothing at rest
  * (dictionary/RLE encodes to a handful of bytes per row group) and
  * survives every declarative stage untouched, which is exactly the
  * reference's "provided the pipeline does not discard the context"
  * contract (client.go:33-36) made structural.
  *
  * Semantics carried over:
  *  - Metadata.Get is case-insensitive (client.go:149-170 EqualFold
  *    fallback). Normalizing keys to lowercase once at attach time
  *    replaces the per-lookup scan; [[ClientInfo.metadataCol]]
  *    lowercases the probe key to match.
  *  - Empty value and unset key are DISTINCT cases (reference
  *    batchprocessor config.go:37): an unset key reads as NULL, a
  *    set-but-empty key as an empty array.
  *  - AuthData (client.go:110-122) is a flat attribute bag published
  *    by authenticators (e.g. an OIDC "subject"); string-valued here,
  *    which covers the documented attribute contract.
  */
final case class ClientInfo(
    addr: Option[String] = None,
    auth: Map[String, String] = Map.empty,
    metadata: Map[String, Seq[String]] = Map.empty) {
  /** lowercased metadata keys; last writer wins on a case collision
    * (the reference treats such keys as equal already) */
  def normalized: ClientInfo =
    copy(metadata = metadata.map { case (k, v) => k.toLowerCase -> v })
}

object ClientInfo {
  /** the carrier column; leading underscore keeps it out of the way
    * of signal schemas (attributes flatten to bare names) */
  val ColName = "_client"

  /** client.MetadataHostName (client.go:122), normalized */
  val MetadataHostName = "host"

  /** Attach the info to every row of the request frame. */
  def attach(df: DataFrame, info: ClientInfo): DataFrame = {
    val n = info.normalized
    df.withColumn(ColName, struct(
      lit(n.addr.orNull).cast("string").as("addr"),
      typedLit(n.auth).as("auth"),
      typedLit(n.metadata).as("metadata")))
  }

  /** Metadata.Get analog: NULL when unset, empty array when set
    * empty, case-insensitive via the attach-time normalization. */
  def metadataCol(key: String): Column =
    element_at(col(s"$ColName.metadata"), key.toLowerCase)

  /** single-valued convenience: first value of the key (request
    * metadata is single-valued for the common tenant/token cases) */
  def metadataHead(key: String): Column = metadataCol(key).getItem(0)

  def addrCol: Column = col(s"$ColName.addr")

  /** AuthData.GetAttribute analog */
  def authCol(attr: String): Column = element_at(col(s"$ColName.auth"), attr)

  /** a deterministic single-string identity for one metadata key's
    * value list — the attribute-set member the reference builds for
    * shard lookup (batch_processor.go:296-308); unset stays NULL so
    * it remains distinct from set-empty */
  def metadataId(key: String): Column =
    when(metadataCol(key).isNotNull, array_join(metadataCol(key), ","))

  /** Partition-directory-safe encoding of [[metadataId]]: Spark's
    * partitioned parquet writer maps BOTH NULL and the empty string to
    * `__HIVE_DEFAULT_PARTITION__`, which would erase the unset-vs-
    * set-empty distinction this layer explicitly preserves. Unset →
    * the literal sentinel `__unset__`; a set value v → `v_` + v — the
    * prefix makes set-empty a non-empty directory name (`v_`) and
    * keeps a tenant literally named "__unset__" unambiguous
    * (`v___unset__`). Values stay recoverable from the path via
    * [[metadataPartitionDecode]]. */
  def metadataPartitionValue(key: String): Column =
    when(metadataCol(key).isNull, lit("__unset__"))
      .otherwise(concat(lit("v_"), array_join(metadataCol(key), ",")))

  /** inverse of [[metadataPartitionValue]] over a partition column
    * read back from the path: sentinel → NULL, `v_`-prefixed → the
    * original value */
  def metadataPartitionDecode(c: Column): Column =
    when(c === "__unset__", lit(null).cast("string"))
      .otherwise(c.substr(lit(3), length(c) - 2))

  /** strip the carrier before handing data to a sink that should not
    * see transport context */
  def strip(df: DataFrame): DataFrame = df.drop(ColName)

  /** Server-authenticator analog (reference client.go:26-30 — an
    * authenticator reads the incoming context, validates, and stores
    * AuthData back into client.Info; a failed authentication rejects
    * the request at the receiver, so the data NEVER enters the
    * pipeline). `validate` judges each request row (NULL = reject —
    * absent credentials are not valid ones); `attrs` are the
    * authenticator's published attributes (the documented public API
    * of an authenticator, e.g. an OIDC "subject"), written into
    * `_client.auth` with authenticator-wins override. Returns
    * (authenticated, rejected) — wire the rejected side to a deny
    * counter or DLQ exporter. */
  def authenticate(df: DataFrame, validate: Column,
                   attrs: Map[String, Column]): (DataFrame, DataFrame) = {
    val ok = coalesce(validate, lit(false))
    val attrKeys = attrs.keys.toSeq
    val published =
      if (attrs.isEmpty) col(s"$ColName.auth")
      else map_concat(
        // authenticator wins on key collision (a client cannot spoof
        // an attribute the authenticator publishes)
        map_filter(col(s"$ColName.auth"),
          (k, _) => !k.isInCollection(attrKeys)),
        map(attrs.toSeq.flatMap { case (k, v) => Seq(lit(k), v) }: _*))
    val accepted = df.filter(ok).withColumn(ColName, struct(
      col(s"$ColName.addr").as("addr"),
      published.as("auth"),
      col(s"$ColName.metadata").as("metadata")))
    (accepted, df.filter(!ok))
  }
}

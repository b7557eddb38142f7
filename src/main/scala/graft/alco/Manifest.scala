package graft.alco

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._
import scala.util.Try

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Iceberg-semantics emulation (SURVEY.md §7.4): a per-sink `_manifest/`
  * directory of JSON snapshot files provides snapshot commits, resumability
  * ("reruns resume from the last committed partition", BASELINE.json) and
  * per-partition lineage — without the Iceberg runtime (no Iceberg jar in
  * this sandbox; swap-in is a config change).
  *
  * Commit protocol: write `snapshot-<id>.json.tmp`, then atomic rename. The
  * latest snapshot is the max id. Each snapshot carries its parent, the
  * batch id, and the cumulative set of committed partition keys
  * ("tool=…/role=…/day=…").
  *
  * Driver-side metadata only — snapshot counts are O(#partitions), never
  * O(rows), so this holds at 10^12 rows (partitions are bounded by
  * tools × roles × days).
  */
object Manifest {

  final case class PartitionStat(partition: String, rowCount: Long)
  final case class Snapshot(
      snapshotId: Long,
      parentId: Long,
      batchId: Long,
      committedPartitions: Seq[String],
      stats: Seq[PartitionStat],
      wallMs: Long)

  private val mapper = new ObjectMapper()

  private def manifestDir(tableRoot: String): Path =
    Paths.get(tableRoot, "_manifest")

  def latest(tableRoot: String): Option[Snapshot] = {
    val dir = manifestDir(tableRoot)
    if (!Files.isDirectory(dir)) return None
    val snaps = Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.matches("snapshot-\\d+\\.json"))
      .toSeq
    if (snaps.isEmpty) None
    else Try(read(snaps.maxBy(p =>
      p.getFileName.toString.stripPrefix("snapshot-").stripSuffix(".json").toLong)))
      .toOption
  }

  def committedPartitions(tableRoot: String): Set[String] =
    latest(tableRoot).map(_.committedPartitions.toSet).getOrElse(Set.empty)

  /** Append a snapshot: cumulative committed set = parent's ∪ new. */
  def commit(tableRoot: String, batchId: Long, newStats: Seq[PartitionStat],
             wallMs: Long): Snapshot = {
    val parent = latest(tableRoot)
    val id = parent.map(_.snapshotId + 1).getOrElse(0L)
    val committed =
      (parent.map(_.committedPartitions).getOrElse(Seq.empty) ++
        newStats.map(_.partition)).distinct
    val snap = Snapshot(id, parent.map(_.snapshotId).getOrElse(-1L), batchId,
      committed, newStats, wallMs)
    val dir = manifestDir(tableRoot)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s"snapshot-$id.json.tmp")
    Files.write(tmp, toJson(snap).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(s"snapshot-$id.json"),
      StandardCopyOption.ATOMIC_MOVE)
    snap
  }

  /** Snapshot whose committed set is replaced outright (retention/expiry):
    * unlike `commit`, the parent's set is NOT unioned in.
    */
  def replaceCommitted(tableRoot: String, batchId: Long,
                       committed: Seq[String]): Snapshot = {
    val parent = latest(tableRoot)
    val id = parent.map(_.snapshotId + 1).getOrElse(0L)
    val snap = Snapshot(id, parent.map(_.snapshotId).getOrElse(-1L), batchId,
      committed.distinct,
      parent.map(_.stats.filter(st => committed.contains(st.partition)))
        .getOrElse(Nil),
      0L)
    val dir = manifestDir(tableRoot)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s"snapshot-$id.json.tmp")
    Files.write(tmp, toJson(snap).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(s"snapshot-$id.json"),
      StandardCopyOption.ATOMIC_MOVE)
    snap
  }

  private def toJson(s: Snapshot): String = {
    val root = mapper.createObjectNode()
    root.put("snapshot_id", s.snapshotId)
    root.put("parent_id", s.parentId)
    root.put("batch_id", s.batchId)
    root.put("wall_ms", s.wallMs)
    val parts = root.putArray("committed_partitions")
    s.committedPartitions.foreach(parts.add)
    val stats = root.putArray("stats")
    s.stats.foreach { st =>
      val o = stats.addObject()
      o.put("partition", st.partition)
      o.put("row_count", st.rowCount)
    }
    root.toPrettyString
  }

  private def read(p: Path): Snapshot = {
    val root = mapper.readTree(Files.readAllBytes(p)).asInstanceOf[ObjectNode]
    def arr(name: String) = root.get(name).asInstanceOf[ArrayNode].asScala.toSeq
    Snapshot(
      root.get("snapshot_id").asLong(),
      root.get("parent_id").asLong(),
      root.get("batch_id").asLong(),
      arr("committed_partitions").map(_.asText()),
      arr("stats").map(n => PartitionStat(
        n.get("partition").asText(), n.get("row_count").asLong())),
      root.get("wall_ms").asLong())
  }
}

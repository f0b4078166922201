package graft.cdc

/** Replication position: binlog file name + offset + originating server.
  *
  * Semantics re-expressed from the reference (not a code port):
  *  - total order: binlog name first, then offset
  *    (/root/reference/canal/prog/position.go:32-51);
  *  - comparing positions from DIFFERENT server_ids is undefined — the
  *    reference panics; we throw IllegalArgumentException and offer
  *    `tryCompare` for callers that need the safe form.
  */
final case class Position(name: String, pos: Long, serverId: Long) {
  def isZero: Boolean = name.isEmpty && pos == 0L

  def compare(o: Position): Int = {
    require(serverId == o.serverId,
      s"unsupported comparison between different server id: $serverId != ${o.serverId}")
    val c = name.compareTo(o.name)
    if (c != 0) Integer.signum(c) else java.lang.Long.compare(pos, o.pos)
  }

  def tryCompare(o: Position): Option[Int] =
    if (serverId == o.serverId) Some(compare(o)) else None

  override def toString: String = s"$name:$pos"
}

object Position {
  val zero: Position = Position("", 0L, 0L)
}

/** Flavor-spanning GTID set — what a [[Progress]] carries. Two concrete
  * flavors (the reference's go-mysql GTIDSet interface,
  * ckp/checkpoint.go:56-63): MySQL uuid-interval sets ([[GtidSet]]) and
  * MariaDB per-domain positions ([[GtidSet.Mariadb]]). Serialization is
  * the flavor's own public text format; [[Gset.parse]] auto-detects it,
  * so checkpoints/wire/JSON round-trip either flavor unchanged. */
sealed trait Gset {
  def isEmpty: Boolean
}

object Gset {
  /** Auto-detecting parse: every MySQL fragment contains a ':'
    * (`uuid:interval[:interval…]`); a MariaDB one (`domain-server-seq`)
    * never does. Empty → the empty MySQL-flavor set. */
  def parse(s: String): Gset = {
    val t = s.trim
    if (t.isEmpty || t.contains(':')) GtidSet.parse(t) else GtidSet.Mariadb.parse(t)
  }
}

/** A MySQL GTID set: `uuid:1-10:12,uuid2:5-8`. The reference delegates to
  * go-mysql's parser (/root/reference/canal/prog/progress.go:15-24 uses
  * mysql.GTIDSet); this is an independent implementation of the same
  * public format: parse, normalize (sorted, merged intervals), union,
  * containment, round-trip formatting.
  */
final case class GtidSet(sets: Map[String, Vector[(Long, Long)]]) extends Gset {
  def isEmpty: Boolean = sets.isEmpty

  def contains(other: GtidSet): Boolean =
    other.sets.forall { case (uuid, ivs) =>
      sets.get(uuid).exists { mine =>
        ivs.forall { case (a, b) => mine.exists { case (x, y) => x <= a && b <= y } }
      }
    }

  def union(other: GtidSet): GtidSet =
    GtidSet((sets.keySet ++ other.sets.keySet).map { uuid =>
      uuid -> GtidSet.normalize(
        sets.getOrElse(uuid, Vector.empty) ++ other.sets.getOrElse(uuid, Vector.empty))
    }.toMap)

  def add(uuid: String, gno: Long): GtidSet =
    GtidSet(sets.updated(uuid,
      GtidSet.normalize(sets.getOrElse(uuid, Vector.empty) :+ ((gno, gno)))))

  override def toString: String =
    sets.toVector.sortBy(_._1).map { case (uuid, ivs) =>
      uuid + ":" + ivs.map { case (a, b) => if (a == b) s"$a" else s"$a-$b" }.mkString(":")
    }.mkString(",")
}

object GtidSet {
  val empty: GtidSet = GtidSet(Map.empty)

  /** Merge/sort intervals; adjacent and overlapping runs coalesce. */
  def normalize(ivs: Vector[(Long, Long)]): Vector[(Long, Long)] = {
    val sorted = ivs.sortBy(_._1)
    sorted.foldLeft(Vector.empty[(Long, Long)]) {
      case (acc :+ ((a, b)), (c, d)) if c <= b + 1 => acc :+ ((a, math.max(b, d)))
      case (acc, iv) => acc :+ iv
    }
  }

  /** MariaDB flavor: `domain-server-seq` per domain (e.g. `0-1-100,1-2-5`)
    * — one current GTID per replication domain, ordering is per-domain seq
    * (the reference parses both flavors via go-mysql ParseGTIDSet,
    * ckp/checkpoint.go:56-63). Modeled separately from the MySQL
    * uuid-interval sets because the algebra differs: union is per-domain
    * max, containment is per-domain seq ≥. */
  final case class Mariadb(domains: Map[Long, (Long, Long)]) extends Gset { // domain -> (server, seq)
    def isEmpty: Boolean = domains.isEmpty
    def contains(other: Mariadb): Boolean =
      other.domains.forall { case (d, (_, seq)) =>
        domains.get(d).exists { case (_, mySeq) => mySeq >= seq }
      }
    /** Per-domain max — the later stream position wins. */
    def union(other: Mariadb): Mariadb =
      Mariadb((domains.keySet ++ other.domains.keySet).map { d =>
        d -> (domains.get(d).toSeq ++ other.domains.get(d).toSeq).maxBy(_._2)
      }.toMap)
    def add(domain: Long, server: Long, seq: Long): Mariadb =
      Mariadb(domains.get(domain) match {
        case Some((_, cur)) if cur >= seq => domains
        case _ => domains.updated(domain, (server, seq))
      })
    override def toString: String =
      domains.toVector.sortBy(_._1)
        .map { case (d, (srv, seq)) => s"$d-$srv-$seq" }.mkString(",")
  }

  object Mariadb {
    val empty: Mariadb = Mariadb(Map.empty)
    /** Parse `0-1-100,1-2-5`; empty string → empty set. */
    def parse(s: String): Mariadb = {
      val trimmed = s.trim
      if (trimmed.isEmpty) empty
      else Mariadb(trimmed.split(",").map(_.trim).filter(_.nonEmpty).map { part =>
        part.split("-") match {
          case Array(d, srv, seq) => d.toLong -> (srv.toLong, seq.toLong)
          case _ => throw new IllegalArgumentException(s"malformed mariadb gtid: $part")
        }
      }.toMap)
    }
  }

  /** Parse `uuid:1-10:12,uuid:...`; empty string → empty set. */
  def parse(s: String): GtidSet = {
    val trimmed = s.trim
    if (trimmed.isEmpty) empty
    else GtidSet(trimmed.split(",").map(_.trim).filter(_.nonEmpty).map { part =>
      val pieces = part.split(":")
      require(pieces.length >= 2, s"malformed gtid set fragment: $part")
      val uuid = pieces.head.toLowerCase
      val ivs = pieces.tail.toVector.map { r =>
        r.split("-") match {
          case Array(a) => (a.toLong, a.toLong)
          case Array(a, b) => (a.toLong, b.toLong)
          case _ => throw new IllegalArgumentException(s"malformed interval: $r")
        }
      }
      uuid -> normalize(ivs)
    }.groupMapReduce(_._1)(_._2)((a, b) => normalize(a ++ b)))
  }
}

/** Progress = position + optional GTID set. Ordering uses file&pos only —
  * GTID sets may not contain each other (the reference's documented reason,
  * /root/reference/canal/prog/progress.go:70-72). Zero progress sorts below
  * everything; a non-nil-but-empty GTID set means zero even when file&pos
  * are set (/root/reference/canal/prog/progress.go:55-67).
  */
final case class Progress(pos: Position, gset: Option[Gset]) {
  def isZero: Boolean = gset match {
    case Some(g) => g.isEmpty
    case None => pos.isZero
  }

  def compare(o: Progress): Int =
    if (isZero) { if (o.isZero) 0 else -1 }
    else if (o.isZero) 1
    else pos.compare(o.pos)

  override def toString: String = gset.map(_.toString).getOrElse(pos.toString)
}

object Progress {
  val zero: Progress = Progress(Position.zero, None)
  def apply(name: String, pos: Long, serverId: Long): Progress =
    Progress(Position(name, pos, serverId), None)
}

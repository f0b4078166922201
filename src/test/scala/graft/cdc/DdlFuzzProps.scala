package graft.cdc

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Model-based DDL fuzz: generate random ALTER sequences, render them to
  * SQL (with randomized casing, backticks, riders, and noise specs), and
  * replay through the tracker while applying the same steps to a trivial
  * independent model (a Vector of names). The tracker's column list must
  * match the model after every sequence — the catalog-drift property the
  * whole CDC pipeline rests on (a silent mis-parse here mis-decodes every
  * later row event). */
object DdlFuzzProps extends Properties("DdlFuzz") {

  private val types = Vector("INT", "BIGINT UNSIGNED", "VARCHAR(32)", "TEXT",
    "DECIMAL(12,2)", "TIMESTAMP", "JSON", "DOUBLE")

  private val genName: Gen[String] =
    Gen.chooseNum(0, 25).map(i => s"c$i")

  sealed trait Step
  private case class Add(name: String, tpe: String, first: Boolean, after: Option[Int]) extends Step
  private case class Drop(name: String) extends Step
  private case class Rename(from: String, to: String) extends Step
  private case class Modify(name: String, tpe: String) extends Step
  private case class Change(from: String, to: String, tpe: String) extends Step
  private case object Noise extends Step // index/option/partition riders

  private val genStep: Gen[Step] = Gen.frequency(
    4 -> (for {
      n <- genName; t <- Gen.oneOf(types); f <- Gen.oneOf(true, false)
      a <- Gen.option(Gen.chooseNum(0, 30))
    } yield Add(n, t, f, a)),
    2 -> genName.map(Drop.apply),
    2 -> (for { a <- genName; b <- genName } yield Rename(a, b)),
    2 -> (for { n <- genName; t <- Gen.oneOf(types) } yield Modify(n, t)),
    1 -> (for { a <- genName; b <- genName; t <- Gen.oneOf(types) } yield Change(a, b, t)),
    2 -> Gen.const(Noise))

  private val noiseSpecs = Vector(
    "ADD INDEX idx_fz (id)", "ENGINE=InnoDB", "AUTO_INCREMENT=99",
    "ALGORITHM=INPLACE", "LOCK=NONE", "COMMENT='fuzz'",
    "ADD CONSTRAINT ck CHECK (id > 0)", "DROP CHECK ck",
    "ROW_FORMAT=DYNAMIC", "DISABLE KEYS")

  /** Render a step to SQL against the model; None = step not applicable
    * (e.g. dropping a column that doesn't exist) → skipped. Randomness in
    * the RENDERING (case, backticks) comes from the seed. */
  private def render(step: Step, model: Vector[String], seed: Int): Option[(String, Vector[String])] = {
    def bt(n: String): String = if (seed % 3 == 0) s"`$n`" else n
    def kw(s: String): String = if (seed % 2 == 0) s.toLowerCase else s
    step match {
      case Add(n, t, first, after) if !model.contains(n) =>
        val pos =
          if (first) " FIRST"
          else after.filter(_ < model.size).map(i => s" AFTER ${bt(model(i))}").getOrElse("")
        val newModel = (first, after.filter(_ < model.size)) match {
          case (true, _) => n +: model
          case (_, Some(i)) => (model.take(i + 1) :+ n) ++ model.drop(i + 1)
          case _ => model :+ n
        }
        Some(s"${kw("ALTER TABLE")} ${bt("t")} ${kw("ADD COLUMN")} ${bt(n)} $t$pos" -> newModel)
      case Drop(n) if model.contains(n) && model.size > 1 =>
        Some(s"${kw("ALTER TABLE")} t ${kw("DROP COLUMN")} ${bt(n)}" ->
          model.filterNot(_ == n))
      case Rename(a, b) if model.contains(a) && !model.contains(b) =>
        Some(s"ALTER TABLE t ${kw("RENAME COLUMN")} ${bt(a)} TO ${bt(b)}" ->
          model.map(c => if (c == a) b else c))
      case Modify(n, t) if model.contains(n) =>
        Some(s"ALTER TABLE t ${kw("MODIFY COLUMN")} ${bt(n)} $t" -> model)
      case Change(a, b, t) if model.contains(a) && (a == b || !model.contains(b)) =>
        Some(s"ALTER TABLE t ${kw("CHANGE COLUMN")} ${bt(a)} ${bt(b)} $t" ->
          model.map(c => if (c == a) b else c))
      case Noise =>
        Some(s"ALTER TABLE t ${noiseSpecs(math.abs(seed) % noiseSpecs.size)}" -> model)
      case _ => None
    }
  }

  property("tracker column list equals the independent model after any ALTER sequence") =
    forAll(Gen.listOfN(30, genStep), Gen.chooseNum(0, 1000)) { (steps, seed) =>
      val tracker = new SchemaTracker
      tracker.createDatabase("db")
      tracker.execDdl("CREATE TABLE t (id INT NOT NULL PRIMARY KEY)", "db")
      var model = Vector("id")
      steps.zipWithIndex.foreach { case (step, i) =>
        render(step, model, seed + i).foreach { case (sql, newModel) =>
          tracker.execDdl(sql, "db")
          model = newModel
        }
      }
      val got = tracker.getTableDef("db", "t").get.columns.map(_.name)
      Prop(got == model) :| s"tracker=$got model=$model"
    }

  property("multi-spec statements apply left to right like single specs") =
    forAll(Gen.listOfN(6, genStep), Gen.chooseNum(0, 1000)) { (steps, seed) =>
      var model = Vector("id")
      val specs = Vector.newBuilder[String]
      steps.zipWithIndex.foreach { case (step, i) =>
        render(step, model, seed + i).foreach { case (sql, newModel) =>
          // strip the per-statement prefix; keep the spec body
          specs += sql.replaceFirst("(?i)^alter table `?t`? ", "")
          model = newModel
        }
      }
      val body = specs.result()
      body.isEmpty || {
        val tracker = new SchemaTracker
        tracker.createDatabase("db")
        tracker.execDdl("CREATE TABLE t (id INT NOT NULL PRIMARY KEY)", "db")
        tracker.execDdl(s"ALTER TABLE t ${body.mkString(", ")}", "db")
        val got = tracker.getTableDef("db", "t").get.columns.map(_.name)
        got == model
      }
    }
}

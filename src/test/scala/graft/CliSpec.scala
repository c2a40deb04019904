package graft

import java.nio.file.{Files, Path}

import graft.cli.Main

/** CLI surface tests: arg parsing (new + legacy shapes, cli.py:31-111) and
  * the full git-worktree diff lifecycle reproducing the reference's e2e
  * golden values (test_postgres_e2e.py:301-307). */
class CliSpec extends SparkTestBase {

  test("arg parsing covers the reference flag surface") {
    val a = Main.parseArgs(Seq("diff", "dim_customers", "--keys", "customer_id,name",
      "--base", "main", "--head", "feature/x", "--where", "id > 0",
      "--sample", "5", "--format", "json", "--keep-schemas"))
    assert(a.model == "dim_customers")
    assert(a.keys == Seq("customer_id", "name"))
    assert(a.baseRef == "main" && a.headRef == "feature/x")
    assert(a.where.contains("id > 0") && a.sample == 5)
    assert(a.format == "json" && a.keepSnapshots)
  }

  test("legacy invocation shape (no subcommand) still resolves to diff") {
    val a = Main.parseArgs(Seq("dim_customers", "--keys", "id"))
    assert(a.command == "diff" && a.model == "dim_customers" && a.keys == Seq("id"))
  }

  test("diff-tables parses paths; bad flags/formats rejected") {
    val a = Main.parseArgs(Seq("diff-tables", "/tmp/a", "/tmp/b", "--keys", "k"))
    assert(a.command == "diff-tables" && a.basePath == "/tmp/a" && a.headPath == "/tmp/b")
    intercept[IllegalArgumentException](Main.parseArgs(Seq("diff", "m", "--format", "xml")))
    intercept[IllegalArgumentException](Main.parseArgs(Seq("diff", "m", "--bogus")))
    intercept[IllegalArgumentException](Main.parseArgs(Seq("diff")))
  }

  test("--no-col-stats skips profile computation") {
    val a = Main.parseArgs(Seq("diff", "m", "--no-col-stats"))
    assert(!a.colStats)
    assert(Main.parseArgs(Seq("diff", "m", "--col-stats")).colStats)
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val r = graft.engine.DiffEngine.diff(df, df, keys = Seq("id"), computeProfiles = false)
    assert(r.columnProfiles.isEmpty)
    assert(r.rowcounts.base == 2 && r.rowDiff.get.changed == 0)
  }

  test("diff-tables runs the engine over two parquet paths") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dt_")
    val base = Seq((1, "Alice"), (2, "Bob"), (3, "Chandra")).toDF("customer_id", "name")
    val head = Seq((1, "Alice"), (2, "Bob"), (3, "Chandra"), (4, "Deepak")).toDF("customer_id", "name")
    base.write.parquet(s"$dir/base")
    head.write.parquet(s"$dir/head")
    val r = Main.runDiffTables(spark, Main.parseArgs(
      Seq("diff-tables", s"$dir/base", s"$dir/head", "--keys", "customer_id")))
    assert(r.rowcounts.base == 3 && r.rowcounts.head == 4)
    assert(r.rowDiff.get.added == 1 && r.rowDiff.get.removed == 0 && r.rowDiff.get.changed == 0)
  }

  private def git(cwd: Path, args: String*): Unit = {
    val pb = new ProcessBuilder(("git" +: args): _*)
    pb.directory(cwd.toFile)
    pb.environment().put("GIT_AUTHOR_NAME", "t"); pb.environment().put("GIT_AUTHOR_EMAIL", "t@t")
    pb.environment().put("GIT_COMMITTER_NAME", "t"); pb.environment().put("GIT_COMMITTER_EMAIL", "t@t")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0, s"git ${args.mkString(" ")}: $out")
  }

  test("worktree diff detects schema drift between refs") {
    assume(new ProcessBuilder("git", "--version").start().waitFor() == 0, "git unavailable")
    val repo = Files.createTempDirectory("graft_drift_repo_")
    val models = repo.resolve("models"); Files.createDirectories(models)
    val seeds = repo.resolve("seeds"); Files.createDirectories(seeds)
    Files.writeString(seeds.resolve("customers.csv"),
      "id,name,city\n1,Alice,Oslo\n2,Bob,Lima\n")
    git(repo, "init", "-b", "main")
    Files.writeString(models.resolve("dim.sql"),
      "select id, name, city from {{ ref('customers') }}")
    git(repo, "add", "."); git(repo, "commit", "-m", "base")
    git(repo, "checkout", "-b", "feature/drift")
    Files.writeString(models.resolve("dim.sql"),
      "select id, upper(name) as name, concat(name, '!') as greeting from {{ ref('customers') }}")
    git(repo, "add", "."); git(repo, "commit", "-m", "head drops city, adds greeting, changes name")

    val r = Main.runDiff(spark, Main.parseArgs(Seq("diff", "dim", "--keys", "id",
      "--base", "main", "--head", "feature/drift",
      "--project-dir", repo.toString, "--format", "json")))
    assert(r.schemaDiff.common == Seq("id", "name"))
    assert(r.schemaDiff.onlyInHead == Seq("greeting"))
    assert(r.schemaDiff.onlyInBase == Seq("city"))
    // hash over common non-key columns only: both names changed by upper()
    assert(r.rowDiff.get.changed == 2 && r.rowDiff.get.added == 0 && r.rowDiff.get.removed == 0)
  }

  test("full worktree diff lifecycle hits the reference e2e golden 3/4/1/0/0") {
    assume(new ProcessBuilder("git", "--version").start().waitFor() == 0, "git unavailable")
    val repo = Files.createTempDirectory("graft_e2e_repo_")
    val models = repo.resolve("models"); Files.createDirectories(models)
    val seeds = repo.resolve("seeds"); Files.createDirectories(seeds)
    Files.writeString(seeds.resolve("customers.csv"),
      "id,name\n1,Alice\n2,Bob\n3,Chandra\n4,Deepak\n")
    git(repo, "init", "-b", "main")
    Files.writeString(models.resolve("dim_customers.sql"),
      "select id as customer_id, name from {{ ref('customers') }} where id <= 3 order by id")
    git(repo, "add", "."); git(repo, "commit", "-m", "base model")
    git(repo, "checkout", "-b", "feature/include-4")
    Files.writeString(models.resolve("dim_customers.sql"),
      "select id as customer_id, name from {{ ref('customers') }} where id <= 4 order by id")
    git(repo, "add", "."); git(repo, "commit", "-m", "head model")

    val a = Main.parseArgs(Seq("diff", "dim_customers", "--keys", "customer_id",
      "--base", "main", "--head", "feature/include-4",
      "--project-dir", repo.toString, "--format", "json"))
    val r = Main.runDiff(spark, a)
    assert(r.rowcounts.base == 3 && r.rowcounts.head == 4)
    val rd = r.rowDiff.get
    assert(rd.added == 1 && rd.removed == 0 && rd.changed == 0)
    val json = Main.render(r, "json")
    assert(json.contains("\"added\": 1") && json.contains("\"mode\": \"FULL_DIFF\""))
  }
}

package graft.crawl

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CodecsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("zstd frame chain: compress per shard, concatenate, inflate back") {
    val a = ("alpha " * 500).getBytes("UTF-8")
    val b = "beta".getBytes("UTF-8")
    val chain = Codecs.zstd(a) ++ Codecs.zstd(b)
    assert(Codecs.unzstdAll(chain).get.sameElements(a ++ b))
    // single frame too
    assert(Codecs.unzstdAll(Codecs.zstd(b)).get.sameElements(b))
    // corrupt bytes and truncation quarantine
    assert(Codecs.unzstdAll("not zstd".getBytes).isEmpty)
    assert(Codecs.unzstdAll(chain.take(chain.length / 2)).isEmpty)
    assert(Codecs.unzstdAll(null).isEmpty)
    // bomb guard: 64 MiB of zeros compresses to a few KiB; the cap
    // fires during inflation, long before 64 MiB commits
    val bomb = Codecs.zstd(new Array[Byte](64 << 20))
    assert(bomb.length < (1 << 17))
    assert(Codecs.unzstdAll(bomb, maxOut = 1 << 20).isEmpty)
    assert(Codecs.unzstdAll(bomb, maxOut = (64 << 20) + 1).isDefined)
  }

  test("SQL surface: zstd_bytes / unzstd_all round trip and NULL quarantine") {
    graft.plans.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT decode(unzstd_all(concat(" +
        "zstd_bytes(encode('jsonl line one\n', 'utf-8')), " +
        "zstd_bytes(encode('jsonl line two', 'utf-8')))), 'utf-8') AS s")
      .collect().head.getString(0)
    assert(got == "jsonl line one\njsonl line two")
    assert(spark.sql("SELECT unzstd_all(encode('junk', 'utf-8')) IS NULL")
      .collect().head.getBoolean(0))
  }
}

package graft.core

import graft.SparkFunSuite
import org.apache.spark.sql.Column

class TransformsSpec extends SparkFunSuite {
  import spark.implicits._

  private def one(input: String, f: Column => Column): String =
    Seq(input).toDF("c").select(f($"c")).as[String].head

  test("T1 stripCr removes carriage returns") {
    assert(one("a\rb\r", Transforms.stripCr) == "ab")
  }
  test("T2 spacesToComma collapses runs") {
    assert(one("a  b c", Transforms.spacesToComma) == "a,b,c")
  }
  test("T3 colonsToComma collapses runs") {
    assert(one("t::5:k", Transforms.colonsToComma) == "t,5,k")
  }
  test("T4 quoteWrap single-quotes the value") {
    assert(one("v", Transforms.quoteWrap) == "'v'")
  }
  test("T5 stripFirstPipe removes only the first pipe") {
    assert(one("a|b|c", Transforms.stripFirstPipe) == "ab|c")
    assert(one("abc", Transforms.stripFirstPipe) == "abc")
  }
  test("T7 kv renders key=value") {
    val got = Seq(("k", "v")).toDF("k", "v")
      .select(Transforms.kv($"k", $"v")).as[String].head
    assert(got == "k=v")
  }
}

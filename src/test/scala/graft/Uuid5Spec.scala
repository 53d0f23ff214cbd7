package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Uuid5Util

/** Vectors generated with CPython `uuid.uuid5(uuid.NAMESPACE_DNS, name)` —
  * the exact call the reference makes (`src/utils/types_transform.py:76-79`). */
class Uuid5Spec extends AnyFunSuite {
  val vectors = Seq(
    "example.com" -> "cfbff0d1-9375-5685-968c-48ce8b15ae17",
    "1_1" -> "25277d86-b537-5f22-9a56-3da3aee3d9b8",
    "42_4" -> "700c0d69-6fdc-57e9-9802-87e4789528b2",
    "" -> "4ebd0208-8328-5d69-8c44-ec50939c0967",
    "мир_2" -> "86efb920-4ac7-5d99-a419-d9e3e42f8a98") // non-ASCII → UTF-8 bytes

  test("uuid5 matches CPython reference vectors") {
    vectors.foreach { case (name, expected) =>
      assert(Uuid5Util.v5(name) == expected, s"for name '$name'")
    }
  }

  test("uuid5 is deterministic and well-formed") {
    val u = Uuid5Util.v5("123_2")
    assert(u == Uuid5Util.v5("123_2"))
    assert(u.matches("[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"))
  }
}

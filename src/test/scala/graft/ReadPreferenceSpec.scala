package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.channel.{ReadMode, ReadPreference, ReplicaTagSet}

/** T7 — the reference's full read-preference surface
  * (mongo/package.scala:24-54): mode enum + preferred flag + tag sets,
  * with the reference's one rejected combination (plain primary with tag
  * sets, :53) and a canonical string form that round-trips. */
class ReadPreferenceSpec extends AnyFunSuite {

  test("plain modes render to the driver-mode strings") {
    assert(ReadPreference.Primary.render === "primary")
    assert(ReadPreference.PrimaryPreferred.render === "primaryPreferred")
    assert(ReadPreference.Secondary.render === "secondary")
    assert(ReadPreference.SecondaryPreferred.render === "secondaryPreferred")
    assert(ReadPreference.Nearest.render === "nearest")
  }

  test("builder-style preferred/tags match the reference's copy semantics") {
    val ts = List(ReplicaTagSet(List("dc" -> "east")))
    val rp = ReadPreference.Secondary.preferred(true).tags(ts)
    assert(rp === ReadPreference(ReadMode.Secondary, preferred = true, ts))
    // tags() APPENDS (reference: copy(tag = tag ++ ts))
    val more = rp.tags(List(ReplicaTagSet(List("dc" -> "west"))))
    assert(more.tagSets.map(_.render) === List("dc=east", "dc=west"))
  }

  test("tagged render and parse round-trip") {
    val rp = ReadPreference(ReadMode.Secondary, preferred = true,
      List(ReplicaTagSet(List("dc" -> "east", "rack" -> "r1")),
        ReplicaTagSet(List("dc" -> "west"))))
    assert(rp.render === "secondaryPreferred[dc=east,rack=r1;dc=west]")
    assert(ReadPreference.parse(rp.render) === rp)
    // every named constant round-trips too
    for (p <- Seq(ReadPreference.Primary, ReadPreference.PrimaryPreferred,
        ReadPreference.Secondary, ReadPreference.SecondaryPreferred,
        ReadPreference.Nearest))
      assert(ReadPreference.parse(p.render) === p)
  }

  test("the reference's unsupported combination is rejected: primary with tags") {
    val e = intercept[IllegalArgumentException] {
      ReadPreference(ReadMode.Primary, preferred = false,
        List(ReplicaTagSet(List("dc" -> "east"))))
    }
    assert(e.getMessage.contains("primary does not accept tag sets"))
    // ...but primaryPreferred with tags is a supported driver factory
    val ok = ReadPreference(ReadMode.Primary, preferred = true,
      List(ReplicaTagSet(List("dc" -> "east"))))
    assert(ok.render === "primaryPreferred[dc=east]")
    // and the parse path rejects the same combination
    assertThrows[IllegalArgumentException] {
      ReadPreference.parse("primary[dc=east]")
    }
  }

  test("nearest has no preferred variant") {
    assertThrows[IllegalArgumentException] {
      ReadPreference(ReadMode.Nearest, preferred = true)
    }
  }

  test("parse rejects unknown modes and malformed tag syntax") {
    val e = intercept[IllegalArgumentException](ReadPreference.parse("bogus"))
    assert(e.getMessage.contains("bogus"))
    assertThrows[IllegalArgumentException](ReadPreference.parse("secondary[dc]"))
    assertThrows[IllegalArgumentException](ReadPreference.parse("secondary[dc=east"))
    assertThrows[IllegalArgumentException](ReadPreference.parse("secondary[]"))
    assertThrows[IllegalArgumentException](ReadPreference.parse("secondary[=v]"))
  }

  test("tag names/values reject reserved characters") {
    assertThrows[IllegalArgumentException](ReplicaTagSet(List("d=c" -> "x")))
    assertThrows[IllegalArgumentException](ReplicaTagSet(List("dc" -> "a;b")))
    assertThrows[IllegalArgumentException](ReplicaTagSet(Nil))
  }
}

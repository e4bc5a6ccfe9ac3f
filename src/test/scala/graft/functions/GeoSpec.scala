package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class GeoSpec extends AnyFunSuite {
  import Geo._

  /** Run a scalacheck property under scalatest (no scalatestplus bridge
    * in the offline cache). */
  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  test("parsePolygon: happy path swaps to [lon,lat] (task.ts:300)") {
    val Right(ring) = parsePolygon("-41.0,174.0 -41.5,174.5 -42.0,174.0 -41.0,174.0")
    assert(ring.length == 4)
    assert(ring(0).sameElements(Array(174.0, -41.0)))
    assert(ring(1).sameElements(Array(174.5, -41.5)))
  }

  test("parsePolygon: auto-closes an open ring (task.ts:311-314)") {
    val Right(ring) = parsePolygon("-45.0,169.0 -45.5,169.8 -46.0,169.0")
    assert(ring.length == 4)
    assert(ring.head.sameElements(ring.last))
  }

  test("parsePolygon: any invalid pair rejects the whole polygon (task.ts:303-305)") {
    assert(parsePolygon("91.0,174.0 -41.5,174.5 -42.0,174.0").isLeft) // lat out of range
    assert(parsePolygon("-41.0,181.0 -41.5,174.5 -42.0,174.0").isLeft) // lon out of range
    assert(parsePolygon("a,b -41.5,174.5 -42.0,174.0").isLeft) // NaN
    assert(parsePolygon("-41.0,174.0,9 -41.5,174.5 -42.0,174.0").isLeft) // 3 comma parts
    assert(parsePolygon(",174.0 -41.5,174.5 -42.0,174.0").isLeft) // empty half
  }

  test("parsePolygon: a no-comma token is invalid (JS pushes it, task.ts:270-272)") {
    assert(parsePolygon("junk -41.5,174.5 -42.0,174.0 -41.5,174.5").isLeft)
  }

  test("parsePolygon: fewer than 3 valid points rejects (task.ts:307-309)") {
    assert(parsePolygon("-41.0,174.0 -41.5,174.5").isLeft)
    assert(parsePolygon("").isLeft)
    assert(parsePolygon("   ").isLeft)
    assert(parsePolygon(null).isLeft)
  }

  test("parsePolygon: JS parseFloat prefix semantics carry through") {
    // "1.5abc" parses in JS — pair is valid
    val Right(ring) = parsePolygon("-41.0abc,174.0 -41.5,174.5 -42.0,174.0")
    assert(ring(0).sameElements(Array(174.0, -41.0)))
  }

  test("parseCircle: happy path, radius kept for caller but validated (task.ts:319-338)") {
    assert(parseCircle("-41.5,174.1 30.0").exists { case (c, r) =>
      c.sameElements(Array(174.1, -41.5)) && r == 30.0 })
  }

  test("parseCircle: returns None, never throws") {
    assert(parseCircle(null).isEmpty)
    assert(parseCircle("").isEmpty)
    assert(parseCircle("-41.5,174.1").isEmpty) // no radius
    assert(parseCircle("-41.5,174.1 0").isEmpty) // radius not > 0
    assert(parseCircle("-41.5,174.1 -5").isEmpty)
    assert(parseCircle("91.0,174.1 30").isEmpty) // lat range
    assert(parseCircle("-41.5 174.1 30").isEmpty) // no comma
    assert(parseCircle("-41.5,174.1  30").isEmpty) // double space → empty part (JS split(' '))
  }

  test("polygonCentroid: shoelace centroid of a square") {
    val ring = Array(Array(0.0, 0.0), Array(2.0, 0.0), Array(2.0, 2.0), Array(0.0, 2.0), Array(0.0, 0.0))
    val c = polygonCentroid(ring)
    assert(math.abs(c(0) - 1.0) < 1e-12 && math.abs(c(1) - 1.0) < 1e-12)
  }

  test("polygonCentroid: degenerate (collinear) falls back to vertex mean (task.ts:364-372)") {
    val ring = Array(Array(0.0, 0.0), Array(1.0, 1.0), Array(2.0, 2.0), Array(0.0, 0.0))
    val c = polygonCentroid(ring)
    assert(c(0) == 0.75 && c(1) == 0.75) // mean of 4 points incl. repeated closure
  }

  test("polygonCentroid: <3 points → [0,0] (task.ts:342-344)") {
    assert(polygonCentroid(Array(Array(1.0, 2.0))).sameElements(Array(0.0, 0.0)))
  }

  // --- property-based (SURVEY §5.2) ---

  private val latGen = Gen.choose(-89.0, 89.0)
  private val lonGen = Gen.choose(-179.0, 179.0)
  private val pointsGen = Gen.listOfN(5, Gen.zip(latGen, lonGen))

  test("property: valid pair lists always parse and close the ring") {
    checkProp(Prop.forAll(pointsGen) { pts =>
      val s = pts.map { case (lat, lon) => s"$lat,$lon" }.mkString(" ")
      parsePolygon(s) match {
        case Right(ring) =>
          ring.head.sameElements(ring.last) &&
          ring.forall(p => p(0) >= -180 && p(0) <= 180 && p(1) >= -90 && p(1) <= 90)
        case Left(_) => false
      }
    })
  }

  test("property: corrupting any one pair rejects the whole polygon") {
    checkProp(Prop.forAll(pointsGen, Gen.choose(0, 4)) { (pts, idx) =>
      val good = pts.map { case (lat, lon) => s"$lat,$lon" }
      val bad = good.updated(idx, "999,999")
      parsePolygon(bad.mkString(" ")).isLeft
    })
  }

  test("property: centroid translation equivariance") {
    checkProp(Prop.forAll(pointsGen, latGen, lonGen) { (pts, dy, dx) =>
      val s = pts.map { case (lat, lon) => s"$lat,$lon" }.mkString(" ")
      parsePolygon(s) match {
        case Right(ring) =>
          val c1 = polygonCentroid(ring)
          val shifted = ring.map(p => Array(p(0) + dx / 10, p(1) + dy / 10))
          val c2 = polygonCentroid(shifted)
          math.abs(c2(0) - c1(0) - dx / 10) < 1e-6 && math.abs(c2(1) - c1(1) - dy / 10) < 1e-6
        case Left(_) => true
      }
    })
  }

  test("property: parseCircle never throws on arbitrary strings") {
    checkProp(Prop.forAll { (s: String) => parseCircle(s); true })
  }
}

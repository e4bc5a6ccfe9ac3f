package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class LookupsSpec extends AnyFunSuite {
  import Lookups._

  test("L1 category: map hit, passthrough, Unknown (task.ts:181-183)") {
    assert(categoryDescription("Met") == "Meteorological (including flood)")
    assert(categoryDescription("Geo") == "Geophysical (including landslide)")
    assert(categoryDescription("Volcano") == "Volcano") // passthrough
    assert(categoryDescription("") == "Unknown")
    assert(categoryDescription(null) == "Unknown")
  }

  test("L1/L2 maps have reference cardinalities (12 / 39 entries)") {
    assert(CategoryMap.size == 12)
    assert(EventMap.size == 39)
    assert(IconMap.size == 45)
    assert(ColorMap.size == 5)
  }

  test("L2 event: map hit, passthrough, Unknown (task.ts:185-187)") {
    assert(eventDescription("tropCyclone") == "Tropical Cyclone")
    assert(eventDescription("hurricFrcWnd") == "Hurricane Force Wind")
    assert(eventDescription("sharknado") == "sharknado")
    assert(eventDescription("") == "Unknown")
  }

  test("L3 cascade level 1: Health/Fire category overrides (task.ts:190-195)") {
    assert(eventIcon("anything", "Health", "Severe", "x") ==
      IconPrefix + "Incidents/INC.60.GHS08.HealthHazard.png")
    assert(eventIcon("flood", "Fire", "", "") ==
      IconPrefix + "Incidents/INC.35.Fire.png")
  }

  test("L3 cascade level 2: empty event → default icon (task.ts:198-201)") {
    assert(eventIcon("", "Met", "", "") == IconPrefix + DefaultIcon)
    assert(eventIcon(null, null, null, null) == IconPrefix + DefaultIcon)
  }

  test("L3 cascade level 3: pattern groups match event or headline (task.ts:207-231)") {
    // normalization strips spaces/hyphens, lowercases
    assert(eventIcon("Heavy Rain-Fall", "Met", "", "") ==
      IconPrefix + "NaturalHazards/NH.05.HeavyRain.png")
    // headline triggers even when event doesn't
    assert(eventIcon("wx", "Met", "", "Severe Thunderstorm Watch") ==
      IconPrefix + "NaturalHazards/NH.06.ElectricalStorm.png")
    // flashflood beats flood (earlier group)
    assert(eventIcon("FlashFlood", "", "", "") ==
      IconPrefix + "NaturalHazards/NH.01.Flood.png")
    // stormwind pattern → wind icon
    assert(eventIcon("Storm Wind", "", "", "") ==
      IconPrefix + "NaturalHazards/NH.04.StrongWind.png")
  }

  test("L3 cascade level 4: direct ICON_MAP lookup (task.ts:233-237)") {
    assert(eventIcon("frost", "Other", "", "") ==
      IconPrefix + "NaturalHazards/NH.08.Ice.png")
    assert(eventIcon("Drought", "Other", "", "") == // lowercased lookup
      IconPrefix + "NaturalHazards/NH.22.Drought.png")
  }

  test("L3 cascade level 5: Met/Geo severity fallback (task.ts:239-250)") {
    assert(eventIcon("mystery", "Met", "Severe", "") ==
      IconPrefix + "Incidents/INC.38.NaturalDisaster1.Urgent.png")
    assert(eventIcon("mystery", "Geo", "Extreme", "") ==
      IconPrefix + "Incidents/INC.38.NaturalDisaster1.Urgent.png")
    assert(eventIcon("mystery", "Met", "Moderate", "") ==
      IconPrefix + "Incidents/INC.39.NaturalDisaster2.NonUrgent.png")
    assert(eventIcon("mystery", "Geo", "Minor", "") ==
      IconPrefix + "Incidents/INC.40.NaturalDisaster3.InformationOnly.png")
    // non-Met/Geo category skips severity fallback
    assert(eventIcon("mystery", "Safety", "Severe", "") == IconPrefix + DefaultIcon)
  }

  test("L3 cascade level 6: default (task.ts:252)") {
    assert(eventIcon("mystery", "Other", "Unknown", "") == IconPrefix + DefaultIcon)
  }

  test("L3: every pattern group resolves to an existing icon") {
    // iterate one representative per group
    val reps = Seq("thunder", "flashflood", "heavyrain", "strongwind",
      "winterstorm", "stormsurge", "tropicalcyclone", "tropicalstorm",
      "earthquake", "tsunami", "tornado", "flood", "snow", "hail",
      "marine", "waterspout")
    reps.foreach { r =>
      val icon = eventIcon(r, "Other", "", "")
      assert(icon.startsWith(IconPrefix) && icon != IconPrefix + DefaultIcon, r)
    }
  }
}

package graft

import java.nio.file.Files

import graft.jobs.{EnergyFixtures, Jobs}

/** The sf-scaled energy-feed generators drive the reference's actual
  * pipeline compositions end-to-end (the same path Bench times): dirty
  * rows vanish, merges produce rows, archives fire.
  */
class EnergyFixturesSpec extends SparkTestBase {

  test("generated feeds run fmLoadMerge / sppWeatherMerge / histUnion") {
    val root = Files.createTempDirectory("energy_fix").toString
    EnergyFixtures.generateAll(spark, root, sf = 0.001) // 1000 fm rows floor

    val fm = Jobs.fmLoadMerge(spark, s"$root/fuel_mix", s"$root/load",
      s"$root/arch_fm", s"$root/arch_load", s"$root/lake_fm_load")
    assert(fm.exists(_ > 0), s"fmLoadMerge produced $fm")

    val spw = Jobs.sppWeatherMerge(spark, s"$root/spp", s"$root/weather",
      s"$root/arch_spp", s"$root/arch_weather", s"$root/lake_spp_weather")
    assert(spw.exists(_ > 0), s"sppWeatherMerge produced $spw")

    val hist = Jobs.historicalWeatherUnion(spark, s"$root/hist_weather",
      s"$root/lake_hist")
    assert(hist.exists(_ > 0), s"historicalWeatherUnion produced $hist")

    // sources archived -> a re-run is the S3-guard no-op
    assert(Jobs.fmLoadMerge(spark, s"$root/fuel_mix", s"$root/load",
      s"$root/arch_fm", s"$root/arch_load", s"$root/lake_fm_load").isEmpty)

    // determinism: regenerating produces the same cleaned merge count
    val root2 = Files.createTempDirectory("energy_fix2").toString
    EnergyFixtures.generateAll(spark, root2, sf = 0.001)
    val fm2 = Jobs.fmLoadMerge(spark, s"$root2/fuel_mix", s"$root2/load",
      s"$root2/arch_fm", s"$root2/arch_load", s"$root2/lake_fm_load")
    assert(fm2 === fm, "fixture generation must be deterministic")
  }
}
